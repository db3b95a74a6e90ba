"""Assemble the round-4 evidence artifacts into the repo root.

Run after tpu_session_r4.py + tpu_session_r4b.py finish:
  * THROUGHPUT_r4.json   — per-family matrix + profiles, extracted from the
    session logs
  * SOLVE_r4.jsonl       — seed matrix (curves stripped to <=40 pts already)
  * CURVES_r4.jsonl      — no-threshold workload curves
  * ABLATION_*_r4.jsonl  — ppg/rainbow decisive-cell seed-1 replications
  * OVERLAY_r4.json/.png — reference-vs-repo curve overlays

    python benchmarks/assemble_r4.py
"""

from __future__ import annotations

import json
import pathlib
import shutil
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent
ART = HERE / "artifacts"


def main():
    matrix, profiles, bench, flatopt = [], [], None, []
    for logname in ("tpu_session_r4.log", "tpu_session_r4b.log",
                    "tpu_session_r4c.log"):
        p = ART / logname
        if not p.exists():
            continue
        for line in p.read_text().splitlines():
            if not line.startswith("{"):
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "env_steps_per_s" in rec and "workload" in rec and "ms_full" not in rec:
                matrix.append(rec)
            elif "ms_full" in rec or "ms_full_train_iter" in rec:
                profiles.append(rec)
            elif rec.get("arm") == "baseline":
                bench = rec["steps_per_s"]
            elif rec.get("metric") == "ppo_lunarlander_env_steps_per_s":
                bench = rec["value"]  # shipped bench.py line (latest wins)
            elif rec.get("arm") in ("flat", "pytree"):
                flatopt.append(rec)

    out = {
        "bench_in_session_baseline_steps_per_s": bench,
        "family_matrix": matrix,
        "phase_profiles": profiles,
        "flat_optimizer_ab": flatopt,
        "note": ("one v5e chip via the session relay; in-session baseline is "
                 "the anchor (relay throughput varies per session). Full "
                 "streams: benchmarks/artifacts/tpu_session_r4*.log"),
    }
    (ROOT / "THROUGHPUT_r4.json").write_text(json.dumps(out, indent=1))
    print("THROUGHPUT_r4.json:", len(matrix), "matrix rows,",
          len(profiles), "profiles, flatopt", flatopt)

    for src, dst in (("SOLVE_r4.jsonl", "SOLVE_r4.jsonl"),
                     ("CURVES_r4.jsonl", "CURVES_r4.jsonl"),
                     ("ABLATION_ppg_r4.jsonl", "ABLATION_ppg_r4.jsonl"),
                     ("ABLATION_rainbow_r4.jsonl", "ABLATION_rainbow_r4.jsonl")):
        if (ART / src).exists():
            shutil.copy(ART / src, ROOT / dst)
            print("copied", dst)

    solve = ART / "SOLVE_r4_overlay.jsonl"
    overlay_json = ROOT / "OVERLAY_r4.json"
    cmd = [sys.executable, str(HERE / "ref_overlay.py"),
           "--out", str(overlay_json)]
    if solve.exists():
        cmd += ["--solve", str(solve)]
    subprocess.run(cmd, check=True)
    subprocess.run([sys.executable, str(HERE / "make_overlay_png.py"),
                    str(overlay_json), str(ROOT / "OVERLAY_r4.png")], check=True)


if __name__ == "__main__":
    main()
