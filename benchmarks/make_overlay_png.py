"""Render the reference-vs-repo learning-curve overlay figure.

Reads OVERLAY_r4.json (benchmarks/ref_overlay.py output) and draws one
small-multiples row — ppo_lunarlander / dqn_cartpole / sac_pendulum —
reference-script runs vs repo seed runs, avg100 vs env-steps, with each
workload's solve bar. Evidence artifact for curve parity (VERDICT r3
item 3).

    python benchmarks/make_overlay_png.py OVERLAY_r4.json OVERLAY_r4.png
"""

from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# dataviz reference palette, categorical slots in fixed order:
# slot 1 blue = repo, slot 2 orange = reference
BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#1a1a19", "#8a897f"

BARS = {
    "ppo_lunarlander": 200.0,
    "dqn_cartpole": 495.0,
    "sac_pendulum": -200.0,
    "rainbow_dqn_cartpole": 495.0,
    "ppg_rnn_lunarlander": 200.0,
    "ddqn_per_cartpole": 495.0,
    "ddqn_per_duel_cartpole": 495.0,
    "td3_pendulum": -200.0,
}
TITLES = {
    "ppo_lunarlander": "PPO — LunarLander-v3",
    "dqn_cartpole": "DQN — CartPole-v1",
    "sac_pendulum": "SAC — Pendulum-v1",
    "rainbow_dqn_cartpole": "Rainbow — CartPole-v1 (ref-exact 1:1 + γ=.99 arm)",
    "ppg_rnn_lunarlander": "PPG — LunarLander-v3",
    "ddqn_per_cartpole": "DDQN+PER — CartPole-v1 (ref-exact 1:1 + γ=.99 arm)",
    "ddqn_per_duel_cartpole": "DDQN+PER+Duel — CartPole-v1 (1:1 + γ=.99 arm)",
    "td3_pendulum": "TD3 — Pendulum-v1 (1:8 shipped + ref-cadence 1:1)",
}


def main(argv):
    overlay = json.load(open(argv[0]))
    names = [n for n in TITLES if n in overlay and overlay[n]["repo_runs"]]
    ncol = 3
    nrow = (len(names) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(4.6 * ncol, 3.4 * nrow))
    axes = [ax for row in (axes if nrow > 1 else [axes]) for ax in row]
    for ax in axes[len(names):]:
        ax.set_visible(False)

    for ax, name in zip(axes, names):
        o = overlay[name]
        for i, run in enumerate(o["reference_runs"]):
            xs = [p[0] / 1e3 for p in run["curve"]]
            ys = [p[1] for p in run["curve"]]
            ax.plot(xs, ys, color=ORANGE, lw=2, alpha=0.85,
                    label="reference (own script)" if i == 0 else None)
        for i, run in enumerate(o["repo_runs"]):
            xs = [p[0] / 1e3 for p in run["curve"]]
            ys = [p[1] for p in run["curve"]]
            ax.plot(xs, ys, color=BLUE, lw=2, alpha=0.85,
                    label="gymrl-tpu (this repo)" if i == 0 else None)
        bar = BARS[name]
        ax.axhline(bar, color=MUTED, lw=1, ls=(0, (4, 3)))
        ax.text(0.99, bar, f"solve bar {bar:g}", color=MUTED, fontsize=8,
                ha="right", va="bottom", transform=ax.get_yaxis_transform())
        ax.set_title(TITLES[name], fontsize=11, color=INK)
        ax.set_xlabel("env steps (thousands)", fontsize=9, color=MUTED)
        ax.tick_params(labelsize=8, colors=MUTED)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(MUTED)
        ax.grid(axis="y", color="#e6e4da", lw=0.6)
        ax.set_axisbelow(True)

    axes[0].set_ylabel("avg reward (last 100 episodes)", fontsize=9, color=MUTED)
    axes[0].legend(loc="lower right", fontsize=8, frameon=False)
    fig.suptitle("Learning-curve parity: reference scripts' own runs vs gymrl-tpu "
                 "(all runs/seeds shown)", fontsize=11, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.90 if len(names) > 3 else 0.93))
    fig.savefig(argv[1], dpi=150, facecolor="white")
    print("wrote", argv[1])


if __name__ == "__main__":
    main(sys.argv[1:])
