"""Pure-JAX FlappyBird engine (flappy-bird-gymnasium "FlappyBird-v0" semantics).

Canonical env of the reference's NoisyDQN/PPO-RNN FlappyBird workloads
(reference algorithms/noisy_dqn_flappybird.py:48, ppo_rnn_flappybird.py).
The original package wraps the FlapPyBird pygame clone; it is not
installable in this image, so this engine re-creates its documented
numeric-observation mode (``use_lidar=False``, 12 features) from the
package's published constants:

  * screen 288x512; pipe width 52, gap 100; ground at y=400 (screen_height
    * 0.79); pipe x-velocity -4 px/frame; pipes spawn every 0.5 screen
    widths with gap-center uniform in the playable band.
  * player x fixed at 0.2·W = 57; size 34x24; flap impulse -9, gravity +1
    per frame, velocity clamped to [-8, +10]; rotation follows velocity
    (visual only; exported as an observation feature).
  * rewards: +0.1 per frame alive, +1.0 per pipe passed, -1.0 on death,
    -0.5 for touching the top of the screen; death on pipe/ground
    collision.
  * observation (12 features, each normalized to roughly [-1, 1]): for the
    last / next / next-next pipe pairs: (pipe_x, top_pipe_bottom_y,
    bottom_pipe_top_y), then player_y, player_vel_y, player_rotation.

This is an equivalent re-creation rather than an oracle-verified port
(documented deviation; the learning task — time pipe gaps under gravity —
is identical).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit

SCREEN_W, SCREEN_H = 288.0, 512.0
GROUND_Y = 400.0  # base line (screen_height * 0.79)
PIPE_W = 52.0
PIPE_GAP = 100.0
PIPE_VEL_X = -4.0
PIPE_SPACING = 0.5 * SCREEN_W + PIPE_W  # horizontal distance between pipe pairs
PLAYER_X = 0.2 * SCREEN_W
PLAYER_W, PLAYER_H = 34.0, 24.0
FLAP_VEL = -9.0
GRAVITY = 1.0
MAX_VEL_Y, MIN_VEL_Y = 10.0, -8.0
N_PIPES = 3  # pipes tracked in state: enough to always cover last/next/next-next


class FlappyBirdParams(NamedTuple):
    gap_low: jax.Array  # f32[] — lowest gap-center y
    gap_high: jax.Array  # f32[] — highest gap-center y


class FlappyBirdState(NamedTuple):
    player_y: jax.Array  # f32[]
    player_vel: jax.Array  # f32[]
    rotation: jax.Array  # f32[] — degrees, visual-only feature
    pipe_x: jax.Array  # f32[N_PIPES]
    gap_y: jax.Array  # f32[N_PIPES] — gap-center y per pipe
    score: jax.Array  # i32[] — pipes passed
    key: jax.Array  # PRNG for pipe respawns
    t: jax.Array


class FlappyBird(Env):
    name = "FlappyBird-v0"
    n_actions = 2  # 0 = idle, 1 = flap
    obs_shape = (12,)
    max_steps = 10_000

    def default_params(self) -> FlappyBirdParams:
        # Gap center stays inside the playable band with a 0.2·H margin top
        # and above the ground, mirroring the package's pipe-height sampling.
        return FlappyBirdParams(
            gap_low=jnp.asarray(0.2 * SCREEN_H, jnp.float32),
            gap_high=jnp.asarray(GROUND_Y - 0.2 * SCREEN_H, jnp.float32),
        )

    def _obs(self, state: FlappyBirdState) -> jax.Array:
        # Order pipes by x; "last" = the most recent pipe at/behind the player,
        # "next"/"next-next" the two upcoming ones (package feature layout).
        # One-hot contractions instead of `x[order]` / `xs[i]`: under vmap
        # those lower to per-env dynamic gathers, which are pathologically
        # slow on TPU (same fix as lunarlander._segment_lookup).
        order = jnp.argsort(state.pipe_x)
        oh_order = (jnp.arange(N_PIPES)[None, :] == order[:, None]).astype(jnp.float32)
        xs = oh_order @ state.pipe_x
        gaps = oh_order @ state.gap_y
        behind = xs + PIPE_W < PLAYER_X
        # index of last passed pipe (or the nearest if none passed yet)
        last_idx = jnp.where(jnp.any(behind), jnp.sum(behind.astype(jnp.int32)) - 1, 0)
        next_idx = jnp.minimum(last_idx + 1, N_PIPES - 1)
        nnext_idx = jnp.minimum(last_idx + 2, N_PIPES - 1)

        def pipe_feats(i):
            oh = (jnp.arange(N_PIPES) == i).astype(jnp.float32)
            x_i = jnp.sum(xs * oh)
            gap_i = jnp.sum(gaps * oh)
            top_y = gap_i - PIPE_GAP / 2.0  # bottom edge of the top pipe
            bot_y = gap_i + PIPE_GAP / 2.0  # top edge of the bottom pipe
            return jnp.array([x_i / SCREEN_W, top_y / SCREEN_H, bot_y / SCREEN_H])

        return jnp.concatenate(
            [
                pipe_feats(last_idx),
                pipe_feats(next_idx),
                pipe_feats(nnext_idx),
                jnp.array(
                    [
                        state.player_y / SCREEN_H,
                        state.player_vel / MAX_VEL_Y,
                        state.rotation / 90.0,
                    ]
                ),
            ]
        ).astype(jnp.float32)

    def reset(self, params: FlappyBirdParams, key):
        k_gaps, k_state = jax.random.split(key)
        gap_y = jax.random.uniform(
            k_gaps, (N_PIPES,), jnp.float32, params.gap_low, params.gap_high
        )
        state = FlappyBirdState(
            player_y=jnp.asarray((SCREEN_H - PLAYER_H) / 2.0, jnp.float32),
            player_vel=jnp.zeros(()),
            rotation=jnp.zeros(()),
            pipe_x=SCREEN_W + jnp.arange(N_PIPES, dtype=jnp.float32) * PIPE_SPACING,
            gap_y=gap_y,
            score=jnp.zeros((), jnp.int32),
            key=k_state,
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._obs(state)

    def step(self, params: FlappyBirdParams, state: FlappyBirdState, action, key) -> StepResult:
        flap = jnp.asarray(action) == 1
        # flap sets the impulse directly (no clamp); gravity path caps at the
        # terminal fall speed — matching the original FlapPyBird update rule.
        vel = jnp.where(flap, FLAP_VEL, jnp.minimum(state.player_vel + GRAVITY, MAX_VEL_Y))
        y = state.player_y + vel
        hit_top = y < 0.0
        y = jnp.maximum(y, 0.0)
        # Rotation: flap snaps up to 45°, otherwise rotates down 3°/frame to -90°.
        rotation = jnp.where(flap, 45.0, jnp.maximum(state.rotation - 3.0, -90.0))

        pipe_x = state.pipe_x + PIPE_VEL_X
        # Score: pipe's trailing edge crossed the player x this frame.
        passed = (pipe_x + PIPE_W < PLAYER_X) & (state.pipe_x + PIPE_W >= PLAYER_X)
        n_passed = jnp.sum(passed.astype(jnp.int32))

        # Respawn pipes that scrolled off-screen at the back of the train.
        k_next, k_gap = jax.random.split(state.key)
        off = pipe_x < -PIPE_W
        rightmost = jnp.max(pipe_x)
        new_gaps = jax.random.uniform(
            k_gap, (N_PIPES,), jnp.float32, params.gap_low, params.gap_high
        )
        pipe_x = jnp.where(off, rightmost + PIPE_SPACING, pipe_x)
        gap_y = jnp.where(off, new_gaps, state.gap_y)

        # Collision: player AABB vs pipe pair AABBs, or ground.
        px0, px1 = PLAYER_X, PLAYER_X + PLAYER_W
        py0, py1 = y, y + PLAYER_H
        overlap_x = (pipe_x < px1) & (pipe_x + PIPE_W > px0)
        top_edge = gap_y - PIPE_GAP / 2.0
        bot_edge = gap_y + PIPE_GAP / 2.0
        hit_pipe = jnp.any(overlap_x & ((py0 < top_edge) | (py1 > bot_edge)))
        hit_ground = py1 >= GROUND_Y
        died = hit_pipe | hit_ground

        reward = (
            0.1
            + 1.0 * n_passed.astype(jnp.float32)
            - jnp.where(hit_top, 0.5, 0.0)
            - jnp.where(died, 1.0, 0.0)
        )

        t = state.t + 1
        new_state = FlappyBirdState(
            player_y=y, player_vel=vel, rotation=rotation,
            pipe_x=pipe_x, gap_y=gap_y,
            score=state.score + n_passed,
            key=k_next, t=t,
        )
        terminated = died
        truncated = time_limit(t, self.max_steps, terminated)
        return StepResult(
            new_state, self._obs(new_state), reward.astype(jnp.float32), terminated, truncated
        )
