"""Pixel-observation pipeline — the image-obs capability of the reference's
``make_env`` (utils/runner.py:57-66: AtariPreprocessing + PyTorchFrame).

The reference's path is host-side: gym renders RGB frames, Atari
preprocessing rescales/skips, PyTorchFrame rolls HWC→CHW
(utils/env_wrappers.py:4-13). The TPU-native equivalent keeps everything
inside the jitted step: engines render their state to a grayscale canvas
with pure jnp rasterization (static shapes, vmap-friendly), and
``PixelWrapper`` applies the same preprocessing semantics —

  * ``scale_obs``   — float frames in [0, 1] (AtariPreprocessing scale_obs=True)
  * ``frame_skip``  — repeat the action k times, sum rewards, stop folding at
    done (AtariPreprocessing frame_skip)
  * frame stacking  — last ``stack`` frames as the channel axis

Layout note: PyTorchFrame's HWC→CHW roll exists because torch convs are
NCHW-native; flax/XLA convs are NHWC-native on TPU, so observations stay
[H, W, stack] and no transpose ever happens (documented deviation — the
capability is "learn from pixels", not a memory layout).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult


def rasterize_segment(h: int, w: int, x0, y0, x1, y1, thickness: float):
    """Anti-aliased segment rasterizer: [h, w] coverage of pixels within
    ``thickness`` of the segment (x, y in pixel coords), with a 1-px soft
    edge (coverage falls linearly from 1 at dist=thickness−0.5 to 0 at
    thickness+0.5). Pure jnp, static shapes — vmaps over envs inside jit.

    The soft edge matters for learning-from-pixels: binary masks make
    intensities a STEP function of the underlying state, so sub-pixel
    motion (a 0.3 px pole-tip shift per degree at 48×48) is invisible;
    AA coverage is continuous in state and recovers it (round-4 fix for
    the dqn_cartpole_pixels plateau — CURVES_r3.jsonl:1-2)."""
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    dx, dy = x1 - x0, y1 - y0
    len2 = dx * dx + dy * dy + 1e-8
    t = jnp.clip(((cols - x0) * dx + (rows - y0) * dy) / len2, 0.0, 1.0)
    px, py = x0 + t * dx, y0 + t * dy
    dist = jnp.sqrt((cols - px) ** 2 + (rows - py) ** 2)
    return jnp.clip(thickness + 0.5 - dist, 0.0, 1.0)


def rasterize_box(h: int, w: int, cx, cy, half_w, half_h):
    """[h, w] anti-aliased coverage of an axis-aligned box centered at
    (cx, cy) pixel coords (1-px soft edge per axis, see rasterize_segment)."""
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    cov_x = jnp.clip(half_w + 0.5 - jnp.abs(cols - cx), 0.0, 1.0)
    cov_y = jnp.clip(half_h + 0.5 - jnp.abs(rows - cy), 0.0, 1.0)
    return cov_x * cov_y


class PixelState(NamedTuple):
    inner: Any
    frames: jax.Array  # [H, W, stack] newest last
    t: jax.Array


class PixelWrapper(Env):
    """Wrap a state engine + renderer into a pixel-observation Env.

    ``render(params, state) -> [H, W] float frame in [0, 1]``; subclasses
    set ``screen_hw``/``render``. Observations are [H, W, stack].
    """

    stack: int = 4
    frame_skip: int = 1
    screen_hw: tuple[int, int] = (48, 48)

    def __init__(self, inner: Env):
        self.inner = inner
        self.n_actions = inner.n_actions
        self.act_dim = inner.act_dim
        self.action_bound = inner.action_bound
        self.max_steps = max(1, inner.max_steps // self.frame_skip)
        h, w = self.screen_hw
        self.obs_shape = (h, w, self.stack)
        self.name = f"{inner.name}-pixels"

    def default_params(self):
        return self.inner.default_params()

    def render(self, params, inner_state) -> jax.Array:
        raise NotImplementedError

    def _obs(self, state: PixelState) -> jax.Array:
        return state.frames

    def reset(self, params, key):
        inner_state, _ = self.inner.reset(params, key)
        frame = self.render(params, inner_state)
        frames = jnp.repeat(frame[:, :, None], self.stack, axis=2)
        state = PixelState(inner=inner_state, frames=frames, t=jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, params, state: PixelState, action, key) -> StepResult:
        def skip_step(carry, k):
            inner, reward, terminated, truncated = carry
            res = self.inner.step(params, inner, action, k)
            live = jnp.logical_not(terminated | truncated)
            reward = reward + res.reward * live
            inner = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old), res.state, inner
            )
            terminated = terminated | (res.terminated & live)
            truncated = truncated | (res.truncated & live)
            return (inner, reward, terminated, truncated), None

        keys = jax.random.split(key, self.frame_skip)
        (inner, reward, terminated, truncated), _ = jax.lax.scan(
            skip_step,
            (state.inner, jnp.zeros((), jnp.float32), jnp.zeros((), bool), jnp.zeros((), bool)),
            keys,
        )
        frame = self.render(params, inner)
        frames = jnp.concatenate([state.frames[:, :, 1:], frame[:, :, None]], axis=2)
        t = state.t + 1
        truncated = truncated | (t >= self.max_steps)
        new_state = PixelState(inner=inner, frames=frames, t=t)
        return StepResult(
            state=new_state, obs=self._obs(new_state), reward=reward,
            terminated=terminated, truncated=truncated,
        )


class CartPolePixels(PixelWrapper):
    """CartPole rendered to a 48×48 grayscale canvas: track line, cart box,
    pole segment — the state is fully recoverable from one frame except
    velocities, which the frame stack supplies (the standard pixel-control
    formulation). Registered as ``CartPolePixels-v0``."""

    stack: int = 4
    frame_skip: int = 1
    screen_hw: tuple[int, int] = (48, 48)

    def __init__(self):
        from gymrl_tpu.envs.cartpole import CartPole

        super().__init__(CartPole())

    def render(self, params, s) -> jax.Array:
        h, w = self.screen_hw
        world_w = 2.0 * params.x_threshold  # visible track span
        scale = w / world_w
        cart_cx = (s.x + params.x_threshold) * scale
        cart_cy = 0.75 * h
        pole_len_px = 2.0 * params.length * scale * 2.0  # gym draws 2×half-length
        tip_x = cart_cx + pole_len_px * jnp.sin(s.theta)
        tip_y = cart_cy - pole_len_px * jnp.cos(s.theta)

        track = rasterize_box(h, w, w / 2.0, cart_cy + 4.0, w / 2.0, 0.5)
        cart = rasterize_box(h, w, cart_cx, cart_cy, 4.0, 2.5)
        pole = rasterize_segment(h, w, cart_cx, cart_cy, tip_x, tip_y, 1.2)
        frame = jnp.clip(0.3 * track + 0.6 * cart + 1.0 * pole, 0.0, 1.0)
        return frame.astype(jnp.float32)
