"""DQN on vectorized CartPole — the framework's minimum end-to-end slice.

Algorithm parity with reference algorithms/dqn_cartpole.py:
  * 3-layer MLP(256), orthogonal init gain √2, head gain 0.01 (:45-62)
  * ε-greedy with exponential decay ε_end + (ε_start−ε_end)·e^(−t/800),
    t counted in env steps / action selections (:117-122)
  * uniform replay 100k, batch 64, MSE TD loss with target net (:135-160)
  * targets bootstrap with (1 − done) where done = terminated|truncated (:158)
  * per-parameter gradient clamp ±1 (:163-165)
  * hard target sync every 4 *episodes* (:193-194)

TPU-native re-design (SURVEY.md §3.1): instead of the host while-loop doing
2 device round-trips per env step, `train_iter` is ONE jitted program that
scans `steps_per_iter` fused iterations of
    batched ε-greedy act → vmapped env step (+autoreset) → ring-buffer push
    → `updates_per_step` minibatch SGD updates,
with the update:data ratio preserved via cfg (reference ratio: 1 update of
batch 64 per env step ⇒ updates_per_step defaults to num_envs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import IterOut, Trainer, clip_grads_by_value, hard_update
from gymrl_tpu.core.schedules import exp_epsilon_decay
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.nn import initializers as gl_init
from gymrl_tpu.nn.layers import Dense
from gymrl_tpu.replay.uniform import ReplayState, replay_init, replay_push_batch, replay_sample


@dataclass(frozen=True)
class DQNConfig:
    env_name: str = "CartPole-v1"
    num_envs: int = 16
    steps_per_iter: int = 32  # vector env steps per jitted train_iter
    batch_size: int = 64
    gamma: float = 0.99
    lr: float = 1e-3
    epsilon_start: float = 0.95
    epsilon_end: float = 0.01
    epsilon_decay: float = 800.0  # in units of single-env steps (ref cadence)
    target_update_freq: int = 4  # episodes between hard target syncs
    memory_capacity: int = 100_000
    hidden_dim: int = 256
    # updates per vector step; None ⇒ num_envs (preserves ref 1-update/env-step)
    updates_per_step: int | None = None
    max_train_steps: int = 2_000_000  # total env steps budget
    solve_threshold: float = 495.0

    @property
    def n_updates(self) -> int:
        return self.num_envs if self.updates_per_step is None else self.updates_per_step


class QNetwork(nn.Module):
    n_actions: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_dim, kernel_init=gl_init.orthogonal(), name="fc1")(x)
        x = nn.relu(x)
        x = Dense(self.hidden_dim, kernel_init=gl_init.orthogonal(), name="fc2")(x)
        x = nn.relu(x)
        return Dense(self.n_actions, kernel_init=gl_init.orthogonal(0.01), name="head")(x)


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array  # f32 — reference DQN cuts bootstrap on done (incl. trunc)


class DQNTrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    replay: ReplayState
    vec_state: Any
    key: jax.Array
    env_steps: jax.Array  # i64-ish i32 total single-env steps
    episodes: jax.Array  # i32 completed episodes
    target_syncs: jax.Array  # i32 — number of hard syncs performed


class DQNTrainer(Trainer):
    """With ``mesh``: env batch + sampled learner batch DP over 'data',
    replay replicated (distributed.mesh.train_state_shardings)."""

    def __init__(self, cfg: DQNConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = QNetwork(self.venv.env.n_actions, cfg.hidden_dim)
        self.tx = optax.adam(cfg.lr)

    # -- API ----------------------------------------------------------------
    def init(self, key, _place: bool = True) -> DQNTrainState:
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        params = self.net.init(k_params, jnp.zeros((1, obs_dim)))
        example = Transition(
            obs=jnp.zeros((obs_dim,), jnp.float32),
            action=jnp.zeros((), jnp.int32),
            reward=jnp.zeros((), jnp.float32),
            next_obs=jnp.zeros((obs_dim,), jnp.float32),
            done=jnp.zeros((), jnp.float32),
        )
        ts = DQNTrainState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            replay=replay_init(example, self.cfg.memory_capacity),
            vec_state=self.venv.reset(k_env),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
            episodes=jnp.zeros((), jnp.int32),
            target_syncs=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def policy(self, ts, obs, key, deterministic: bool = True):
        q = self.net.apply(ts.params, obs)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    # -- internals ------------------------------------------------------------
    def _loss(self, params, target_params, batch: Transition):
        q = self.net.apply(params, batch.obs)
        q_sa = jnp.take_along_axis(q, batch.action[:, None], axis=-1).squeeze(-1)
        next_q = jnp.max(self.net.apply(target_params, batch.next_obs), axis=-1)
        target = batch.reward + self.cfg.gamma * next_q * (1.0 - batch.done)
        target = jax.lax.stop_gradient(target)
        return jnp.mean(jnp.square(q_sa - target))

    def _update(self, params, target_params, opt_state, replay, key):
        batch = replay_sample(replay, key, self.cfg.batch_size)
        if self.mesh is not None:
            from gymrl_tpu.distributed.mesh import constrain_batch

            batch = constrain_batch(batch, self.mesh)
        loss, grads = jax.value_and_grad(self._loss)(params, target_params, batch)
        grads = clip_grads_by_value(grads, 1.0)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def _train_iter(self, ts: DQNTrainState) -> tuple[DQNTrainState, IterOut]:
        cfg = self.cfg

        def env_step(ts: DQNTrainState, _):
            key, k_eps, k_rand, k_step, k_upd = jax.random.split(ts.key, 5)

            # ε-greedy batched action selection (ref dqn_cartpole.py:124-133)
            eps = exp_epsilon_decay(
                ts.env_steps, cfg.epsilon_start, cfg.epsilon_end, cfg.epsilon_decay
            )
            q = self.net.apply(ts.params, ts.vec_state.obs)
            greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
            randoms = jax.random.randint(k_rand, (cfg.num_envs,), 0, self.venv.env.n_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            action = jnp.where(explore, randoms, greedy)

            vec_state, tr = self.venv.step(ts.vec_state, action, k_step)
            replay = replay_push_batch(
                ts.replay,
                Transition(
                    obs=tr.obs,
                    action=action,
                    reward=tr.reward,
                    next_obs=tr.next_obs,
                    done=tr.done.astype(jnp.float32),
                ),
            )

            # k gradient updates per vector step (update:data ratio parity)
            def upd(carry, k):
                params, opt_state = carry
                params, opt_state, loss = self._update(
                    params, ts.target_params, opt_state, replay, k
                )
                return (params, opt_state), loss

            def do_updates(_):
                keys = jax.random.split(k_upd, cfg.n_updates)
                (params, opt_state), losses = jax.lax.scan(
                    upd, (ts.params, ts.opt_state), keys
                )
                return params, opt_state, jnp.mean(losses)

            params, opt_state, loss = jax.lax.cond(
                replay.size >= cfg.batch_size,
                do_updates,
                lambda _: (ts.params, ts.opt_state, jnp.zeros(())),
                operand=None,
            )

            # hard target sync every target_update_freq completed episodes
            episodes = ts.episodes + jnp.sum(tr.done.astype(jnp.int32))
            due = episodes // cfg.target_update_freq
            sync = due > ts.target_syncs
            target_params = jax.tree_util.tree_map(
                lambda t, o: jnp.where(sync, o, t), ts.target_params, params
            )

            new_ts = DQNTrainState(
                params=params,
                target_params=target_params,
                opt_state=opt_state,
                replay=replay,
                vec_state=vec_state,
                key=key,
                env_steps=ts.env_steps + cfg.num_envs,
                episodes=episodes,
                target_syncs=jnp.where(sync, due, ts.target_syncs),
            )
            step_out = (tr.final_return, tr.final_length, tr.done, loss, eps)
            return new_ts, step_out

        ts, (ep_ret, ep_len, ep_done, losses, epss) = jax.lax.scan(
            env_step, ts, None, length=cfg.steps_per_iter
        )
        out = IterOut(
            ep_return=ep_ret,
            ep_length=ep_len,
            ep_done=ep_done,
            metrics={"loss": jnp.mean(losses), "epsilon": epss[-1]},
        )
        return ts, out
