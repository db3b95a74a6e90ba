"""The DQN family beyond vanilla: Double/PER/Dueling/Noisy/Rainbow.

One parameterized trainer covers four reference workloads (feature flags
match each script's semantics exactly; presets at the bottom pin the
reference hyperparameters):

  * DDQN+PER          — algorithms/ddqn_per_cartpole.py
      2x256 relu trunk; double-DQN target (:224-229); stratified PER
      sampling, β 0.4 +0.001/sample (:125,137-138); priority
      min(|δ|+1e-4, 1.0)^0.6 (:142-145); per-param grad clamp ±1; hard
      target sync every 4 episodes; γ=0.9.
  * DDQN+PER+Dueling  — algorithms/ddqn_per_duel_cartpole.py
      1x256 relu trunk + V/A streams, Q = V + (A − mean A) (:71-78).
  * NoisyDQN+Dueling  — algorithms/noisy_dqn_cartpole.py
      all-noisy 2x64 trunk + noisy streams; NO ε-greedy (noise is the
      exploration; eval = μ-only, :192-205); uniform replay 10k; hard
      target sync every 500 learn steps (:243-244); γ=0.99.
  * Rainbow           — algorithms/rainbow_dqn_cartpole.py
      plain 2x256 relu trunk + noisy V/A heads (:100-115); PER with β
      annealing to 1.0 by progress (:229-231); n-step=5 folding with
      mid-episode termination handling (:207-218) and γ^n bootstrap on
      `terminal` (true termination, not truncation, :328-331); soft
      target τ=0.005 every update; grad-norm clip 10; lr decay
      0.9·lr·(1−t/T)+0.1·lr (:354-359); priority (|δ|+0.01)^0.6 unclipped;
      batch 256, capacity 20000, γ=0.9.

TPU-native structure is the same fused scan as algos/dqn.py: act → step →
(n-step fold) → push → k updates per vector step, one jitted program per
train_iter. The n-step fold keeps a [n, B] window in the carry and emits
the completed transition of t−n+1 each step (gated until warm).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import IterOut, Trainer, clip_grads_by_value
from gymrl_tpu.core.schedules import exp_epsilon_decay, per_beta_anneal, ref_lr_decay
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.core.normalization import (
    RewardScaler,
    RunningMeanStd,
    normalize_obs,
    reward_scaler_init,
    reward_scaler_reset,
    reward_scaler_step,
    rms_init,
    rms_update_batch,
)
from gymrl_tpu.nn.layers import MLP, PSCN, ConvEncoder, Dense, NoisyDense
from gymrl_tpu.replay.per import (
    PERState,
    per_init,
    per_push_batch,
    per_sample,
    per_update_priorities,
)
from gymrl_tpu.replay.uniform import replay_init, replay_push_batch, replay_sample


@dataclass(frozen=True)
class DQNFamilyConfig:
    env_name: str = "CartPole-v1"
    num_envs: int = 16
    steps_per_iter: int = 32
    batch_size: int = 64
    gamma: float = 0.9
    lr: float = 1e-3
    hidden_dim: int = 256
    memory_capacity: int = 65536  # power of two when use_per
    # feature flags
    double: bool = True
    dueling: bool = False
    noisy_trunk: bool = False
    noisy_heads: bool = False
    trunk_layers: int = 2
    trunk: str = "mlp"  # "mlp" | "pscn" (flappybird) | "conv" (pixel obs)
    pscn_dim: int = 512
    trunk_dims: tuple = ()  # post-PSCN MLP widths (flappy: (512, 256, 256)→256 out)
    head_hidden: int = 0  # dueling stream hidden width (flappy: 64)
    use_per: bool = True
    n_steps: int = 1
    # inline normalization (noisy_dqn_flappybird.py:484-487): running
    # state norm on obs entering the net/replay + per-episode reward scaling
    normalize_obs: bool = False
    scale_rewards: bool = False
    # exploration (ignored when noisy)
    epsilon_start: float = 0.95
    epsilon_end: float = 0.01
    epsilon_decay: float = 800.0
    # PER
    per_alpha: float = 0.6
    per_beta0: float = 0.4
    per_beta_increment: float = 0.001  # per sample() call; 0 ⇒ progress anneal
    per_eps: float = 1e-4
    per_error_max: float | None = 1.0  # None ⇒ unclipped (rainbow)
    # target network
    target_mode: str = "hard_episode"  # hard_episode | hard_step | soft
    target_update_freq: int = 4  # episodes or learn steps per mode
    tau: float = 0.005
    # optimization
    grad_clip_value: float | None = 1.0  # per-param clamp
    grad_clip_norm: float | None = None
    lr_decay: bool = False  # rainbow's 0.9·lr·(1−t/T)+0.1·lr
    updates_per_step: int | None = None  # None ⇒ num_envs (ref cadence)
    # Store replay obs/next_obs as uint8 (x·255 rounded): 4× less HBM for
    # pixel frames in [0, 1], enabling 8-16× larger pixel replay at equal
    # memory. Quantization error ≤ 1/510 per channel — below the render's
    # own intensity quantum. Requires normalize_obs=False (frames are
    # already [0, 1]; RMS-normalized obs are unbounded).
    obs_uint8: bool = False
    max_train_steps: int = 2_000_000
    solve_threshold: float | None = 495.0

    @property
    def n_updates(self) -> int:
        return self.num_envs if self.updates_per_step is None else self.updates_per_step

    @property
    def noisy(self) -> bool:
        return self.noisy_trunk or self.noisy_heads


class QNet(nn.Module):
    """Configurable trunk + (dueling) head with optional noisy layers.

    Two trunk shapes:
      * "mlp"  — trunk_layers × Dense/NoisyDense(hidden_dim) + ReLU (the
        CartPole scripts);
      * "pscn" — PSCN(pscn_dim) followed by MLP(trunk_dims, last_act) —
        the noisy_dqn_flappybird network: PSCN-512 + MLP[512,256,256]
        all-Noisy (reference algorithms/noisy_dqn_flappybird.py:219-247).
    ``head_hidden`` > 0 turns each dueling stream into MLP[head_hidden, out]
    (flappybird's fc_v/fc_a = MLP[256, 64, ·], :234-236); 0 keeps the
    CartPole scripts' single linear per stream.
    """

    n_actions: int
    hidden_dim: int
    trunk_layers: int
    dueling: bool
    noisy_trunk: bool
    noisy_heads: bool
    trunk: str = "mlp"  # "mlp" | "pscn"
    pscn_dim: int = 512
    trunk_dims: tuple = ()
    head_hidden: int = 0

    def _layer(self, feat, noisy, name):
        return NoisyDense(feat, name=name) if noisy else Dense(feat, name=name)

    def _stream(self, x, out_dim, name, deterministic, per_sample):
        if self.head_hidden > 0:
            linear = "noisy" if self.noisy_heads else "dense"
            return MLP([self.head_hidden, out_dim], linear=linear, name=name)(
                x, deterministic=deterministic, per_sample=per_sample
            )
        return self._layer(out_dim, self.noisy_heads, name)(
            x, deterministic=deterministic, per_sample=per_sample
        )

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False, per_sample: bool = False):
        if self.trunk == "conv":
            # pixel observations [B, H, W, C] — the image-obs capability of
            # the reference's make_env (utils/runner.py:57-66), NHWC-native
            x = ConvEncoder(self.hidden_dim, name="conv")(x)
        elif self.trunk == "pscn":
            linear = "noisy" if self.noisy_trunk else "dense"
            x = PSCN(self.pscn_dim, linear=linear, name="pscn")(
                x, deterministic=deterministic, per_sample=per_sample
            )
            if self.trunk_dims:
                x = MLP(list(self.trunk_dims), last_act=True, linear=linear,
                        name="trunk_mlp")(
                    x, deterministic=deterministic, per_sample=per_sample
                )
        else:
            for i in range(self.trunk_layers):
                x = self._layer(self.hidden_dim, self.noisy_trunk, f"fc{i + 1}")(
                    x, deterministic=deterministic, per_sample=per_sample
                )
                x = nn.relu(x)
        if self.dueling:
            v = self._stream(x, 1, "value", deterministic, per_sample)
            a = self._stream(x, self.n_actions, "advantage", deterministic, per_sample)
            return v + (a - jnp.mean(a, axis=-1, keepdims=True))
        return self._layer(self.n_actions, self.noisy_heads, "head")(
            x, deterministic=deterministic, per_sample=per_sample
        )


class NStepWindow(NamedTuple):
    """Ring of the last n transitions per env instance ([n, B, ...])."""

    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    terminated: jax.Array  # f32 — cuts bootstrap (γ^n target)
    done: jax.Array  # f32 — cuts reward folding


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    terminated: jax.Array  # rainbow bootstraps on true termination only
    done: jax.Array  # plain variants bootstrap on done (incl. truncation)


class FamilyTrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    replay: Any  # PERState or uniform ReplayState
    vec_state: Any
    window: NStepWindow | None
    obs_rms: RunningMeanStd  # checkpointed like the reference's pickled state_norm
    reward_scaler: RewardScaler
    key: jax.Array
    env_steps: jax.Array
    learn_steps: jax.Array
    episodes: jax.Array
    target_syncs: jax.Array
    beta: jax.Array  # PER β (stateful increment mode)


class DQNFamilyTrainer(Trainer):
    """With ``mesh``: DP over the env batch + the sampled learner batch;
    replay/sum-tree replicated (see distributed.mesh.train_state_shardings
    for the design rationale). 'model' axis unused — these nets are ≤256 wide,
    TP would be all-reduce overhead for no MXU win."""

    def __init__(self, cfg: DQNFamilyConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = QNet(
            n_actions=self.venv.env.n_actions,
            hidden_dim=cfg.hidden_dim,
            trunk_layers=cfg.trunk_layers,
            dueling=cfg.dueling,
            noisy_trunk=cfg.noisy_trunk,
            noisy_heads=cfg.noisy_heads,
            trunk=cfg.trunk,
            pscn_dim=cfg.pscn_dim,
            trunk_dims=tuple(cfg.trunk_dims),
            head_hidden=cfg.head_hidden,
        )
        tx = []
        if cfg.grad_clip_norm:
            tx.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
        tx.append(optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr))
        self.tx = optax.chain(*tx)

    # -- helpers --------------------------------------------------------------
    def _apply(self, params, obs, noise_key=None, per_sample: bool = False):
        """``per_sample=True`` = independent ε per batch row (acting path:
        decorrelates exploration across the vectorized env fleet — the
        equivalent of the reference's per-env-step noise resample).
        Updates keep one shared draw per forward, the NoisyNet training
        cadence the reference uses (utils/model.py:74-84)."""
        if self.cfg.noisy and noise_key is not None:
            return self.net.apply(
                params, obs, per_sample=per_sample, rngs={"noise": noise_key}
            )
        return self.net.apply(params, obs, deterministic=True)

    def init(self, key, _place: bool = True) -> FamilyTrainState:
        cfg = self.cfg
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_shape = self.venv.env.obs_shape  # (d,) for vectors, (H, W, C) for pixels
        init_rngs = {"params": k_params}
        params = self.net.init(init_rngs, jnp.zeros((1, *obs_shape)))
        obs_dtype = jnp.uint8 if cfg.obs_uint8 else jnp.float32
        if cfg.obs_uint8:
            assert not cfg.normalize_obs, "obs_uint8 requires raw [0,1] frames"
        example = Transition(
            obs=jnp.zeros(obs_shape, obs_dtype),
            action=jnp.zeros((), jnp.int32),
            reward=jnp.zeros((), jnp.float32),
            next_obs=jnp.zeros(obs_shape, obs_dtype),
            terminated=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.float32),
        )
        replay = (
            per_init(example, cfg.memory_capacity)
            if cfg.use_per
            else replay_init(example, cfg.memory_capacity)
        )
        b = cfg.num_envs
        window = None
        if cfg.n_steps > 1:
            window = NStepWindow(
                obs=jnp.zeros((cfg.n_steps, b, *obs_shape), jnp.float32),
                action=jnp.zeros((cfg.n_steps, b), jnp.int32),
                reward=jnp.zeros((cfg.n_steps, b), jnp.float32),
                next_obs=jnp.zeros((cfg.n_steps, b, *obs_shape), jnp.float32),
                terminated=jnp.zeros((cfg.n_steps, b), jnp.float32),
                done=jnp.zeros((cfg.n_steps, b), jnp.float32),
            )
        ts = FamilyTrainState(
            params=params,
            target_params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=self.tx.init(params),
            replay=replay,
            vec_state=self.venv.reset(k_env),
            window=window,
            obs_rms=rms_init(obs_shape),
            reward_scaler=reward_scaler_init(cfg.num_envs, cfg.gamma),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
            learn_steps=jnp.zeros((), jnp.int32),
            episodes=jnp.zeros((), jnp.int32),
            target_syncs=jnp.zeros((), jnp.int32),
            beta=jnp.asarray(cfg.per_beta0, jnp.float32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def policy(self, ts, obs, key, deterministic: bool = True):
        # eval: μ-only for noisy nets (ref noisy_dqn :192-205), argmax always;
        # frozen normalization stats (ref utils/runner.py:173)
        if self.cfg.normalize_obs:
            obs = normalize_obs(ts.obs_rms, obs)
        q = self._apply(ts.params, obs, None if deterministic else key)
        return jnp.argmax(q, axis=-1).astype(jnp.int32)

    # -- n-step fold ----------------------------------------------------------
    def _fold_window(self, w: NStepWindow) -> Transition:
        """Emit the n-step transition of the window's oldest entry
        (reference rainbow :207-218 semantics, vectorized over B)."""
        n = self.cfg.n_steps
        gamma = self.cfg.gamma
        n_reward = jnp.zeros_like(w.reward[0])
        next_obs = w.next_obs[n - 1]
        terminal = w.terminated[n - 1]
        for i in reversed(range(n)):
            n_reward = w.reward[i] + gamma * (1.0 - w.done[i]) * n_reward
            cut = w.done[i] > 0.5
            cut_b = cut.reshape(cut.shape + (1,) * (next_obs.ndim - 1))
            next_obs = jnp.where(cut_b, w.next_obs[i], next_obs)
            terminal = jnp.where(cut, w.terminated[i], terminal)
        return Transition(
            obs=w.obs[0], action=w.action[0], reward=n_reward,
            next_obs=next_obs, terminated=terminal, done=w.done[0],
        )

    # -- loss / update --------------------------------------------------------
    def _td_error(self, params, target_params, batch: Transition, keys):
        cfg = self.cfg
        k1, k2, _ = keys
        q = self._apply(params, batch.obs, k1)
        q_sa = jnp.take_along_axis(q, batch.action[:, None], axis=-1).squeeze(-1)
        # the target net is permanently eval-mode in the reference (μ-only,
        # rainbow_dqn_cartpole.py:281 / noisy_dqn_cartpole.py:181) — noisy
        # targets never anneal and cap learning (plateau ~280 on CartPole)
        if cfg.double:
            next_a = jnp.argmax(self._apply(params, batch.next_obs, k2), axis=-1)
            next_q = jnp.take_along_axis(
                self._apply(target_params, batch.next_obs, None),
                next_a[:, None], axis=-1,
            ).squeeze(-1)
        else:
            next_q = jnp.max(self._apply(target_params, batch.next_obs, None), axis=-1)
        # rainbow (n>1) bootstraps on true termination with γ^n; 1-step
        # variants use done (terminated|truncated), matching each script.
        cut = batch.terminated if cfg.n_steps > 1 else batch.done
        target = batch.reward + (cfg.gamma ** cfg.n_steps) * next_q * (1.0 - cut)
        return q_sa - jax.lax.stop_gradient(target)

    def _loss(self, params, target_params, batch, weights, keys):
        delta = self._td_error(params, target_params, batch, keys)
        return jnp.mean(jnp.square(delta) * weights), delta

    def _update_once(self, params, target_params, opt_state, replay, beta, key, lr):
        cfg = self.cfg
        k_sample, k1, k2, k3 = jax.random.split(key, 4)
        if cfg.use_per:
            batch, leaf_idx, weights = per_sample(replay, k_sample, cfg.batch_size, beta)
        else:
            batch = replay_sample(replay, k_sample, cfg.batch_size)
            weights = jnp.ones((cfg.batch_size,), jnp.float32)
        if cfg.obs_uint8:  # dequantize sampled frames back to [0, 1] f32
            batch = batch._replace(
                obs=batch.obs.astype(jnp.float32) / 255.0,
                next_obs=batch.next_obs.astype(jnp.float32) / 255.0,
            )
        if self.mesh is not None:
            from gymrl_tpu.distributed.mesh import constrain_batch

            # re-shard the sampled minibatch onto 'data' so the gradient
            # pass is data-parallel (XLA psums grads into replicated params)
            batch = constrain_batch(batch, self.mesh)
            weights = constrain_batch(weights, self.mesh)

        (loss, delta), grads = jax.value_and_grad(self._loss, has_aux=True)(
            params, target_params, batch, weights, (k1, k2, k3)
        )
        if cfg.grad_clip_value:
            grads = clip_grads_by_value(grads, cfg.grad_clip_value)
        opt_state[-1].hyperparams["learning_rate"] = lr
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        if cfg.use_per:
            err = jnp.abs(delta) + cfg.per_eps
            if cfg.per_error_max is not None:
                err = jnp.minimum(err, cfg.per_error_max)
            priorities = jnp.power(err, cfg.per_alpha)
            replay = per_update_priorities(replay, leaf_idx, priorities)
            if cfg.per_beta_increment > 0:
                beta = jnp.minimum(1.0, beta + cfg.per_beta_increment)
        return params, opt_state, replay, beta, loss

    # -- fused train iteration (jitted via base.Trainer.train_iter) -----------
    def _train_iter(self, ts: FamilyTrainState) -> tuple[FamilyTrainState, IterOut]:
        cfg = self.cfg

        def env_step(ts: FamilyTrainState, _):
            key, k_act, k_eps, k_rand, k_step, k_upd = jax.random.split(ts.key, 6)

            # --- act (on normalized obs when the workload uses state_norm,
            # noisy_dqn_flappybird.py:484-487)
            obs_rms = ts.obs_rms
            nobs = normalize_obs(obs_rms, ts.vec_state.obs) if cfg.normalize_obs \
                else ts.vec_state.obs
            q = self._apply(
                ts.params, nobs, k_act if cfg.noisy else None, per_sample=True
            )
            action = jnp.argmax(q, axis=-1).astype(jnp.int32)
            if not cfg.noisy:  # ε-greedy exploration
                eps = exp_epsilon_decay(
                    ts.env_steps, cfg.epsilon_start, cfg.epsilon_end, cfg.epsilon_decay
                )
                randoms = jax.random.randint(k_rand, (cfg.num_envs,), 0, self.venv.env.n_actions)
                explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
                action = jnp.where(explore, randoms, action)

            vec_state, tr = self.venv.step(ts.vec_state, action, k_step)

            # --- inline normalization/scaling before the replay sees the
            # transition (reference stores normalized states + scaled rewards,
            # noisy_dqn_flappybird.py:484-487; scaler resets per episode)
            scaler = ts.reward_scaler
            reward = tr.reward
            if cfg.scale_rewards:
                scaler, reward = reward_scaler_step(scaler, reward)
                scaler = reward_scaler_reset(scaler, tr.done)
            if cfg.normalize_obs:
                obs_rms = rms_update_batch(obs_rms, tr.next_obs)
                next_obs = normalize_obs(obs_rms, tr.next_obs)
            else:
                next_obs = tr.next_obs
            step_tr = Transition(
                obs=nobs, action=action, reward=reward, next_obs=next_obs,
                terminated=tr.terminated.astype(jnp.float32),
                done=tr.done.astype(jnp.float32),
            )

            # --- n-step fold + push
            window = ts.window
            if cfg.n_steps > 1:
                window = NStepWindow(
                    obs=jnp.roll(ts.window.obs, -1, 0).at[-1].set(step_tr.obs),
                    action=jnp.roll(ts.window.action, -1, 0).at[-1].set(step_tr.action),
                    reward=jnp.roll(ts.window.reward, -1, 0).at[-1].set(step_tr.reward),
                    next_obs=jnp.roll(ts.window.next_obs, -1, 0).at[-1].set(step_tr.next_obs),
                    terminated=jnp.roll(ts.window.terminated, -1, 0).at[-1].set(step_tr.terminated),
                    done=jnp.roll(ts.window.done, -1, 0).at[-1].set(step_tr.done),
                )
                emit = self._fold_window(window)
                warm = ts.env_steps >= (cfg.n_steps - 1) * cfg.num_envs
            else:
                emit = step_tr
                warm = jnp.asarray(True)

            if cfg.obs_uint8:  # quantize frames entering the replay
                # clip before the cast: uint8 wraps mod 256, so an env whose
                # frames escape [0, 1] would corrupt silently (free on TPU)
                emit = emit._replace(
                    obs=jnp.clip(jnp.round(emit.obs * 255.0), 0.0, 255.0).astype(jnp.uint8),
                    next_obs=jnp.clip(jnp.round(emit.next_obs * 255.0), 0.0, 255.0).astype(jnp.uint8),
                )
            push = per_push_batch if cfg.use_per else replay_push_batch
            replay = jax.lax.cond(
                warm, lambda r: push(r, emit), lambda r: r, ts.replay
            )

            # --- k gradient updates (update:data parity)
            lr = (
                ref_lr_decay(ts.env_steps, cfg.max_train_steps, cfg.lr)
                if cfg.lr_decay else jnp.asarray(cfg.lr, jnp.float32)
            )
            beta = (
                per_beta_anneal(ts.env_steps, cfg.max_train_steps, cfg.per_beta0)
                if (cfg.use_per and cfg.per_beta_increment == 0) else ts.beta
            )

            def upd(carry, k):
                params, opt_state, replay, beta = carry
                params, opt_state, replay, beta, loss = self._update_once(
                    params, ts.target_params, opt_state, replay, beta, k, lr
                )
                return (params, opt_state, replay, beta), loss

            def do_updates(args):
                params, opt_state, replay, beta = args
                keys = jax.random.split(k_upd, cfg.n_updates)
                (params, opt_state, replay, beta), losses = jax.lax.scan(
                    upd, (params, opt_state, replay, beta), keys
                )
                return params, opt_state, replay, beta, jnp.mean(losses)

            size = replay.size
            params, opt_state, replay, beta, loss = jax.lax.cond(
                size >= cfg.batch_size,
                do_updates,
                lambda args: (*args, jnp.zeros(())),
                (ts.params, ts.opt_state, replay, beta),
            )
            did_update = (size >= cfg.batch_size).astype(jnp.int32)
            learn_steps = ts.learn_steps + did_update * cfg.n_updates

            # --- target network maintenance
            episodes = ts.episodes + jnp.sum(tr.done.astype(jnp.int32))
            target_params, target_syncs = self._target_update(
                ts, params, episodes, learn_steps, did_update
            )

            new_ts = FamilyTrainState(
                params=params, target_params=target_params, opt_state=opt_state,
                replay=replay, vec_state=vec_state, window=window,
                obs_rms=obs_rms, reward_scaler=scaler, key=key,
                env_steps=ts.env_steps + cfg.num_envs, learn_steps=learn_steps,
                episodes=episodes, target_syncs=target_syncs, beta=beta,
            )
            return new_ts, (tr.final_return, tr.final_length, tr.done, loss)

        ts, (ep_ret, ep_len, ep_done, losses) = jax.lax.scan(
            env_step, ts, None, length=cfg.steps_per_iter
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics={"loss": jnp.mean(losses), "beta": ts.beta},
        )
        return ts, out

    def _target_update(self, ts, params, episodes, learn_steps, did_update):
        cfg = self.cfg
        if cfg.target_mode == "soft":
            # soft update happens once per update() call (rainbow :347-352),
            # so skip it on steps where the replay was still warming up.
            tau = cfg.tau * did_update.astype(jnp.float32)
            target = jax.tree_util.tree_map(
                lambda t, o: (1.0 - tau) * t + tau * o, ts.target_params, params
            )
            return target, ts.target_syncs
        counter = episodes if cfg.target_mode == "hard_episode" else learn_steps
        due = counter // cfg.target_update_freq
        sync = due > ts.target_syncs
        target = jax.tree_util.tree_map(
            lambda t, o: jnp.where(sync, o, t), ts.target_params, params
        )
        return target, jnp.where(sync, due, ts.target_syncs)


# -- presets: one per reference script ---------------------------------------

def ddqn_per_config(**kw) -> DQNFamilyConfig:
    """algorithms/ddqn_per_cartpole.py hyperparameters."""
    base = dict(
        gamma=0.9, memory_capacity=65536, double=True, dueling=False,
        use_per=True, per_beta_increment=0.001, per_error_max=1.0, per_eps=1e-4,
        target_mode="hard_episode", target_update_freq=4, grad_clip_value=1.0,
        trunk_layers=2, hidden_dim=256,
    )
    base.update(kw)
    return DQNFamilyConfig(**base)


def ddqn_per_duel_config(**kw) -> DQNFamilyConfig:
    """algorithms/ddqn_per_duel_cartpole.py — adds the dueling head."""
    return ddqn_per_config(dueling=True, trunk_layers=1, **kw)


def noisy_dqn_config(**kw) -> DQNFamilyConfig:
    """algorithms/noisy_dqn_cartpole.py hyperparameters."""
    base = dict(
        gamma=0.99, memory_capacity=16384, double=False, dueling=True,
        noisy_trunk=True, noisy_heads=True, trunk_layers=2, hidden_dim=64,
        use_per=False, target_mode="hard_step", target_update_freq=500,
        grad_clip_value=1.0,
    )
    base.update(kw)
    return DQNFamilyConfig(**base)


def noisy_dqn_flappybird_config(**kw) -> DQNFamilyConfig:
    """algorithms/noisy_dqn_flappybird.py hyperparameters + network.

    PSCN-512 trunk + MLP[512, 256, 256] all-Noisy, dueling streams
    MLP[256, 64, ·] (:219-247); Double-DQN targets (:413-421); γ=0.9,
    Adam 1e-4 (torch-default eps), batch 256, capacity 51200, hard target
    sync every 400 learn steps, grad-NORM clip 1.0 (:44-58, 427);
    inline state normalization + per-episode reward scaling (:484-487).
    """
    base = dict(
        env_name="FlappyBird-v0", gamma=0.9, lr=1e-4, batch_size=256,
        memory_capacity=51200, double=True, dueling=True,
        noisy_trunk=True, noisy_heads=True,
        trunk="pscn", pscn_dim=512, trunk_dims=(512, 256, 256), head_hidden=64,
        use_per=False, target_mode="hard_step", target_update_freq=400,
        grad_clip_value=None, grad_clip_norm=1.0,
        normalize_obs=True, scale_rewards=True,
        solve_threshold=None,
    )
    base.update(kw)
    return DQNFamilyConfig(**base)


def dqn_pixels_config(**kw) -> DQNFamilyConfig:
    """Pixel-observation DQN: conv trunk on CartPolePixels-v0 — the
    framework's image-obs pipeline (reference capability: make_env's
    AtariPreprocessing + PyTorchFrame path, utils/runner.py:57-66).

    Round-4 revision of the r3 guesses (plateau ~130, CURVES_r3.jsonl) —
    these defaults SOLVE CartPole from pixels (avg100 497.5 @ 1.79M
    env-steps, CURVES_r4.jsonl dqn_cartpole_pixels_stab2). The committed
    arm ladder that got there: anti-aliased rendering (envs/pixels.py,
    sub-pixel motion becomes visible) + uint8 frames (16k replay at the
    old 2k's HBM) + slower ε reached 383 peak; lr 1e-4 + target sync
    1000 damped the swings to 482 peak; rainbow's lr decay settles the
    late collapse-recover cycles and solves."""
    base = dict(
        env_name="CartPolePixels-v0", trunk="conv", hidden_dim=256,
        gamma=0.99, lr=1e-4, double=True, dueling=True, use_per=False,
        num_envs=32, batch_size=32, memory_capacity=16384, obs_uint8=True,
        epsilon_decay=40_000.0, lr_decay=True, max_train_steps=3_000_000,
        target_mode="hard_step", target_update_freq=1000,
        grad_clip_value=None, grad_clip_norm=10.0, updates_per_step=2,
    )
    base.update(kw)
    return DQNFamilyConfig(**base)


def rainbow_config(**kw) -> DQNFamilyConfig:
    """algorithms/rainbow_dqn_cartpole.py hyperparameters.

    Acceptance status (round 3, committed evidence): the reference's OWN
    script run to its full 500-episode budget finishes at avg100 228.5 —
    far from its in-code 495 bar (benchmarks/artifacts/refrainbow_run.log);
    this trainer at reference-exact 1:1 update ratio and 250k budget lands
    at 232.6 (ABLATION_rainbow_r3.json ratio_1to1_250k) — curve parity.
    The cap is the reference's γ=0.9 (alone among its CartPole scripts):
    the single deviation gamma=0.99 solves at 524k steps (avg100 495.6,
    cell gamma_99), while removing n-step/noisy/PER-shape deltas does not.
    Defaults stay reference-exact; pass gamma=0.99 to reproduce the solve.
    """
    base = dict(
        gamma=0.9, batch_size=256, memory_capacity=32768, double=True,
        dueling=True, noisy_trunk=False, noisy_heads=True, trunk_layers=2,
        hidden_dim=256, use_per=True, per_beta_increment=0.0,  # progress anneal
        per_eps=0.01, per_error_max=None, n_steps=5,
        target_mode="soft", tau=0.005, grad_clip_value=None, grad_clip_norm=10.0,
        lr_decay=True, max_train_steps=250_000,
    )
    base.update(kw)
    return DQNFamilyConfig(**base)
