"""Recurrent PPO (GRU) — the ppo_rnn_lunarlander / ppo_rnn_flappybird workloads.

Algorithm parity with reference algorithms/ppo_rnn_lunarlander.py:
  * network: PSCN(state→256) → MLPRNN(256→256, GRU hidden 64) → actor
    MLP[256,64,A] (softmax) + critic MLP[256,32,1] (:88-166); kaiming
    init; hidden reset per episode (:401, here: at dones inside the scan)
  * observation Normalization + RewardScaling (divide-only, reset per
    episode) applied during collection (:288-289,399,413-414)
  * transitions carry (s, a, r̃, done, terminated, logp, v, v′) with the
    successor value computed under the ADVANCED hidden state (:403-430) —
    reproduced exactly by a single batched one-step cell forward over the
    stored post-step hiddens
  * GAE with the dw/done distinction, per-update advantage
    standardization (:187-203)
  * dual-clip 3.0 policy loss, value MSE ·0.5, entropy 1e-2, grad-norm
    0.5, Adam(1e-3, eps 1e-5), 10 epochs (:316-357)

TPU-native re-design (SURVEY.md §7.3 item 3): the reference trains on 4
whole-episode buffers per update, resetting the hidden and re-unrolling
each episode (:322-327). Vectorized over B lockstep envs, the equivalent
is truncated-BPTT over fixed [T]-step segments per env with the TRUE
per-step hidden stored during collection (reset to zero at dones) used as
each segment's initial state — the mechanism the reference itself uses in
its hardest variant (ppo_lstm_lunarlander.py:679-708). Segments therefore
span episode boundaries exactly like the reference's seq-chunked variant;
whole-episode BPTT is recovered as seq_len → episode length. Documented
deviation: episode-level BPTT horizons are bounded by seq_len.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import (
    IterOut, Trainer, assert_flat_tp_ok, flat_opt_target, flat_params_repr,
    masked_mean, pack_fields, unpack_fields,
)
from gymrl_tpu.core.gae import compute_gae, standardize
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
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.utils.logging import get_logger

logger = get_logger()
from gymrl_tpu.nn.layers import MLP, PSCN
from gymrl_tpu.nn.recurrent import MLPRNNCell


@dataclass(frozen=True)
class PPORNNConfig:
    env_name: str = "LunarLander-v3"
    num_envs: int = 32
    rollout_steps: int = 128  # T per env per iteration
    seq_len: int = 16  # truncated-BPTT chunk length (divides rollout_steps)
    num_epochs: int = 10
    seq_minibatch: int = 64  # sequences per minibatch
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    dual_clip: float = 3.0
    entropy_coef: float = 1e-2
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    lr: float = 1e-3
    adam_eps: float = 1e-5
    feature_dim: int = 256
    normalize_obs: bool = True
    scale_rewards: bool = True
    # Whole-episode BPTT (exact reference semantics, ppo_rnn_lunarlander.py
    # :322-327, 446-447): the rollout is packed episode-major (every episode
    # segment in its own padded row, replay/episode.episode_buffer_pack) and
    # each episode re-unrolls from its TRUE initial hidden (zero for fresh
    # episodes) under a masked loss. False = truncated-BPTT(seq_len) chunks,
    # the cheaper scheme the reference itself uses in ppo_lstm (:679-708).
    whole_episode_bptt: bool = False
    episode_rows_per_env: int = 8  # max episodes packed per env column
    # Run the optimizer on ONE raveled parameter vector (same trick as
    # PPOConfig.flat_optimizer — the r4 flagship win): the recurrent family
    # is SGD-bound at solve configs (91 of 106 ms, PROFILE_r4.md), so the
    # per-leaf optimizer op overhead is the dominant cost here too.
    # Mathematically identical update (Adam is elementwise; global norm is
    # the same sum re-associated). Incompatible with model-axis TP.
    flat_optimizer: bool = False
    # lax.scan unroll for the hoisted cell recurrence in _seq_forward —
    # the remaining sequential chain after the r5 hoist is L tiny GRU
    # steps per minibatch; unrolling k bodies removes loop bookkeeping.
    # Identical math. Measured r5: see AB_UNROLL_r5.json (rnn section).
    cell_unroll: int = 1
    max_train_steps: int = 2_000_000
    solve_threshold: float = 200.0

    @property
    def seqs_per_rollout(self) -> int:
        assert self.rollout_steps % self.seq_len == 0
        return (self.rollout_steps // self.seq_len) * self.num_envs

    @property
    def n_train_items(self) -> int:
        """Sequences (chunk mode) or episode rows (whole-episode mode)."""
        if self.whole_episode_bptt:
            return self.num_envs * self.episode_rows_per_env
        return self.seqs_per_rollout

    @property
    def num_minibatches(self) -> int:
        n = self.n_train_items
        mb = min(self.seq_minibatch, n)
        assert n % mb == 0, f"{n} sequences must divide into minibatches of {mb}"
        return n // mb


class RecurrentActorCritic(nn.Module):
    """PSCN → MLPRNN cell → actor/critic heads (ppo_rnn_lunarlander.py:141-166).

    Called one step at a time — (h, obs) → (h', logits, value) — during
    collection/eval. For the training re-unroll the time-INdependent
    pieces are exposed as separate methods (`encode`, `cell`, `heads`) so
    `_seq_forward` can run the encoder and heads ONCE batched over all
    mb·L steps and keep only the GRU recurrence inside the sequential
    scan (r5 — the SGD phase was ~10k sequential cell+encoder+head
    evals per train_iter at solve configs, kernel-latency-bound).
    setup()-based with the same submodule names as the original compact
    version, so the param tree (and checkpoints) are unchanged.
    """

    n_actions: int
    feature_dim: int = 256

    def setup(self):
        self.fc_head = PSCN(self.feature_dim)
        self.rnn = MLPRNNCell(self.feature_dim)
        self.actor_fc = MLP([64, self.n_actions])
        self.critic_fc = MLP([32, 1])

    def __call__(self, h, obs):
        x = self.fc_head(obs)
        h, out = self.rnn(h, x)
        logits = self.actor_fc(out)
        value = self.critic_fc(out).squeeze(-1)
        return h, logits, value

    def encode(self, obs):
        """Time-independent feature trunk (any leading shape)."""
        return self.fc_head(obs)

    def cell(self, h, x):
        """One recurrence step on pre-encoded features."""
        return self.rnn(h, x)

    def heads(self, out):
        """Time-independent actor/critic heads (any leading shape)."""
        return self.actor_fc(out), self.critic_fc(out).squeeze(-1)

    @property
    def rnn_size(self) -> int:
        return self.feature_dim // 4


class RNNTrainState(NamedTuple):
    params: Any
    opt_state: Any
    vec_state: Any
    hidden: jax.Array  # [B, rnn_size]
    obs_rms: RunningMeanStd
    reward_scaler: RewardScaler
    key: jax.Array
    env_steps: jax.Array


class RNNRollout(NamedTuple):
    obs: jax.Array  # [T, B, obs] normalized
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    reward: jax.Array  # scaled
    next_obs: jax.Array  # [T, B, obs] normalized true successor
    h_pre: jax.Array  # [T, B, rnn] hidden BEFORE the step (segment init states)
    h_post: jax.Array  # [T, B, rnn] hidden AFTER forward (pre-reset)
    terminated: jax.Array
    done: jax.Array


class PPORNNTrainer(Trainer):
    """With ``mesh``: env-batch DP over 'data' — vec_state, the GRU hidden
    carry [B, rnn] and the per-env reward-scaler returns [B] shard on the
    batch axis; params/opt-state/obs-RMS replicate, so minibatch gradients
    psum over 'data' automatically (distributed.mesh.train_state_shardings).
    The sequence chunks stay per-env slices, so the BPTT re-unroll never
    crosses shard boundaries; only the epoch shuffle's global permutation
    reshards (rides ICI), exactly like flat PPO's."""

    def __init__(self, cfg: PPORNNConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = RecurrentActorCritic(self.venv.env.n_actions, cfg.feature_dim)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr, eps=cfg.adam_eps),
        )
        if cfg.flat_optimizer:
            assert_flat_tp_ok(mesh)
        self._eval_cache: dict = {}

    def init(self, key, _place: bool = True) -> RNNTrainState:
        cfg = self.cfg
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        h0 = jnp.zeros((1, self.net.rnn_size), jnp.float32)
        params = self.net.init(k_params, h0, jnp.zeros((1, obs_dim)))
        opt_target = flat_opt_target(params, self.cfg.flat_optimizer)
        ts = RNNTrainState(
            params=params,
            opt_state=self.tx.init(opt_target),
            vec_state=self.venv.reset(k_env),
            hidden=jnp.zeros((cfg.num_envs, self.net.rnn_size), jnp.float32),
            obs_rms=rms_init((obs_dim,)),
            reward_scaler=reward_scaler_init(cfg.num_envs, cfg.gamma),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def _norm(self, rms, obs):
        return normalize_obs(rms, obs) if self.cfg.normalize_obs else obs

    def _apply_cell(self, params, h, x):
        """(h, logits, value) — subclass hook (PPG's net adds an aux head)."""
        return self.net.apply(params, h, x)

    def policy(self, ts, obs, key, deterministic: bool = True):
        """MEMORYLESS single-shot view (h=0 every call) — a recurrent policy
        evaluated this way ignores its GRU memory. Use policy_step /
        eval_episodes for real recurrent behavior; this exists only for
        API uniformity with feedforward trainers."""
        if not getattr(self, "_warned_stateless_policy", False):
            logger.warning(
                f"{type(self).__name__}.policy() is memoryless (h=0 each "
                "call); use policy_step/eval_episodes for recurrent eval"
            )
            self._warned_stateless_policy = True
        nobs = self._norm(ts.obs_rms, obs)
        b = obs.shape[0]
        h = jnp.zeros((b, self.net.rnn_size), jnp.float32)
        _, logits, _ = self._apply_cell(ts.params, h, nobs)
        if deterministic:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def policy_reset(self, batch: int):
        """Fresh GRU hidden (ref utils/model.py:307-324 `begin_task`)."""
        return jnp.zeros((batch, self.net.rnn_size), jnp.float32)

    def policy_step(self, ts, carry, obs, key, deterministic: bool = True):
        """Carry-through recurrent policy (ref utils/runner.py:169-206
        threads rnn_h across the test loop)."""
        nobs = self._norm(ts.obs_rms, obs)
        h, logits, _ = self._apply_cell(ts.params, carry, nobs)
        if deterministic:
            return h, jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return h, jax.random.categorical(key, logits).astype(jnp.int32)

    def eval_episodes(self, ts, key, n_episodes: int):
        """Recurrent eval: carries the GRU hidden through each episode."""
        fn = self._eval_cache.get(n_episodes)
        if fn is None:
            fn = jax.jit(partial(self._eval_rollout, n_episodes))
            self._eval_cache[n_episodes] = fn
        return fn(ts, key)

    def _eval_rollout(self, n_episodes, ts, key):
        env, params = self.venv.env, self.venv.params
        k_reset, k_roll = jax.random.split(key)
        keys = jax.random.split(k_reset, n_episodes)
        state, obs = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
        h = jnp.zeros((n_episodes, self.net.rnn_size), jnp.float32)

        def body(carry, k):
            state, obs, h, done, ret, length = carry
            nobs = self._norm(ts.obs_rms, obs)
            h, logits, _ = self._apply_cell(ts.params, h, nobs)
            action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            step_keys = jax.random.split(k, n_episodes)
            sr = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(params, state, action, step_keys)
            alive = jnp.logical_not(done)
            ret = ret + sr.reward * alive
            length = length + alive.astype(jnp.int32)
            done = done | sr.terminated | sr.truncated
            return (sr.state, sr.obs, h, done, ret, length), None

        init = (state, obs, h, jnp.zeros((n_episodes,), bool),
                jnp.zeros((n_episodes,), jnp.float32), jnp.zeros((n_episodes,), jnp.int32))
        keys = jax.random.split(k_roll, env.max_steps)
        (_, _, _, _, returns, lengths), _ = jax.lax.scan(body, init, keys)
        return returns, lengths

    # -- collection -----------------------------------------------------------
    def _collect(self, ts: RNNTrainState):
        cfg = self.cfg

        def env_step(carry, _):
            vec_state, hidden, obs_rms, scaler, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            nobs = self._norm(obs_rms, vec_state.obs)
            h_pre = hidden
            hidden, logits, value = self._apply_cell(ts.params, hidden, nobs)
            action = jax.random.categorical(k_act, logits).astype(jnp.int32)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[:, None], axis=-1
            ).squeeze(-1)

            vec_state, tr = self.venv.step(vec_state, action, k_step)
            if cfg.normalize_obs:
                obs_rms = rms_update_batch(obs_rms, tr.next_obs)
            reward = tr.reward
            if cfg.scale_rewards:
                scaler, reward = reward_scaler_step(scaler, tr.reward)
                scaler = reward_scaler_reset(scaler, tr.done)

            h_post = hidden
            # per-episode hidden reset (ref :401): zero at done
            hidden = jnp.where(tr.done[:, None], 0.0, hidden)

            roll = RNNRollout(
                obs=nobs, action=action, logp=logp, value=value, reward=reward,
                next_obs=self._norm(obs_rms, tr.next_obs),
                h_pre=h_pre, h_post=h_post,
                terminated=tr.terminated.astype(jnp.float32),
                done=tr.done.astype(jnp.float32),
            )
            stats = (tr.final_return, tr.final_length, tr.done)
            return (vec_state, hidden, obs_rms, scaler, key), (roll, stats)

        carry = (ts.vec_state, ts.hidden, ts.obs_rms, ts.reward_scaler, ts.key)
        (vec_state, hidden, obs_rms, scaler, key), (roll, stats) = jax.lax.scan(
            env_step, carry, None, length=cfg.rollout_steps
        )
        return vec_state, hidden, obs_rms, scaler, key, roll, stats

    # -- loss over a sequence minibatch ---------------------------------------
    def _seq_forward(self, params, h0, obs_seq):
        """Unroll over a [mb, L, obs] chunk from stored init hidden.

        TPU shape (r5): encoder and heads are time-independent, so they
        run ONCE as wide batched matmuls over all mb·L steps; only the
        GRU cell recurrence stays inside the sequential scan. Identical
        math to the per-step unroll (same weights, re-batched), ~2× on
        the SGD phase at solve configs (PROFILE_r5.md §5).
        """
        mb, L = obs_seq.shape[:2]
        feats = self.net.apply(params, obs_seq.reshape(mb * L, -1), method="encode")
        feats = jnp.swapaxes(feats.reshape(mb, L, -1), 0, 1)  # [L, mb, F]

        def step(h, x):
            h, out = self.net.apply(params, h, x, method="cell")
            return h, out

        _, outs = jax.lax.scan(
            step, h0, feats, unroll=self.cfg.cell_unroll
        )  # [L, mb, F]
        logits, values = self.net.apply(
            params, jnp.swapaxes(outs, 0, 1), method="heads"
        )
        return logits, values

    def _loss(self, params, mb):
        cfg = self.cfg
        mask = mb["mask"]
        logits, values = self._seq_forward(params, mb["h0"], mb["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, mb["action"][..., None], axis=-1).squeeze(-1)
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

        ratio = jnp.exp(logp - mb["logp"])
        adv = mb["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv
        min_surr = jnp.minimum(surr1, surr2)
        policy_obj = jnp.where(adv < 0.0, jnp.maximum(min_surr, cfg.dual_clip * adv), min_surr)
        policy_loss = -masked_mean(policy_obj, mask)
        value_loss = masked_mean(jnp.square(values - mb["v_target"]), mask)
        entropy_mean = masked_mean(entropy, mask)
        loss = policy_loss + cfg.value_coef * value_loss - cfg.entropy_coef * entropy_mean
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy_mean,
            "approx_kl": masked_mean(mb["logp"] - logp, mask),
        }

    # -- minibatch construction (shared with the PPG subclass) -----------------
    def _training_data(self, roll: "RNNRollout", adv, v_target):
        """Build the per-item training tensors + ``mask`` and item count.

        Chunk mode: fixed [L]-step slices of the flat rollout with stored
        initial hiddens (ppo_lstm_lunarlander.py:679-708 mechanism) — mask
        all-ones. Whole-episode mode: episode-major padded rows via
        ``episode_buffer_pack``; each row's h0 is the TRUE hidden at its
        episode's first step (zero except for the mid-episode continuation
        row at each column start), and ``mask`` is the row's active steps —
        the reference's whole-episode re-unroll (:322-327) with exact
        per-episode gradient extents.
        """
        cfg = self.cfg
        if cfg.whole_episode_bptt:
            from gymrl_tpu.replay.episode import episode_buffer_pack

            packed = episode_buffer_pack(
                {
                    "obs": roll.obs,
                    "action": roll.action,
                    "logp": roll.logp,
                    "adv": adv,
                    "v_target": v_target,
                    "h_pre": roll.h_pre,
                },
                roll.done,
                cfg.episode_rows_per_env,
            )
            data = dict(packed.data)
            data["h0"] = data.pop("h_pre")[:, 0]
            data["mask"] = packed.active.astype(jnp.float32)
            # overflow beyond rows_per_env is counted, never silent — surfaced
            # as a train metric so a mis-sized R shows up in the logs
            extra = {
                "dropped_steps": packed.dropped_steps.astype(jnp.float32),
                "dropped_episodes": packed.dropped_episodes.astype(jnp.float32),
            }
            return data, cfg.n_train_items, extra

        L = cfg.seq_len
        n_chunks = cfg.rollout_steps // L

        def to_seq(x):
            # [T, B, ...] -> [n_chunks, L, B, ...] -> [n_chunks·B, L, ...]
            x = x.reshape((n_chunks, L) + x.shape[1:])
            x = jnp.moveaxis(x, 2, 1)  # [n_chunks, B, L, ...]
            return x.reshape((n_chunks * cfg.num_envs, L) + x.shape[3:])

        data = {
            "obs": to_seq(roll.obs),
            "action": to_seq(roll.action),
            "logp": to_seq(roll.logp),
            "adv": to_seq(adv),
            "v_target": to_seq(v_target),
            "h0": to_seq(roll.h_pre)[:, 0],  # hidden at each chunk start
        }
        data["mask"] = jnp.ones_like(data["logp"])
        return data, cfg.n_train_items, {}

    # -- fused train iteration ------------------------------------------------
    def _train_iter(self, ts: RNNTrainState) -> tuple[RNNTrainState, IterOut]:
        cfg = self.cfg
        vec_state, hidden, obs_rms, scaler, key, roll, (ep_ret, ep_len, ep_done) = (
            self._collect(ts)
        )

        # Successor values under the ADVANCED hidden (ref :403-430): one
        # batched one-step forward over all [T·B] stored (h_post, next_obs).
        flat_h = roll.h_post.reshape(-1, roll.h_post.shape[-1])
        flat_next = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
        _, _, next_values = self._apply_cell(ts.params, flat_h, flat_next)
        next_values = next_values.reshape(roll.value.shape)

        adv, v_target = compute_gae(
            roll.reward, roll.value, next_values, roll.terminated, roll.done,
            cfg.gamma, cfg.gae_lambda,
        )
        adv = standardize(adv)

        data, n_seqs, pack_metrics = self._training_data(roll, adv, v_target)
        mb_size = n_seqs // cfg.num_minibatches
        # One packed [n, F] matrix instead of ~7 narrow sequence leaves: the
        # epoch shuffle becomes a single wide gather (same pathology + fix
        # as flat PPO's — PROFILE_r3.md "epoch-shuffle pack"). Identical
        # sample groups/order; ints roundtrip exactly through f32.
        packed, spec = pack_fields(data)

        # Optimizer representation: flat master vector (one fused Adam) or
        # the param pytree — see PPORNNConfig.flat_optimizer.
        params0, unravel = flat_params_repr(ts.params, cfg.flat_optimizer)
        loss_fn = (
            (lambda p, mb: self._loss(unravel(p), mb))
            if cfg.flat_optimizer else self._loss
        )

        def epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, n_seqs)
            mb_rows = packed[perm].reshape(cfg.num_minibatches, mb_size, -1)

            def minibatch(carry, rows):
                params, opt_state = carry
                mb = unpack_fields(rows, spec)
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), mb_rows
            )
            return (params, opt_state), metrics

        key, k_epochs = jax.random.split(key)
        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params0, ts.opt_state), jax.random.split(k_epochs, cfg.num_epochs)
        )
        params = unravel(params)

        new_ts = RNNTrainState(
            params=params, opt_state=opt_state, vec_state=vec_state, hidden=hidden,
            obs_rms=obs_rms, reward_scaler=scaler, key=key,
            env_steps=ts.env_steps + cfg.num_envs * cfg.rollout_steps,
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics=jax.tree_util.tree_map(jnp.mean, metrics) | pack_metrics,
        )
        return new_ts, out


def ppo_rnn_lunarlander_config(**kw) -> PPORNNConfig:
    """Whole-episode BPTT by default — the reference's actual training
    scheme (ppo_rnn_lunarlander.py:322-327), and empirically ~16× more
    sample-efficient here than truncated chunks (SOLVE_r2.jsonl: solved at
    180k env-steps vs 2.9M chunked). flat_optimizer since r5: +8.8% at
    this config, solve-validated 3/3 (160k/418k/143k,
    SOLVE_r5.jsonl; equivalence test in
    tests/test_ppo_rnn.py)."""
    base = dict(env_name="LunarLander-v3", whole_episode_bptt=True,
                episode_rows_per_env=8, seq_minibatch=64,
                flat_optimizer=True)
    base.update(kw)
    return PPORNNConfig(**base)


def ppo_rnn_flappybird_config(**kw) -> PPORNNConfig:
    """ppo_rnn_flappybird.py: identical loop at width 512 (:172-202).

    Round-4 parity fixes vs the r3 config (peak avg100 43.5,
    CURVES_r3.jsonl): γ=0.995 (ref :56 — rounds 1-3 inherited the
    LunarLander 0.99) and whole-episode BPTT (the reference trains on 4
    whole-episode buffers, :52 batch_size=4 'parallel episodes', same as
    its LunarLander variant) instead of truncated chunks."""
    base = dict(env_name="FlappyBird-v0", feature_dim=512, solve_threshold=None,
                gamma=0.995, whole_episode_bptt=True, episode_rows_per_env=8,
                seq_minibatch=64, flat_optimizer=True)
    base.update(kw)
    return PPORNNConfig(**base)
