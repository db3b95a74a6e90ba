"""PPO on vectorized envs — the flagship trainer (north-star workload).

Algorithm parity with reference algorithms/ppo_lunarlander.py:
  * shared 2x256 tanh trunk, tanh actor/critic heads, orthogonal init
    gain √2 (policy head 0.01, value head 1.0) (:63-118)
  * rollout horizon 2048 transitions, 10 epochs, shuffled minibatches of
    64, Adam(3e-4, eps=1e-5), linear lr anneal with env steps (:29-56,337-341)
  * GAE(γ=0.99, λ=0.95) with rollout-wide advantage standardization (:179-196,236)
  * clipped surrogate + dual-clip 3.0:
    adv<0 ? max(min(surr1,surr2), 3·adv) : min(surr1,surr2) (:278-292)
  * value MSE ·0.5, entropy bonus 0.01, grad-norm clip 0.5 (:294-307)
  * metrics: policy/value loss, entropy, clip_frac, approx_kl (:313-321)

TPU-native re-design (SURVEY.md §3.2): rollout collection, bootstrap value,
GAE, and the full epoch×minibatch SGD sweep are ONE jitted program:
  * rollout = `lax.scan` of (forward → sample → vmapped env step) over T
    steps of B lockstep envs; next-state values for GAE come from one
    batched [T·B] forward afterwards (an MXU-friendly matmul) instead of a
    second per-step forward, and truncated episodes therefore bootstrap
    correctly (terminated ones are cut by the dw mask).
  * epochs/minibatches = nested `lax.scan`s over a fresh permutation per
    epoch; minibatch size is preserved in *samples* so the update count
    per rollout matches the reference (T·B/64 minibatches × 10 epochs).
  * With a mesh, the env-batch axis is sharded on 'data': XLA partitions
    the rollout and inserts gradient psums automatically (minibatch
    shuffling is global — resharding rides ICI).
"""

from __future__ import annotations

from dataclasses import dataclass

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import (
    IterOut, Trainer, assert_flat_tp_ok, flat_opt_target, flat_params_repr,
)
from gymrl_tpu.core.gae import compute_gae, standardize
from gymrl_tpu.core.normalization import (
    RunningMeanStd,
    normalize_obs,
    rms_init,
    rms_update_batch,
)
from gymrl_tpu.distributed.mesh import batch_sharding, replicated
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.nn import initializers as gl_init
from gymrl_tpu.nn.layers import Dense


@dataclass(frozen=True)
class PPOConfig:
    env_name: str = "LunarLander-v3"
    num_envs: int = 32
    rollout_steps: int = 64  # T; total horizon = T·num_envs (ref: 2048 total)
    num_epochs: int = 10
    minibatch_size: int = 64  # in samples (ref batch_size)
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    dual_clip: float = 3.0
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    lr: float = 3e-4
    adam_eps: float = 1e-5
    anneal_lr: bool = True
    hidden_dim: int = 256
    normalize_obs: bool = False  # plain PPO matches ref (no state_norm)
    max_train_steps: int = 1_000_000
    solve_threshold: float = 200.0
    # (History: a fused Pallas actor-critic forward lived on this path
    # through round 3 and was removed after losing its A/B — 1.281M vs
    # 1.362M steps/s at bench scale on TPU v5e, PALLAS_AB_r3.json. At
    # these layer widths XLA's own fusion of the scan-step forward is
    # already HBM-optimal and the per-step pallas_call only added
    # dispatch/tiling overhead; a hand kernel needs a fatter op to win.)
    # bf16 matmuls on the (no-grad) rollout forward: params+obs cast to
    # bfloat16, logits/values upcast to f32 before sampling/GAE. Doubles
    # MXU rate and halves weight HBM traffic on the acting path; the SGD
    # update stays fully fp32 so training numerics are unchanged except the
    # stored behavior-logp, which differs from the fp32 recompute by bf16
    # rounding (~1e-2 relative on logits — inside PPO's clip band).
    # Off by default: opt-in for throughput runs (bench A/B).
    rollout_bf16: bool = False
    # bf16 compute in the SGD loss forward/backward: master params and
    # optimizer state stay fp32 (the cast is inside the loss, so autodiff
    # returns fp32 grads computed through bf16 matmuls — the standard
    # mixed-precision recipe). ~2x MXU rate on the epoch phase, which was
    # 87% of the iteration right after the rollout gather fix and ~70%
    # (65 ms of ~93 ms) after the epoch-shuffle pack landed (PROFILE_r3.md
    # — both snapshots are recorded there).
    # Opt-in: changes training numerics by bf16 rounding; learning-curve
    # validation recorded in SOLVE_r3.jsonl (ppo_lunarlander_sgd_bf16).
    sgd_bf16: bool = False
    # Reference SGD cadence (algorithms/ppo_lunarlander.py:261-272) is
    # 10 epochs × minibatch 64. bench.py deliberately deviates (4 × 16384)
    # and says so; solve configs keep the reference cadence.
    # Run the optimizer on ONE raveled parameter vector instead of the
    # param pytree: clip_by_global_norm + Adam become a handful of fused
    # wide elementwise kernels instead of ~6 ops × ~12 leaves per grad
    # step — the r4 attack on the "128 sequential ~0.5 ms grad steps"
    # floor (PROFILE_r3.md). Mathematically identical update (Adam is
    # elementwise; the global norm is the same sum re-associated), not
    # bit-identical (reduction order). Unsupported with model-axis TP
    # (the flat master vector cannot carry the per-leaf TP layout).
    flat_optimizer: bool = False
    # lax.scan unroll factor for the minibatch SGD loop. The bench-scale
    # SGD phase is 128 sequential latency-bound grad steps; unrolling k
    # bodies per scan iteration removes loop bookkeeping and gives XLA a
    # longer straight-line program to schedule. Must divide
    # num_minibatches. Measured r5: see AB_UNROLL_r5.json.
    sgd_unroll: int = 1
    # lax.scan unroll for the T-step collection loop (forward → sample →
    # env step). Identical math. Measured r5: AB_UNROLL_r5.json.
    rollout_unroll: int = 1

    @property
    def batch_total(self) -> int:
        return self.num_envs * self.rollout_steps

    @property
    def num_minibatches(self) -> int:
        assert self.batch_total % self.minibatch_size == 0, (
            f"T·B={self.batch_total} must divide by minibatch {self.minibatch_size}"
        )
        return self.batch_total // self.minibatch_size


class ActorCritic(nn.Module):
    """Shared tanh trunk + tanh actor/critic heads (ref ppo_lunarlander.py:63-118)."""

    n_actions: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        trunk = x
        for i in range(2):
            trunk = Dense(self.hidden_dim, kernel_init=gl_init.orthogonal(), name=f"shared_{i}")(trunk)
            trunk = jnp.tanh(trunk)
        a = Dense(self.hidden_dim, kernel_init=gl_init.orthogonal(), name="actor_0")(trunk)
        a = jnp.tanh(a)
        logits = Dense(self.n_actions, kernel_init=gl_init.orthogonal(0.01), name="actor_head")(a)
        c = Dense(self.hidden_dim, kernel_init=gl_init.orthogonal(), name="critic_0")(trunk)
        c = jnp.tanh(c)
        value = Dense(1, kernel_init=gl_init.orthogonal(1.0), name="critic_head")(c)
        return logits, value.squeeze(-1)


class PPOTrainState(NamedTuple):
    params: Any
    opt_state: Any
    vec_state: Any
    obs_rms: RunningMeanStd
    key: jax.Array
    env_steps: jax.Array


class MinibatchData(NamedTuple):
    """The three per-sample fields the PPO loss reads (unpacked from the
    packed shuffle row — see _train_iter)."""

    obs: jax.Array
    action: jax.Array
    logp: jax.Array


class Rollout(NamedTuple):
    obs: jax.Array  # f32[T, B, obs] — normalized if cfg.normalize_obs
    action: jax.Array  # i32[T, B]
    logp: jax.Array  # f32[T, B]
    value: jax.Array  # f32[T, B]
    reward: jax.Array  # f32[T, B]
    next_obs: jax.Array  # f32[T, B, obs] — true successor (terminal at done)
    terminated: jax.Array  # f32[T, B]
    done: jax.Array  # f32[T, B]


def categorical_logp_entropy(logits, action):
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, action[..., None], axis=-1).squeeze(-1)
    entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
    return logp, entropy


class PPOTrainer(Trainer):
    def __init__(self, cfg: PPOConfig, mesh=None):
        super().__init__(cfg)
        self.mesh = mesh
        # Guard here as well as in init(): a trainer fed an externally
        # built/restored TrainState never calls init(), but always __init__.
        if cfg.flat_optimizer:
            assert_flat_tp_ok(mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = ActorCritic(self.venv.env.n_actions, cfg.hidden_dim)
        # inject_hyperparams exposes lr for in-jit annealing (ref :337-341)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=cfg.lr, eps=cfg.adam_eps
            ),
        )
        # train_iter jitting (shardings + donation) is inherited from
        # base.Trainer; _in_shardings below supplies the DP×TP layout.

    # -- sharding layout ------------------------------------------------------
    def _param_sharding(self, path, leaf):
        """Megatron-style TP over the trunk when the mesh has a model axis:
        shared_0 kernel column-split [in, H/tp], shared_1 row-split
        [H/tp, H] — XLA inserts the all-reduce after the row-parallel
        matmul. Heads and everything else replicate over 'model'.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.mesh.shape.get("model", 1) > 1 and leaf.ndim == 2:
            name = "/".join(str(p) for p in path)
            if "shared_0" in name and "kernel" in name:
                return NamedSharding(self.mesh, P(None, "model"))
            if "shared_1" in name and "kernel" in name:
                return NamedSharding(self.mesh, P("model", None))
        return replicated(self.mesh)

    def _state_shardings(self):
        """env batch axis on 'data'; trunk weights on 'model' (TP); rest
        replicated. Gradients reduce over 'data' automatically; the TP
        trunk's activations all-reduce over 'model'."""
        example = self.init(jax.random.PRNGKey(0), _place=False)
        return self._shardings_for(example)

    # -- API ------------------------------------------------------------------
    def init(self, key, _place: bool = True) -> PPOTrainState:
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        params = self.net.init(k_params, jnp.zeros((1, obs_dim)))
        if self.cfg.flat_optimizer:
            assert_flat_tp_ok(self.mesh)
        opt_target = flat_opt_target(params, self.cfg.flat_optimizer)
        ts = PPOTrainState(
            params=params,
            opt_state=self.tx.init(opt_target),
            vec_state=self.venv.reset(k_env),
            obs_rms=rms_init((obs_dim,)),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            sh = self._shardings_for(ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def _shardings_for(self, ts: "PPOTrainState"):
        """Sharding pytree matching ``ts``'s structure exactly."""
        rep = replicated(self.mesh)
        bsh = batch_sharding(self.mesh, 0)
        return PPOTrainState(
            params=jax.tree_util.tree_map_with_path(self._param_sharding, ts.params),
            opt_state=jax.tree_util.tree_map_with_path(
                self._opt_sharding, ts.opt_state
            ),
            vec_state=jax.tree_util.tree_map(
                lambda x: bsh if jnp.ndim(x) >= 1 else rep, ts.vec_state
            ),
            obs_rms=jax.tree_util.tree_map(lambda _: rep, ts.obs_rms),
            key=rep,
            env_steps=rep,
        )

    def _opt_sharding(self, path, leaf):
        """Adam moments mirror their parameter's layout (same trailing path)."""
        return self._param_sharding(path, leaf)

    def policy(self, ts: PPOTrainState, obs, key, deterministic: bool = True):
        obs = self._norm(ts.obs_rms, obs)
        logits, _ = self.net.apply(ts.params, obs)
        if deterministic:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def _in_shardings(self):
        return self._state_shardings() if self.mesh is not None else None

    # -- internals ------------------------------------------------------------
    def _norm(self, rms, obs):
        return normalize_obs(rms, obs) if self.cfg.normalize_obs else obs

    def _rollout_forward(self, params, obs):
        """Policy forward on the (no-grad) rollout path."""
        if self.cfg.rollout_bf16:
            bf16 = jnp.bfloat16
            params = jax.tree_util.tree_map(lambda p: p.astype(bf16), params)
            logits, value = self.net.apply(params, obs.astype(bf16))
            return logits.astype(jnp.float32), value.astype(jnp.float32)
        return self.net.apply(params, obs)

    def _collect(self, ts: PPOTrainState):
        cfg = self.cfg

        def env_step(carry, _):
            vec_state, obs_rms, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            nobs = self._norm(obs_rms, vec_state.obs)
            logits, value = self._rollout_forward(ts.params, nobs)
            action = jax.random.categorical(k_act, logits).astype(jnp.int32)
            logp, _ = categorical_logp_entropy(logits, action)
            vec_state, tr = self.venv.step(vec_state, action, k_step)
            if cfg.normalize_obs:
                obs_rms = rms_update_batch(obs_rms, tr.next_obs)
            roll = Rollout(
                obs=nobs,
                action=action,
                logp=logp,
                value=value,
                reward=tr.reward,
                next_obs=tr.next_obs,
                terminated=tr.terminated.astype(jnp.float32),
                done=tr.done.astype(jnp.float32),
            )
            stats = (tr.final_return, tr.final_length, tr.done)
            return (vec_state, obs_rms, key), (roll, stats)

        (vec_state, obs_rms, key), (roll, stats) = jax.lax.scan(
            env_step, (ts.vec_state, ts.obs_rms, ts.key), None,
            length=cfg.rollout_steps, unroll=cfg.rollout_unroll,
        )
        return vec_state, obs_rms, key, roll, stats

    def _loss(self, params, batch, adv, returns):
        cfg = self.cfg
        if cfg.sgd_bf16:
            bf16 = jnp.bfloat16
            cparams = jax.tree_util.tree_map(lambda p: p.astype(bf16), params)
            logits, values = self.net.apply(cparams, batch.obs.astype(bf16))
            logits = logits.astype(jnp.float32)
            values = values.astype(jnp.float32)
        else:
            logits, values = self.net.apply(params, batch.obs)
        logp, entropy = categorical_logp_entropy(logits, batch.action)
        ratio = jnp.exp(logp - batch.logp)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * adv
        min_surr = jnp.minimum(surr1, surr2)
        # dual-clip (ref :285-292)
        policy_obj = jnp.where(
            adv < 0.0, jnp.maximum(min_surr, cfg.dual_clip * adv), min_surr
        )
        policy_loss = -jnp.mean(policy_obj)
        value_loss = cfg.value_coef * jnp.mean(jnp.square(values - returns))
        entropy_mean = jnp.mean(entropy)
        loss = policy_loss + value_loss - cfg.entropy_coef * entropy_mean
        clip_frac = jnp.mean(
            ((ratio < 1.0 - cfg.clip_eps) | (ratio > 1.0 + cfg.clip_eps)).astype(jnp.float32)
        )
        approx_kl = jnp.mean(batch.logp - logp)
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy_mean,
            "clip_frac": clip_frac,
            "approx_kl": approx_kl,
        }

    def _train_iter(self, ts: PPOTrainState) -> tuple[PPOTrainState, IterOut]:
        cfg = self.cfg
        vec_state, obs_rms, key, roll, (ep_ret, ep_len, ep_done) = self._collect(ts)

        # Values of true successors in ONE batched forward (bootstrap for
        # truncation; terminated steps are masked by (1-dw) inside GAE).
        next_nobs = self._norm(obs_rms, roll.next_obs)
        _, next_values = self._rollout_forward(
            ts.params, next_nobs.reshape(-1, next_nobs.shape[-1])
        )
        next_values = next_values.reshape(roll.value.shape)

        adv, v_target = compute_gae(
            roll.reward, roll.value, next_values, roll.terminated, roll.done,
            cfg.gamma, cfg.gae_lambda,
        )
        adv = standardize(adv)  # rollout-wide (ref :236)

        # Flatten [T, B] → [N] and run epochs of shuffled minibatches.
        # The SGD phase touches only (obs, action, logp, adv, v_target), so
        # pack exactly those into ONE [N, obs+4] array and shuffle that:
        # shuffling the full Rollout pytree leaf-by-leaf cost 137 ms/iter at
        # bench scale vs 65 ms packed — random-row gathers over many narrow
        # leaves are the worst HBM pattern on TPU (PROFILE_r3.md). The
        # permutation, minibatch grouping, and loss inputs are unchanged
        # (action roundtrips exactly through f32). Requires flat vector
        # observations — [T, B, obs_dim] — which every PPOTrainer workload
        # has (LunarLander/CartPole); image-obs variants would need the
        # pytree shuffle back.
        assert roll.obs.ndim == 3, (
            "packed epoch shuffle requires flat vector obs [T, B, obs_dim]; "
            f"got rank {roll.obs.ndim}"
        )
        obs_dim = roll.obs.shape[-1]
        n = cfg.batch_total
        packed = jnp.concatenate(
            [
                roll.obs.reshape(n, obs_dim),
                roll.action.reshape(n).astype(jnp.float32)[:, None],
                roll.logp.reshape(n)[:, None],
                adv.reshape(n)[:, None],
                v_target.reshape(n)[:, None],
            ],
            axis=1,
        )

        # lr anneal (ref :337-341): set the injected hyperparam for this iter.
        frac = 1.0 - ts.env_steps.astype(jnp.float32) / cfg.max_train_steps
        lr = jnp.where(cfg.anneal_lr, cfg.lr * jnp.maximum(frac, 0.0), cfg.lr)
        opt_state = ts.opt_state
        opt_state[1].hyperparams["learning_rate"] = lr  # inject_hyperparams slot

        # Optimizer representation: flat master vector (one fused Adam) or
        # the param pytree — see PPOConfig.flat_optimizer.
        params0, unravel = flat_params_repr(ts.params, cfg.flat_optimizer)
        loss_fn = (
            (lambda p, *a: self._loss(unravel(p), *a))
            if cfg.flat_optimizer else self._loss
        )

        def epoch(carry, k_epoch):
            params, opt_state = carry
            # One shuffle gather per epoch, then contiguous minibatch slices
            # via scan-over-leading-axis — identical sample groups/order to
            # per-minibatch index gathers, but HBM reads stay sequential
            # instead of 524k-row random gathers per minibatch.
            perm = jax.random.permutation(k_epoch, cfg.batch_total)
            mb_xs = packed[perm].reshape(
                (cfg.num_minibatches, cfg.minibatch_size, obs_dim + 4)
            )

            def minibatch(carry, mb):
                params, opt_state = carry
                batch = MinibatchData(
                    obs=mb[:, :obs_dim],
                    action=mb[:, obs_dim].astype(jnp.int32),
                    logp=mb[:, obs_dim + 1],
                )
                adv_mb, ret_mb = mb[:, obs_dim + 2], mb[:, obs_dim + 3]
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, batch, adv_mb, ret_mb
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), mb_xs, unroll=cfg.sgd_unroll
            )
            return (params, opt_state), metrics

        key, k_epochs = jax.random.split(key)
        epoch_keys = jax.random.split(k_epochs, cfg.num_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params0, opt_state), epoch_keys
        )
        params = unravel(params)

        new_ts = PPOTrainState(
            params=params,
            opt_state=opt_state,
            vec_state=vec_state,
            obs_rms=obs_rms,
            key=key,
            env_steps=ts.env_steps + cfg.batch_total,
        )
        out = IterOut(
            ep_return=ep_ret,
            ep_length=ep_len,
            ep_done=ep_done,
            metrics={k: jnp.mean(v) for k, v in metrics.items()} | {"lr": lr},
        )
        return new_ts, out
