"""Full-tricks PPO — the ppo_full_lunarlander workload (README trick list).

Algorithm parity with reference algorithms/ppo_full_lunarlander.py:
  * mHC backbone (dim 128, rate 2, 2 layers, 10 SK iters, :26-31) or PSCN
    fallback (:378-386); SiLU MLP heads with RMSNorm between layers and
    custom head gains (actor 0.001, critic 1.0, :385-389)
  * rollout 4096, 4 epochs, minibatch 1024, γ=0.995 (:34-37)
  * decoupled-λ GAE (λ_actor / λ_critic accumulators, :507-535); note this
    variant cuts BOTH bootstrap and trace on `done` (:518-531)
  * clip-higher: asymmetric bounds [1−0.2, 1+0.28] (:40-41, 603-607)
  * dual-clip variant (b): surr1 uses ratio clamped to [0, 3] (:600-601)
  * ERC: entropy-ratio mask vs. rollout-time old entropies, β=0.06; the
    mask multiplies policy/value/entropy losses via plain means (:585-633)
  * clip-cov: covariance-based sample dropping, DISABLED by default
    (clip_cov_ratio=0.0, :42, 608-616) but implemented for parity
  * value loss 0.5·corr·(v−ret)² (:627-629); no value clipping here
  * lr AND entropy-coef linear annealing per update (:659-666)
  * Adam eps default (the script uses optim.Adam(lr) — torch default eps)

TPU-native structure matches algos/ppo.py: one jitted program per
iteration (rollout scan → batched successor values → dual-λ GAE → epoch ×
minibatch scans), with old entropies recorded during collection.
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
    pack_fields, unpack_fields,
)
from gymrl_tpu.core.gae import compute_gae_dual_lambda, standardize
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.nn import initializers as gl_init
from gymrl_tpu.nn.layers import Dense, RMSNorm
from gymrl_tpu.nn.mhc import MHCBackbone


@dataclass(frozen=True)
class PPOFullConfig:
    env_name: str = "LunarLander-v3"
    num_envs: int = 64
    rollout_steps: int = 64  # T·B = 4096 (reference update_freq)
    num_epochs: int = 4
    minibatch_size: int = 1024
    gamma: float = 0.995
    lam_actor: float = 0.95
    lam_critic: float = 0.95
    clip_eps_min: float = 0.2
    clip_eps_max: float = 0.28  # clip-higher
    dual_clip: float = 3.0
    clip_cov_ratio: float = 0.0  # disabled by default (ref :42)
    clip_cov_min: float = 1.0
    clip_cov_max: float = 5.0
    entropy_coef: float = 0.01
    erc_beta_low: float = 0.06
    erc_beta_high: float = 0.06
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    anneal: bool = True
    # backbone
    use_mhc: bool = True
    mhc_dim: int = 128
    mhc_rate: int = 2
    mhc_layers: int = 2
    mhc_sk_it: int = 10
    # Flat raveled-vector optimizer (see PPOConfig.flat_optimizer);
    # incompatible with model-axis TP
    flat_optimizer: bool = False
    max_train_steps: int = 5_000_000
    solve_threshold: float = 200.0

    @property
    def batch_total(self) -> int:
        return self.num_envs * self.rollout_steps

    @property
    def num_minibatches(self) -> int:
        mb = min(self.minibatch_size, self.batch_total)
        assert self.batch_total % mb == 0
        return self.batch_total // mb


def cov_drop_mask(key, covs, ratio, cov_min, cov_max):
    """clip-cov keep mask: drop EXACTLY max(int(n_in_band·ratio), 1) samples
    (capped at n_in_band) chosen uniformly among those whose covariance lies
    in (cov_min, cov_max) — the reference picks them via randperm over the
    in-band indices (ppo_full_lunarlander.py:608-616). Fixed-shape JAX
    version: random scores (∞ off-band) → argsort ranks the in-band samples
    in uniform random order → zero the first num_drop ranks."""
    n = covs.shape[0]
    in_band = (covs > cov_min) & (covs < cov_max)
    n_in = jnp.sum(in_band.astype(jnp.int32))
    num_drop = jnp.minimum(
        jnp.maximum((n_in.astype(jnp.float32) * ratio).astype(jnp.int32), 1), n_in
    )
    scores = jnp.where(in_band, jax.random.uniform(key, covs.shape), jnp.inf)
    order = jnp.argsort(scores)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    return jnp.where(rank < num_drop, 0.0, 1.0)


class SiluRMSMLP(nn.Module):
    """ppo_full's MLP: Linear → SiLU → RMSNorm between layers, custom head
    gain on the last layer (ref :287-318)."""

    dims: tuple
    last_std: float | None = None

    @nn.compact
    def __call__(self, x):
        n = len(self.dims)
        for i, feat in enumerate(self.dims):
            is_last = i == n - 1
            gain = self.last_std if (is_last and self.last_std) else float(np.sqrt(2.0))
            x = Dense(feat, kernel_init=gl_init.orthogonal(gain), name=f"fc{i}")(x)
            if not is_last:
                x = nn.silu(x)
                x = RMSNorm(eps=1e-6, name=f"norm{i}")(x)
        return x


class FullActorCritic(nn.Module):
    n_actions: int
    use_mhc: bool = True
    mhc_dim: int = 128
    mhc_rate: int = 2
    mhc_layers: int = 2
    mhc_sk_it: int = 10

    @nn.compact
    def __call__(self, x):
        if self.use_mhc:
            feat = MHCBackbone(
                self.mhc_dim, self.mhc_rate, self.mhc_layers, self.mhc_sk_it,
                name="shared",
            )(x)
        else:
            from gymrl_tpu.nn.layers import PSCN

            feat = PSCN(256, depth=4, name="shared")(x)
        logits = SiluRMSMLP((256, self.n_actions), last_std=0.001, name="actor")(feat)
        value = SiluRMSMLP((256, 1), last_std=1.0, name="critic")(feat).squeeze(-1)
        return logits, value


class FullTrainState(NamedTuple):
    params: Any
    opt_state: Any
    vec_state: Any
    key: jax.Array
    env_steps: jax.Array


class FullRollout(NamedTuple):
    obs: jax.Array
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    entropy: jax.Array  # old entropies for ERC (ref :488)
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array  # this variant cuts bootstrap AND trace on done (:518)


class PPOFullTrainer(Trainer):
    """With ``mesh``: env-batch DP over 'data' (vec_state sharded, params —
    incl. the mHC backbone — replicated) via the inherited
    distributed.mesh.train_state_shardings layout; minibatch gradients
    psum into the replicated params automatically."""

    def __init__(self, cfg: PPOFullConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = FullActorCritic(
            self.venv.env.n_actions, cfg.use_mhc, cfg.mhc_dim, cfg.mhc_rate,
            cfg.mhc_layers, cfg.mhc_sk_it,
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr),
        )
        if cfg.flat_optimizer:
            assert_flat_tp_ok(mesh)

    def init(self, key, _place: bool = True) -> FullTrainState:
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        params = self.net.init(k_params, jnp.zeros((1, obs_dim)))
        opt_target = flat_opt_target(params, self.cfg.flat_optimizer)
        ts = FullTrainState(
            params=params,
            opt_state=self.tx.init(opt_target),
            vec_state=self.venv.reset(k_env),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def policy(self, ts, obs, key, deterministic: bool = True):
        logits, _ = self.net.apply(ts.params, obs)
        if deterministic:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def _collect(self, ts: FullTrainState):
        cfg = self.cfg

        def env_step(carry, _):
            vec_state, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            logits, value = self.net.apply(ts.params, vec_state.obs)
            action = jax.random.categorical(k_act, logits).astype(jnp.int32)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, action[:, None], axis=-1).squeeze(-1)
            entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
            vec_state, tr = self.venv.step(vec_state, action, k_step)
            roll = FullRollout(
                obs=tr.obs, action=action, logp=logp, value=value, entropy=entropy,
                reward=tr.reward, next_obs=tr.next_obs,
                done=tr.done.astype(jnp.float32),
            )
            return (vec_state, key), (roll, (tr.final_return, tr.final_length, tr.done))

        (vec_state, key), (roll, stats) = jax.lax.scan(
            env_step, (ts.vec_state, ts.key), None, length=cfg.rollout_steps
        )
        return vec_state, key, roll, stats

    def _loss(self, params, mb, ent_coef):
        cfg = self.cfg
        logits, values = self.net.apply(params, mb["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, mb["action"][:, None], axis=-1).squeeze(-1)
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

        # ERC mask (ref :585-597)
        entropy_ratio = entropy / (mb["old_entropy"] + 1e-8)
        erc_mask = (
            (entropy_ratio > (1.0 - cfg.erc_beta_low))
            & (entropy_ratio < (1.0 + cfg.erc_beta_high))
        ).astype(jnp.float32)
        corr = erc_mask * mb["cov_keep"]  # clip-cov dropping folds in here

        ratio = jnp.exp(logp - mb["logp"])
        adv = mb["adv"]
        # dual-clip variant (b): surr1 from ratio clamped [0, dual_clip] (:600-601)
        surr1 = jnp.clip(ratio, 0.0, cfg.dual_clip) * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_eps_min, 1.0 + cfg.clip_eps_max) * adv
        policy_loss = jnp.mean(-jnp.minimum(surr1, surr2) * corr)
        value_loss = jnp.mean(0.5 * corr * jnp.square(values - mb["ret"]))
        entropy_term = jnp.mean(entropy * corr)
        loss = policy_loss + value_loss - ent_coef * entropy_term

        clip_frac = jnp.mean(
            ((ratio < 1.0 - cfg.clip_eps_min) | (ratio > 1.0 + cfg.clip_eps_max)).astype(
                jnp.float32
            ) * corr
        )
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy_term,
            "approx_kl": jnp.mean(mb["logp"] - logp),
            "clip_frac": clip_frac,
            "erc_clip_frac": 1.0 - jnp.mean(erc_mask),
        }

    def _train_iter(self, ts: FullTrainState) -> tuple[FullTrainState, IterOut]:
        cfg = self.cfg
        vec_state, key, roll, (ep_ret, ep_len, ep_done) = self._collect(ts)

        # successor values in one batched forward (bootstraps truncation too;
        # this variant multiplies by (1 - done) anyway, matching :518)
        flat_next = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
        _, next_values = self.net.apply(ts.params, flat_next)
        next_values = next_values.reshape(roll.value.shape)

        adv, returns = compute_gae_dual_lambda(
            roll.reward, roll.value, next_values,
            roll.done, roll.done,  # done cuts bootstrap AND trace here (:518-531)
            cfg.gamma, cfg.lam_actor, cfg.lam_critic,
        )
        adv = standardize(adv)

        flat = {
            "obs": roll.obs.reshape(cfg.batch_total, -1),
            "action": roll.action.reshape(-1),
            "logp": roll.logp.reshape(-1),
            "old_entropy": roll.entropy.reshape(-1),
            "adv": adv.reshape(-1),
            "ret": returns.reshape(-1),
        }
        # packed epoch shuffle — one wide gather, not 6 narrow leaf gathers
        # (PROFILE_r3.md pathology; same fix as ppo.py / the recurrent family)
        packed, spec = pack_fields(flat)

        # anneal lr + entropy coef with env-step progress (ref :659-666)
        progress = jnp.clip(ts.env_steps.astype(jnp.float32) / cfg.max_train_steps, 0.0, 1.0)
        lr = jnp.where(cfg.anneal, cfg.lr * (1.0 - progress), cfg.lr)
        ent_coef = jnp.where(cfg.anneal, cfg.entropy_coef * (1.0 - progress), cfg.entropy_coef)
        opt_state = ts.opt_state
        opt_state[1].hyperparams["learning_rate"] = lr

        mb_size = cfg.batch_total // cfg.num_minibatches

        # Optimizer representation: flat master vector (one fused Adam) or
        # the param pytree — see PPOFullConfig.flat_optimizer.
        params0, unravel = flat_params_repr(ts.params, cfg.flat_optimizer)
        loss_fn = (
            (lambda p, mb, ec: self._loss(unravel(p), mb, ec))
            if cfg.flat_optimizer else self._loss
        )

        def epoch(carry, k_epoch):
            params, opt_state = carry
            k_perm, k_cov = jax.random.split(k_epoch)
            perm = jax.random.permutation(k_perm, cfg.batch_total)
            mb_rows = packed[perm].reshape(cfg.num_minibatches, mb_size, -1)

            def minibatch(carry, xs):
                params, opt_state = carry
                rows, k_mb = xs
                mb = unpack_fields(rows, spec)
                # clip-cov sample dropping (ref :608-616); see cov_drop_mask
                if cfg.clip_cov_ratio > 0:
                    logits, _ = self.net.apply(unravel(params), mb["obs"])
                    logp_all = jax.nn.log_softmax(logits)
                    lp = jnp.take_along_axis(
                        logp_all, mb["action"][:, None], axis=-1
                    ).squeeze(-1)
                    covs = (lp - jnp.mean(lp)) * (mb["adv"] - jnp.mean(mb["adv"]))
                    mb["cov_keep"] = cov_drop_mask(
                        k_mb, covs, cfg.clip_cov_ratio,
                        cfg.clip_cov_min, cfg.clip_cov_max,
                    )
                else:
                    mb["cov_keep"] = jnp.ones((mb_size,), jnp.float32)
                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb, ent_coef
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            mb_keys = jax.random.split(k_cov, cfg.num_minibatches)
            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), (mb_rows, mb_keys)
            )
            return (params, opt_state), metrics

        key, k_epochs = jax.random.split(key)
        (params, opt_state), metrics = jax.lax.scan(
            epoch, (params0, opt_state), jax.random.split(k_epochs, cfg.num_epochs)
        )
        params = unravel(params)

        new_ts = FullTrainState(
            params=params, opt_state=opt_state, vec_state=vec_state, key=key,
            env_steps=ts.env_steps + cfg.batch_total,
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics=jax.tree_util.tree_map(jnp.mean, metrics)
            | {"lr": lr, "ent_coef": ent_coef},
        )
        return new_ts, out
