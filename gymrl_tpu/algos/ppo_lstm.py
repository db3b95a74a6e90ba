"""Recurrent full-tricks PPO + RND — the ppo_lstm_lunarlander workload.

Algorithm parity with reference algorithms/ppo_lstm_lunarlander.py (the
hardest path, SURVEY.md §3.3):
  * network (:446-520): RND (predictor/frozen-target PSCN-512 pair on the
    RAW state) → mHC backbone (dim 256, rate 2, 2 layers) or PSCN(512,
    depth 5) → URNN (GRU hidden 512, flat packed hidden) → actor
    MLP[512,512,A] (head gain 0.001) + critic MLP[512,512,1]
  * collection (:565-616): per-step hidden recorded BEFORE the forward,
    hidden zeroed at dones; intrinsic reward mean((pred−target)²) added
    to the env reward at collection time
  * dual-λ GAE cutting bootstrap AND trace on done (:618-644)
  * sequence training (:679-708): the flat rollout is chopped into
    seq_len=8 chunks (spanning episode boundaries), each re-unrolled from
    its stored initial hidden; minibatches of 128 sequences
  * losses (:723-790): ERC mask via `masked_mean` (sum/mask-count),
    dual-clip variant (b) + clip-higher, value clipping
    max((v−ret)², (old + clamp(v−old, −ε_min, +ε_max) − ret)²)·0.5,
    entropy 0.015 (annealed), RND MSE joins the total loss,
    grad-norm 0.5, Adam(3e-4, eps=1e-5)
  * lr + ent-coef annealing per update (:793-804)

TPU-native structure follows algos/ppo_rnn.py: everything is one jitted
program; the chunk mechanism here IS the reference's own (fixed slices +
stored initial hiddens), so no semantic deviation beyond vectorizing the
env batch.
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
from gymrl_tpu.core.gae import compute_gae_dual_lambda, standardize
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.nn.layers import PSCN
from gymrl_tpu.utils.logging import get_logger

logger = get_logger()
from gymrl_tpu.nn.mhc import MHCBackbone
from gymrl_tpu.nn.recurrent import URNNCell
from gymrl_tpu.algos.ppo_full import SiluRMSMLP


@dataclass(frozen=True)
class PPOLSTMConfig:
    env_name: str = "LunarLander-v3"
    num_envs: int = 64
    rollout_steps: int = 64  # T·B = 4096 (reference update_freq)
    seq_len: int = 8
    seq_minibatch: int = 128  # sequences per minibatch
    num_epochs: int = 4
    gamma: float = 0.995
    lam_actor: float = 0.95
    lam_critic: float = 0.95
    clip_eps_min: float = 0.2
    clip_eps_max: float = 0.28
    dual_clip: float = 3.0
    entropy_coef: float = 0.015
    erc_beta_low: float = 0.06
    erc_beta_high: float = 0.06
    lr: float = 3e-4
    adam_eps: float = 1e-5
    max_grad_norm: float = 0.5
    anneal: bool = True
    use_mhc: bool = True
    mhc_dim: int = 256
    mhc_rate: int = 2
    mhc_layers: int = 2
    mhc_sk_it: int = 10
    rnn_hidden: int = 512
    rnn_cell: str = "gru"  # 'gru' | 'lstm' (URNN supports both)
    rnd_embed: int = 512
    # Flat raveled-vector optimizer (see PPOConfig.flat_optimizer);
    # incompatible with model-axis TP
    flat_optimizer: bool = False
    # lax.scan unroll for the hoisted URNN recurrence (seq_len is only 8
    # here, so unroll=8 is a full unroll). Identical math; measured r5 in
    # AB_UNROLL_r5.json (lstm section).
    cell_unroll: int = 1
    max_train_steps: int = 5_000_000
    solve_threshold: float = 200.0

    @property
    def batch_total(self) -> int:
        return self.num_envs * self.rollout_steps

    @property
    def seqs_per_rollout(self) -> int:
        assert self.rollout_steps % self.seq_len == 0
        return (self.rollout_steps // self.seq_len) * self.num_envs

    @property
    def num_minibatches(self) -> int:
        n = self.seqs_per_rollout
        mb = min(self.seq_minibatch, n)
        assert n % mb == 0
        return n // mb


class RNDPair(nn.Module):
    """Predictor + frozen target PSCN pair (ref :494-513). The target's
    output is stop_gradient-ed so its params never receive gradients."""

    embed_dim: int = 512

    @nn.compact
    def __call__(self, x):
        import numpy as np

        depth = int(np.log2(self.embed_dim // 16))
        predict = PSCN(self.embed_dim, depth=depth, name="predictor")(x)
        target = PSCN(self.embed_dim, depth=depth, name="target")(x)
        return predict, jax.lax.stop_gradient(target)


class LSTMActorCritic(nn.Module):
    """RND + backbone + URNN cell + heads; called one step at a time."""

    n_actions: int
    cfg: Any  # PPOLSTMConfig (static)

    def setup(self):
        c = self.cfg
        if c.use_mhc:
            self.shared = MHCBackbone(c.mhc_dim, c.mhc_rate, c.mhc_layers, c.mhc_sk_it,
                                      name="shared")
        else:
            self.shared = PSCN(512, depth=5, name="shared")
        self.rnn = URNNCell(c.rnn_hidden, c.rnn_cell, name="rnn")
        self.actor = SiluRMSMLP((512, self.n_actions), last_std=0.001, name="actor")
        self.critic = SiluRMSMLP((512, 1), last_std=1.0, name="critic")
        self.rnd = RNDPair(c.rnd_embed, name="rnd")

    def __call__(self, h, obs):
        predict, target = self.rnd(obs)
        x = self.shared(obs)
        h, out = self.rnn(h, x)
        logits = self.actor(out)
        value = self.critic(out).squeeze(-1)
        return h, logits, value, predict, target

    # Time-independent pieces exposed separately so the training re-unroll
    # keeps only the URNN recurrence in its sequential scan; the mHC
    # backbone (Sinkhorn per layer!), RND pair, and heads run ONCE batched
    # over all mb·L steps (r5 — same hoist as RecurrentActorCritic).
    def encode(self, obs):
        return self.shared(obs)

    def cell(self, h, x):
        return self.rnn(h, x)

    def heads(self, out):
        return self.actor(out), self.critic(out).squeeze(-1)

    def rnd_forward(self, obs):
        return self.rnd(obs)

    @property
    def packed_hidden(self) -> int:
        return self.cfg.rnn_hidden * (2 if self.cfg.rnn_cell == "lstm" else 1)


class LSTMTrainState(NamedTuple):
    params: Any
    opt_state: Any
    vec_state: Any
    hidden: jax.Array
    key: jax.Array
    env_steps: jax.Array


class LSTMRollout(NamedTuple):
    obs: jax.Array
    action: jax.Array
    logp: jax.Array
    value: jax.Array
    entropy: jax.Array
    reward: jax.Array  # env reward + RND intrinsic (ref :586-590)
    next_obs: jax.Array
    h_pre: jax.Array  # hidden BEFORE the step (chunk init states, ref :579)
    h_post: jax.Array  # hidden AFTER forward, pre-reset (bootstrap value)
    done: jax.Array


class PPOLSTMTrainer(Trainer):
    """With ``mesh``: env-batch DP over 'data' (vec_state + the packed URNN
    hidden carry shard on batch; params — incl. the mHC backbone and the
    RND pair — replicate), via distributed.mesh.train_state_shardings. The
    seq_len=8 chunks are per-env slices so the stored-initial-hidden
    re-unroll stays shard-local; the global sequence shuffle reshards over
    ICI and gradients psum into the replicated params automatically."""

    def __init__(self, cfg: PPOLSTMConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.net = LSTMActorCritic(self.venv.env.n_actions, cfg)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr, eps=cfg.adam_eps),
        )
        if cfg.flat_optimizer:
            assert_flat_tp_ok(mesh)
        self._eval_cache: dict = {}

    def init(self, key, _place: bool = True) -> LSTMTrainState:
        cfg = self.cfg
        k_params, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        h0 = jnp.zeros((1, self.net.packed_hidden), jnp.float32)
        params = self.net.init(k_params, h0, jnp.zeros((1, obs_dim)))
        opt_target = flat_opt_target(params, cfg.flat_optimizer)
        ts = LSTMTrainState(
            params=params,
            opt_state=self.tx.init(opt_target),
            vec_state=self.venv.reset(k_env),
            hidden=jnp.zeros((cfg.num_envs, self.net.packed_hidden), jnp.float32),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def policy(self, ts, obs, key, deterministic: bool = True):
        """MEMORYLESS single-shot view (packed LSTM carry = 0 every call) —
        use policy_step / eval_episodes for real recurrent behavior."""
        if not getattr(self, "_warned_stateless_policy", False):
            logger.warning(
                "PPOLSTMTrainer.policy() is memoryless (carry=0 each call); "
                "use policy_step/eval_episodes for recurrent eval"
            )
            self._warned_stateless_policy = True
        b = obs.shape[0]
        h = jnp.zeros((b, self.net.packed_hidden), jnp.float32)
        _, logits, _, _, _ = self.net.apply(ts.params, h, obs)
        if deterministic:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def policy_reset(self, batch: int):
        """Fresh packed (h, c) carry (ref utils/model.py:307-324)."""
        return jnp.zeros((batch, self.net.packed_hidden), jnp.float32)

    def policy_step(self, ts, carry, obs, key, deterministic: bool = True):
        """Carry-through recurrent policy (ref utils/runner.py:169-206)."""
        h, logits, _, _, _ = self.net.apply(ts.params, carry, obs)
        if deterministic:
            return h, jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return h, jax.random.categorical(key, logits).astype(jnp.int32)

    def eval_episodes(self, ts, key, n_episodes: int):
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
        h = jnp.zeros((n_episodes, self.net.packed_hidden), jnp.float32)

        def body(carry, k):
            state, obs, h, done, ret, length = carry
            h, logits, _, _, _ = self.net.apply(ts.params, h, obs)
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
        (_, _, _, _, returns, lengths), _ = jax.lax.scan(
            body, init, jax.random.split(k_roll, env.max_steps)
        )
        return returns, lengths

    # -- collection -----------------------------------------------------------
    def _collect(self, ts: LSTMTrainState):
        cfg = self.cfg

        def env_step(carry, _):
            vec_state, hidden, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            h_pre = hidden
            hidden, logits, value, predict, target = self.net.apply(
                ts.params, hidden, vec_state.obs
            )
            action = jax.random.categorical(k_act, logits).astype(jnp.int32)
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, action[:, None], axis=-1).squeeze(-1)
            entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

            vec_state, tr = self.venv.step(vec_state, action, k_step)
            rnd_reward = jnp.mean(jnp.square(predict - target), axis=-1)
            reward = tr.reward + rnd_reward  # intrinsic reward (ref :586-590)

            h_post = hidden
            hidden = jnp.where(tr.done[:, None], 0.0, hidden)  # reset at done

            roll = LSTMRollout(
                obs=tr.obs, action=action, logp=logp, value=value, entropy=entropy,
                reward=reward, next_obs=tr.next_obs, h_pre=h_pre, h_post=h_post,
                done=tr.done.astype(jnp.float32),
            )
            return (vec_state, hidden, key), (roll, (tr.final_return, tr.final_length, tr.done))

        (vec_state, hidden, key), (roll, stats) = jax.lax.scan(
            env_step, (ts.vec_state, ts.hidden, ts.key), None, length=cfg.rollout_steps
        )
        return vec_state, hidden, key, roll, stats

    # -- loss -----------------------------------------------------------------
    def _seq_forward(self, params, h0, obs_seq):
        """[mb, L, obs] unroll: mHC backbone + RND + heads hoisted out of
        the time scan (time-independent — one wide batched pass each);
        only the URNN recurrence is sequential. Identical math to the
        per-step unroll (r5, PROFILE_r5.md §5)."""
        mb, L = obs_seq.shape[:2]
        flat_obs = obs_seq.reshape(mb * L, -1)
        predict, target = self.net.apply(params, flat_obs, method="rnd_forward")
        x = self.net.apply(params, flat_obs, method="encode")
        feats = jnp.swapaxes(x.reshape(mb, L, -1), 0, 1)  # [L, mb, F]

        def step(h, xx):
            h, out = self.net.apply(params, h, xx, method="cell")
            return h, out

        _, outs = jax.lax.scan(step, h0, feats, unroll=self.cfg.cell_unroll)
        logits, values = self.net.apply(
            params, jnp.swapaxes(outs, 0, 1), method="heads"
        )
        return (logits, values,
                predict.reshape(mb, L, -1), target.reshape(mb, L, -1))

    def _loss(self, params, mb, ent_coef):
        cfg = self.cfg
        logits, values, predict, target = self._seq_forward(params, mb["h0"], mb["obs"])
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.take_along_axis(logp_all, mb["action"][..., None], axis=-1).squeeze(-1)
        entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

        entropy_ratio = entropy / (mb["old_entropy"] + 1e-8)
        corr = (
            (entropy_ratio > (1.0 - cfg.erc_beta_low))
            & (entropy_ratio < (1.0 + cfg.erc_beta_high))
        ).astype(jnp.float32)

        ratio = jnp.exp(logp - mb["logp"])
        adv = mb["adv"]
        surr1 = jnp.clip(ratio, 0.0, cfg.dual_clip) * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_eps_min, 1.0 + cfg.clip_eps_max) * adv
        policy_loss = masked_mean(-jnp.minimum(surr1, surr2), corr)

        # value clipping (ref :763-770) — asymmetric band like the ratio clip
        v_clip = mb["old_value"] + jnp.clip(
            values - mb["old_value"], -cfg.clip_eps_min, cfg.clip_eps_max
        )
        vl1 = jnp.square(values - mb["ret"])
        vl2 = jnp.square(v_clip - mb["ret"])
        value_loss = 0.5 * masked_mean(jnp.maximum(vl1, vl2), corr)

        entropy_term = masked_mean(entropy, corr)
        rnd_loss = jnp.mean(jnp.square(predict - target))
        loss = policy_loss + value_loss - ent_coef * entropy_term + rnd_loss

        clip_frac = masked_mean(
            ((ratio < 1.0 - cfg.clip_eps_min) | (ratio > 1.0 + cfg.clip_eps_max)).astype(
                jnp.float32
            ),
            corr,
        )
        return loss, {
            "policy_loss": policy_loss, "value_loss": value_loss,
            "entropy": entropy_term, "rnd_loss": rnd_loss,
            "approx_kl": jnp.mean(mb["logp"] - logp), "clip_frac": clip_frac,
            "erc_clip_frac": 1.0 - jnp.mean(corr),
        }

    # -- fused train iteration ------------------------------------------------
    def _train_iter(self, ts: LSTMTrainState) -> tuple[LSTMTrainState, IterOut]:
        cfg = self.cfg
        vec_state, hidden, key, roll, (ep_ret, ep_len, ep_done) = self._collect(ts)

        # successor values under the advanced hidden, one batched forward
        flat_h = roll.h_post.reshape(-1, roll.h_post.shape[-1])
        flat_next = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
        _, _, next_values, _, _ = self.net.apply(ts.params, flat_h, flat_next)
        next_values = next_values.reshape(roll.value.shape)

        adv, returns = compute_gae_dual_lambda(
            roll.reward, roll.value, next_values, roll.done, roll.done,
            cfg.gamma, cfg.lam_actor, cfg.lam_critic,
        )
        adv = standardize(adv)

        L = cfg.seq_len
        n_chunks = cfg.rollout_steps // L

        def to_seq(x):
            x = x.reshape((n_chunks, L) + x.shape[1:])
            x = jnp.moveaxis(x, 2, 1)
            return x.reshape((n_chunks * cfg.num_envs, L) + x.shape[3:])

        data = {
            "obs": to_seq(roll.obs),
            "action": to_seq(roll.action),
            "logp": to_seq(roll.logp),
            "old_entropy": to_seq(roll.entropy),
            "old_value": to_seq(roll.value),
            "adv": to_seq(adv),
            "ret": to_seq(returns),
            "h0": to_seq(roll.h_pre)[:, 0],
        }

        progress = jnp.clip(ts.env_steps.astype(jnp.float32) / cfg.max_train_steps, 0.0, 1.0)
        lr = jnp.where(cfg.anneal, cfg.lr * (1.0 - progress), cfg.lr)
        ent_coef = jnp.where(cfg.anneal, cfg.entropy_coef * (1.0 - progress), cfg.entropy_coef)
        opt_state = ts.opt_state
        opt_state[1].hyperparams["learning_rate"] = lr

        n_seqs = cfg.seqs_per_rollout
        mb_size = n_seqs // cfg.num_minibatches
        # Packed epoch shuffle — one wide gather instead of 8 narrow
        # leaf-by-leaf gathers (PROFILE_r3.md pathology; same fix as ppo.py)
        packed, spec = pack_fields(data)

        # Optimizer representation: flat master vector (one fused Adam) or
        # the param pytree — see PPOLSTMConfig.flat_optimizer. The frozen
        # RND target rides along with zero grads (stop_gradient), so its
        # Adam moments stay zero and it never moves, flat or not.
        params0, unravel = flat_params_repr(ts.params, cfg.flat_optimizer)
        loss_fn = (
            (lambda p, mb, ec: self._loss(unravel(p), mb, ec))
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
                    params, mb, ent_coef
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
            epoch, (params0, opt_state), jax.random.split(k_epochs, cfg.num_epochs)
        )
        params = unravel(params)

        new_ts = LSTMTrainState(
            params=params, opt_state=opt_state, vec_state=vec_state, hidden=hidden,
            key=key, env_steps=ts.env_steps + cfg.batch_total,
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics=jax.tree_util.tree_map(jnp.mean, metrics)
            | {"lr": lr, "ent_coef": ent_coef},
        )
        return new_ts, out
