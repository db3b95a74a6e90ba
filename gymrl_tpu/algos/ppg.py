"""PPG (Phasic Policy Gradient) with GRU — the ppg_rnn_lunarlander workload.

Algorithm parity with reference algorithms/ppg_rnn_lunarlander.py:
  * network = the recurrent PPO net plus an auxiliary value head
    ``aux_critic_fc`` = MLP[256, 32, 1] (:143-176)
  * phase 1 = 10 standard recurrent-PPO epochs (dual-clip, value MSE ·0.5,
    entropy 1e-2) — identical to ppo_rnn (:333-370)
  * phase 2 = 6 auxiliary epochs minimizing
    ``MSE(v_target, aux_value) + β_clone·MSE(new_logp(a), old_logp(a))``
    with β_clone = 1.0 (:372-393); both phases share one Adam optimizer
  * γ = 0.995 (:46), everything else inherits the ppo_rnn defaults

Implementation: subclass of PPORNNTrainer — the net gains the aux head
(ignored by phase 1 through the `_apply_cell` hook), and `train_iter`
appends the phase-2 scan after the inherited phase-1 logic.

Documented deviation (defaults): the reference's aux phase — behavior-logp
MSE clone run EVERY update — is the one combination that never learns:
the full grid (ABLATION_ppg_r3.json, benchmarks/ablate_ppg.py) shows
clone-to-current solves at either cadence (471k @ every-8, 463k @
every-1), behavior-clone at every-8 solves too (508k), but
behavior-clone × every-update plateaus at avg100 ~50-65 — at vectorized
scale (1.5M cap here; 10M in SOLVE_r2.jsonl) AND at reference scale
(num_envs=4, whole-episode, 600k: avg100 48.7), so it is not a
vectorization artifact. The canonical workload config
(``ppg_rnn_lunarlander_config``) therefore follows canonical PPG (Cobbe
et al. 2020): KL clone to the post-policy-phase distribution, aux every 8
policy phases, whole-episode BPTT — solved at 471k env-steps (seed 0)
and 614k (seed 1 replication, SOLVE_r3.jsonl). Committed evidence:
ABLATION_ppg_r3.json and
benchmarks/artifacts/ — including a long run of the reference's OWN
script (refppg_run.log), which sits at avg100 ≈ −76 after 1288 episodes
(~3.5 h CPU), nowhere near its avg100 ≥ 200 bar
(ppg_rnn_lunarlander.py:493), so the reference semantics are not a
working recipe to match in the first place. ``clone_target="behavior", aux_every=1`` remains available for
reference-exact semantics.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import (
    IterOut, flat_params_repr, masked_mean, pack_fields, unpack_fields,
)
from gymrl_tpu.algos.ppo_rnn import (
    PPORNNConfig,
    PPORNNTrainer,
    RNNTrainState,
)
from gymrl_tpu.core.gae import compute_gae, standardize
from gymrl_tpu.nn.layers import MLP, PSCN
from gymrl_tpu.nn.recurrent import MLPRNNCell


@dataclass(frozen=True)
class PPGConfig(PPORNNConfig):
    gamma: float = 0.995  # ppg_rnn_lunarlander.py:46
    aux_epochs: int = 6
    beta_clone: float = 1.0
    # Aux-phase behavior. The reference anchors the clone loss to the
    # BEHAVIOR policy's logp and runs the aux phase every update
    # (ppg_rnn_lunarlander.py:372-393) — at vectorized scale this drags the
    # policy back toward pre-update and the run plateaus (committed
    # evidence: SOLVE_r2.jsonl behavior-clone entries avg100 ~50 @ 10M
    # steps; ABLATION_ppg_r3.json; benchmarks/artifacts/r2_logs/).
    # Canonical PPG (Cobbe et al. 2020) anchors to the CURRENT
    # (post-policy-phase) distribution via full KL and runs aux only every
    # N_pi policy phases — the canonical workload config solves at 471k
    # steps (avg100 204.3, ppg_current8.log). Reference-exact semantics
    # remain available via clone_target="behavior", aux_every=1.
    clone_target: str = "current"  # "current" (canonical) | "behavior" (ref)
    aux_every: int = 8  # run the aux phase every N train iterations (N_pi)


class PPGActorCritic(nn.Module):
    """Recurrent net + aux value head (ppg_rnn_lunarlander.py:143-176).

    Same encode/cell/heads split as RecurrentActorCritic (r5 — see that
    docstring): the sequential scan carries only the GRU cell; PSCN and
    all three heads run batched over the full sequence. Param tree is
    identical to the original compact version.
    """

    n_actions: int
    feature_dim: int = 256

    def setup(self):
        self.fc_head = PSCN(self.feature_dim)
        self.rnn = MLPRNNCell(self.feature_dim)
        self.actor_fc = MLP([64, self.n_actions])
        self.critic_fc = MLP([32, 1])
        self.aux_critic_fc = MLP([32, 1])

    def __call__(self, h, obs):
        x = self.fc_head(obs)
        h, out = self.rnn(h, x)
        logits = self.actor_fc(out)
        value = self.critic_fc(out).squeeze(-1)
        aux_value = self.aux_critic_fc(out).squeeze(-1)
        return h, logits, value, aux_value

    def encode(self, obs):
        return self.fc_head(obs)

    def cell(self, h, x):
        return self.rnn(h, x)

    def heads(self, out):
        """Policy-phase heads — matches the base trainer's _seq_forward."""
        return self.actor_fc(out), self.critic_fc(out).squeeze(-1)

    def aux_heads(self, out):
        """Aux-phase heads: (logits, aux_value)."""
        return self.actor_fc(out), self.aux_critic_fc(out).squeeze(-1)

    @property
    def rnn_size(self) -> int:
        return self.feature_dim // 4


class PPGTrainer(PPORNNTrainer):
    def __init__(self, cfg: PPGConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.net = PPGActorCritic(self.venv.env.n_actions, cfg.feature_dim)

    def _apply_cell(self, params, h, x):
        h, logits, value, _aux = self.net.apply(params, h, x)
        return h, logits, value

    # -- phase 2 --------------------------------------------------------------
    def _aux_seq_forward(self, params, h0, obs_seq):
        """Aux-phase unroll with the same hoisted encode/cell/heads shape
        as the base _seq_forward (only the GRU cell is sequential)."""
        mb, L = obs_seq.shape[:2]
        feats = self.net.apply(params, obs_seq.reshape(mb * L, -1), method="encode")
        feats = jnp.swapaxes(feats.reshape(mb, L, -1), 0, 1)

        def step(h, x):
            h, out = self.net.apply(params, h, x, method="cell")
            return h, out

        _, outs = jax.lax.scan(step, h0, feats, unroll=self.cfg.cell_unroll)
        logits, aux = self.net.apply(
            params, jnp.swapaxes(outs, 0, 1), method="aux_heads"
        )
        return logits, aux

    def _aux_loss(self, params, mb):
        logits, aux_values = self._aux_seq_forward(params, mb["h0"], mb["obs"])
        logp_all = jax.nn.log_softmax(logits)
        mask = mb["mask"]
        aux_value_loss = masked_mean(jnp.square(aux_values - mb["v_target"]), mask)
        if self.cfg.clone_target == "current":
            # canonical PPG: KL(anchor ‖ new) to the post-policy-phase dist
            anchor = mb["anchor_logp_all"]
            kl = jnp.sum(jnp.exp(anchor) * (anchor - logp_all), axis=-1)
            clone_loss = masked_mean(kl, mask)
        else:
            # reference: MSE to the behavior policy's taken-action logp (:383-388)
            logp = jnp.take_along_axis(
                logp_all, mb["action"][..., None], axis=-1
            ).squeeze(-1)
            clone_loss = masked_mean(jnp.square(logp - mb["logp"]), mask)
        loss = aux_value_loss + self.cfg.beta_clone * clone_loss
        return loss, {"aux_value_loss": aux_value_loss, "clone_loss": clone_loss}

    def _train_iter(self, ts: RNNTrainState) -> tuple[RNNTrainState, IterOut]:
        cfg = self.cfg
        # -- phase 1: identical pipeline to recurrent PPO
        vec_state, hidden, obs_rms, scaler, key, roll, (ep_ret, ep_len, ep_done) = (
            self._collect(ts)
        )
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
        # Packed epoch shuffle for both phases (PROFILE_r3.md pathology;
        # same single-wide-gather fix as ppo.py / ppo_rnn.py)
        packed, spec = pack_fields(data)

        # Optimizer representation: flat master vector (one fused Adam per
        # grad step in BOTH phases) or the param pytree — see
        # PPORNNConfig.flat_optimizer (inherited).
        params0, unravel = flat_params_repr(ts.params, cfg.flat_optimizer)
        if cfg.flat_optimizer:
            loss_fn = lambda p, mb: self._loss(unravel(p), mb)
            aux_loss_fn = lambda p, mb: self._aux_loss(unravel(p), mb)
        else:
            loss_fn, aux_loss_fn = self._loss, self._aux_loss

        def phase1_epoch(carry, k_epoch):
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

        key, k_p1, k_p2 = jax.random.split(key, 3)
        (params, opt_state), metrics = jax.lax.scan(
            phase1_epoch, (params0, ts.opt_state), jax.random.split(k_p1, cfg.num_epochs)
        )

        # -- phase 2: auxiliary epochs (ref :372-393)
        if cfg.clone_target == "current":
            # anchor = the post-policy-phase distribution over the buffer,
            # computed once (canonical PPG's pi_old for the aux phase)
            anchor_logits, _ = self._aux_seq_forward(
                unravel(params), data["h0"], data["obs"]
            )
            data = dict(
                data,
                anchor_logp_all=jax.lax.stop_gradient(
                    jax.nn.log_softmax(anchor_logits)
                ),
            )
            aux_packed, aux_spec = pack_fields(data)
        else:
            # no anchor field added — reuse phase 1's packed matrix rather
            # than relying on XLA CSE to dedupe a full-buffer concatenate
            aux_packed, aux_spec = packed, spec

        def phase2_epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, n_seqs)
            mb_rows = aux_packed[perm].reshape(cfg.num_minibatches, mb_size, -1)

            def minibatch(carry, rows):
                params, opt_state = carry
                mb = unpack_fields(rows, aux_spec)
                (loss, aux_metrics), grads = jax.value_and_grad(
                    aux_loss_fn, has_aux=True
                )(params, mb)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux_metrics

            (params, opt_state), aux_metrics = jax.lax.scan(
                minibatch, (params, opt_state), mb_rows
            )
            return (params, opt_state), aux_metrics

        def run_phase2(carry):
            return jax.lax.scan(
                phase2_epoch, carry, jax.random.split(k_p2, cfg.aux_epochs)
            )

        if cfg.aux_every > 1:
            # canonical PPG cadence: aux only every N_pi policy phases
            iter_idx = ts.env_steps // (cfg.num_envs * cfg.rollout_steps)

            def skip_phase2(carry):
                zeros = {
                    "aux_value_loss": jnp.zeros((cfg.aux_epochs, cfg.num_minibatches)),
                    "clone_loss": jnp.zeros((cfg.aux_epochs, cfg.num_minibatches)),
                }
                return carry, zeros

            (params, opt_state), aux_metrics = jax.lax.cond(
                (iter_idx % cfg.aux_every) == cfg.aux_every - 1,
                run_phase2, skip_phase2, (params, opt_state),
            )
        else:
            (params, opt_state), aux_metrics = run_phase2((params, opt_state))

        new_ts = RNNTrainState(
            params=unravel(params), opt_state=opt_state, vec_state=vec_state,
            hidden=hidden, obs_rms=obs_rms, reward_scaler=scaler, key=key,
            env_steps=ts.env_steps + cfg.num_envs * cfg.rollout_steps,
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics=jax.tree_util.tree_map(jnp.mean, metrics)
            | jax.tree_util.tree_map(jnp.mean, aux_metrics)
            | pack_metrics,
        )
        return new_ts, out


def ppg_rnn_lunarlander_config(**kw) -> PPGConfig:
    """Canonical PPG workload config — whole-episode BPTT (matching
    ppo_rnn_lunarlander_config) with the canonical-PPG aux defaults
    (clone_target='current', aux_every=8). Solved LunarLander at 471k
    env-steps (benchmarks/artifacts/r2_logs/ppg_current8.log; ablation
    grid in ABLATION_ppg_r3.json)."""
    base = dict(env_name="LunarLander-v3", whole_episode_bptt=True,
                episode_rows_per_env=8, seq_minibatch=64,
                # r5: flat master-vector Adam, +18.3% at this config,
                # solve-validated 3/3 (90k/930k/262k, SOLVE_r5.jsonl)
                flat_optimizer=True)
    base.update(kw)
    return PPGConfig(**base)
