"""Off-policy continuous control: DDPG, TD3, SAC — plus discrete SAC.

Reference parity (each trainer pins its script's hyperparameters):
  * DDPG  — algorithms/ddpg_pendulum.py: deterministic tanh actor ·bound,
    Q(s,a) critic on concat, Gaussian exploration N(0, 0.1·bound), soft
    updates τ=0.005 of BOTH nets every update (:192-193), batch 128,
    γ=0.99, lr 1e-3.
  * TD3   — algorithms/td3_pendulum.py: twin critic (+`q1` view :91-95),
    target-policy smoothing noise N(0, 0.2) clipped ±0.5 then action
    clipped to bounds (:194-200), delayed actor+target updates every 2
    critic steps (:216-224), exploration noise N(0, 0.1·bound) (:165-169).
  * SAC   — algorithms/sac_pendulum.py: squashed-Gaussian actor with
    log_std clamp [−20, 2] and tanh log-prob correction (:76-87), twin
    critic in one module, target min(Q1,Q2) − α·logπ (:233-237), auto-α
    with target_entropy = −dim(A) and loss −(logα·(logπ+H̄).detach())
    (:176-180, 257-259), τ=0.005, batch 128, lrs 3e-4, init α 0.2.
  * SACD  — algorithms/sac_cartpole.py (discrete): softmax actor,
    per-action Q critics with separate optimizers/targets (:106-116),
    expectation-form targets Σπ·min(Q1,Q2) + α·H (:172-183), α-loss
    mean(α·(H−H̄).detach()) with target_entropy −1.0 (:43, 211-213),
    init α 0.01, capacity 10k, lrs 1e-3/2e-3… pinned in the config.

TPU-native structure: identical fused scan to the DQN family — batched
act → vmapped env step → ring push → k minibatch updates per vector step,
one jitted program per train_iter; separate optimizer states per network
exactly as the reference keeps separate Adam instances.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from gymrl_tpu.algos.base import IterOut, Trainer, soft_update
from gymrl_tpu.envs.registry import make_vec
from gymrl_tpu.nn.layers import Dense
from gymrl_tpu.replay.uniform import replay_init, replay_push_batch, replay_sample

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


# -- networks -----------------------------------------------------------------

class DeterministicActor(nn.Module):
    """tanh(MLP)·bound (DDPG/TD3 actor, e.g. ddpg_pendulum.py:45-58)."""

    act_dim: int
    action_bound: float
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(Dense(self.hidden_dim, name="fc2")(x))
        return jnp.tanh(Dense(self.act_dim, name="head")(x)) * self.action_bound


class QCritic(nn.Module):
    """Q(s, a) on concat (ddpg_pendulum.py:61-78)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, s, a):
        x = jnp.concatenate([s, a], axis=-1)
        x = nn.relu(Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(Dense(self.hidden_dim, name="fc2")(x))
        return Dense(1, name="head")(x).squeeze(-1)


class TwinQCritic(nn.Module):
    """Two Q heads in one module with a q1 view (td3_pendulum.py:65-95)."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, s, a):
        return QCritic(self.hidden_dim, name="q1")(s, a), QCritic(
            self.hidden_dim, name="q2"
        )(s, a)


class SquashedGaussianActor(nn.Module):
    """SAC actor: tanh-squashed Normal ·bound (sac_pendulum.py:49-98)."""

    act_dim: int
    action_bound: float
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(Dense(self.hidden_dim, name="fc2")(x))
        mean = Dense(self.act_dim, name="mean")(x)
        log_std = jnp.clip(Dense(self.act_dim, name="log_std")(x), LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


def squashed_sample(mean, log_std, bound, key):
    """rsample + tanh squash + log-prob correction (sac_pendulum.py:76-87)."""
    std = jnp.exp(log_std)
    x = mean + std * jax.random.normal(key, mean.shape)
    tanh_x = jnp.tanh(x)
    action = tanh_x * bound
    logp = -0.5 * (jnp.square((x - mean) / std) + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    logp = logp - jnp.log(bound * (1.0 - jnp.square(tanh_x)) + 1e-6)
    return action, jnp.sum(logp, axis=-1)


class SoftmaxActor(nn.Module):
    """Discrete SAC actor: softmax over actions (sac_cartpole.py:70-81)."""

    n_actions: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(Dense(self.hidden_dim, name="fc2")(x))
        return jax.nn.softmax(Dense(self.n_actions, name="fc3")(x), axis=-1)


class PerActionQ(nn.Module):
    """Discrete critic: Q(s, ·) vector (sac_cartpole.py:83-94)."""

    n_actions: int
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(Dense(self.hidden_dim, name="fc2")(x))
        return Dense(self.n_actions, name="fc3")(x)


# -- shared off-policy machinery ---------------------------------------------

class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array  # all four scripts bootstrap on done (incl. truncation)


@dataclass(frozen=True)
class OffPolicyConfig:
    env_name: str = "Pendulum-v1"
    num_envs: int = 16
    steps_per_iter: int = 32
    batch_size: int = 128
    gamma: float = 0.99
    tau: float = 0.005
    lr_actor: float = 1e-3
    lr_critic: float = 1e-3
    lr_alpha: float = 3e-4
    hidden_dim: int = 256
    memory_capacity: int = 100_000
    exploration_noise: float = 0.1  # ·bound (DDPG/TD3)
    policy_noise: float = 0.2  # TD3 target smoothing
    noise_clip: float = 0.5
    policy_freq: int = 2  # TD3 delayed updates
    init_alpha: float = 0.2  # SAC
    target_entropy: float | None = None  # None ⇒ −act_dim (SAC) / −1.0 (SACD)
    updates_per_step: int | None = None
    max_train_steps: int = 500_000
    solve_threshold: float | None = None

    @property
    def n_updates(self) -> int:
        return self.num_envs if self.updates_per_step is None else self.updates_per_step


class OffPolicyTrainState(NamedTuple):
    nets: Any  # dict of param trees
    targets: Any  # dict of target param trees
    opts: Any  # dict of optimizer states
    replay: Any
    vec_state: Any
    key: jax.Array
    env_steps: jax.Array
    learn_steps: jax.Array


class OffPolicyContinuousTrainer(Trainer):
    """Shared fused loop; subclasses define nets, act, and update.

    With ``mesh``: DP over the env batch and over the sampled learner
    minibatch, replay replicated (same design as DQNFamilyTrainer — see
    distributed.mesh.train_state_shardings)."""

    def _make_nets(self, key, obs_dim):
        raise NotImplementedError

    def _act(self, ts, obs, key, deterministic):
        raise NotImplementedError

    def _update(self, nets, targets, opts, batch, learn_step, key):
        raise NotImplementedError

    def init(self, key, _place: bool = True) -> OffPolicyTrainState:
        cfg = self.cfg
        k_nets, k_env, k_iter = jax.random.split(key, 3)
        obs_dim = self.venv.env.obs_dim
        nets, targets, opts = self._make_nets(k_nets, obs_dim)
        act_example = (
            jnp.zeros((self._act_dim,), jnp.float32)
            if self._act_dim else jnp.zeros((), jnp.int32)
        )
        example = Transition(
            obs=jnp.zeros((obs_dim,), jnp.float32),
            action=act_example,
            reward=jnp.zeros((), jnp.float32),
            next_obs=jnp.zeros((obs_dim,), jnp.float32),
            done=jnp.zeros((), jnp.float32),
        )
        ts = OffPolicyTrainState(
            nets=nets, targets=targets, opts=opts,
            replay=replay_init(example, cfg.memory_capacity),
            vec_state=self.venv.reset(k_env),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
            learn_steps=jnp.zeros((), jnp.int32),
        )
        if self.mesh is not None and _place:
            from gymrl_tpu.distributed.mesh import train_state_shardings

            sh = train_state_shardings(self.mesh, ts)
            ts = jax.tree_util.tree_map(jax.device_put, ts, sh)
        return ts

    def policy(self, ts, obs, key, deterministic: bool = True):
        return self._act(ts.nets, obs, key, deterministic)

    def _train_iter(self, ts: OffPolicyTrainState) -> tuple[OffPolicyTrainState, IterOut]:
        cfg = self.cfg

        def env_step(ts: OffPolicyTrainState, _):
            key, k_act, k_step, k_upd = jax.random.split(ts.key, 4)
            action = self._act(ts.nets, ts.vec_state.obs, k_act, deterministic=False)
            vec_state, tr = self.venv.step(ts.vec_state, action, k_step)
            replay = replay_push_batch(
                ts.replay,
                Transition(
                    obs=tr.obs, action=action, reward=tr.reward,
                    next_obs=tr.next_obs, done=tr.done.astype(jnp.float32),
                ),
            )

            def upd(carry, xs):
                nets, targets, opts, learn_step = carry
                k_s, k_u = jax.random.split(xs)
                batch = replay_sample(replay, k_s, cfg.batch_size)
                if self.mesh is not None:
                    from gymrl_tpu.distributed.mesh import constrain_batch

                    # data-parallel gradient pass over the sampled batch
                    batch = constrain_batch(batch, self.mesh)
                nets, targets, opts, metrics = self._update(
                    nets, targets, opts, batch, learn_step, k_u
                )
                return (nets, targets, opts, learn_step + 1), metrics

            def do_updates(args):
                keys = jax.random.split(k_upd, cfg.n_updates)
                (nets, targets, opts, learn_step), metrics = jax.lax.scan(upd, args, keys)
                return nets, targets, opts, learn_step, jax.tree_util.tree_map(jnp.mean, metrics)

            def no_updates(args):
                nets, targets, opts, learn_step = args
                return nets, targets, opts, learn_step, self._zero_metrics()

            nets, targets, opts, learn_steps, metrics = jax.lax.cond(
                replay.size >= cfg.batch_size, do_updates, no_updates,
                (ts.nets, ts.targets, ts.opts, ts.learn_steps),
            )

            new_ts = OffPolicyTrainState(
                nets=nets, targets=targets, opts=opts, replay=replay,
                vec_state=vec_state, key=key,
                env_steps=ts.env_steps + cfg.num_envs, learn_steps=learn_steps,
            )
            return new_ts, (tr.final_return, tr.final_length, tr.done, metrics)

        ts, (ep_ret, ep_len, ep_done, metrics) = jax.lax.scan(
            env_step, ts, None, length=cfg.steps_per_iter
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics=jax.tree_util.tree_map(jnp.mean, metrics),
        )
        return ts, out

    def _zero_metrics(self):
        raise NotImplementedError


# -- DDPG ---------------------------------------------------------------------

class DDPGTrainer(OffPolicyContinuousTrainer):
    def __init__(self, cfg: OffPolicyConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self._act_dim = self.venv.env.act_dim
        self.bound = self.venv.env.action_bound
        self.actor = DeterministicActor(self._act_dim, self.bound, cfg.hidden_dim)
        self.critic = QCritic(cfg.hidden_dim)
        self.tx_actor = optax.adam(cfg.lr_actor)
        self.tx_critic = optax.adam(cfg.lr_critic)

    def _make_nets(self, key, obs_dim):
        k_a, k_c = jax.random.split(key)
        obs = jnp.zeros((1, obs_dim))
        act = jnp.zeros((1, self._act_dim))
        nets = {
            "actor": self.actor.init(k_a, obs),
            "critic": self.critic.init(k_c, obs, act),
        }
        targets = jax.tree_util.tree_map(jnp.copy, nets)
        opts = {
            "actor": self.tx_actor.init(nets["actor"]),
            "critic": self.tx_critic.init(nets["critic"]),
        }
        return nets, targets, opts

    def _act(self, nets, obs, key, deterministic):
        a = self.actor.apply(nets["actor"], obs)
        if deterministic:
            return a
        noise = jax.random.normal(key, a.shape) * self.cfg.exploration_noise * self.bound
        return jnp.clip(a + noise, -self.bound, self.bound)

    def _update(self, nets, targets, opts, batch: Transition, learn_step, key):
        cfg = self.cfg

        def critic_loss(cp):
            q = self.critic.apply(cp, batch.obs, batch.action)
            next_a = self.actor.apply(targets["actor"], batch.next_obs)
            next_q = self.critic.apply(targets["critic"], batch.next_obs, next_a)
            target = batch.reward + cfg.gamma * next_q * (1.0 - batch.done)
            return jnp.mean(jnp.square(q - jax.lax.stop_gradient(target)))

        c_loss, c_grads = jax.value_and_grad(critic_loss)(nets["critic"])
        c_updates, opt_c = self.tx_critic.update(c_grads, opts["critic"], nets["critic"])
        critic_params = optax.apply_updates(nets["critic"], c_updates)

        def actor_loss(ap):
            a = self.actor.apply(ap, batch.obs)
            return -jnp.mean(self.critic.apply(critic_params, batch.obs, a))

        a_loss, a_grads = jax.value_and_grad(actor_loss)(nets["actor"])
        a_updates, opt_a = self.tx_actor.update(a_grads, opts["actor"], nets["actor"])
        actor_params = optax.apply_updates(nets["actor"], a_updates)

        nets = {"actor": actor_params, "critic": critic_params}
        targets = {
            "actor": soft_update(targets["actor"], actor_params, cfg.tau),
            "critic": soft_update(targets["critic"], critic_params, cfg.tau),
        }
        opts = {"actor": opt_a, "critic": opt_c}
        return nets, targets, opts, {"actor_loss": a_loss, "critic_loss": c_loss}

    def _zero_metrics(self):
        return {"actor_loss": jnp.zeros(()), "critic_loss": jnp.zeros(())}


# -- TD3 ----------------------------------------------------------------------

class TD3Trainer(OffPolicyContinuousTrainer):
    def __init__(self, cfg: OffPolicyConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self._act_dim = self.venv.env.act_dim
        self.bound = self.venv.env.action_bound
        self.actor = DeterministicActor(self._act_dim, self.bound, cfg.hidden_dim)
        self.critic = TwinQCritic(cfg.hidden_dim)
        self.tx_actor = optax.adam(cfg.lr_actor)
        self.tx_critic = optax.adam(cfg.lr_critic)

    _make_nets = DDPGTrainer._make_nets
    _act = DDPGTrainer._act

    def _update(self, nets, targets, opts, batch: Transition, learn_step, key):
        cfg = self.cfg

        def critic_loss(cp):
            q1, q2 = self.critic.apply(cp, batch.obs, batch.action)
            # target policy smoothing (td3_pendulum.py:194-200)
            noise = jnp.clip(
                jax.random.normal(key, batch.action.shape) * cfg.policy_noise,
                -cfg.noise_clip, cfg.noise_clip,
            )
            next_a = jnp.clip(
                self.actor.apply(targets["actor"], batch.next_obs) + noise,
                -self.bound, self.bound,
            )
            tq1, tq2 = self.critic.apply(targets["critic"], batch.next_obs, next_a)
            target = batch.reward + cfg.gamma * jnp.minimum(tq1, tq2) * (1.0 - batch.done)
            target = jax.lax.stop_gradient(target)
            return jnp.mean(jnp.square(q1 - target)) + jnp.mean(jnp.square(q2 - target))

        c_loss, c_grads = jax.value_and_grad(critic_loss)(nets["critic"])
        c_updates, opt_c = self.tx_critic.update(c_grads, opts["critic"], nets["critic"])
        critic_params = optax.apply_updates(nets["critic"], c_updates)

        # delayed actor + target updates (td3_pendulum.py:216-224)
        do_policy = (learn_step % cfg.policy_freq) == 0

        def actor_loss(ap):
            a = self.actor.apply(ap, batch.obs)
            q1, _ = self.critic.apply(critic_params, batch.obs, a)
            return -jnp.mean(q1)

        # The reference leaves the actor optimizer UNTOUCHED between delayed
        # steps (td3_pendulum.py:216-224: optimizer.step() only inside the
        # policy_freq branch) — so both the params AND the Adam moments/count
        # advance only when do_policy; off-steps discard the whole update.
        a_loss, a_grads = jax.value_and_grad(actor_loss)(nets["actor"])
        a_updates, opt_a_new = self.tx_actor.update(a_grads, opts["actor"], nets["actor"])
        actor_params = jax.tree_util.tree_map(
            lambda p, u: jnp.where(do_policy, p + u, p), nets["actor"], a_updates
        )
        opt_a = jax.tree_util.tree_map(
            lambda new, old: jnp.where(do_policy, new, old), opt_a_new, opts["actor"]
        )

        tau_eff = jnp.where(do_policy, cfg.tau, 0.0)
        targets = {
            "actor": jax.tree_util.tree_map(
                lambda t, o: (1.0 - tau_eff) * t + tau_eff * o, targets["actor"], actor_params
            ),
            "critic": jax.tree_util.tree_map(
                lambda t, o: (1.0 - tau_eff) * t + tau_eff * o, targets["critic"], critic_params
            ),
        }
        nets = {"actor": actor_params, "critic": critic_params}
        opts = {"actor": opt_a, "critic": opt_c}
        return nets, targets, opts, {"actor_loss": a_loss, "critic_loss": c_loss}

    def _zero_metrics(self):
        return {"actor_loss": jnp.zeros(()), "critic_loss": jnp.zeros(())}


# -- SAC (continuous) ---------------------------------------------------------

class SACTrainer(OffPolicyContinuousTrainer):
    def __init__(self, cfg: OffPolicyConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self._act_dim = self.venv.env.act_dim
        self.bound = self.venv.env.action_bound
        self.actor = SquashedGaussianActor(self._act_dim, self.bound, cfg.hidden_dim)
        self.critic = TwinQCritic(cfg.hidden_dim)
        self.tx_actor = optax.adam(cfg.lr_actor)
        self.tx_critic = optax.adam(cfg.lr_critic)
        self.tx_alpha = optax.adam(cfg.lr_alpha)
        self.target_entropy = (
            cfg.target_entropy if cfg.target_entropy is not None else -float(self._act_dim)
        )

    def _make_nets(self, key, obs_dim):
        k_a, k_c = jax.random.split(key)
        obs = jnp.zeros((1, obs_dim))
        act = jnp.zeros((1, self._act_dim))
        nets = {
            "actor": self.actor.init(k_a, obs),
            "critic": self.critic.init(k_c, obs, act),
            "log_alpha": jnp.asarray(np.log(self.cfg.init_alpha), jnp.float32),
        }
        targets = {"critic": jax.tree_util.tree_map(jnp.copy, nets["critic"])}
        opts = {
            "actor": self.tx_actor.init(nets["actor"]),
            "critic": self.tx_critic.init(nets["critic"]),
            "log_alpha": self.tx_alpha.init(nets["log_alpha"]),
        }
        return nets, targets, opts

    def _act(self, nets, obs, key, deterministic):
        mean, log_std = self.actor.apply(nets["actor"], obs)
        if deterministic:
            return jnp.tanh(mean) * self.bound
        a, _ = squashed_sample(mean, log_std, self.bound, key)
        return a

    def _update(self, nets, targets, opts, batch: Transition, learn_step, key):
        cfg = self.cfg
        k_next, k_new = jax.random.split(key)
        alpha = jnp.exp(nets["log_alpha"])

        def critic_loss(cp):
            mean, log_std = self.actor.apply(nets["actor"], batch.next_obs)
            next_a, next_logp = squashed_sample(mean, log_std, self.bound, k_next)
            tq1, tq2 = self.critic.apply(targets["critic"], batch.next_obs, next_a)
            target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
            target = batch.reward + cfg.gamma * (1.0 - batch.done) * target_v
            target = jax.lax.stop_gradient(target)
            q1, q2 = self.critic.apply(cp, batch.obs, batch.action)
            return jnp.mean(jnp.square(q1 - target)) + jnp.mean(jnp.square(q2 - target))

        c_loss, c_grads = jax.value_and_grad(critic_loss)(nets["critic"])
        c_updates, opt_c = self.tx_critic.update(c_grads, opts["critic"], nets["critic"])
        critic_params = optax.apply_updates(nets["critic"], c_updates)

        def actor_loss(ap):
            mean, log_std = self.actor.apply(ap, batch.obs)
            a, logp = squashed_sample(mean, log_std, self.bound, k_new)
            q1, q2 = self.critic.apply(critic_params, batch.obs, a)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (a_loss, logp), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(nets["actor"])
        a_updates, opt_a = self.tx_actor.update(a_grads, opts["actor"], nets["actor"])
        actor_params = optax.apply_updates(nets["actor"], a_updates)

        # auto-α: loss = −logα·(logπ + H̄).detach() (sac_pendulum.py:257-259)
        def alpha_loss(log_alpha):
            return -jnp.mean(log_alpha * jax.lax.stop_gradient(logp + self.target_entropy))

        al_loss, al_grad = jax.value_and_grad(alpha_loss)(nets["log_alpha"])
        al_update, opt_al = self.tx_alpha.update(al_grad, opts["log_alpha"], nets["log_alpha"])
        log_alpha = optax.apply_updates(nets["log_alpha"], al_update)

        nets = {"actor": actor_params, "critic": critic_params, "log_alpha": log_alpha}
        targets = {"critic": soft_update(targets["critic"], critic_params, cfg.tau)}
        opts = {"actor": opt_a, "critic": opt_c, "log_alpha": opt_al}
        return nets, targets, opts, {
            "actor_loss": a_loss, "critic_loss": c_loss,
            "alpha_loss": al_loss, "alpha": jnp.exp(log_alpha),
        }

    def _zero_metrics(self):
        return {
            "actor_loss": jnp.zeros(()), "critic_loss": jnp.zeros(()),
            "alpha_loss": jnp.zeros(()), "alpha": jnp.zeros(()),
        }


# -- SAC (discrete) -----------------------------------------------------------

class DiscreteSACTrainer(OffPolicyContinuousTrainer):
    """sac_cartpole.py: expectation-form targets, two separate critics."""

    def __init__(self, cfg: OffPolicyConfig, mesh=None):
        super().__init__(cfg, mesh)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self._act_dim = None  # discrete
        self.n_actions = self.venv.env.n_actions
        self.actor = SoftmaxActor(self.n_actions, cfg.hidden_dim)
        self.critic = PerActionQ(self.n_actions, cfg.hidden_dim)
        self.tx_actor = optax.adam(cfg.lr_actor)
        self.tx_critic = optax.adam(cfg.lr_critic)
        self.tx_alpha = optax.adam(cfg.lr_alpha)
        self.target_entropy = (
            cfg.target_entropy if cfg.target_entropy is not None else -1.0
        )

    def _make_nets(self, key, obs_dim):
        k_a, k_1, k_2 = jax.random.split(key, 3)
        obs = jnp.zeros((1, obs_dim))
        nets = {
            "actor": self.actor.init(k_a, obs),
            "critic1": self.critic.init(k_1, obs),
            "critic2": self.critic.init(k_2, obs),
            "log_alpha": jnp.asarray(np.log(self.cfg.init_alpha), jnp.float32),
        }
        targets = {
            "critic1": jax.tree_util.tree_map(jnp.copy, nets["critic1"]),
            "critic2": jax.tree_util.tree_map(jnp.copy, nets["critic2"]),
        }
        opts = {
            "actor": self.tx_actor.init(nets["actor"]),
            "critic1": self.tx_critic.init(nets["critic1"]),
            "critic2": self.tx_critic.init(nets["critic2"]),
            "log_alpha": self.tx_alpha.init(nets["log_alpha"]),
        }
        return nets, targets, opts

    def _act(self, nets, obs, key, deterministic):
        probs = self.actor.apply(nets["actor"], obs)
        if deterministic:
            return jnp.argmax(probs, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, jnp.log(probs + 1e-8)).astype(jnp.int32)

    def _update(self, nets, targets, opts, batch: Transition, learn_step, key):
        cfg = self.cfg
        alpha = jnp.exp(nets["log_alpha"])

        # expectation-form target (sac_cartpole.py:172-183)
        next_probs = self.actor.apply(nets["actor"], batch.next_obs)
        next_logp = jnp.log(next_probs + 1e-8)
        next_h = -jnp.sum(next_probs * next_logp, axis=-1)
        tq1 = self.critic.apply(targets["critic1"], batch.next_obs)
        tq2 = self.critic.apply(targets["critic2"], batch.next_obs)
        min_next_q = jnp.sum(next_probs * jnp.minimum(tq1, tq2), axis=-1)
        target = batch.reward + cfg.gamma * (1.0 - batch.done) * (
            min_next_q + alpha * next_h
        )
        target = jax.lax.stop_gradient(target)

        def c_loss_fn(cp):
            q = jnp.take_along_axis(
                self.critic.apply(cp, batch.obs), batch.action[:, None], axis=-1
            ).squeeze(-1)
            return jnp.mean(jnp.square(q - target))

        c1_loss, g1 = jax.value_and_grad(c_loss_fn)(nets["critic1"])
        u1, opt_c1 = self.tx_critic.update(g1, opts["critic1"], nets["critic1"])
        critic1 = optax.apply_updates(nets["critic1"], u1)
        c2_loss, g2 = jax.value_and_grad(c_loss_fn)(nets["critic2"])
        u2, opt_c2 = self.tx_critic.update(g2, opts["critic2"], nets["critic2"])
        critic2 = optax.apply_updates(nets["critic2"], u2)

        def actor_loss(ap):
            probs = self.actor.apply(ap, batch.obs)
            logp = jnp.log(probs + 1e-8)
            h = -jnp.sum(probs * logp, axis=-1)
            q1 = self.critic.apply(critic1, batch.obs)
            q2 = self.critic.apply(critic2, batch.obs)
            min_q = jnp.sum(probs * jnp.minimum(q1, q2), axis=-1)
            return jnp.mean(-alpha * h - min_q), h

        (a_loss, entropy), a_grads = jax.value_and_grad(actor_loss, has_aux=True)(
            nets["actor"]
        )
        ua, opt_a = self.tx_actor.update(a_grads, opts["actor"], nets["actor"])
        actor_params = optax.apply_updates(nets["actor"], ua)

        # α-loss sign convention: mean(α·(H − H̄).detach()) (sac_cartpole.py:211-213)
        def alpha_loss(log_alpha):
            return jnp.mean(
                jnp.exp(log_alpha) * jax.lax.stop_gradient(entropy - self.target_entropy)
            )

        al_loss, al_grad = jax.value_and_grad(alpha_loss)(nets["log_alpha"])
        al_update, opt_al = self.tx_alpha.update(al_grad, opts["log_alpha"], nets["log_alpha"])
        log_alpha = optax.apply_updates(nets["log_alpha"], al_update)

        nets = {
            "actor": actor_params, "critic1": critic1, "critic2": critic2,
            "log_alpha": log_alpha,
        }
        targets = {
            "critic1": soft_update(targets["critic1"], critic1, cfg.tau),
            "critic2": soft_update(targets["critic2"], critic2, cfg.tau),
        }
        opts = {"actor": opt_a, "critic1": opt_c1, "critic2": opt_c2, "log_alpha": opt_al}
        return nets, targets, opts, {
            "actor_loss": a_loss, "critic_loss": c1_loss + c2_loss,
            "alpha_loss": al_loss, "alpha": jnp.exp(log_alpha),
        }

    def _zero_metrics(self):
        return {
            "actor_loss": jnp.zeros(()), "critic_loss": jnp.zeros(()),
            "alpha_loss": jnp.zeros(()), "alpha": jnp.zeros(()),
        }


# -- presets ------------------------------------------------------------------

def ddpg_config(**kw) -> OffPolicyConfig:
    base = dict(env_name="Pendulum-v1", batch_size=128, lr_actor=1e-3, lr_critic=1e-3)
    base.update(kw)
    return OffPolicyConfig(**base)


def td3_config(**kw) -> OffPolicyConfig:
    return ddpg_config(**kw)


def sac_config(**kw) -> OffPolicyConfig:
    base = dict(
        env_name="Pendulum-v1", batch_size=128,
        lr_actor=3e-4, lr_critic=3e-4, lr_alpha=3e-4, init_alpha=0.2,
    )
    base.update(kw)
    return OffPolicyConfig(**base)


def sac_discrete_config(**kw) -> OffPolicyConfig:
    base = dict(
        env_name="CartPole-v1", batch_size=64, memory_capacity=10_000,
        lr_actor=1e-3, lr_critic=1e-3, lr_alpha=1e-3, init_alpha=0.01,
        target_entropy=-1.0, solve_threshold=495.0,
    )
    base.update(kw)
    return OffPolicyConfig(**base)
