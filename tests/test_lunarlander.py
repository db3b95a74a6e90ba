"""Pure-JAX LunarLander vs. gymnasium Box2D oracle.

Free-flight dynamics (gravity + engine impulses, no ground contact) are
compared step-by-step against the real Box2D env with dispersion noise
zeroed on both sides. Contact/landing behavior differs by design through
the leg-suspension approximation (see engine docstring), so touchdown is
tested semantically (crash => -100, rest => +100, leg flags) rather than
trajectory-exact.
"""

import gymnasium as gym
import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.envs.lunarlander import (
    CHUNKS,
    HELIPAD_Y,
    LunarLander,
    LunarLanderState,
)


class _ZeroDispersion:
    """np_random stub: dispersion uniforms → 0, everything else unused."""

    def uniform(self, low, high, size=None):
        if size is None:
            return 0.0
        return np.zeros(size)

    def integers(self, *a, **k):
        return 0


def _copy_state(genv, env):
    """Lift gymnasium's Box2D state into the JAX engine's state pytree."""
    lander = genv.lander
    return LunarLanderState(
        pos=jnp.asarray([lander.position.x, lander.position.y], jnp.float32),
        vel=jnp.asarray([lander.linearVelocity.x, lander.linearVelocity.y], jnp.float32),
        angle=jnp.asarray(lander.angle, jnp.float32),
        omega=jnp.asarray(lander.angularVelocity, jnp.float32),
        terrain=jnp.full((CHUNKS,), HELIPAD_Y, jnp.float32),  # irrelevant while airborne
        prev_shaping=jnp.asarray(genv.prev_shaping, jnp.float32),
        sleep_time=jnp.zeros(()),
        wind_idx=jnp.zeros((), jnp.int32),
        torque_idx=jnp.zeros((), jnp.int32),
        leg_contact=jnp.zeros((2,), bool),
        t=jnp.zeros((), jnp.int32),
    )


def _make_pair(seed):
    genv = gym.make("LunarLander-v3").unwrapped
    genv.reset(seed=seed)
    genv._np_random = _ZeroDispersion()
    env = LunarLander()
    params = env.default_params()._replace(dispersion_scale=jnp.asarray(0.0))
    state = _copy_state(genv, env)
    return genv, env, params, state


def _compare_rollout(seed, actions, pos_atol, vel_atol, rew_atol):
    genv, env, params, state = _make_pair(seed)
    key = jax.random.PRNGKey(0)
    for i, a in enumerate(actions):
        gobs, grew, gterm, _, _ = genv.step(a)
        key, k = jax.random.split(key)
        sr = env.step(params, state, jnp.asarray(a), k)
        state = sr.state
        obs = np.asarray(sr.obs)
        if gterm or bool(sr.terminated):
            break
        np.testing.assert_allclose(obs[:2], gobs[:2], atol=pos_atol,
                                   err_msg=f"pos mismatch at step {i} action {a}")
        np.testing.assert_allclose(obs[2:4], gobs[2:4], atol=vel_atol,
                                   err_msg=f"vel mismatch at step {i}")
        np.testing.assert_allclose(obs[4], gobs[4], atol=pos_atol,
                                   err_msg=f"angle mismatch at step {i}")
        np.testing.assert_allclose(obs[5], gobs[5], atol=vel_atol,
                                   err_msg=f"omega mismatch at step {i}")
        np.testing.assert_allclose(float(sr.reward), grew, atol=rew_atol,
                                   err_msg=f"reward mismatch at step {i}")


def test_free_fall_matches_box2d():
    _compare_rollout(seed=0, actions=[0] * 25, pos_atol=0.01, vel_atol=0.02, rew_atol=1.5)


def test_main_engine_matches_box2d():
    _compare_rollout(seed=1, actions=[2] * 20, pos_atol=0.03, vel_atol=0.05, rew_atol=2.0)


def test_side_engines_match_box2d():
    _compare_rollout(seed=2, actions=[1, 3] * 8, pos_atol=0.03, vel_atol=0.05, rew_atol=2.0)


def test_mixed_control_matches_box2d():
    rng = np.random.default_rng(5)
    actions = list(rng.integers(0, 4, size=30))
    _compare_rollout(seed=3, actions=actions, pos_atol=0.05, vel_atol=0.08, rew_atol=2.5)


def test_reset_obs_distribution():
    """Reset obs: centered x, y near top, velocity from the ±1000 N impulse."""
    env = LunarLander()
    params = env.default_params()
    reset = jax.jit(lambda k: env.reset(params, k)[1])
    obs = np.stack([np.asarray(reset(jax.random.PRNGKey(i))) for i in range(64)])
    assert np.all(np.abs(obs[:, 0]) < 0.12)  # x near center (after 1 step of drift)
    assert np.all(obs[:, 1] > 1.0)  # near top of viewport
    assert np.all(np.abs(obs[:, 2]) < 1.2)  # vx bounded by impulse magnitude
    assert obs[:, 2].std() > 0.15  # ... but actually randomized
    assert np.all(obs[:, 6:8] == 0.0)  # airborne

    # gymnasium reference reset distribution for the same stats
    genv = gym.make("LunarLander-v3").unwrapped
    gobs = np.stack([genv.reset(seed=i)[0] for i in range(64)])
    assert abs(obs[:, 2].std() - gobs[:, 2].std()) < 0.12
    # means of 64 draws from the ±1000 N impulse are noisy; compare loosely
    assert abs(obs[:, 3].mean() - gobs[:, 3].mean()) < 0.15


def test_landing_rest_gives_plus_100():
    """A lander placed just above the pad with no velocity settles => +100."""
    env = LunarLander()
    params = env.default_params()
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    # Teleport: hovering at the pad, legs ~touching, zero motion.
    state = state._replace(
        pos=jnp.asarray([10.0, HELIPAD_Y * 0.99 + 0.56], jnp.float32),
        vel=jnp.zeros(2),
        angle=jnp.zeros(()),
        omega=jnp.zeros(()),
        terrain=jnp.full((CHUNKS,), HELIPAD_Y * 0.99, jnp.float32),
        sleep_time=jnp.zeros(()),
    )
    key = jax.random.PRNGKey(1)
    step = jax.jit(env.step)
    for i in range(120):
        key, k = jax.random.split(key)
        sr = step(params, state, jnp.asarray(0), k)
        state = sr.state
        if bool(sr.terminated):
            assert float(sr.reward) == 100.0, f"terminated with {float(sr.reward)} at {i}"
            assert np.all(np.asarray(state.leg_contact))
            return
    raise AssertionError("lander never settled to sleep")


def test_crash_gives_minus_100():
    """Slamming the hull into the ground terminates with -100."""
    env = LunarLander()
    params = env.default_params()
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    state = state._replace(
        pos=jnp.asarray([10.0, HELIPAD_Y + 0.4], jnp.float32),
        vel=jnp.asarray([0.0, -20.0], jnp.float32),  # way beyond survivable
        angle=jnp.asarray(1.2, jnp.float32),  # tilted: hull corner hits first
        terrain=jnp.full((CHUNKS,), HELIPAD_Y, jnp.float32),
    )
    sr = env.step(params, state, jnp.asarray(0), jax.random.PRNGKey(1))
    assert bool(sr.terminated)
    assert float(sr.reward) == -100.0


def test_out_of_bounds_terminates():
    env = LunarLander()
    params = env.default_params()
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    state = state._replace(
        pos=jnp.asarray([19.99, 10.0], jnp.float32),
        vel=jnp.asarray([3.0, 0.0], jnp.float32),  # drifting out of bounds
    )
    sr = env.step(params, state, jnp.asarray(0), jax.random.PRNGKey(1))
    assert bool(sr.terminated)
    assert float(sr.reward) == -100.0


def test_continuous_action_mapping():
    """Continuous throttle: main in [0.5,1], side fires only beyond ±0.5."""
    genv = gym.make("LunarLander-v3", continuous=True).unwrapped
    genv.reset(seed=7)
    genv._np_random = _ZeroDispersion()
    env = LunarLander(continuous=True)
    params = env.default_params()._replace(dispersion_scale=jnp.asarray(0.0))
    state = _copy_state(genv, env)
    key = jax.random.PRNGKey(0)
    actions = [np.array([1.0, 0.0]), np.array([0.3, 0.8]), np.array([-1.0, -0.7]),
               np.array([0.8, 0.2])]
    for i, a in enumerate(actions):
        gobs, grew, gterm, _, _ = genv.step(a.astype(np.float32))
        key, k = jax.random.split(key)
        sr = env.step(params, state, jnp.asarray(a, jnp.float32), k)
        state = sr.state
        np.testing.assert_allclose(np.asarray(sr.obs)[2:4], gobs[2:4], atol=0.05,
                                   err_msg=f"continuous vel mismatch at step {i}")


def test_wind_turbulence_matches_box2d():
    """v3 wind/turbulence oracle (engine claims exactness in its docstring):
    wind-enabled free flight must track gymnasium step-by-step, including
    the tanh(sin(0.02k)+sin(0.01πk)) pseudo-noise and the index walk."""
    genv = gym.make("LunarLander-v3", enable_wind=True, wind_power=15.0,
                    turbulence_power=1.5).unwrapped
    # seed 21 was NOT in the fit set for WIND_INERTIA/WIND_TORQUE_LEVER
    genv.reset(seed=21)
    wind_idx = int(genv.wind_idx)
    torque_idx = int(genv.torque_idx)
    genv._np_random = _ZeroDispersion()

    env = LunarLander(enable_wind=True)
    params = env.default_params()._replace(dispersion_scale=jnp.asarray(0.0))
    state = _copy_state(genv, env)._replace(
        wind_idx=jnp.asarray(wind_idx, jnp.int32),
        torque_idx=jnp.asarray(torque_idx, jnp.int32),
    )
    key = jax.random.PRNGKey(0)
    for i in range(25):
        gobs, grew, gterm, _, _ = genv.step(0)
        key, k = jax.random.split(key)
        sr = env.step(params, state, jnp.asarray(0), k)
        state = sr.state
        obs = np.asarray(sr.obs)
        if gterm or bool(sr.terminated):
            break
        np.testing.assert_allclose(obs[:2], gobs[:2], atol=0.015,
                                   err_msg=f"wind pos mismatch at step {i}")
        np.testing.assert_allclose(obs[2:4], gobs[2:4], atol=0.03,
                                   err_msg=f"wind vel mismatch at step {i}")
        np.testing.assert_allclose(obs[4], gobs[4], atol=0.02,
                                   err_msg=f"wind angle mismatch at step {i}")
        np.testing.assert_allclose(obs[5], gobs[5], atol=0.04,
                                   err_msg=f"wind omega mismatch at step {i}")
        # index walk advanced in lockstep
        assert int(state.wind_idx) == int(genv.wind_idx)
        assert int(state.torque_idx) == int(genv.torque_idx)


def _heuristic_action_jnp(s):
    """gymnasium's discrete heuristic controller (lunar_lander.py:794-846)."""
    angle_targ = jnp.clip(s[0] * 0.5 + s[2] * 1.0, -0.4, 0.4)
    hover_targ = 0.55 * jnp.abs(s[0])
    angle_todo = (angle_targ - s[4]) * 0.5 - s[5] * 1.0
    hover_todo = (hover_targ - s[1]) * 0.5 - s[3] * 0.5
    contact = (s[6] > 0) | (s[7] > 0)
    angle_todo = jnp.where(contact, 0.0, angle_todo)
    hover_todo = jnp.where(contact, -s[3] * 0.5, hover_todo)
    a = jnp.where(
        (hover_todo > jnp.abs(angle_todo)) & (hover_todo > 0.05), 2,
        jnp.where(angle_todo < -0.05, 3, jnp.where(angle_todo > 0.05, 1, 0)),
    )
    return a.astype(jnp.int32)


def test_touchdown_statistics_match_gymnasium():
    """Statistical touchdown parity (leg suspension is the one documented
    approximation): gymnasium's own heuristic controller flies N episodes on
    both engines; success rate (+100 landings) and mean final return must
    agree within seed-noise tolerances."""
    from gymnasium.envs.box2d.lunar_lander import heuristic

    N = 48
    genv = gym.make("LunarLander-v3").unwrapped
    g_rewards, g_success = [], 0
    for seed in range(N):
        s, _ = genv.reset(seed=seed)
        total, last_r = 0.0, 0.0
        for _ in range(1000):
            s, r, term, trunc, _ = genv.step(heuristic(genv, s))
            total += r
            last_r = r
            if term or trunc:
                break
        g_rewards.append(total)
        g_success += last_r == 100.0

    env = LunarLander()
    params = env.default_params()

    def episode(key):
        k_reset, k_roll = jax.random.split(key)
        state, obs = env.reset(params, k_reset)

        def body(carry, k):
            state, obs, done, total, last_r = carry
            a = _heuristic_action_jnp(obs)
            sr = env.step(params, state, a, k)
            alive = jnp.logical_not(done)
            total = total + sr.reward * alive
            last_r = jnp.where(alive & (sr.terminated | sr.truncated), sr.reward, last_r)
            done = done | sr.terminated | sr.truncated
            return (sr.state, sr.obs, done, total, last_r), None

        init = (state, obs, jnp.asarray(False), jnp.zeros(()), jnp.zeros(()))
        (_, _, _, total, last_r), _ = jax.lax.scan(
            body, init, jax.random.split(k_roll, 1000)
        )
        return total, last_r

    totals, lasts = jax.jit(jax.vmap(episode))(
        jax.random.split(jax.random.PRNGKey(123), N)
    )
    j_rewards = np.asarray(totals)
    j_success = int(np.sum(np.asarray(lasts) == 100.0))

    g_rate, j_rate = g_success / N, j_success / N
    assert abs(g_rate - j_rate) <= 0.25, (
        f"landing success rate diverged: gym {g_rate:.2f} vs jax {j_rate:.2f}"
    )
    assert abs(np.mean(g_rewards) - np.mean(j_rewards)) <= 60.0, (
        f"mean heuristic return diverged: gym {np.mean(g_rewards):.1f} "
        f"vs jax {np.mean(j_rewards):.1f}"
    )
