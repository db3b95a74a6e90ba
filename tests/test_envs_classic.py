"""Engine-vs-gymnasium oracle tests for the classic-control environments.

Method: reset the gymnasium env, copy its internal state into the JAX
engine's state pytree, drive both with the same action sequence, and
compare observations / rewards / termination step-by-step.
"""

import gymnasium as gym
import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.envs import registry
from gymrl_tpu.envs.cartpole import CartPoleState
from gymrl_tpu.envs.cliffwalking import CliffWalkingState
from gymrl_tpu.envs.frozenlake import FrozenLakeState
from gymrl_tpu.envs.mountaincar import MountainCarState
from gymrl_tpu.envs.pendulum import PendulumState


def _drive(env, params, state, actions, key):
    """Step the JAX engine over an action sequence, returning per-step records."""
    out = []
    for a in actions:
        key, k = jax.random.split(key)
        sr = env.step(params, state, jnp.asarray(a), k)
        state = sr.state
        out.append((np.asarray(sr.obs), float(sr.reward), bool(sr.terminated), bool(sr.truncated)))
        if out[-1][2] or out[-1][3]:
            break
    return out


def test_cartpole_matches_gymnasium():
    genv = gym.make("CartPole-v1").unwrapped
    genv.reset(seed=0)
    env = registry.make("CartPole-v1")
    params = env.default_params()
    rng = np.random.default_rng(1)

    for trial in range(5):
        genv.reset(seed=trial)
        s = np.asarray(genv.state, np.float32)
        state = CartPoleState(*[jnp.asarray(v) for v in s], jnp.zeros((), jnp.int32))
        actions = rng.integers(0, 2, size=200)
        ours = _drive(env, params, state, actions, jax.random.PRNGKey(0))
        for i, a in enumerate(actions):
            gobs, gr, gterm, gtrunc, _ = genv.step(int(a))
            obs, r, term, trunc = ours[i]
            np.testing.assert_allclose(obs, gobs, rtol=1e-5, atol=1e-6)
            assert r == gr and term == gterm
            if gterm:
                break


def test_pendulum_matches_gymnasium():
    genv = gym.make("Pendulum-v1").unwrapped
    env = registry.make("Pendulum-v1")
    params = env.default_params()
    rng = np.random.default_rng(2)

    for trial in range(3):
        genv.reset(seed=trial)
        th, thdot = genv.state
        state = PendulumState(jnp.asarray(th, jnp.float32), jnp.asarray(thdot, jnp.float32),
                              jnp.zeros((), jnp.int32))
        actions = rng.uniform(-2, 2, size=(50, 1)).astype(np.float32)
        ours = _drive(env, params, state, actions, jax.random.PRNGKey(0))
        for i, a in enumerate(actions):
            gobs, gr, gterm, gtrunc, _ = genv.step(a)
            obs, r, term, trunc = ours[i]
            np.testing.assert_allclose(obs, gobs, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(r, gr, rtol=1e-4, atol=1e-5)


def test_mountaincar_matches_gymnasium():
    genv = gym.make("MountainCar-v0").unwrapped
    env = registry.make("MountainCar-v0")
    params = env.default_params()
    rng = np.random.default_rng(3)

    genv.reset(seed=0)
    pos, vel = genv.state
    state = MountainCarState(jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
                             jnp.zeros((), jnp.int32))
    actions = rng.integers(0, 3, size=150)
    ours = _drive(env, params, state, actions, jax.random.PRNGKey(0))
    for i, a in enumerate(actions):
        gobs, gr, gterm, _, _ = genv.step(int(a))
        obs, r, term, trunc = ours[i]
        np.testing.assert_allclose(obs, gobs, rtol=1e-5, atol=1e-6)
        assert r == gr and term == gterm
        if gterm:
            break


def test_frozenlake_deterministic_matches_gymnasium():
    genv = gym.make("FrozenLake-v1", is_slippery=False).unwrapped
    env = registry.make("FrozenLake-v1", is_slippery=False)
    params = env.default_params()
    genv.reset(seed=0)
    state = FrozenLakeState(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    # A path to the goal on the 4x4 map: DDRRDR (gym order 1=DOWN, 2=RIGHT)
    for a in [1, 1, 2, 2, 1, 2]:
        gobs, gr, gterm, _, _ = genv.step(a)
        sr = env.step(params, state, jnp.asarray(a), jax.random.PRNGKey(0))
        state = sr.state
        assert int(sr.obs) == int(gobs)
        assert float(sr.reward) == gr
        assert bool(sr.terminated) == gterm
    assert gterm and gr == 1.0


def test_frozenlake_slippery_distribution():
    """Slippery moves: intended or one of the two perpendicular, 1/3 each."""
    env = registry.make("FrozenLake-v1", is_slippery=True)
    params = env.default_params()
    state = FrozenLakeState(jnp.asarray(5, jnp.int32), jnp.zeros((), jnp.int32))  # interior-ish cell

    step = jax.jit(lambda k: env.step(params, state, jnp.asarray(2, jnp.int32), k).state.pos)
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    cells = np.asarray(jax.vmap(step)(keys))
    # from cell 5 (row1,col1) action RIGHT(2) slips to {DOWN(1)→9, RIGHT→6, UP(3)→1}
    values, counts = np.unique(cells, return_counts=True)
    assert set(values) == {1, 6, 9}
    assert np.all(np.abs(counts / 3000 - 1 / 3) < 0.05)


def test_cliffwalking_matches_gymnasium():
    # gymnasium 1.2 renamed v0→v1 (identical non-slippery dynamics)
    genv = gym.make("CliffWalking-v1").unwrapped
    env = registry.make("CliffWalking-v0")
    params = env.default_params()
    genv.reset(seed=0)
    state = CliffWalkingState(jnp.asarray(36, jnp.int32), jnp.zeros((), jnp.int32))

    rng = np.random.default_rng(4)
    # random walk, then a guaranteed goal path: to top row, right wall, down
    actions = list(rng.integers(0, 4, size=60)) + [0, 0, 0] + [1] * 11 + [2, 2, 2]
    for a in actions:
        gobs, gr, gterm, _, _ = genv.step(int(a))
        sr = env.step(params, state, jnp.asarray(a), jax.random.PRNGKey(0))
        state = sr.state
        assert int(sr.obs) == int(gobs), f"action {a}"
        assert float(sr.reward) == gr
        assert bool(sr.terminated) == gterm
        if gterm:
            break
    assert gterm  # the tail of the action list walks start→goal


def test_vec_autoreset_cartpole():
    """Vectorized autoreset: done instances restart, episode stats are emitted."""
    venv = registry.make_vec("CartPole-v1", num_envs=8)
    vstate = venv.reset(jax.random.PRNGKey(0))

    @jax.jit
    def roll(vstate, key):
        def body(carry, k):
            vs = carry
            # random policy
            a = jax.random.randint(k, (8,), 0, 2)
            vs, tr = venv.step(vs, a, k)
            return vs, tr

        keys = jax.random.split(key, 300)
        return jax.lax.scan(body, vstate, keys)

    vstate, trs = roll(vstate, jax.random.PRNGKey(1))
    done = np.asarray(trs.done)
    assert done.any(), "random CartPole episodes must end within 300 steps"
    finals = np.asarray(trs.final_return)[done]
    lengths = np.asarray(trs.final_length)[done]
    assert np.all(finals == lengths)  # CartPole reward == steps survived
    assert np.all(lengths >= 1)
    # after a done, the carried obs must be a fresh-reset obs (inside ±0.05 box)
    t, b = np.argwhere(done)[0]
    obs_after = np.asarray(trs.obs)[t + 1, b] if t + 1 < 300 else None
    if obs_after is not None:
        assert np.all(np.abs(obs_after) <= 0.05 + 1e-6)
