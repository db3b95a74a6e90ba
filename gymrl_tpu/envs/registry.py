"""Environment registry — the TPU-side `make_env` (ref utils/runner.py:52-78).

Instead of mutating a config, `make(name)` returns a stateless Env whose
metadata (obs_dim / n_actions / act_dim / action_bound / max_steps) the
trainers read directly; `make_vec(name, n)` bundles it with default params
into a vectorized auto-resetting engine.
"""

from __future__ import annotations

from gymrl_tpu.envs.base import Env
from gymrl_tpu.envs.rollout import VecEnv

_REGISTRY: dict[str, type[Env]] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def _populate():
    if _REGISTRY:
        return
    from gymrl_tpu.envs.cartpole import CartPole
    from gymrl_tpu.envs.pendulum import Pendulum
    from gymrl_tpu.envs.mountaincar import MountainCar
    from gymrl_tpu.envs.frozenlake import FrozenLake
    from gymrl_tpu.envs.cliffwalking import CliffWalking
    from gymrl_tpu.envs.lunarlander import LunarLander
    from gymrl_tpu.envs.flappybird import FlappyBird
    from gymrl_tpu.envs.pixels import CartPolePixels

    _REGISTRY.update(
        {
            "CartPolePixels-v0": CartPolePixels,
            "CartPole-v1": CartPole,
            "Pendulum-v1": Pendulum,
            "MountainCar-v0": MountainCar,
            "FrozenLake-v1": FrozenLake,
            "CliffWalking-v0": CliffWalking,
            "LunarLander-v2": LunarLander,
            "LunarLander-v3": LunarLander,
            "FlappyBird-v0": FlappyBird,
        }
    )


def make(name: str, **kwargs) -> Env:
    _populate()
    if name not in _REGISTRY:
        raise KeyError(f"Unknown env '{name}'. Known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def make_vec(name: str, num_envs: int, env_kwargs: dict | None = None) -> VecEnv:
    env = make(name, **(env_kwargs or {}))
    return VecEnv(env, env.default_params(), num_envs)
