"""gymrl-tpu: a TPU-native reinforcement-learning framework.

A from-scratch JAX/XLA rebuild of the capability surface of the reference
repo Starlight0798/gymRL (see SURVEY.md): the full algorithm zoo (DQN family
through Rainbow, PPO with the full trick set incl. recurrent + RND variants,
PPG, DDPG/TD3/SAC, tabular Q-learning) running against pure-JAX vectorized
environment engines, with rollout, replay and SGD updates fused into single
jitted device programs and sharded over TPU meshes.

Design principles (what makes this TPU-native rather than a port):
  * Environments are pure functions `(params, state, action, key) -> step`,
    `vmap`-ed to thousands of lockstep instances inside `jit`.
  * Trainers are `(TrainState) -> (TrainState, metrics)` jitted steps that
    fuse rollout collection, advantage/target computation and minibatch SGD.
  * Time loops are `lax.scan`; there is no per-env-step host round trip.
  * Multi-device scaling is a `jax.sharding.Mesh` + NamedSharding over the
    environment batch axis; gradients reduce with XLA collectives.
"""

__version__ = "0.1.0"
