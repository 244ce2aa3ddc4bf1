"""brax_tracking_tpu: a TPU-native motion-tracking RL framework.

A from-scratch rebuild of the capabilities of charles-zhng/Brax-Tracking
(reference mounted at /root/reference) designed TPU-first:

- ``physics``   — vectorized articulated-body engine (FK, CRB, RNE, contacts,
                  CG/Newton constraint solve) under jit/vmap with static shapes.
- ``math``      — quaternion / spatial algebra primitives.
- ``envs``      — tracking MDPs (fruitfly, rodent) + wrapper stack.
- ``data``      — reference-clip preprocessing and IO.
- ``agents.ppo``— on-device PPO actor-learner (rollout scan, GAE, minibatch SGD).
- ``parallel``  — jax.sharding Mesh / shard_map distribution (env-axis DP).
- ``ops``       — Pallas TPU kernels for the hot batched-step ops.
- ``harness``   — config composition, training driver, metrics, rendering.
"""

__version__ = "0.1.0"
