"""Shared tiny-PPO-run recipe for the multi-process test (not a pytest
module). Used by tests/_mp_worker.py (2-process cluster) and by
tests/test_multiprocess.py (1-process 8-device control run) so both runs
execute the identical training program."""

import jax
import numpy as np


def run_tiny_train(env):
    """One tiny PointMass PPO run on the default (global) mesh; returns the
    final params + eval metrics as host numpy."""
    from brax_tracking_tpu.agents.ppo import train as ppo_train

    eval_metrics = []
    make_policy, params, metrics = ppo_train.train(
        environment=env,
        num_timesteps=2048,
        episode_length=16,
        num_envs=16,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        discounting=0.95,
        unroll_length=8,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=2,
        num_evals=2,
        num_eval_envs=16,
        normalize_observations=True,
        seed=0,
        progress_fn=lambda step, m: eval_metrics.append((step, dict(m))),
    )
    normalizer, policy = params
    return {
        "normalizer": jax.device_get(normalizer),
        "policy": jax.tree.map(np.asarray, jax.device_get(policy)),
        "metrics": {k: float(v) for k, v in metrics.items()},
        "n_evals_ran": len(eval_metrics),
    }
