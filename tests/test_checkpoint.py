"""Checkpoint/resume tests: full-state roundtrip + reference-layout restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from brax_tracking_tpu.agents.ppo import losses as ppo_losses
from brax_tracking_tpu.agents.ppo import networks as ppo_networks
from brax_tracking_tpu.agents.ppo.train import TrainingState
from brax_tracking_tpu.training import checkpoint, running_statistics


def _make_state(seed=0):
    net = ppo_networks.make_ppo_networks(6, 3)
    params = ppo_losses.PPONetworkParams(
        policy=net.policy_network.init(jax.random.PRNGKey(seed)),
        value=net.value_network.init(jax.random.PRNGKey(seed + 1)),
    )
    opt = optax.adam(1e-3)
    return TrainingState(
        optimizer_state=opt.init(params),
        params=params,
        normalizer_params=running_statistics.init_state(jnp.zeros((6,))),
        env_steps=jnp.asarray(12345),
    )


def test_full_state_roundtrip(tmp_path):
    state = _make_state()
    path = os.path.join(tmp_path, "ckpt", "100")
    checkpoint.save_checkpoint(path, state)
    restored = checkpoint.restore_checkpoint(path, _make_state(seed=7))
    # every leaf identical, including optimizer moments and env_steps
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.env_steps) == 12345


def test_latest_checkpoint_selection(tmp_path):
    root = str(tmp_path)
    for step in (100, 900, 5000):
        checkpoint.save_checkpoint(os.path.join(root, str(step)), {"x": jnp.ones(3)})
    assert checkpoint.latest_checkpoint(root).endswith("5000")
    assert checkpoint.latest_checkpoint(os.path.join(root, "missing")) is None


def test_param_pickle_io(tmp_path):
    state = _make_state()
    path = os.path.join(tmp_path, "params.pkl")
    params = (state.normalizer_params, state.params.policy)
    checkpoint.save_params(path, params)
    loaded = checkpoint.load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
