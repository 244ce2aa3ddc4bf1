"""Welford running mean/std of observations with cross-device reduction.

Re-provides the acme running_statistics capability the reference trainer
uses for observation normalization (/root/reference/custom_brax/
custom_ppo.py:18, init 398-400, update 322-327, normalize preprocessing
226-227). ``pmean_axis_name`` plays the role of the reference's pmap axis
"i": statistics increments are averaged across the mesh axis so every
shard holds identical normalizer state.

Works on arbitrary pytrees of arrays (the observation may be a dict).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStatisticsState:
    count: jax.Array  # scalar
    mean: Any  # pytree like the observation
    summed_variance: Any  # pytree like the observation
    std: Any  # pytree like the observation


def init_state(specimen: Any) -> RunningStatisticsState:
    """Init from a specimen pytree (zeros of the per-step shape/dtype)."""
    zeros = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), specimen)
    ones = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), specimen)
    dtype = jax.tree_util.tree_leaves(specimen)[0].dtype
    return RunningStatisticsState(
        count=jnp.zeros((), dtype), mean=zeros, summed_variance=zeros, std=ones
    )


def update(
    state: RunningStatisticsState,
    batch: Any,
    pmean_axis_name: Optional[str] = None,
    std_min_value: float = 1e-6,
    std_max_value: float = 1e6,
) -> RunningStatisticsState:
    """Fold a batch (any number of leading batch dims) into the statistics."""
    specimen_leaf = jax.tree_util.tree_leaves(state.mean)[0]
    batch_leaf = jax.tree_util.tree_leaves(batch)[0]
    n_feature_dims = specimen_leaf.ndim
    n_batch_dims = batch_leaf.ndim - n_feature_dims
    batch_axes = tuple(range(n_batch_dims))

    step_increment = 1
    for s in batch_leaf.shape[:n_batch_dims]:
        step_increment *= s
    step_increment = jnp.asarray(step_increment, state.count.dtype)
    if pmean_axis_name is not None:
        step_increment = step_increment * jax.lax.psum(
            jnp.ones((), state.count.dtype), pmean_axis_name
        )
    count = state.count + step_increment

    def _update(mean, summed_variance, b):
        # count is already the GLOBAL count, so summing per-device sums with
        # psum and dividing by count yields the exact all-data Welford update.
        diff_to_old = b - mean
        mean_update = jnp.sum(diff_to_old, axis=batch_axes) / count
        if pmean_axis_name is not None:
            mean_update = jax.lax.psum(mean_update, pmean_axis_name)
        new_mean = mean + mean_update
        diff_to_new = b - new_mean
        var_update = jnp.sum(diff_to_old * diff_to_new, axis=batch_axes)
        if pmean_axis_name is not None:
            var_update = jax.lax.psum(var_update, pmean_axis_name)
        new_sv = summed_variance + var_update
        return new_mean, new_sv

    flat_mean, treedef = jax.tree_util.tree_flatten(state.mean)
    flat_sv = jax.tree_util.tree_leaves(state.summed_variance)
    flat_batch = jax.tree_util.tree_leaves(batch)
    new_mean, new_sv = [], []
    for mean_l, sv_l, b_l in zip(flat_mean, flat_sv, flat_batch):
        m, sv = _update(mean_l, sv_l, b_l)
        new_mean.append(m)
        new_sv.append(sv)
    mean_tree = jax.tree_util.tree_unflatten(treedef, new_mean)
    sv_tree = jax.tree_util.tree_unflatten(treedef, new_sv)
    std_tree = jax.tree_util.tree_map(
        lambda sv: jnp.clip(jnp.sqrt(sv / count), std_min_value, std_max_value),
        sv_tree,
    )
    return RunningStatisticsState(
        count=count, mean=mean_tree, summed_variance=sv_tree, std=std_tree
    )


def normalize(batch: Any, state: RunningStatisticsState) -> Any:
    return jax.tree_util.tree_map(
        lambda b, m, s: (b - m) / s, batch, state.mean, state.std
    )


def denormalize(batch: Any, state: RunningStatisticsState) -> Any:
    return jax.tree_util.tree_map(
        lambda b, m, s: b * s + m, batch, state.mean, state.std
    )
