"""Mesh construction + replication checks + host sync.

TPU-native replacement for the reference's pmap plumbing
(/root/reference/custom_brax/custom_ppo.py:38,155-170,356,502-505 and
brax.training.pmap): a 1-D ``env`` mesh axis over all chips of the slice,
params replicated and env state sharded along it. Collectives (gradient
pmean, normalizer psum) ride ICI within a slice and DCN across slices —
XLA picks the transport from the mesh layout.

RNG discipline mirrors the reference (custom_ppo.py:189-197): a *global*
key stream so network init is identical on every process, plus a local
key folded with process_index so env rollouts decorrelate across hosts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def shard_map_compat(f, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax versions (check_rep -> check_vma rename),
    always with replication checking off (we reduce manually)."""
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


@dataclass(frozen=True)
class TrainMesh:
    """The training mesh and its canonical shardings."""

    mesh: Mesh
    axis_name: str = ENV_AXIS

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[self.axis_name]

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def env_sharded(self) -> NamedSharding:
        """Shard the leading (env-batch) axis."""
        return NamedSharding(self.mesh, P(self.axis_name))

    def spec_env(self) -> P:
        return P(self.axis_name)

    def spec_replicated(self) -> P:
        return P()


def make_train_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    max_devices_per_host: Optional[int] = None,
    axis_name: str = ENV_AXIS,
) -> TrainMesh:
    """1-D data-parallel mesh over (a prefix of) local devices × processes.

    ``max_devices_per_host`` mirrors the reference knob
    (custom_ppo.py:70,156-160).
    """
    if devices is None:
        if max_devices_per_host is not None and jax.process_count() == 1:
            devices = jax.devices()[:max_devices_per_host]
        else:
            devices = jax.devices()
    mesh = Mesh(np.asarray(devices), (axis_name,))
    return TrainMesh(mesh=mesh, axis_name=axis_name)


def assert_is_replicated(tree, mesh: TrainMesh) -> None:
    """Checks every leaf is fully replicated over the mesh (parity with
    brax.training.pmap.assert_is_replicated, custom_ppo.py:502)."""

    def check(x):
        if not isinstance(x, jax.Array):
            return
        s = x.sharding
        if not s.is_fully_replicated:
            raise AssertionError(f"leaf not replicated: sharding={s}")

    jax.tree_util.tree_map(check, tree)


def synchronize_hosts() -> None:
    """Barrier across processes (custom_ppo.py:505 parity)."""
    if jax.process_count() == 1:
        return
    # A tiny psum across all devices acts as a global barrier.
    x = jnp.ones((jax.local_device_count(),))
    y = jax.pmap(lambda z: jax.lax.psum(z, "i"), axis_name="i")(x)
    assert float(y[0]) == jax.device_count()


def fold_process_key(key: jax.Array) -> jax.Array:
    """Decorrelate a key across hosts (custom_ppo.py:192 parity)."""
    return jax.random.fold_in(key, jax.process_index())
