"""Spatial (6D) vector algebra in MuJoCo's convention.

A spatial motion/force vector is a 6-array ``[angular(3), linear(3)]``
expressed in a common frame (the engine uses per-kinematic-tree frames
centered at the tree root's subtree CoM, world-aligned — the same "c-frame"
scheme MuJoCo uses for cdof/cinert/cvel).

Spatial inertia is carried as the triple ``(I, h, m)``:
  I : (..., 3, 3) rotational inertia about the frame origin,
  h : (..., 3)    m * (com - origin),
  m : (...,)      mass.
which is the same information as MuJoCo's 10-float ``cinert`` rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpatialInertia(NamedTuple):
    i: jax.Array  # (..., 3, 3)
    h: jax.Array  # (..., 3)
    m: jax.Array  # (...,)

    def __add__(self, other: "SpatialInertia") -> "SpatialInertia":
        return SpatialInertia(self.i + other.i, self.h + other.h, self.m + other.m)


def _cross_mat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]x, batched."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def motion_cross(v: jax.Array, u: jax.Array) -> jax.Array:
    """Motion-cross-motion: mju_crossMotion(v, u) = v x u.

    v, u: (..., 6) motion vectors [ang, lin].
    """
    vang, vlin = v[..., :3], v[..., 3:]
    uang, ulin = u[..., :3], u[..., 3:]
    ang = jnp.cross(vang, uang)
    lin = jnp.cross(vang, ulin) + jnp.cross(vlin, uang)
    return jnp.concatenate([ang, lin], axis=-1)


def motion_cross_force(v: jax.Array, f: jax.Array) -> jax.Array:
    """Motion-cross-force: mju_crossForce(v, f) = v x* f.

    v: (..., 6) motion vector; f: (..., 6) force vector [torque, force].
    """
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    ang = jnp.cross(vang, fang) + jnp.cross(vlin, flin)
    lin = jnp.cross(vang, flin)
    return jnp.concatenate([ang, lin], axis=-1)


def inert_mul(inert: SpatialInertia, v: jax.Array) -> jax.Array:
    """Spatial inertia times motion vector -> force vector.

    f = [I w + h x vlin, m vlin - h x w]   (mju_mulInertVec).
    """
    w, vlin = v[..., :3], v[..., 3:]
    ang = jnp.einsum("...ij,...j->...i", inert.i, w) + jnp.cross(inert.h, vlin)
    lin = inert.m[..., None] * vlin - jnp.cross(inert.h, w)
    return jnp.concatenate([ang, lin], axis=-1)


def transform_inertia(
    body_inertia_diag: jax.Array,
    mass: jax.Array,
    rot: jax.Array,
    offset: jax.Array,
) -> SpatialInertia:
    """Shift a principal-axis body inertia into a common frame.

    body_inertia_diag: (..., 3) principal moments (MuJoCo body_inertia).
    mass: (...,) body mass.
    rot: (..., 3, 3) rotation from principal/inertial frame to common frame
        (MuJoCo ximat).
    offset: (..., 3) position of body CoM relative to the common-frame origin
        (xipos - frame_origin).

    Returns inertia about the common-frame origin (parallel-axis theorem),
    matching MuJoCo cinert rows.
    """
    i_body = rot * body_inertia_diag[..., None, :] @ jnp.swapaxes(rot, -1, -2)
    cx = _cross_mat(offset)
    # I_origin = R I R^T + m [c]x [c]x^T
    i_origin = i_body + mass[..., None, None] * (cx @ jnp.swapaxes(cx, -1, -2))
    h = mass[..., None] * offset
    return SpatialInertia(i_origin, h, mass)
