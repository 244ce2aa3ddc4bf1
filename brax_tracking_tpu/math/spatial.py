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


# ---------------------------------------------------------------------------
# Component-major ("CM") variants: arrays are (components, entities).
#
# TPU rationale: per-env arrays shaped (entities, 3/4/6) put a tiny dimension
# minor-most, which the (8, 128) tile layout pads to 128 lanes — a 14-42x
# memory blowup on every materialized buffer (measured ~30% of the rodent
# substep). With (components, entities) the big entity axis rides the lanes.
# Symmetric 3x3 inertia is packed as 6 rows [xx, yy, zz, xy, xz, yz].
# ---------------------------------------------------------------------------


def cross_cm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product along axis 0: a, b (3, n) -> (3, n)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def motion_cross_cm(v: jax.Array, u: jax.Array) -> jax.Array:
    """Motion-cross-motion on (6, n) arrays."""
    vang, vlin = v[:3], v[3:]
    uang, ulin = u[:3], u[3:]
    ang = cross_cm(vang, uang)
    lin = cross_cm(vang, ulin) + cross_cm(vlin, uang)
    return jnp.concatenate([ang, lin], axis=0)


def motion_cross_force_cm(v: jax.Array, f: jax.Array) -> jax.Array:
    """Motion-cross-force on (6, n) arrays."""
    vang, vlin = v[:3], v[3:]
    fang, flin = f[:3], f[3:]
    ang = cross_cm(vang, fang) + cross_cm(vlin, flin)
    lin = cross_cm(vang, flin)
    return jnp.concatenate([ang, lin], axis=0)


def inert_mul_cm(
    i6: jax.Array, h: jax.Array, mass: jax.Array, v: jax.Array
) -> jax.Array:
    """Packed spatial inertia times motion: (6,n),(3,n),(n,),(6,n) -> (6,n).

    f = [I w + h x vlin, m vlin - h x w]  (mju_mulInertVec).
    """
    w, vlin = v[:3], v[3:]
    iw = jnp.stack(
        [
            i6[0] * w[0] + i6[3] * w[1] + i6[4] * w[2],
            i6[3] * w[0] + i6[1] * w[1] + i6[5] * w[2],
            i6[4] * w[0] + i6[5] * w[1] + i6[2] * w[2],
        ]
    )
    ang = iw + cross_cm(h, vlin)
    lin = mass[None, :] * vlin - cross_cm(h, w)
    return jnp.concatenate([ang, lin], axis=0)


def transform_inertia_cm(
    body_inertia_diag: jax.Array,
    mass: jax.Array,
    iquat: jax.Array,
    offset: jax.Array,
):
    """CM transform_inertia from the inertial-frame quaternion — pure
    elementwise math (no 3x3 dots, nothing with a tiny minor dim).

    body_inertia_diag: (n, 3) static principal moments; mass: (n,);
    iquat: (n, 4) world inertial-frame quaternion (mj ximat as a quat);
    offset: (3, n) CoM minus common-frame origin.
    Returns (i6 (6, n), h (3, n)) with i6 rows [xx, yy, zz, xy, xz, yz].
    """
    w, x, y, z = iquat[:, 0], iquat[:, 1], iquat[:, 2], iquat[:, 3]
    # rotation matrix entries R[a][k] (same formulas as quat_to_mat)
    r = [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]
    d0, d1, d2 = (
        body_inertia_diag[:, 0],
        body_inertia_diag[:, 1],
        body_inertia_diag[:, 2],
    )

    def entry(a, b):
        # I_ab = sum_k d_k R[a][k] R[b][k]
        return d0 * r[a][0] * r[b][0] + d1 * r[a][1] * r[b][1] + d2 * r[a][2] * r[b][2]

    c2 = offset[0] ** 2 + offset[1] ** 2 + offset[2] ** 2
    i6 = jnp.stack(
        [
            entry(0, 0) + mass * (c2 - offset[0] * offset[0]),
            entry(1, 1) + mass * (c2 - offset[1] * offset[1]),
            entry(2, 2) + mass * (c2 - offset[2] * offset[2]),
            entry(0, 1) - mass * offset[0] * offset[1],
            entry(0, 2) - mass * offset[0] * offset[2],
            entry(1, 2) - mass * offset[1] * offset[2],
        ]
    )
    h = mass[None, :] * offset
    return i6, h


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
