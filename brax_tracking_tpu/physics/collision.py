"""Narrowphase collision over the static pair table.

There is no broadphase: the candidate pair list is fixed at model-build
time (spec._candidate_pairs) and every pair owns a fixed number of contact
slots. A slot's activation is the runtime predicate dist < margin used by
the constraint stage — shapes never change. For the target models every
pair is geom-vs-floor-plane (SURVEY.md §2: rodent feet/toes/fingers+hands,
fly tarsal claws), but sphere/capsule pairs are implemented for coverage
(e.g. scenes without a plane-only contact structure).

Conventions match MuJoCo: the contact normal points from geom1 into geom2,
dist is the signed surface separation, pos is the midpoint.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import model as M


def make_frame(normal: jax.Array) -> jax.Array:
    """Builds a (.., 3, 3) frame [normal; tangent1; tangent2] from normals.

    Mirrors mju_makeFrame's helper-axis choice so friction directions match
    the oracle.
    """
    n = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    # helper: (0,0,1) unless normal is near +-z, then (0,1,0)
    near_z = jnp.abs(n[..., 2]) > 0.5
    helper = jnp.where(
        near_z[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
    )
    # tangent1: helper axis Gram-Schmidt-orthogonalized against the normal
    t1 = helper - n * jnp.sum(n * helper, axis=-1, keepdims=True)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), M.MINVAL)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_sphere_point(
    pn: jax.Array, pp: jax.Array, center: jax.Array, radius
) -> Tuple[jax.Array, jax.Array]:
    """dist & pos for a sphere (center, radius) against plane (normal pn, point pp)."""
    cdist = jnp.sum(pn * (center - pp), axis=-1)
    dist = cdist - radius
    pos = center - pn * (radius + 0.5 * dist)[..., None]
    return dist, pos


def _gz(d: M.Data, g) -> jax.Array:
    """World z-axis of selected geom frames, from the stored quaternions
    (geom_xmat is not materialized on the hot path)."""
    q = d.geom_xquat[g]
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)], -1
    )


def _gmat(d: M.Data, g) -> jax.Array:
    """Full 3x3 world frames of selected geoms, from the stored quaternions."""
    from brax_tracking_tpu import math as btm

    return btm.quat_to_mat(d.geom_xquat[g])


def collision(m: M.Model, d: M.Data) -> M.Data:
    dtype = d.qpos.dtype
    ncon = m.ncon
    if ncon == 0:
        return d.replace(
            contact_dist=jnp.zeros(0, dtype),
            contact_pos=jnp.zeros((0, 3), dtype),
            contact_frame=jnp.zeros((0, 3, 3), dtype),
        )

    pairs = m.pairs
    g1, g2 = pairs.geom1, pairs.geom2
    t1, t2 = m.geom_type[g1], m.geom_type[g2]

    dist = jnp.full((ncon,), 1e10, dtype)
    pos = jnp.zeros((ncon, 3), dtype)
    frame = jnp.tile(jnp.eye(3, dtype=dtype), (ncon, 1, 1))

    # slot offsets per pair (static)
    slot0 = np.concatenate([[0], np.cumsum(pairs.npoint)[:-1]]).astype(np.int32)

    def sel(mask):
        return np.nonzero(mask)[0].astype(np.int32)

    # ---- plane-sphere ----
    ps = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_SPHERE))
    if ps.size:
        pn = _gz(d, g1[ps])
        pp = d.geom_xpos[g1[ps]]
        c = d.geom_xpos[g2[ps]]
        r = m.geom_size[g2[ps], 0].astype(dtype)
        di, po = _plane_sphere_point(pn, pp, c, r)
        slots = slot0[ps]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(pn))

    # ---- plane-capsule: one contact per end sphere ----
    pc = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_CAPSULE))
    if pc.size:
        pn = _gz(d, g1[pc])
        pp = d.geom_xpos[g1[pc]]
        c = d.geom_xpos[g2[pc]]
        axis = _gz(d, g2[pc])
        r = m.geom_size[g2[pc], 0].astype(dtype)
        half = m.geom_size[g2[pc], 1].astype(dtype)
        # mujoco aligns friction tangent1 with the capsule axis projected
        # onto the plane (falls back to the helper frame when perpendicular)
        proj = axis - pn * jnp.sum(pn * axis, axis=-1, keepdims=True)
        pnorm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        tan1 = proj / jnp.maximum(pnorm, M.MINVAL)
        tan2 = jnp.cross(pn, tan1)
        fr_axis = jnp.stack([pn, tan1, tan2], axis=-2)
        fr = jnp.where((pnorm > 1e-10)[..., None], fr_axis, make_frame(pn))
        for endi, sign in enumerate((1.0, -1.0)):
            end = c + sign * axis * half[:, None]
            di, po = _plane_sphere_point(pn, pp, end, r)
            slots = slot0[pc] + endi
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
            frame = frame.at[slots].set(fr)

    # ---- plane-ellipsoid: analytic support point ----
    pe = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_ELLIPSOID))
    if pe.size:
        pn = _gz(d, g1[pe])
        pp = d.geom_xpos[g1[pe]]
        c = d.geom_xpos[g2[pe]]
        E = _gmat(d, g2[pe])  # (n, 3, 3)
        s = m.geom_size[g2[pe]].astype(dtype)  # (n, 3)
        # support point of the ellipsoid in direction -pn
        nloc = jnp.einsum("nij,ni->nj", E, pn)  # E^T n
        sn = s * nloc
        denom = jnp.maximum(jnp.linalg.norm(sn, axis=-1, keepdims=True), M.MINVAL)
        vloc = -s * sn / denom
        v = c + jnp.einsum("nij,nj->ni", E, vloc)
        di = jnp.sum(pn * (v - pp), axis=-1)
        po = v - 0.5 * di[:, None] * pn
        slots = slot0[pe]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(pn))

    # ---- plane-box: four deepest corners ----
    pb = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_BOX))
    if pb.size:
        pn = _gz(d, g1[pb])
        pp = d.geom_xpos[g1[pb]]
        c = d.geom_xpos[g2[pb]]
        R = _gmat(d, g2[pb])
        s = m.geom_size[g2[pb]].astype(dtype)
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float64,
        )  # (8, 3)
        pts = c[:, None, :] + jnp.einsum(
            "nij,nkj->nki", R, jnp.asarray(corners, dtype)[None] * s[:, None, :]
        )
        di_all = jnp.sum(pn[:, None, :] * (pts - pp[:, None, :]), axis=-1)  # (n, 8)
        # four deepest corners
        idx = jnp.argsort(di_all, axis=-1)[:, :4]
        di = jnp.take_along_axis(di_all, idx, axis=-1)
        po = jnp.take_along_axis(pts, idx[..., None].repeat(3, -1), axis=1)
        po = po - 0.5 * di[..., None] * pn[:, None, :]
        fr = make_frame(pn)
        for k in range(4):
            slots = slot0[pb] + k
            dist = dist.at[slots].set(di[:, k])
            pos = pos.at[slots].set(po[:, k])
            frame = frame.at[slots].set(fr)

    # ---- sphere-sphere ----
    ss = sel((t1 == M.GEOM_SPHERE) & (t2 == M.GEOM_SPHERE))
    if ss.size:
        c1, c2 = d.geom_xpos[g1[ss]], d.geom_xpos[g2[ss]]
        r1 = m.geom_size[g1[ss], 0].astype(dtype)
        r2 = m.geom_size[g2[ss], 0].astype(dtype)
        delta = c2 - c1
        length = jnp.maximum(jnp.linalg.norm(delta, axis=-1), M.MINVAL)
        n = delta / length[:, None]
        di = length - (r1 + r2)
        po = c1 + n * (r1 + 0.5 * di)[:, None]
        slots = slot0[ss]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))

    # ---- sphere-capsule / capsule-capsule: closest-segment-point spheres ----
    def _seg_closest(p, a_c, a_axis, a_half):
        """closest point to p on segment centered a_c along a_axis."""
        tproj = jnp.clip(
            jnp.sum((p - a_c) * a_axis, axis=-1), -a_half, a_half
        )
        return a_c + a_axis * tproj[..., None]

    sc = sel((t1 == M.GEOM_SPHERE) & (t2 == M.GEOM_CAPSULE))
    if sc.size:
        c1 = d.geom_xpos[g1[sc]]
        r1 = m.geom_size[g1[sc], 0].astype(dtype)
        c2 = d.geom_xpos[g2[sc]]
        ax2 = _gz(d, g2[sc])
        r2 = m.geom_size[g2[sc], 0].astype(dtype)
        h2 = m.geom_size[g2[sc], 1].astype(dtype)
        p2 = _seg_closest(c1, c2, ax2, h2)
        delta = p2 - c1
        length = jnp.maximum(jnp.linalg.norm(delta, axis=-1), M.MINVAL)
        n = delta / length[:, None]
        di = length - (r1 + r2)
        po = c1 + n * (r1 + 0.5 * di)[:, None]
        slots = slot0[sc]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))

    cc = sel((t1 == M.GEOM_CAPSULE) & (t2 == M.GEOM_CAPSULE))
    if cc.size:
        c1 = d.geom_xpos[g1[cc]]
        ax1 = _gz(d, g1[cc])
        r1 = m.geom_size[g1[cc], 0].astype(dtype)
        h1 = m.geom_size[g1[cc], 1].astype(dtype)
        c2 = d.geom_xpos[g2[cc]]
        ax2 = _gz(d, g2[cc])
        r2 = m.geom_size[g2[cc], 0].astype(dtype)
        h2 = m.geom_size[g2[cc], 1].astype(dtype)
        # closest points between segments (clamped alternating projection)
        p1 = c1
        for _ in range(4):
            p2 = _seg_closest(p1, c2, ax2, h2)
            p1 = _seg_closest(p2, c1, ax1, h1)
        delta = p2 - p1
        length = jnp.maximum(jnp.linalg.norm(delta, axis=-1), M.MINVAL)
        n = delta / length[:, None]
        di = length - (r1 + r2)
        po = p1 + n * (r1 + 0.5 * di)[:, None]
        slots = slot0[cc]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))
        # second slot of capsule-capsule pairs stays inactive (dist=1e10)

    return d.replace(contact_dist=dist, contact_pos=pos, contact_frame=frame)
