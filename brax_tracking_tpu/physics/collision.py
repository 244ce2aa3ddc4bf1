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


def _point_tri_closest(
    p: jax.Array, a: jax.Array, b: jax.Array, c: jax.Array
) -> jax.Array:
    """Closest point on triangles (a, b, c) to points p, all (..., 3).

    Ericson, Real-Time Collision Detection §5.1.5, restated as a where
    cascade (no data-dependent branches; vectorizes on the VPU over the
    hfield patch's triangle set)."""

    def dot(u, v):
        return jnp.sum(u * v, axis=-1)

    eps = M.MINVAL
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = dot(ab, ap), dot(ac, ap)
    bp = p - b
    d3, d4 = dot(ab, bp), dot(ac, bp)
    cp = p - c
    d5, d6 = dot(ab, cp), dot(ac, cp)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    # candidate closest points per region (guarded divides)
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) > eps, d1 - d3, 1.0)
    q_ab = a + v_ab[..., None] * ab
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) > eps, d2 - d6, 1.0)
    q_ac = a + w_ac[..., None] * ac
    den_bc = (d4 - d3) + (d5 - d6)
    w_bc = (d4 - d3) / jnp.where(jnp.abs(den_bc) > eps, den_bc, 1.0)
    q_bc = b + w_bc[..., None] * (c - b)
    den_f = va + vb + vc
    inv_f = 1.0 / jnp.where(jnp.abs(den_f) > eps, den_f, 1.0)
    q_face = a + (vb * inv_f)[..., None] * ab + (vc * inv_f)[..., None] * ac
    # region selection, highest priority last (vertex > edge > face)
    q = q_face
    q = jnp.where(((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None], q_bc, q)
    q = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], q_ac, q)
    q = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], q_ab, q)
    q = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, q)
    q = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, q)
    q = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, q)
    return q


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


def _sgn(x: jax.Array) -> jax.Array:
    """sign() that never returns 0 (degenerate centered poses)."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _seg_argmin(f, n: int, dtype) -> jax.Array:
    """argmin over t in [-1, 1] of a per-pair function f((n,)->(n,)) that is
    convex (hence unimodal) along the segment: 17-point grid (vmapped — one
    traced body) + ternary refinement under lax.fori_loop. Rolled loops keep
    the jaxpr small: giant unrolled collision graphs have triggered
    XLA:CPU compiler crashes in long-lived processes."""
    ts = jnp.linspace(-1.0, 1.0, 17).astype(dtype)
    vals = jax.vmap(lambda t: f(jnp.full((n,), t, dtype)))(ts)
    k = jnp.argmin(vals, axis=0)
    lo = ts[jnp.maximum(k - 1, 0)]
    hi = ts[jnp.minimum(k + 1, len(ts) - 1)]

    def body(_, carry):
        lo, hi = carry
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        go_lo = f(m1) < f(m2)
        return jnp.where(go_lo, lo, m1), jnp.where(go_lo, m2, hi)

    lo, hi = jax.lax.fori_loop(0, 14, body, (lo, hi))
    return 0.5 * (lo + hi)


def _box_box(c1, R1, s1, c2, R2, s2, dtype):
    """Box-box narrowphase: SAT (6 face + 9 edge-cross axes) + an 8-point
    face manifold / 1-point edge contact.

    Face case: the incident face's 4 corners clamped into the reference
    face rectangle, plus the reference rectangle's 4 corners where they
    project inside the incident face — together they cover small-on-big,
    big-on-small and crossed-rectangle overlaps (duplicates from the
    clamping are deactivated). Contact depth is the normal gap of the
    incident-face plane evaluated at each candidate's face coordinates.
    Edge case (a cross axis wins the SAT): single contact at the closest
    points of the two witness edges. This is not mjc_BoxBox's exact case
    analysis; the physically-load-bearing properties (deepest contact,
    manifold span, no deeper phantom) match the oracle — see
    tests/test_collision_extended.py.

    Returns (dist (n,8), pos (n,8,3), normal (n,8,3)); normal geom1->geom2.
    """
    Rt = jnp.einsum("nki,nkj->nij", R1, R2)  # box2 axes in box1 frame
    p = jnp.einsum("nki,nk->ni", R1, c2 - c1)  # box2 center in box1 frame
    AbsR = jnp.abs(Rt) + 1e-9  # epsilon: parallel-edge SAT robustness

    sep_a = jnp.abs(p) - (s1 + jnp.einsum("nij,nj->ni", AbsR, s2))
    pB = jnp.einsum("nij,ni->nj", Rt, p)  # p in box2 axes
    sep_b = jnp.abs(pB) - (s2 + jnp.einsum("nij,ni->nj", AbsR, s1))

    seps_c = []
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            rA = s1[:, i1] * AbsR[:, i2, j] + s1[:, i2] * AbsR[:, i1, j]
            rB = s2[:, j1] * AbsR[:, i, j2] + s2[:, j2] * AbsR[:, i, j1]
            dd = jnp.abs(p[:, i2] * Rt[:, i1, j] - p[:, i1] * Rt[:, i2, j])
            ln2 = Rt[:, i1, j] ** 2 + Rt[:, i2, j] ** 2  # |e_i x b_j|^2
            sep = (dd - (rA + rB)) / jnp.sqrt(jnp.maximum(ln2, 1e-12))
            # near-parallel edges: axis degenerate, never the winner
            seps_c.append(jnp.where(ln2 < 1e-8, -jnp.inf, sep))
    sep_c = jnp.stack(seps_c, axis=1)  # (n, 9)

    sep_f = jnp.concatenate([sep_a, sep_b], axis=1)  # (n, 6)
    fmax = jnp.max(sep_f, axis=1)
    cmax = jnp.max(sep_c, axis=1)
    # bias toward face manifolds (standard SAT practice; avoids jitter
    # between near-equal face and edge axes)
    is_edge = cmax > fmax + 1e-6

    # ---------------- face manifold (A = winning-face box) ----------------
    face_idx = jnp.argmax(sep_f, axis=1)
    is_b = face_idx >= 3
    fi = face_idx % 3
    wb = is_b[:, None, None]
    Mab = jnp.where(wb, jnp.swapaxes(Rt, 1, 2), Rt)  # B axes in A frame
    cB = jnp.where(is_b[:, None], -pB, p)  # B center in A frame
    sA = jnp.where(is_b[:, None], s2, s1)
    sB = jnp.where(is_b[:, None], s1, s2)
    h_f = jax.nn.one_hot(fi, 3, dtype=dtype)
    h_u = jax.nn.one_hot((fi + 1) % 3, 3, dtype=dtype)
    h_v = jax.nn.one_hot((fi + 2) % 3, 3, dtype=dtype)
    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    sigma = _sgn(dot(h_f, cB))  # face of A toward B
    sAf, sAu, sAv = dot(h_f, sA), dot(h_u, sA), dot(h_v, sA)

    # incident face on B: axis most anti-parallel to the face normal
    mf = jnp.einsum("nf,nfj->nj", h_f, Mab)  # row f of Mab
    h_j = jax.nn.one_hot(jnp.argmax(jnp.abs(mf), axis=1), 3, dtype=dtype)
    w = _sgn(dot(h_j, mf) * sigma)
    bj = jnp.einsum("nfj,nj->nf", Mab, h_j)
    fc = cB - (w * dot(h_j, sB))[:, None] * bj  # incident face center
    jn = jnp.argmax(jnp.abs(mf), axis=1)
    h_a = jax.nn.one_hot((jn + 1) % 3, 3, dtype=dtype)
    h_b = jax.nn.one_hot((jn + 2) % 3, 3, dtype=dtype)
    ea = jnp.einsum("nfj,nj->nf", Mab, h_a) * dot(h_a, sB)[:, None]
    eb = jnp.einsum("nfj,nj->nf", Mab, h_b) * dot(h_b, sB)[:, None]
    # affine incident-face map x(a,b) = fc + a ea + b eb in face coords
    fc_u, fc_v = dot(h_u, fc), dot(h_v, fc)
    ea_u, ea_v = dot(h_u, ea), dot(h_v, ea)
    eb_u, eb_v = dot(h_u, eb), dot(h_v, eb)
    fc_h = sigma * dot(h_f, fc) - sAf  # normal gap at the face center
    ea_h, eb_h = sigma * dot(h_f, ea), sigma * dot(h_f, eb)
    det = ea_u * eb_v - eb_u * ea_v
    det_ok = jnp.abs(det) > 1e-9
    det_s = jnp.where(det_ok, det, 1.0)

    def uv_to_ab(u, v):
        du, dv = u - fc_u, v - fc_v
        return (eb_v * du - eb_u * dv) / det_s, (-ea_v * du + ea_u * dv) / det_s

    f_u, f_v, f_h = [], [], []
    for a, b in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        # project the incident corner into the overlap region: alternate
        # clamping between the reference rectangle (u,v coords) and the
        # incident face box ((a,b) coords) — both convex, so this converges
        # into their intersection (the true contact patch); evaluating the
        # incident-plane height outside its own footprint would create
        # phantom contacts deeper than any real overlap.
        uu = fc_u + a * ea_u + b * eb_u
        vv = fc_v + a * ea_v + b * eb_v
        a2 = jnp.full_like(uu, a)
        b2 = jnp.full_like(vv, b)
        for _ in range(6):
            uu = jnp.clip(uu, -sAu, sAu)
            vv = jnp.clip(vv, -sAv, sAv)
            na, nb = uv_to_ab(uu, vv)
            a2 = jnp.where(det_ok, jnp.clip(na, -1.0, 1.0), a2)
            b2 = jnp.where(det_ok, jnp.clip(nb, -1.0, 1.0), b2)
            uu = jnp.where(det_ok, fc_u + a2 * ea_u + b2 * eb_u, uu)
            vv = jnp.where(det_ok, fc_v + a2 * ea_v + b2 * eb_v, vv)
        # empty intersection (corner sticks out past the rect): deactivate
        ok = (
            (jnp.abs(uu) <= sAu + 1e-7)
            & (jnp.abs(vv) <= sAv + 1e-7)
        ) | ~det_ok
        uu = jnp.clip(uu, -sAu, sAu)
        vv = jnp.clip(vv, -sAv, sAv)
        hh = jnp.where(ok, fc_h + a2 * ea_h + b2 * eb_h, 1e10)
        f_u.append(uu)
        f_v.append(vv)
        f_h.append(hh)
    for a, b in ((1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)):
        uu = a * sAu
        vv = b * sAv
        a2, b2 = uv_to_ab(uu, vv)
        inside = det_ok & (jnp.abs(a2) <= 1.0 + 1e-6) & (jnp.abs(b2) <= 1.0 + 1e-6)
        # drop duplicates of the clamped incident corners
        for k in range(4):
            inside = inside & (
                jnp.abs(uu - f_u[k]) + jnp.abs(vv - f_v[k]) > 1e-9
            )
        hh = jnp.where(inside, fc_h + a2 * ea_h + b2 * eb_h, 1e10)
        f_u.append(uu)
        f_v.append(vv)
        f_h.append(hh)

    R_A = jnp.where(wb, R2, R1)
    c_A = jnp.where(is_b[:, None], c2, c1)
    n_loc = sigma[:, None] * h_f
    # normal convention: geom1 -> geom2 in world
    fn = jnp.einsum("nij,nj->ni", R_A, n_loc) * jnp.where(is_b, -1.0, 1.0)[:, None]

    # ---------------- edge-edge contact ----------------
    eidx = jnp.argmax(sep_c, axis=1)
    h_i = jax.nn.one_hot(eidx // 3, 3, dtype=dtype)
    h_j2 = jax.nn.one_hot(eidx % 3, 3, dtype=dtype)
    d1 = h_i  # e_i in box1 frame
    d2 = jnp.einsum("nij,nj->ni", Rt, h_j2)  # b_j in box1 frame
    axis = jnp.cross(d1, d2)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), M.MINVAL
    )
    u_dir = axis * _sgn(dot(axis, p))[:, None]  # box1 -> box2
    o1 = (1.0 - h_i) * s1 * _sgn(u_dir)
    ub = jnp.einsum("nij,ni->nj", Rt, u_dir)  # u in box2 axes
    o2 = p + jnp.einsum("nij,nj->ni", Rt, (1.0 - h_j2) * s2 * (-_sgn(ub)))
    w0 = o1 - o2
    b_ = dot(d1, d2)
    d_ = dot(d1, w0)
    e_ = dot(d2, w0)
    denom = jnp.maximum(1.0 - b_ * b_, 1e-12)
    t1 = jnp.clip((b_ * e_ - d_) / denom, -dot(h_i, s1), dot(h_i, s1))
    t2 = jnp.clip((e_ - b_ * d_) / denom, -dot(h_j2, s2), dot(h_j2, s2))
    p1 = o1 + t1[:, None] * d1
    p2 = o2 + t2[:, None] * d2
    edist = dot(p2 - p1, u_dir)
    epos = c1 + jnp.einsum("nij,nj->ni", R1, 0.5 * (p1 + p2))
    en = jnp.einsum("nij,nj->ni", R1, u_dir)

    # ---------------- merge ----------------
    dists, poss, nrms = [], [], []
    for k in range(8):
        x_loc = (
            h_u * f_u[k][:, None]
            + h_v * f_v[k][:, None]
            + h_f * (sigma * (sAf + 0.5 * jnp.minimum(f_h[k], 1e9)))[:, None]
        )
        fpos = c_A + jnp.einsum("nij,nj->ni", R_A, x_loc)
        if k == 0:
            dists.append(jnp.where(is_edge, edist, f_h[k]))
            poss.append(jnp.where(is_edge[:, None], epos, fpos))
            nrms.append(jnp.where(is_edge[:, None], en, fn))
        else:
            dists.append(jnp.where(is_edge, 1e10, f_h[k]))
            poss.append(fpos)
            nrms.append(fn)
    return (
        jnp.stack(dists, 1),
        jnp.stack(poss, 1),
        jnp.stack(nrms, 1),
    )


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

    # ---- plane-mesh: four deepest hull vertices (mjc_PlaneConvex) ----
    pm = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_MESH))
    if pm.size:
        pn = _gz(d, g1[pm])
        pp = d.geom_xpos[g1[pm]]
        c = d.geom_xpos[g2[pm]]
        R = _gmat(d, g2[pm])
        mi = np.asarray(m.geom_meshidx)[np.asarray(g2[pm])]
        verts = m.mesh_vert[mi].astype(dtype)  # (n, maxv, 3) geom frame
        pts = c[:, None, :] + jnp.einsum("nij,nkj->nki", R, verts)
        di_all = jnp.sum(pn[:, None, :] * (pts - pp[:, None, :]), axis=-1)
        # padded slots duplicate vertex 0; push them past every real vertex
        # so the 4-deepest selection never picks a duplicate
        maxv = verts.shape[1]
        valid = np.arange(maxv)[None, :] < np.asarray(m.mesh_vertnum)[mi][:, None]
        di_all = jnp.where(jnp.asarray(valid), di_all, jnp.asarray(1e10, dtype))
        idx = jnp.argsort(di_all, axis=-1)[:, :4]
        di = jnp.take_along_axis(di_all, idx, axis=-1)
        po = jnp.take_along_axis(pts, idx[..., None].repeat(3, -1), axis=1)
        po = po - 0.5 * di[..., None] * pn[:, None, :]
        fr = make_frame(pn)
        for k in range(4):
            slots = slot0[pm] + k
            dist = dist.at[slots].set(di[:, k])
            pos = pos.at[slots].set(po[:, k])
            frame = frame.at[slots].set(fr)

    # ---- height fields: K x K patch, deepest-triangle sphere probes ----
    def _hfield_probe(idx_sel, centers_w, radius):
        """One sphere probe per pair row against its height field: gathers
        the static K x K elevation patch under the probe, tests all
        2(K-1)^2 surface triangles (mjc_ConvexHField's prism triangulation)
        with an exact point-triangle closest point, and returns the deepest
        (dist, world pos, world frame). All shapes static; the patch
        gather is one dynamic_slice per probe."""
        K = m.hfield_patch
        gh = np.asarray(m.geom_hfieldidx)[np.asarray(g1[idx_sel])]
        nr = np.asarray(m.hfield_nrowcol)[gh, 0]  # static per-probe
        nc = np.asarray(m.hfield_nrowcol)[gh, 1]
        Rh = _gmat(d, g1[idx_sel])
        ph = d.geom_xpos[g1[idx_sel]]
        c = jnp.einsum("nij,ni->nj", Rh, centers_w - ph)  # hfield frame
        sz = m.hfield_size[jnp.asarray(gh)].astype(dtype)  # (n, 4)
        dx = 2.0 * sz[:, 0] / jnp.asarray(np.maximum(nc - 1, 1), dtype)
        dy = 2.0 * sz[:, 1] / jnp.asarray(np.maximum(nr - 1, 1), dtype)
        j0 = jnp.clip(
            jnp.floor((c[:, 0] + sz[:, 0]) / dx).astype(jnp.int32) - (K - 1) // 2,
            0,
            jnp.asarray(nc - K, jnp.int32),
        )
        i0 = jnp.clip(
            jnp.floor((c[:, 1] + sz[:, 1]) / dy).astype(jnp.int32) - (K - 1) // 2,
            0,
            jnp.asarray(nr - K, jnp.int32),
        )
        data = m.hfield_elev[jnp.asarray(gh)].astype(dtype)  # (n, maxr, maxc)
        patch = jax.vmap(
            lambda dat, i, j: jax.lax.dynamic_slice(dat, (i, j), (K, K))
        )(data, i0, j0)  # (n, K, K) z at [row=y, col=x]
        ar = jnp.arange(K, dtype=dtype)
        xs = (j0[:, None].astype(dtype) + ar) * dx[:, None] - sz[:, 0:1]
        ys = (i0[:, None].astype(dtype) + ar) * dy[:, None] - sz[:, 1:2]
        V = jnp.stack(
            [
                jnp.broadcast_to(xs[:, None, :], patch.shape),
                jnp.broadcast_to(ys[:, :, None], patch.shape),
                patch,
            ],
            axis=-1,
        )  # (n, K, K, 3)
        flat = lambda W: W.reshape(W.shape[0], -1, 3)
        A = jnp.concatenate([flat(V[:, :-1, :-1]), flat(V[:, :-1, :-1])], 1)
        B = jnp.concatenate([flat(V[:, :-1, 1:]), flat(V[:, 1:, 1:])], 1)
        C = jnp.concatenate([flat(V[:, 1:, 1:]), flat(V[:, 1:, :-1])], 1)
        q = _point_tri_closest(c[:, None, :], A, B, C)  # (n, T, 3)
        dvec = c[:, None, :] - q
        d2 = jnp.sum(dvec * dvec, axis=-1)
        k = jnp.argmin(d2, axis=-1)
        take = lambda W: jnp.take_along_axis(W, k[:, None, None], axis=1)[:, 0]
        qs, As, Bs, Cs = take(q), take(A), take(B), take(C)
        ntri = jnp.cross(Bs - As, Cs - As)
        ntri = ntri / jnp.maximum(
            jnp.linalg.norm(ntri, axis=-1, keepdims=True), M.MINVAL
        )  # z-up by winding
        dv = c - qs
        L = jnp.linalg.norm(dv, axis=-1)
        above = jnp.sum(dv * ntri, axis=-1) >= 0
        sgn = jnp.where(above, 1.0, -1.0).astype(dtype)
        di = sgn * L - radius
        n_l = jnp.where(
            (above & (L > M.MINVAL))[:, None],
            dv / jnp.maximum(L, M.MINVAL)[:, None],
            ntri,
        )
        pos_l = 0.5 * (qs + c - n_l * radius[:, None])
        n_w = jnp.einsum("nij,nj->ni", Rh, n_l)
        pos_w = ph + jnp.einsum("nij,nj->ni", Rh, pos_l)
        return di, pos_w, make_frame(n_w)

    hs = sel((t1 == M.GEOM_HFIELD) & (t2 == M.GEOM_SPHERE))
    if hs.size:
        r = m.geom_size[g2[hs], 0].astype(dtype)
        di, po, fr = _hfield_probe(hs, d.geom_xpos[g2[hs]], r)
        slots = slot0[hs]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(fr)

    hc = sel((t1 == M.GEOM_HFIELD) & (t2 == M.GEOM_CAPSULE))
    if hc.size:
        cw = d.geom_xpos[g2[hc]]
        axis = _gz(d, g2[hc])
        r = m.geom_size[g2[hc], 0].astype(dtype)
        half = m.geom_size[g2[hc], 1].astype(dtype)
        for k_, t_ in enumerate((-1.0, 0.0, 1.0)):
            di, po, fr = _hfield_probe(hc, cw + t_ * axis * half[:, None], r)
            slots = slot0[hc] + k_
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
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

    # ---- plane-cylinder: unified 4-slot rim scheme ----
    # Slots: deepest rim point of the near disk, the same rim direction on
    # the far disk (activates when lying on the side), and +-120 degree rim
    # points on the near disk (activate when standing on the face). All of
    # MuJoCo's mjc_PlaneCylinder cases (1 tilted / 2 side / 3 flat contacts)
    # emerge from plain dist < margin activation of these four candidates.
    pcy = sel((t1 == M.GEOM_PLANE) & (t2 == M.GEOM_CYLINDER))
    if pcy.size:
        pn = _gz(d, g1[pcy])
        pp = d.geom_xpos[g1[pcy]]
        c = d.geom_xpos[g2[pcy]]
        axis = _gz(d, g2[pcy])
        r = m.geom_size[g2[pcy], 0].astype(dtype)
        h = m.geom_size[g2[pcy], 1].astype(dtype)
        ca = jnp.sum(pn * axis, axis=-1)  # cos(axis, normal)
        sgn = jnp.where(ca >= 0, 1.0, -1.0).astype(dtype)
        # in-disk direction toward the plane (radial == rim direction)
        d1 = ca[:, None] * axis - pn
        d1n = jnp.linalg.norm(d1, axis=-1, keepdims=True)
        # axis ~ parallel to normal: any perpendicular (x-axis of the geom)
        from brax_tracking_tpu import math as btm

        gx = btm.quat_to_mat(d.geom_xquat[g2[pcy]])[..., :, 0]
        d1 = jnp.where(d1n > 1e-10, d1 / jnp.maximum(d1n, M.MINVAL), gx)
        d2 = jnp.cross(axis, d1)  # completes the disk basis
        lo = c - axis * (h * sgn)[:, None]  # near (deepest) disk center
        hi = c + axis * (h * sgn)[:, None]
        cand = [
            lo + r[:, None] * d1,
            hi + r[:, None] * d1,
            lo + r[:, None] * (-0.5 * d1 + 0.8660254037844386 * d2),
            lo + r[:, None] * (-0.5 * d1 - 0.8660254037844386 * d2),
        ]
        fr = make_frame(pn)
        for k, p in enumerate(cand):
            di = jnp.sum(pn * (p - pp), axis=-1)
            po = p - 0.5 * di[:, None] * pn
            slots = slot0[pcy] + k
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
            frame = frame.at[slots].set(fr)

    # ---- point-vs-box helper (local frame) ----
    def _point_box(local, s):
        """outward unit dir (local), signed center distance to the surface
        (positive outside), and the surface point, for points vs a box of
        half-sizes s. Inside points exit through the nearest face."""
        clamped = jnp.clip(local, -s, s)
        delta = local - clamped
        dn = jnp.linalg.norm(delta, axis=-1)
        outside = dn > 1e-12
        out_dir = delta / jnp.maximum(dn, M.MINVAL)[:, None]
        gaps = s - jnp.abs(local)  # (n, 3)
        kmin = jnp.argmin(gaps, axis=-1)
        onehot = jax.nn.one_hot(kmin, 3, dtype=local.dtype)
        in_dir = onehot * jnp.sign(
            jnp.where(jnp.abs(local) > 1e-12, local, 1.0)
        )
        in_gap = jnp.take_along_axis(gaps, kmin[:, None], axis=-1)[:, 0]
        q_in = local + in_dir * in_gap[:, None]
        outward = jnp.where(outside[:, None], out_dir, in_dir)
        cdist = jnp.where(outside, dn, -in_gap)
        q = jnp.where(outside[:, None], clamped, q_in)
        return outward, cdist, q

    # ---- sphere-box ----
    sb = sel((t1 == M.GEOM_SPHERE) & (t2 == M.GEOM_BOX))
    if sb.size:
        cs = d.geom_xpos[g1[sb]]
        r = m.geom_size[g1[sb], 0].astype(dtype)
        cb = d.geom_xpos[g2[sb]]
        Rb = _gmat(d, g2[sb])
        s = m.geom_size[g2[sb]].astype(dtype)
        local = jnp.einsum("nij,ni->nj", Rb, cs - cb)
        outward_l, cdist, q_l = _point_box(local, s)
        di = cdist - r
        outward = jnp.einsum("nij,nj->ni", Rb, outward_l)
        po = cb + jnp.einsum("nij,nj->ni", Rb, q_l) + 0.5 * di[:, None] * outward
        slots = slot0[sb]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(-outward))

    # ---- capsule-box: one candidate per capsule end (alternating
    # projection between the segment and the box); when both ends converge
    # to the same closest point (tip contact) the duplicate is disabled ----
    cb_ = sel((t1 == M.GEOM_CAPSULE) & (t2 == M.GEOM_BOX))
    if cb_.size:
        cc_ = d.geom_xpos[g1[cb_]]
        axc = _gz(d, g1[cb_])
        r = m.geom_size[g1[cb_], 0].astype(dtype)
        hc = m.geom_size[g1[cb_], 1].astype(dtype)
        cb2 = d.geom_xpos[g2[cb_]]
        Rb = _gmat(d, g2[cb_])
        s = m.geom_size[g2[cb_]].astype(dtype)
        prev_p = None
        prev_out = None
        for endi, esign in enumerate((1.0, -1.0)):
            p = cc_ + esign * axc * hc[:, None]
            for _ in range(6):
                local = jnp.einsum("nij,ni->nj", Rb, p - cb2)
                qw = cb2 + jnp.einsum(
                    "nij,nj->ni", Rb, jnp.clip(local, -s, s)
                )
                p = _seg_closest(qw, cc_, axc, hc)
            local = jnp.einsum("nij,ni->nj", Rb, p - cb2)
            outward_l, cdist, q_l = _point_box(local, s)
            di = cdist - r
            outward = jnp.einsum("nij,nj->ni", Rb, outward_l)
            po = (
                cb2
                + jnp.einsum("nij,nj->ni", Rb, q_l)
                + 0.5 * di[:, None] * outward
            )
            if endi == 1:
                # keep the second candidate only when it is a distinct
                # contact on the same side of the box (hemisphere test):
                # a capsule piercing straight through would otherwise
                # produce an opposing phantom contact. mjc_CapsuleBox's
                # exact second-contact case analysis (lying / leaning-over-
                # edge) emerges from this plus dist < margin activation.
                dup = jnp.linalg.norm(p - prev_p, axis=-1) < 1e-9
                hemi = jnp.sum(outward * prev_out, axis=-1) > 0.0
                di = jnp.where(hemi & ~dup, di, 1e10)
            prev_p = p
            prev_out = outward
            slots = slot0[cb_] + endi
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
            frame = frame.at[slots].set(make_frame(-outward))

    # ---- ellipsoid projections (iterative; MuJoCo uses MPR here, so these
    # pairs are near-exact for separated/shallow contacts and approximate
    # for deep overlap — documented deviation, same as MJX) ----
    def _ellipsoid_project(p, s):
        """Closest surface point to p on the ellipsoid diag(s), local frame.
        Newton on the Lagrange parameter for outside points; radial scaling
        fallback for inside points."""
        s2 = s * s
        phi = jnp.sum(p * p / jnp.maximum(s2, M.MINVAL), axis=-1)
        inside = phi < 1.0
        t = jnp.zeros_like(phi)
        for _ in range(12):
            denom = t[:, None] + s2
            f = jnp.sum(s2 * p * p / jnp.maximum(denom * denom, M.MINVAL), -1) - 1.0
            fp = -2.0 * jnp.sum(
                s2 * p * p / jnp.maximum(denom * denom * denom, M.MINVAL), -1
            )
            t = t - f / jnp.where(jnp.abs(fp) > M.MINVAL, fp, -1.0)
            t = jnp.maximum(t, 0.0)  # outside points have t* >= 0
        x_out = s2 * p / jnp.maximum(t[:, None] + s2, M.MINVAL)
        x_in = p / jnp.sqrt(jnp.maximum(phi, M.MINVAL))[:, None]
        return jnp.where(inside[:, None], x_in, x_out), inside

    def _sphere_ellipsoid(cs, r, ce, Re, se):
        """dist/pos/normal for a sphere against an ellipsoid (normal from
        the sphere into the ellipsoid, MuJoCo geom1->geom2 convention)."""
        p = jnp.einsum("nij,ni->nj", Re, cs - ce)
        x, inside = _ellipsoid_project(p, se)
        delta = p - x
        dn = jnp.maximum(jnp.linalg.norm(delta, axis=-1), M.MINVAL)
        grad = x / jnp.maximum(se * se, M.MINVAL)
        gradn = grad / jnp.maximum(
            jnp.linalg.norm(grad, axis=-1, keepdims=True), M.MINVAL
        )
        out_l = jnp.where(inside[:, None], gradn, delta / dn[:, None])
        di = jnp.where(inside, -(dn + r), dn - r)
        outward = jnp.einsum("nij,nj->ni", Re, out_l)
        po = ce + jnp.einsum("nij,nj->ni", Re, x) + 0.5 * di[:, None] * outward
        return di, po, -outward

    se_ = sel((t1 == M.GEOM_SPHERE) & (t2 == M.GEOM_ELLIPSOID))
    if se_.size:
        di, po, n = _sphere_ellipsoid(
            d.geom_xpos[g1[se_]],
            m.geom_size[g1[se_], 0].astype(dtype),
            d.geom_xpos[g2[se_]],
            _gmat(d, g2[se_]),
            m.geom_size[g2[se_]].astype(dtype),
        )
        slots = slot0[se_]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))

    ce_ = sel((t1 == M.GEOM_CAPSULE) & (t2 == M.GEOM_ELLIPSOID))
    if ce_.size:
        cc_ = d.geom_xpos[g1[ce_]]
        axc = _gz(d, g1[ce_])
        r = m.geom_size[g1[ce_], 0].astype(dtype)
        hc = m.geom_size[g1[ce_], 1].astype(dtype)
        ce2 = d.geom_xpos[g2[ce_]]
        Re = _gmat(d, g2[ce_])
        se2 = m.geom_size[g2[ce_]].astype(dtype)

        # signed point-to-surface distance at segment parameter t in [-1,1];
        # the signed distance of a convex set is convex, so it is unimodal
        # along the axis: coarse grid + ternary refinement finds the deepest
        # (or closest) segment point in both the separated and the
        # deep-overlap regime (an alternating closest-point projection would
        # converge to the *shallowest* penetrating point when inside).
        def _sdist_at(t):
            pw = cc_ + (t * hc)[:, None] * axc
            pl = jnp.einsum("nij,ni->nj", Re, pw - ce2)
            x, inside = _ellipsoid_project(pl, se2)
            dn = jnp.linalg.norm(pl - x, axis=-1)
            return jnp.where(inside, -dn, dn)

        t_best = _seg_argmin(_sdist_at, cc_.shape[0], dtype)
        p = cc_ + (t_best * hc)[:, None] * axc
        di, po, n = _sphere_ellipsoid(p, r, ce2, Re, se2)
        slots = slot0[ce_]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))

    # ---- cylinder convex pairs (sphere/capsule vs cylinder) ----
    def _point_cylinder(pl_, r, h):
        """Signed distance, closest surface point and outward normal for
        points vs a cylinder (radius r, half-height h), local frame.
        Regions: outside corner (rim), side (|z| within caps or deeper
        inside radially), cap. Inside points exit through the nearer
        surface (max of the two signed gaps)."""
        x, y, z = pl_[..., 0], pl_[..., 1], pl_[..., 2]
        rho = jnp.sqrt(jnp.maximum(x * x + y * y, M.MINVAL * M.MINVAL))
        er = jnp.stack([x / rho, y / rho, jnp.zeros_like(rho)], -1)
        zhat = jnp.zeros_like(er).at[..., 2].set(1.0)
        dr = rho - r
        dz = jnp.abs(z) - h
        sz = _sgn(z)
        corner = (dr > 0) & (dz > 0)
        d_c = jnp.sqrt(jnp.maximum(dr * dr + dz * dz, M.MINVAL * M.MINVAL))
        q_c = er * r[..., None] + zhat * (sz * h)[..., None]
        n_c = (er * dr[..., None] + zhat * (sz * dz)[..., None]) / d_c[..., None]
        side = dr > dz
        q_s = er * r[..., None] + zhat * z[..., None]
        q_cap = pl_ * jnp.array([1.0, 1.0, 0.0], pl_.dtype) + zhat * (sz * h)[..., None]
        d_sc = jnp.where(side, dr, dz)
        q_sc = jnp.where(side[..., None], q_s, q_cap)
        n_sc = jnp.where(side[..., None], er, zhat * sz[..., None])
        dd = jnp.where(corner, d_c, d_sc)
        return (
            dd,
            jnp.where(corner[..., None], q_c, q_sc),
            jnp.where(corner[..., None], n_c, n_sc),
        )

    def _sphere_cylinder(cs, rs, cc2, Rc, rcy, hcy):
        pl_ = jnp.einsum("nij,ni->nj", Rc, cs - cc2)
        d0, q, nl = _point_cylinder(pl_, rcy, hcy)
        di = d0 - rs
        outward = jnp.einsum("nij,nj->ni", Rc, nl)  # cylinder -> sphere
        po = cc2 + jnp.einsum("nij,nj->ni", Rc, q) + 0.5 * di[:, None] * outward
        return di, po, -outward  # normal geom1 (sphere/capsule) -> geom2

    scy = sel((t1 == M.GEOM_SPHERE) & (t2 == M.GEOM_CYLINDER))
    if scy.size:
        di, po, n = _sphere_cylinder(
            d.geom_xpos[g1[scy]],
            m.geom_size[g1[scy], 0].astype(dtype),
            d.geom_xpos[g2[scy]],
            _gmat(d, g2[scy]),
            m.geom_size[g2[scy], 0].astype(dtype),
            m.geom_size[g2[scy], 1].astype(dtype),
        )
        slots = slot0[scy]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(n))

    ccy = sel((t1 == M.GEOM_CAPSULE) & (t2 == M.GEOM_CYLINDER))
    if ccy.size:
        cc_ = d.geom_xpos[g1[ccy]]
        axc = _gz(d, g1[ccy])
        r = m.geom_size[g1[ccy], 0].astype(dtype)
        hc = m.geom_size[g1[ccy], 1].astype(dtype)
        cc2 = d.geom_xpos[g2[ccy]]
        Rc = _gmat(d, g2[ccy])
        rcy = m.geom_size[g2[ccy], 0].astype(dtype)
        hcy = m.geom_size[g2[ccy], 1].astype(dtype)

        # deepest segment point by grid + ternary search on the (convex,
        # hence unimodal along the axis) signed point-cylinder distance —
        # same scheme as capsule-ellipsoid above
        def _sdist_cyl(t):
            pw = cc_ + (t * hc)[:, None] * axc
            pl_ = jnp.einsum("nij,ni->nj", Rc, pw - cc2)
            return _point_cylinder(pl_, rcy, hcy)[0]

        t_best = _seg_argmin(_sdist_cyl, cc_.shape[0], dtype)
        # 3 slots: the deepest segment point plus both capsule ends — a
        # capsule lying along the side (or across a cap) contacts on a
        # line, which the oracle resolves with a multi-point manifold; the
        # end candidates activate exactly there (dist < margin) and dedup
        # against t_best when it sits at an end.
        for ci, t in enumerate(
            (t_best, jnp.ones_like(t_best), -jnp.ones_like(t_best))
        ):
            p = cc_ + (t * hc)[:, None] * axc
            di, po, n = _sphere_cylinder(p, r, cc2, Rc, rcy, hcy)
            if ci > 0:
                di = jnp.where(jnp.abs(t - t_best) < 1e-4, 1e10, di)
            slots = slot0[ccy] + ci
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
            frame = frame.at[slots].set(make_frame(n))

    # ---- generic convex-convex (support-function dual ascent) ----
    # Covers the remaining primitive combinations (ellipsoid-box,
    # ellipsoid-cylinder, cylinder-cylinder, cylinder-box) with one
    # single-point scheme, the same dual the ellipsoid-ellipsoid branch
    # solves: max over unit u of g(u) = u.(c2-c1) - h1(u) - h2(u) equals
    # the signed separation (negative = exact MTV penetration) for any
    # two convex bodies; grad h = the support witness point, so the
    # ascent needs only support functions. MuJoCo resolves these pairs
    # with MPR (mjc_Convex) and also emits one contact.
    def _mesh_verts(gidx):
        """Hull vertex array (n, maxv, 3) for static geom ids (geom frame)."""
        mi = np.asarray(m.geom_meshidx)[np.asarray(gidx)]
        assert (mi >= 0).all(), "mesh pair on a geom with no hull data"
        return m.mesh_vert[mi].astype(dtype)

    def _support(gtype, Rw, size, u, verts=None):
        """(h(u), witness(u)) of the centered geom along world dirs u."""
        ul = jnp.einsum("nij,ni->nj", Rw, u)
        if gtype == M.GEOM_BOX:
            w_l = size * _sgn(ul)
            h = jnp.sum(size * jnp.abs(ul), -1)
        elif gtype == M.GEOM_CYLINDER:
            perp = ul * jnp.array([1.0, 1.0, 0.0], ul.dtype)
            pn = jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), M.MINVAL)
            w_l = size[:, 0:1] * perp / pn + jnp.concatenate(
                [jnp.zeros_like(perp[:, :2]), (size[:, 1] * _sgn(ul[:, 2]))[:, None]],
                axis=-1,
            )
            h = jnp.sum(w_l * ul, -1)
        elif gtype == M.GEOM_ELLIPSOID:
            su = size * ul
            h = jnp.maximum(jnp.linalg.norm(su, axis=-1), M.MINVAL)
            w_l = size * su / h[:, None]
        elif gtype == M.GEOM_SPHERE:
            h = size[:, 0]
            w_l = size[:, 0:1] * ul
        elif gtype == M.GEOM_CAPSULE:
            h = size[:, 0] + size[:, 1] * jnp.abs(ul[:, 2])
            w_l = size[:, 0:1] * ul + jnp.concatenate(
                [jnp.zeros_like(ul[:, :2]), (size[:, 1] * _sgn(ul[:, 2]))[:, None]],
                axis=-1,
            )
        elif gtype == M.GEOM_MESH:
            # hull support: max over vertices (padding duplicates vertex 0,
            # which never changes a max)
            dots = jnp.einsum("nkj,nj->nk", verts, ul)
            h = jnp.max(dots, -1)
            k = jnp.argmax(dots, -1)
            w_l = jnp.take_along_axis(verts, k[:, None, None], axis=1)[:, 0]
        else:  # pragma: no cover
            raise NotImplementedError(gtype)
        return h, jnp.einsum("nij,nj->ni", Rw, w_l)

    def _convex_pair(ta, tb, idx):
        c1w, c2w = d.geom_xpos[g1[idx]], d.geom_xpos[g2[idx]]
        R1w, R2w = _gmat(d, g1[idx]), _gmat(d, g2[idx])
        s1w = m.geom_size[g1[idx]].astype(dtype)
        s2w = m.geom_size[g2[idx]].astype(dtype)
        v1 = _mesh_verts(g1[idx]) if ta == M.GEOM_MESH else None
        v2 = _mesh_verts(g2[idx]) if tb == M.GEOM_MESH else None
        dc = c2w - c1w

        def _norm(v):
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), M.MINVAL
            )

        def ascend(k, carry):
            u, step = carry
            _, w1 = _support(ta, R1w, s1w, u, v1)
            _, w2 = _support(tb, R2w, s2w, -u, v2)
            grad = dc - w1 + w2  # note: h2 along -u => witness -w2(-u)
            grad = grad - u * jnp.sum(u * grad, -1, keepdims=True)
            return _norm(u + step * _norm(grad)), step * 0.93

        u, _ = jax.lax.fori_loop(
            0, 60, ascend, (_norm(dc), jnp.asarray(0.5, dtype))
        )
        h1, w1 = _support(ta, R1w, s1w, u, v1)
        h2, w2 = _support(tb, R2w, s2w, -u, v2)
        di = jnp.sum(u * dc, -1) - h1 - h2
        x1 = c1w + w1
        x2 = c2w + w2
        po = 0.5 * (x1 + x2)
        return di, po, u

    for ta, tb in (
        (M.GEOM_ELLIPSOID, M.GEOM_CYLINDER),
        (M.GEOM_ELLIPSOID, M.GEOM_BOX),
        (M.GEOM_CYLINDER, M.GEOM_CYLINDER),
        (M.GEOM_CYLINDER, M.GEOM_BOX),
        (M.GEOM_SPHERE, M.GEOM_MESH),
        (M.GEOM_CAPSULE, M.GEOM_MESH),
        (M.GEOM_ELLIPSOID, M.GEOM_MESH),
        (M.GEOM_CYLINDER, M.GEOM_MESH),
        (M.GEOM_BOX, M.GEOM_MESH),
        (M.GEOM_MESH, M.GEOM_MESH),
    ):
        cv = sel((t1 == ta) & (t2 == tb))
        if cv.size:
            di, po, n = _convex_pair(ta, tb, cv)
            slots = slot0[cv]
            dist = dist.at[slots].set(di)
            pos = pos.at[slots].set(po)
            frame = frame.at[slots].set(make_frame(n))

    # ---- box-box: SAT + 8-point face manifold / edge contact ----
    bb = sel((t1 == M.GEOM_BOX) & (t2 == M.GEOM_BOX))
    if bb.size:
        di, po, nr = _box_box(
            d.geom_xpos[g1[bb]],
            _gmat(d, g1[bb]),
            m.geom_size[g1[bb]].astype(dtype),
            d.geom_xpos[g2[bb]],
            _gmat(d, g2[bb]),
            m.geom_size[g2[bb]].astype(dtype),
            dtype,
        )
        slots = (slot0[bb][:, None] + np.arange(8)[None, :]).ravel()
        dist = dist.at[slots].set(di.reshape(-1))
        pos = pos.at[slots].set(po.reshape(-1, 3))
        frame = frame.at[slots].set(make_frame(nr.reshape(-1, 3)))

    ee = sel((t1 == M.GEOM_ELLIPSOID) & (t2 == M.GEOM_ELLIPSOID))
    if ee.size:
        # concave dual: over unit directions u, the support-function gap
        #   g(u) = u.(c2-c1) - sqrt(u^T A1 u) - sqrt(u^T A2 u),
        # with A_i = R_i diag(s_i^2) R_i^T, attains max_u g = signed
        # separation (negative = penetration depth, the MTV) at the contact
        # normal u*. Normalized-gradient ascent with a decaying angular
        # step; exact for both separated and overlapping ellipsoids.
        c1, c2 = d.geom_xpos[g1[ee]], d.geom_xpos[g2[ee]]
        R1, R2 = _gmat(d, g1[ee]), _gmat(d, g2[ee])
        s1 = m.geom_size[g1[ee]].astype(dtype)
        s2_ = m.geom_size[g2[ee]].astype(dtype)
        dc = c2 - c1

        def _Au(R, s, u):
            ul = jnp.einsum("nij,ni->nj", R, u)
            return jnp.einsum("nij,nj->ni", R, s * s * ul)

        def _norm(v):
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), M.MINVAL
            )

        def ascend(_, carry):
            u, step = carry
            a1u = _Au(R1, s1, u)
            a2u = _Au(R2, s2_, u)
            q1 = jnp.sqrt(jnp.maximum(jnp.sum(u * a1u, -1), M.MINVAL))
            q2 = jnp.sqrt(jnp.maximum(jnp.sum(u * a2u, -1), M.MINVAL))
            grad = dc - a1u / q1[:, None] - a2u / q2[:, None]
            # project out the radial component, step along the sphere
            grad = grad - u * jnp.sum(u * grad, -1, keepdims=True)
            return _norm(u + step * _norm(grad)), step * 0.9

        u, _ = jax.lax.fori_loop(
            0, 40, ascend, (_norm(dc), jnp.asarray(0.5, dtype))
        )
        a1u = _Au(R1, s1, u)
        a2u = _Au(R2, s2_, u)
        q1 = jnp.sqrt(jnp.maximum(jnp.sum(u * a1u, -1), M.MINVAL))
        q2 = jnp.sqrt(jnp.maximum(jnp.sum(u * a2u, -1), M.MINVAL))
        di = jnp.sum(u * dc, -1) - q1 - q2
        x1 = c1 + a1u / q1[:, None]  # support of E1 along +u
        x2 = c2 - a2u / q2[:, None]  # support of E2 along -u
        po = 0.5 * (x1 + x2)
        slots = slot0[ee]
        dist = dist.at[slots].set(di)
        pos = pos.at[slots].set(po)
        frame = frame.at[slots].set(make_frame(u))

    return d.replace(contact_dist=dist, contact_pos=pos, contact_frame=frame)
