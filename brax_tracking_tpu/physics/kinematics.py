"""Forward kinematics and CoM-frame quantities — level-vectorized.

Implements the position/velocity stages of the pipeline (MuJoCo
mj_kinematics / mj_comPos / mj_comVel semantics, validated against the C
oracle in tests/test_physics_smooth.py).

TPU-first structure: instead of looping over bodies, the tree is processed
one *depth level* at a time using the static ``Plan`` built at model-compile
time (physics/plan.py). Each level is a handful of wide vector ops with
compile-time gather/scatter indices, so the traced graph is O(depth), not
O(nbody) — this is what keeps XLA compile times and dispatch overhead low
while the batch dimension rides the VPU.

Functions take a single-env Data; the env layer vmaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu import math as btm
from brax_tracking_tpu.physics import model as M


def _gather_quat(qpos, qadr):
    """qpos[(n,) adr array] -> (n, 4) quaternion gather with static indices."""
    idx = qadr[:, None] + np.arange(4)[None, :]
    return qpos[idx]


def _joint_slot_groups(m: M.Model):
    """Static grouping of joints by (within-body slot, type).

    Joints of one body are consecutive in MJCF compile order; the slot is a
    joint's position within its body. Returns (max_slot, groups) where
    groups[slot][type] is an int array of joint ids.
    """
    jb = np.asarray(m.jnt_bodyid)
    jt = np.asarray(m.jnt_type)
    nj = m.njnt
    slot = np.zeros(nj, np.int64)
    seen: dict = {}
    for j in range(nj):
        b = int(jb[j])
        slot[j] = seen.get(b, 0)
        seen[b] = int(slot[j]) + 1
    max_slot = int(slot.max()) + 1 if nj else 0
    groups = []
    for s in range(max_slot):
        by_type = {}
        for t in (M.JNT_FREE, M.JNT_BALL, M.JNT_SLIDE, M.JNT_HINGE):
            by_type[t] = np.nonzero((slot == s) & (jt == t))[0]
        groups.append(by_type)
    return max_slot, groups


def kinematics(m: M.Model, d: M.Data, mats: bool = True) -> M.Data:
    """mj_kinematics: qpos -> body/joint/geom/site world frames.

    ``mats=False`` (the hot engine path) skips materializing the (n, 3, 3)
    rotation-matrix fields — on TPU their tiny minor dims tile-pad ~14x, and
    every consumer can derive what it needs from the stored quaternions.

    TPU-first structure: pointer-jumping ("parent doubling") over the body
    tree. Each body's *local* transform (fixed offset composed with its
    joints, all joints of one within-body slot handled as one wide op) is
    built first; then ceil(log2(depth)) doubling steps compose world
    transforms — O(log depth) traced ops instead of O(depth) levels (the
    rodent tree is 39 levels deep). Quaternion composition is associative,
    so the result matches the sequential recursion to float rounding.
    """
    qpos = d.qpos
    dtype = qpos.dtype
    plan = m.plan
    nb, nj = m.nbody, m.njnt

    rot = jax.vmap(btm.quat_rotate)
    max_slot, groups = _joint_slot_groups(m)

    # --- per-body local transform (parent-relative), wide over joint slots
    Lq = m.body_quat.astype(dtype)
    Lp = m.body_pos.astype(dtype)
    # pre-joint local prefix per joint (for anchors/axes after doubling)
    preq = jnp.zeros((nj, 4), dtype).at[:, 0].set(1.0)
    prep = jnp.zeros((nj, 3), dtype)
    free_jids = np.nonzero(np.asarray(m.jnt_type) == M.JNT_FREE)[0]

    for s in range(max_slot):
        g = groups[s]
        for t in (M.JNT_HINGE, M.JNT_SLIDE, M.JNT_BALL):
            jids = g[t]
            if not jids.size:
                continue
            bodies = np.asarray(m.jnt_bodyid)[jids]
            jpos = m.jnt_pos[jids].astype(dtype)
            jaxis = m.jnt_axis[jids].astype(dtype)
            q_s, p_s = Lq[bodies], Lp[bodies]
            preq = preq.at[jids].set(q_s)
            prep = prep.at[jids].set(p_s)
            qadr = np.asarray(m.jnt_qposadr)[jids]
            if t == M.JNT_HINGE:
                angle = qpos[qadr] - m.qpos0[qadr]
                qloc = btm.axis_angle_to_quat(jaxis, angle)
                tp = jpos - rot(qloc, jpos)
                Lq = Lq.at[bodies].set(btm.quat_mul(q_s, qloc))
                Lp = Lp.at[bodies].set(p_s + rot(q_s, tp))
            elif t == M.JNT_SLIDE:
                disp = qpos[qadr] - m.qpos0[qadr]
                Lp = Lp.at[bodies].set(p_s + rot(q_s, jaxis * disp[:, None]))
            else:  # ball
                qloc = btm.quat_normalize(_gather_quat(qpos, qadr))
                tp = jpos - rot(qloc, jpos)
                Lq = Lq.at[bodies].set(btm.quat_mul(q_s, qloc))
                Lp = Lp.at[bodies].set(p_s + rot(q_s, tp))
    if free_jids.size:
        # free-joint bodies take their world pose straight from qpos
        fb = np.asarray(m.jnt_bodyid)[free_jids]
        fqadr = np.asarray(m.jnt_qposadr)[free_jids]
        idx3 = fqadr[:, None] + np.arange(3)[None, :]
        fpos = qpos[idx3]
        fquat = btm.quat_normalize(_gather_quat(qpos, fqadr + 3))
        Lq = Lq.at[fb].set(fquat)
        Lp = Lp.at[fb].set(fpos)

    # --- pointer jumping: compose ceil(log2(depth)) ancestor blocks
    anc = np.asarray(m.body_parentid).copy()
    anc[0] = 0  # world is its own (identity) ancestor
    Lq = Lq.at[0].set(jnp.asarray([1.0, 0, 0, 0], dtype))
    Lp = Lp.at[0].set(0.0)
    depth = max(len(plan.levels), 1)
    n_jump = max(int(np.ceil(np.log2(depth))), 1)
    q, p = Lq, Lp
    for _ in range(n_jump):
        q_par, p_par = q[anc], p[anc]
        p = p_par + rot(q_par, p)
        # keep quats unit through the jumps (quat_rotate assumes unit)
        q = btm.quat_normalize(btm.quat_mul(q_par, q))
        anc = anc[anc]
    xquat = q
    xpos = p

    # --- joint anchors/axes from the pre-joint world transform
    xanchor = jnp.zeros((nj, 3), dtype)
    xaxis = jnp.zeros((nj, 3), dtype)
    if nj:
        jb = np.asarray(m.jnt_bodyid)
        nf = np.nonzero(np.asarray(m.jnt_type) != M.JNT_FREE)[0]
        if nf.size:
            par = np.asarray(m.body_parentid)[jb[nf]]
            q_par, p_par = xquat[par], xpos[par]
            q_s = btm.quat_mul(q_par, preq[nf])
            p_s = p_par + rot(q_par, prep[nf])
            xanchor = xanchor.at[nf].set(rot(q_s, m.jnt_pos[nf].astype(dtype)) + p_s)
            xaxis = xaxis.at[nf].set(rot(q_s, m.jnt_axis[nf].astype(dtype)))
        if free_jids.size:
            fqadr = np.asarray(m.jnt_qposadr)[free_jids]
            idx3 = fqadr[:, None] + np.arange(3)[None, :]
            xanchor = xanchor.at[free_jids].set(qpos[idx3])
            xaxis = xaxis.at[free_jids].set(m.jnt_axis[free_jids].astype(dtype))

    iquat = btm.quat_mul(xquat, m.body_iquat.astype(dtype))
    xipos = xpos + jax.vmap(btm.quat_rotate)(xquat, m.body_ipos.astype(dtype))

    gq = btm.quat_mul(xquat[m.geom_bodyid], m.geom_quat.astype(dtype))
    geom_xpos = xpos[m.geom_bodyid] + jax.vmap(btm.quat_rotate)(
        xquat[m.geom_bodyid], m.geom_pos.astype(dtype)
    )

    if m.nsite:
        sq = btm.quat_mul(xquat[m.site_bodyid], m.site_quat.astype(dtype))
        site_xpos = xpos[m.site_bodyid] + jax.vmap(btm.quat_rotate)(
            xquat[m.site_bodyid], m.site_pos.astype(dtype)
        )
    else:
        sq = jnp.zeros((0, 4), dtype)
        site_xpos = jnp.zeros((0, 3), dtype)

    return d.replace(
        xpos=xpos,
        xquat=xquat,
        xmat=btm.quat_to_mat(xquat) if mats else None,
        xipos=xipos,
        ximat=btm.quat_to_mat(iquat) if mats else None,
        xanchor=xanchor,
        xaxis=xaxis,
        geom_xpos=geom_xpos,
        geom_xmat=btm.quat_to_mat(gq) if mats else None,
        geom_xquat=gq,
        site_xpos=site_xpos,
        site_xmat=(btm.quat_to_mat(sq) if m.nsite else jnp.zeros((0, 3, 3), dtype))
        if mats
        else None,
        site_xquat=sq,
    )


def com_pos(m: M.Model, d: M.Data) -> M.Data:
    """mj_comPos: subtree CoM, packed cinert, component-major cdof."""
    from brax_tracking_tpu.math.spatial import transform_inertia_cm

    dtype = d.qpos.dtype
    plan = m.plan
    mass = m.body_mass.astype(dtype)

    SUB = jnp.asarray(plan.body_subtree_mask, dtype)
    acc = SUB @ (mass[:, None] * d.xipos)
    submass = SUB @ mass
    subtree_com = acc / jnp.maximum(submass, M.MINVAL)[:, None]

    root_com = subtree_com[m.body_rootid]
    iquat = btm.quat_mul(d.xquat, m.body_iquat.astype(dtype))
    cinert_s, cinert_h = transform_inertia_cm(
        m.body_inertia.astype(dtype), mass, iquat, (d.xipos - root_com).T
    )

    cdof = jnp.zeros((6, m.nv), dtype)
    free_j, ball_j, slide_j, hinge_j = (
        plan.jnt_by_type[0],
        plan.jnt_by_type[1],
        plan.jnt_by_type[2],
        plan.jnt_by_type[3],
    )
    jb = m.jnt_bodyid
    if hinge_j.size:
        dadr = m.jnt_dofadr[hinge_j]
        axis = d.xaxis[hinge_j]
        off = subtree_com[m.body_rootid[jb[hinge_j]]] - d.xanchor[hinge_j]
        cdof = cdof.at[:, dadr].set(
            jnp.concatenate([axis, jnp.cross(axis, off)], -1).T
        )
    if slide_j.size:
        dadr = m.jnt_dofadr[slide_j]
        zeros = jnp.zeros((slide_j.size, 3), dtype)
        cdof = cdof.at[:, dadr].set(jnp.concatenate([zeros, d.xaxis[slide_j]], -1).T)
    for jgrp, rot_off in ((ball_j, 0), (free_j, 3)):
        if not jgrp.size:
            continue
        b = jb[jgrp]
        off = subtree_com[m.body_rootid[b]] - d.xanchor[jgrp]  # (n, 3)
        cols = jnp.swapaxes(btm.quat_to_mat(d.xquat[b]), -1, -2)  # (n, 3axes, 3)
        lin = jnp.cross(cols, off[:, None, :])
        rows = jnp.concatenate([cols, lin], -1)  # (n, 3, 6)
        dadr = (m.jnt_dofadr[jgrp] + rot_off)[:, None] + np.arange(3)[None, :]
        cdof = cdof.at[:, dadr.reshape(-1)].set(rows.reshape(-1, 6).T)
    if free_j.size:
        dadr = m.jnt_dofadr[free_j][:, None] + np.arange(3)[None, :]
        eye = jnp.tile(
            jnp.concatenate([jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], -1),
            (free_j.size, 1, 1),
        )
        cdof = cdof.at[:, dadr.reshape(-1)].set(eye.reshape(-1, 6).T)

    return d.replace(
        subtree_com=subtree_com, cinert_s=cinert_s, cinert_h=cinert_h, cdof=cdof
    )


def tendon(m: M.Model, d: M.Data) -> M.Data:
    """Fixed-tendon lengths and jacobians (constant scatter of coefficients).

    Rodent uses 8 fixed tendons (/root/reference/assets/rodent.xml:521-560).
    """
    dtype = d.qpos.dtype
    if not m.ntendon:
        return d.replace(
            ten_length=jnp.zeros((0,), dtype), ten_J=jnp.zeros((0, m.nv), dtype)
        )
    # all wraps at once: wrap w belongs to tendon t(w)
    t_of_w = np.repeat(np.arange(m.ntendon), np.asarray(m.tendon_num))
    jids = np.asarray(m.wrap_objid)
    coef = m.wrap_prm.astype(dtype)
    qadr = np.asarray(m.jnt_qposadr)[jids]
    dadr = np.asarray(m.jnt_dofadr)[jids]
    lengths = jax.ops.segment_sum(
        coef * d.qpos[qadr], t_of_w, num_segments=m.ntendon
    )
    J = jnp.zeros((m.ntendon, m.nv), dtype).at[t_of_w, dadr].add(coef)
    return d.replace(ten_length=lengths, ten_J=J)


def com_vel(m: M.Model, d: M.Data) -> M.Data:
    """mj_comVel: component-major cvel and cdof time-derivatives."""
    from brax_tracking_tpu.math.spatial import motion_cross_cm

    dtype = d.qpos.dtype
    plan = m.plan

    contrib = d.cdof * d.qvel[None, :]  # (6, nv)
    # dof -> body accumulation and root-to-body prefix sum as matmuls (MXU)
    D2B = jnp.asarray(
        np.eye(m.nbody, dtype=np.float64)[np.asarray(m.dof_bodyid)], dtype
    )  # (nv, nbody) one-hot
    own = contrib @ D2B  # (6, nbody)
    cvel = own @ jnp.asarray(plan.body_subtree_mask, dtype)

    # velocity "before" each dof's joint sub-group, for cdof_dot
    S = jnp.asarray(plan.dof_suffix_mask, dtype)
    vbefore = cvel[:, np.asarray(m.dof_bodyid)] - contrib @ S.T
    cdof_dot = motion_cross_cm(vbefore, d.cdof)
    cdof_dot = jnp.where(
        jnp.asarray(plan.free_trans_dof)[None, :], 0.0, cdof_dot
    )
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)
