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
from brax_tracking_tpu.math.spatial import transform_inertia
from brax_tracking_tpu.physics import model as M


def _gather_quat(qpos, qadr):
    """qpos[(n,) adr array] -> (n, 4) quaternion gather with static indices."""
    idx = qadr[:, None] + np.arange(4)[None, :]
    return qpos[idx]


def kinematics(m: M.Model, d: M.Data) -> M.Data:
    """mj_kinematics: qpos -> body/joint/geom/site world frames."""
    qpos = d.qpos
    dtype = qpos.dtype
    plan = m.plan

    xpos = jnp.zeros((m.nbody, 3), dtype)
    xquat = jnp.zeros((m.nbody, 4), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((m.njnt, 3), dtype)
    xaxis = jnp.zeros((m.njnt, 3), dtype)

    for lev in plan.levels:
        pq = xquat[lev.parents]
        pp = xpos[lev.parents]
        bq = btm.quat_mul(pq, m.body_quat[lev.bodies].astype(dtype))
        bp = pp + jax.vmap(btm.quat_rotate)(pq, m.body_pos[lev.bodies].astype(dtype))

        # free-joint bodies: pose straight from qpos
        fr = lev.free
        if fr.body.size:
            idx3 = fr.qadr[:, None] + np.arange(3)[None, :]
            fpos = qpos[idx3]
            fquat = btm.quat_normalize(_gather_quat(qpos, fr.qadr + 3))
            bp = bp.at[fr.level_pos].set(fpos)
            bq = bq.at[fr.level_pos].set(fquat)
            xanchor = xanchor.at[fr.jid].set(fpos)
            xaxis = xaxis.at[fr.jid].set(m.jnt_axis[fr.jid].astype(dtype))

        for hinge, slide, ball in lev.slots:
            if hinge.body.size:
                sel = hinge.level_pos
                jpos = m.jnt_pos[hinge.jid].astype(dtype)
                jaxis = m.jnt_axis[hinge.jid].astype(dtype)
                q_s, p_s = bq[sel], bp[sel]
                anchor = jax.vmap(btm.quat_rotate)(q_s, jpos) + p_s
                axis_w = jax.vmap(btm.quat_rotate)(q_s, jaxis)
                angle = qpos[hinge.qadr] - m.qpos0[hinge.qadr]
                qloc = btm.axis_angle_to_quat(jaxis, angle)
                q_new = btm.quat_mul(q_s, qloc)
                p_new = anchor - jax.vmap(btm.quat_rotate)(q_new, jpos)
                bq = bq.at[sel].set(q_new)
                bp = bp.at[sel].set(p_new)
                xanchor = xanchor.at[hinge.jid].set(anchor)
                xaxis = xaxis.at[hinge.jid].set(axis_w)
            if slide.body.size:
                sel = slide.level_pos
                jpos = m.jnt_pos[slide.jid].astype(dtype)
                jaxis = m.jnt_axis[slide.jid].astype(dtype)
                q_s, p_s = bq[sel], bp[sel]
                anchor = jax.vmap(btm.quat_rotate)(q_s, jpos) + p_s
                axis_w = jax.vmap(btm.quat_rotate)(q_s, jaxis)
                disp = qpos[slide.qadr] - m.qpos0[slide.qadr]
                bp = bp.at[sel].set(p_s + axis_w * disp[:, None])
                xanchor = xanchor.at[slide.jid].set(anchor)
                xaxis = xaxis.at[slide.jid].set(axis_w)
            if ball.body.size:
                sel = ball.level_pos
                jpos = m.jnt_pos[ball.jid].astype(dtype)
                jaxis = m.jnt_axis[ball.jid].astype(dtype)
                q_s, p_s = bq[sel], bp[sel]
                anchor = jax.vmap(btm.quat_rotate)(q_s, jpos) + p_s
                axis_w = jax.vmap(btm.quat_rotate)(q_s, jaxis)
                qloc = btm.quat_normalize(_gather_quat(qpos, ball.qadr))
                q_new = btm.quat_mul(q_s, qloc)
                p_new = anchor - jax.vmap(btm.quat_rotate)(q_new, jpos)
                bq = bq.at[sel].set(q_new)
                bp = bp.at[sel].set(p_new)
                xanchor = xanchor.at[ball.jid].set(anchor)
                xaxis = xaxis.at[ball.jid].set(axis_w)

        xquat = xquat.at[lev.bodies].set(btm.quat_normalize(bq))
        xpos = xpos.at[lev.bodies].set(bp)

    xmat = btm.quat_to_mat(xquat)
    iquat = btm.quat_mul(xquat, m.body_iquat.astype(dtype))
    xipos = xpos + jax.vmap(btm.quat_rotate)(xquat, m.body_ipos.astype(dtype))
    ximat = btm.quat_to_mat(iquat)

    gq = btm.quat_mul(xquat[m.geom_bodyid], m.geom_quat.astype(dtype))
    geom_xpos = xpos[m.geom_bodyid] + jax.vmap(btm.quat_rotate)(
        xquat[m.geom_bodyid], m.geom_pos.astype(dtype)
    )
    geom_xmat = btm.quat_to_mat(gq)

    if m.nsite:
        sq = btm.quat_mul(xquat[m.site_bodyid], m.site_quat.astype(dtype))
        site_xpos = xpos[m.site_bodyid] + jax.vmap(btm.quat_rotate)(
            xquat[m.site_bodyid], m.site_pos.astype(dtype)
        )
        site_xmat = btm.quat_to_mat(sq)
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
        site_xmat = jnp.zeros((0, 3, 3), dtype)

    return d.replace(
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        ximat=ximat,
        xanchor=xanchor,
        xaxis=xaxis,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
    )


def com_pos(m: M.Model, d: M.Data) -> M.Data:
    """mj_comPos: subtree CoM, cinert, cdof (one op per level / joint type)."""
    dtype = d.qpos.dtype
    plan = m.plan
    mass = m.body_mass.astype(dtype)

    SUB = jnp.asarray(plan.body_subtree_mask, dtype)
    acc = SUB @ (mass[:, None] * d.xipos)
    submass = SUB @ mass
    subtree_com = acc / jnp.maximum(submass, M.MINVAL)[:, None]

    root_com = subtree_com[m.body_rootid]
    inert = transform_inertia(
        m.body_inertia.astype(dtype), mass, d.ximat, d.xipos - root_com
    )

    cdof = jnp.zeros((m.nv, 6), dtype)
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
        cdof = cdof.at[dadr].set(jnp.concatenate([axis, jnp.cross(axis, off)], -1))
    if slide_j.size:
        dadr = m.jnt_dofadr[slide_j]
        zeros = jnp.zeros((slide_j.size, 3), dtype)
        cdof = cdof.at[dadr].set(jnp.concatenate([zeros, d.xaxis[slide_j]], -1))
    for jgrp, rot_off in ((ball_j, 0), (free_j, 3)):
        if not jgrp.size:
            continue
        b = jb[jgrp]
        off = subtree_com[m.body_rootid[b]] - d.xanchor[jgrp]  # (n, 3)
        cols = jnp.swapaxes(d.xmat[b], -1, -2)  # (n, 3axes, 3)
        lin = jnp.cross(cols, off[:, None, :])
        rows = jnp.concatenate([cols, lin], -1)  # (n, 3, 6)
        dadr = (m.jnt_dofadr[jgrp] + rot_off)[:, None] + np.arange(3)[None, :]
        cdof = cdof.at[dadr.reshape(-1)].set(rows.reshape(-1, 6))
    if free_j.size:
        dadr = m.jnt_dofadr[free_j][:, None] + np.arange(3)[None, :]
        eye = jnp.tile(
            jnp.concatenate([jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], -1),
            (free_j.size, 1, 1),
        )
        cdof = cdof.at[dadr.reshape(-1)].set(eye.reshape(-1, 6))

    return d.replace(
        subtree_com=subtree_com, cinert_i=inert.i, cinert_h=inert.h, cdof=cdof
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
    """mj_comVel: body spatial velocities cvel and cdof time-derivatives."""
    dtype = d.qpos.dtype
    plan = m.plan

    contrib = d.cdof * d.qvel[:, None]  # (nv, 6)
    own = jax.ops.segment_sum(contrib, np.asarray(m.dof_bodyid), m.nbody)

    # root-to-body prefix sum as one mask matmul (own[world]=0)
    cvel = jnp.asarray(plan.body_subtree_mask, dtype).T @ own

    # velocity "before" each dof's joint sub-group, for cdof_dot
    S = jnp.asarray(plan.dof_suffix_mask, dtype)
    vbefore = cvel[m.dof_bodyid] - S @ contrib
    cdof_dot = btm.motion_cross(vbefore, d.cdof)
    cdof_dot = jnp.where(
        jnp.asarray(plan.free_trans_dof)[:, None], 0.0, cdof_dot
    )
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)
