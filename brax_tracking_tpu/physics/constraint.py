"""Constraint row assembly: joint limits + contacts (pyramidal & elliptic).

Builds the efc_* arrays (jacobian, reference acceleration, inverse
constraint mass) the solver consumes, with a **static row layout**: every
candidate constraint always owns its rows; activation is runtime masking
(mirrors how MJX keeps shapes static, and is what lets the whole step
compile once).

Semantics follow MuJoCo's computation spec (solref/solimp -> KBI, pyramidal
cone rows mu*Jn +- Jt, elliptic cone rows [Jn; Jt]); coefficients are
validated row-by-row against the C oracle in
tests/test_physics_forward.py::test_rodent_efc_rows_parity (plus the
elliptic/extended-pair coverage in tests/test_collision_extended.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import model as M

# efc row types
ROW_LIMIT, ROW_CON_NORMAL, ROW_CON_FRICTION, ROW_CON_PYRAMID = 0, 1, 2, 3


@dataclass(frozen=True)
class EfcLayout:
    """Static efc row metadata (built per model, compile-time constant)."""

    nefc: int
    row_type: np.ndarray  # (nefc,)
    row_con: np.ndarray  # (nefc,) contact slot id or -1
    row_fdim: np.ndarray  # (nefc,) friction dim index (elliptic) / pyramid idx
    limit_jnt: np.ndarray  # limited scalar (hinge/slide) joint ids, row order
    limit_rows: np.ndarray  # row index of each scalar limit row
    limit_ball_jnt: np.ndarray  # limited BALL joint ids (dense-row limits)
    limit_ball_rows: np.ndarray  # row index of each ball limit row
    con_rows: np.ndarray  # (ncon,) first row of each contact slot (-1 if none)
    con_dim: np.ndarray  # (ncon,) condim per slot
    con_pair: np.ndarray  # (ncon,) pair index per slot
    con_geom1: np.ndarray
    con_geom2: np.ndarray


def efc_layout(m: M.Model) -> EfcLayout:
    limited = np.nonzero(np.asarray(m.jnt_limited))[0]
    for j in limited:
        if m.jnt_type[j] == M.JNT_FREE:
            # matches MuJoCo: free joints cannot be limited
            raise NotImplementedError("free joint limits")
    # Row order: scalar (hinge/slide) limits in joint order, then BALL
    # limits in joint order, then contacts. Scalar limit rows are
    # reconstructed from (jsign, static one-hot); ball limit rows have a
    # dense state-dependent jacobian (-rotation axis over the 3 dofs,
    # engine_core_constraint.c mj_instantiateLimit) and live at the HEAD of
    # the dense efc_Jc block, before the contact rows.
    scalar = [j for j in limited if m.jnt_type[j] in (M.JNT_HINGE, M.JNT_SLIDE)]
    balls = [j for j in limited if m.jnt_type[j] == M.JNT_BALL]
    rows_type, rows_con, rows_fdim = [], [], []
    limit_rows = []
    for j in scalar:
        limit_rows.append(len(rows_type))
        rows_type.append(ROW_LIMIT)
        rows_con.append(-1)
        rows_fdim.append(0)
    limit_ball_rows = []
    for j in balls:
        limit_ball_rows.append(len(rows_type))
        rows_type.append(ROW_LIMIT)
        rows_con.append(-1)
        rows_fdim.append(0)

    pairs = m.pairs
    ncon = m.ncon
    con_rows = np.full(ncon, -1, np.int32)
    con_dim = np.zeros(ncon, np.int32)
    con_pair = np.zeros(ncon, np.int32)
    con_g1 = np.zeros(ncon, np.int32)
    con_g2 = np.zeros(ncon, np.int32)
    slot = 0
    elliptic = m.opt.cone == M.CONE_ELLIPTIC
    for p in range(len(pairs.geom1)):
        dim = int(pairs.condim[p])
        for _ in range(int(pairs.npoint[p])):
            con_rows[slot] = len(rows_type)
            con_dim[slot] = dim
            con_pair[slot] = p
            con_g1[slot] = pairs.geom1[p]
            con_g2[slot] = pairs.geom2[p]
            if dim == 1:
                rows_type.append(ROW_CON_NORMAL)
                rows_con.append(slot)
                rows_fdim.append(0)
            elif elliptic:
                for k in range(dim):
                    rows_type.append(ROW_CON_NORMAL if k == 0 else ROW_CON_FRICTION)
                    rows_con.append(slot)
                    rows_fdim.append(k)
            else:
                for k in range(2 * (dim - 1)):
                    rows_type.append(ROW_CON_PYRAMID)
                    rows_con.append(slot)
                    rows_fdim.append(k)
            slot += 1

    return EfcLayout(
        nefc=len(rows_type),
        row_type=np.array(rows_type, np.int32),
        row_con=np.array(rows_con, np.int32),
        row_fdim=np.array(rows_fdim, np.int32),
        limit_jnt=np.array(scalar, np.int32),
        limit_rows=np.array(limit_rows, np.int32),
        limit_ball_jnt=np.array(balls, np.int32),
        limit_ball_rows=np.array(limit_ball_rows, np.int32),
        con_rows=con_rows,
        con_dim=con_dim,
        con_pair=con_pair,
        con_geom1=con_g1,
        con_geom2=con_g2,
    )


def _kbi(m: M.Model, solref, solimp, pos, dtype):
    """solref/solimp -> (stiffness*imp, damping, imp) per row.

    pos is the constraint violation r = efc_pos - margin (<= 0 when active).
    Returns aref position/velocity coefficients and the impedance.
    """
    timeconst = solref[..., 0]
    dampratio = solref[..., 1]
    dmin, dmax = solimp[..., 0], solimp[..., 1]
    width = jnp.maximum(solimp[..., 2], M.MINVAL)
    mid = jnp.clip(solimp[..., 3], 0.0001, 0.9999)
    power = jnp.maximum(solimp[..., 4], 1.0)

    # impedance sigmoid
    x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1)
    b = 1.0 / jnp.power(1 - mid, power - 1)
    y = jnp.where(
        x <= mid, a * jnp.power(x, power), 1 - b * jnp.power(1 - x, power)
    )
    imp = dmin + y * (dmax - dmin)
    imp = jnp.clip(imp, dmin, dmax)
    imp = jnp.clip(imp, M.MINVAL, 1 - M.MINVAL)

    # stiffness/damping
    dt = m.opt.timestep.astype(dtype)
    tc = jnp.maximum(timeconst, 2 * dt)
    k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dampratio * dampratio, M.MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * tc, M.MINVAL)
    direct = solref[..., 0] <= 0
    k = jnp.where(direct, -solref[..., 0] / jnp.maximum(dmax * dmax, M.MINVAL), k_std)
    b = jnp.where(direct, -solref[..., 1] / jnp.maximum(dmax, M.MINVAL), b_std)
    return k, b, imp


def _contact_jac(m: M.Model, d: M.Data, layout: EfcLayout):
    """Translational jacobian difference at each contact point: (ncon, 3, nv).

    One matmul, no (ncon, nv, 3) intermediates: with off = p_c - com(root),
      frame_row . (lin_v + ang_v x off) = [off x frame_row | frame_row] . cdof_v
    (scalar triple product), so per tree root J = A @ cdof with
    A = (ncon*3, 6). Dofs of different kinematic roots (e.g. the two rats in
    rodent_pair) are combined with static root-membership masks.
    """
    dtype = d.qpos.dtype
    b1 = m.geom_bodyid[layout.con_geom1]
    b2 = m.geom_bodyid[layout.con_geom2]
    md = (
        jnp.asarray(m.body_dof_mask[b2], dtype)
        - jnp.asarray(m.body_dof_mask[b1], dtype)
    )  # (ncon, nv): body2 minus body1 (normal points g1 -> g2)
    p = d.contact_pos  # (ncon, 3)
    F = d.contact_frame  # (ncon, 3, 3)

    dof_root = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    roots = np.unique(dof_root)
    J = None
    A_stack = []
    for r in roots:
        off = p - d.subtree_com[int(r)]  # (ncon, 3)
        ofx = jnp.cross(jnp.broadcast_to(off[:, None, :], F.shape), F, axis=-1)
        A = jnp.concatenate([ofx, F], axis=-1)  # (ncon, 3, 6)
        A_stack.append(A)
        Jr = jnp.einsum("cnk,kv->cnv", A, d.cdof)
        if len(roots) > 1:
            Jr = Jr * jnp.asarray(dof_root == r, dtype)[None, None, :]
        J = Jr if J is None else J + Jr
    return J * md[:, None, :], jnp.stack(A_stack)


def make_constraint(m: M.Model, d: M.Data) -> M.Data:
    """Assembles efc_J / efc_D / efc_aref / efc_pos and activity predicates."""
    dtype = d.qpos.dtype
    layout = efc_layout(m)
    nefc, nv = layout.nefc, m.nv
    if nefc == 0:
        return d.replace(
            efc_Jc=jnp.zeros((0, nv), dtype),
            efc_jsign=jnp.zeros(0, dtype),
            efc_D=jnp.zeros(0, dtype),
            efc_aref=jnp.zeros(0, dtype),
            efc_pos=jnp.zeros(0, dtype),
            efc_margin=jnp.zeros(0, dtype),
        )

    efc_jsign = jnp.zeros((layout.limit_rows.size,), dtype)
    efc_D = jnp.zeros(nefc, dtype)
    efc_aref = jnp.zeros(nefc, dtype)
    efc_pos = jnp.zeros(nefc, dtype)
    efc_margin = jnp.zeros(nefc, dtype)

    # ---------------- joint limits ----------------
    if layout.limit_jnt.size:
        jids = layout.limit_jnt
        qadr = m.jnt_qposadr[jids]
        dadr = m.jnt_dofadr[jids]
        lo = m.jnt_range[jids, 0].astype(dtype)
        hi = m.jnt_range[jids, 1].astype(dtype)
        qp = d.qpos[qadr]
        dist_lo = qp - lo
        dist_hi = hi - qp
        use_lo = dist_lo <= dist_hi
        dist = jnp.where(use_lo, dist_lo, dist_hi)
        sign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[jids].astype(dtype)
        k, b, imp = _kbi(
            m,
            m.jnt_solref[jids].astype(dtype),
            m.jnt_solimp[jids].astype(dtype),
            dist - margin,
            dtype,
        )
        jvel = sign * d.qvel[dadr]
        aref = -b * jvel - k * imp * (dist - margin)
        invweight = m.dof_invweight0[dadr].astype(dtype)
        r = jnp.maximum((1 - imp) / imp * invweight, M.MINVAL)
        rows = layout.limit_rows
        efc_jsign = sign
        efc_D = efc_D.at[rows].set(1.0 / r)
        efc_aref = efc_aref.at[rows].set(aref)
        efc_pos = efc_pos.at[rows].set(dist)
        efc_margin = efc_margin.at[rows].set(margin)

    # ---------------- ball-joint limits (dense rows) ----------------
    # mj_instantiateLimit, mjJNT_BALL branch: limit on the total rotation
    # angle; dist = max(range) - |angle|, jacobian = -axis over the 3 dofs.
    n_ball = int(layout.limit_ball_jnt.size)
    ball_J = jnp.zeros((n_ball, nv), dtype)
    if n_ball:
        from brax_tracking_tpu import math as btm

        jids = layout.limit_ball_jnt
        qadr = np.asarray(m.jnt_qposadr)[jids]
        dadr = np.asarray(m.jnt_dofadr)[jids]
        quat = jnp.stack([d.qpos[a : a + 4] for a in qadr])  # (n_ball, 4)
        aa = jax.vmap(btm.quat_to_axis_angle)(quat)  # rotation vectors
        angle = jnp.linalg.norm(aa, axis=-1)
        axis = aa / jnp.maximum(angle, M.MINVAL)[:, None]
        axis = jnp.where(
            (angle > M.MINVAL)[:, None],
            axis,
            jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dtype), axis.shape),
        )
        amax = np.maximum(
            np.asarray(m.jnt_range)[jids, 0], np.asarray(m.jnt_range)[jids, 1]
        )
        dist = jnp.asarray(amax, dtype) - angle
        margin = m.jnt_margin[jids].astype(dtype)
        k, b, imp = _kbi(
            m,
            m.jnt_solref[jids].astype(dtype),
            m.jnt_solimp[jids].astype(dtype),
            dist - margin,
            dtype,
        )
        qvel3 = jnp.stack([d.qvel[a : a + 3] for a in dadr])  # (n_ball, 3)
        jvel = jnp.sum(-axis * qvel3, axis=-1)
        aref = -b * jvel - k * imp * (dist - margin)
        invweight = m.dof_invweight0[dadr].astype(dtype)
        r = jnp.maximum((1 - imp) / imp * invweight, M.MINVAL)
        rows = layout.limit_ball_rows
        for i, a in enumerate(dadr):
            ball_J = jax.lax.dynamic_update_slice(
                ball_J, -axis[i][None, :], (i, int(a))
            )
        efc_D = efc_D.at[rows].set(1.0 / r)
        efc_aref = efc_aref.at[rows].set(aref)
        efc_pos = efc_pos.at[rows].set(dist)
        efc_margin = efc_margin.at[rows].set(margin)

    # ---------------- contacts ----------------
    ncon = m.ncon
    if ncon:
        pairs = m.pairs
        cp = layout.con_pair
        jac, con_A = _contact_jac(m, d, layout)  # (ncon,3,nv) rows: n,t1,t2
        d = d.replace(con_A=con_A)
        friction = pairs.friction[cp].astype(dtype)  # (ncon, 5)
        solref = pairs.solref[cp].astype(dtype)
        solimp = pairs.solimp[cp].astype(dtype)
        margin = pairs.margin[cp].astype(dtype)
        gap = pairs.gap[cp].astype(dtype)
        includemargin = margin  # oracle (mujoco 3.10): gap does not subtract
        dist = d.contact_dist
        pos_r = dist - includemargin
        k, b, imp = _kbi(m, solref, solimp, pos_r, dtype)
        b1 = m.geom_bodyid[layout.con_geom1]
        b2 = m.geom_bodyid[layout.con_geom2]
        invweight = (
            m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        ).astype(dtype)
        impratio = m.opt.impratio.astype(dtype)

        jvel = jnp.einsum("cnv,v->cn", jac, d.qvel)  # (ncon, 3)

        # Vectorized row assembly over the static layout: every contact row's
        # (slot, kind, friction-dim) is a compile-time constant, so the whole
        # block is a handful of gathers + one contiguous slice write (the old
        # per-slot Python loop made compile time scale with ncon and lowered
        # to scatter chains on TPU). Numerics are identical to the loop form
        # validated against the C oracle (incl. the elliptic friction-row
        # regularizer invweight/impratio).
        c_rows = np.nonzero(layout.row_con >= 0)[0]
        row0 = int(c_rows[0])
        assert np.array_equal(c_rows, np.arange(row0, row0 + c_rows.size))
        slot = jnp.asarray(layout.row_con[c_rows])
        kdim = layout.row_fdim[c_rows]
        rtype = layout.row_type[c_rows]
        is_pyr = jnp.asarray(rtype == ROW_CON_PYRAMID)
        # pyramid decomposition of the fdim index: pairs (+t_i, -t_i)
        i_pyr = kdim // 2
        sgn = jnp.asarray(1.0 - 2.0 * (kdim % 2), dtype)
        k_ell = jnp.asarray(np.where(rtype == ROW_CON_PYRAMID, 0, kdim))
        i_tan = jnp.asarray(np.where(rtype == ROW_CON_PYRAMID, i_pyr + 1, 0))

        mu_i = friction[slot, jnp.asarray(i_pyr)]
        jac_sel = jac[slot, k_ell]  # (nrows, nv): elliptic row's jacobian
        jrow = jnp.where(
            is_pyr[:, None],
            jac[slot, 0] + (sgn * mu_i)[:, None] * jac[slot, i_tan],
            jac_sel,
        )
        vel = jnp.where(
            is_pyr,
            jvel[slot, 0] + sgn * mu_i * jvel[slot, i_tan],
            jvel[slot, k_ell],
        )
        has_pos_term = jnp.asarray(rtype != ROW_CON_FRICTION)
        aref = -b[slot] * vel - jnp.where(
            has_pos_term, k[slot] * imp[slot] * pos_r[slot], 0.0
        )
        invw_pyr = 2.0 * mu_i * mu_i * (1.0 + mu_i * mu_i) * invweight[slot]
        invw_ell = jnp.where(
            jnp.asarray(kdim == 0), invweight[slot], invweight[slot] / impratio
        )
        invw = jnp.where(is_pyr, invw_pyr, invw_ell)
        r_reg = jnp.maximum((1 - imp[slot]) / imp[slot] * invw, M.MINVAL)

        # dense block = [ball-limit rows; contact rows]
        efc_Jc = jnp.concatenate([ball_J, jrow], axis=0) if n_ball else jrow
        efc_D = jax.lax.dynamic_update_slice(efc_D, 1.0 / r_reg, (row0,))
        efc_aref = jax.lax.dynamic_update_slice(efc_aref, aref, (row0,))
        efc_pos = jax.lax.dynamic_update_slice(efc_pos, dist[slot], (row0,))
        efc_margin = jax.lax.dynamic_update_slice(
            efc_margin, includemargin[slot], (row0,)
        )

    if not ncon:
        efc_Jc = ball_J  # (n_ball, nv); empty when no ball limits either
    return d.replace(
        efc_Jc=efc_Jc,
        efc_jsign=efc_jsign,
        efc_D=efc_D,
        efc_aref=efc_aref,
        efc_pos=efc_pos,
        efc_margin=efc_margin,
    )


def limit_dofs(m: M.Model) -> np.ndarray:
    """Static dof address of each limit row."""
    layout = efc_layout(m)
    return np.asarray(m.jnt_dofadr)[np.asarray(layout.limit_jnt)]


def jac_mul(m: M.Model, d: M.Data, x: jax.Array) -> jax.Array:
    """J @ x without materializing the dense J: limit rows are gathers."""
    parts = []
    if d.efc_jsign.shape[0]:
        parts.append(d.efc_jsign * x[limit_dofs(m)])
    if d.efc_Jc.shape[0]:
        parts.append(d.efc_Jc @ x)
    if not parts:
        return jnp.zeros((0,), x.dtype)
    return jnp.concatenate(parts)


def jac_t_mul(m: M.Model, d: M.Data, f: jax.Array) -> jax.Array:
    """J^T @ f: one-hot scatter for limit rows + dense contact block."""
    nlim = d.efc_jsign.shape[0]
    out = jnp.zeros((m.nv,), f.dtype)
    if nlim:
        L1 = jnp.asarray(
            np.eye(m.nv, dtype=np.float64)[limit_dofs(m)], f.dtype
        )  # (nlim, nv)
        out = out + (d.efc_jsign * f[:nlim]) @ L1
    if d.efc_Jc.shape[0]:
        out = out + d.efc_Jc.T @ f[nlim:]
    return out


def dense_J(m: M.Model, d: M.Data) -> jax.Array:
    """Reconstructed dense (nefc, nv) jacobian (tests / debugging only)."""
    layout = efc_layout(m)
    nlim = d.efc_jsign.shape[0]
    J = jnp.zeros((layout.nefc, m.nv), d.efc_D.dtype)
    if nlim:
        J = J.at[np.arange(nlim), limit_dofs(m)].set(d.efc_jsign)
    if d.efc_Jc.shape[0]:
        J = J.at[nlim:].set(d.efc_Jc)
    return J
