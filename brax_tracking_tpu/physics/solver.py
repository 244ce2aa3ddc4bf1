"""Constraint solver: projected CG on the primal (acceleration) problem.

Minimizes over qacc:
    0.5 (x - a0)' M (x - a0) + sum_i s_i(J x - aref)
where a0 = qacc_smooth and s_i are the per-row penalty functions defined by
MuJoCo's constraint model: one-sided quadratics for limits / pyramidal
contact rows, and the elliptic-cone cost for elliptic contacts. This is the
same convex problem mj_forward solves; the implementation is a fixed
iteration-count CG (Polak-Ribiere, M^-1-preconditioned) with an iterative
exact line search — fully branch-free so one XLA compilation serves every
env in the batch (converged envs freeze via masking).

Validated against C-oracle qacc/qfrc_constraint in tests.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu.physics import constraint as Cn
from brax_tracking_tpu.physics import dynamics as D
from brax_tracking_tpu.physics import model as M


class _ConeMeta(NamedTuple):
    """Static row metadata for evaluating the constraint cost."""

    quad_rows: np.ndarray  # rows with 1-sided quadratic cost
    quad_exists_con: np.ndarray  # contact slot gating each quad row (-1 = limit)
    ell_con: np.ndarray  # elliptic contact slot ids
    ell_rows: np.ndarray  # (nell, maxdim) row indices (normal first), -1 pad
    ell_dim: np.ndarray  # (nell,)


def _cone_meta(m: M.Model, layout: Cn.EfcLayout) -> _ConeMeta:
    elliptic = m.opt.cone == M.CONE_ELLIPTIC
    quad_rows, quad_con = [], []
    ell_con, ell_rows, ell_dim = [], [], []
    for r in range(layout.nefc):
        t = layout.row_type[r]
        if t == Cn.ROW_LIMIT:
            quad_rows.append(r)
            quad_con.append(-1)
        elif t == Cn.ROW_CON_PYRAMID:
            quad_rows.append(r)
            quad_con.append(layout.row_con[r])
        elif t == Cn.ROW_CON_NORMAL and (
            not elliptic or layout.con_dim[layout.row_con[r]] == 1
        ):
            quad_rows.append(r)
            quad_con.append(layout.row_con[r])
    if elliptic:
        for slot in range(m.ncon):
            dim = int(layout.con_dim[slot])
            if dim > 1:
                ell_con.append(slot)
                rows = [int(layout.con_rows[slot]) + k for k in range(dim)]
                ell_rows.append(rows)
                ell_dim.append(dim)
    maxdim = max(ell_dim, default=1)
    ell_rows = np.array(
        [r + [-1] * (maxdim - len(r)) for r in ell_rows], np.int32
    ).reshape(len(ell_con), maxdim)
    return _ConeMeta(
        np.array(quad_rows, np.int32),
        np.array(quad_con, np.int32),
        np.array(ell_con, np.int32),
        ell_rows,
        np.array(ell_dim, np.int32),
    )


class _Ctx(NamedTuple):
    x: jax.Array  # qacc
    jar: jax.Array  # J x - aref
    mxa: jax.Array  # qM (x - qacc_smooth), tracked incrementally
    force: jax.Array  # efc forces
    cost: jax.Array
    grad: jax.Array
    mgrad: jax.Array


def _eval_cost_force(m, meta, layout, pairs_friction, exists_row, exists_con, jar, efc_D):
    """Constraint cost and per-row force at the given jar.

    pairs_friction: (ncon, 5) per-SLOT friction (pair friction expanded
    through layout.con_pair — a pair can own several slots),
    exists_row: (nefc,) bool — row instantiated (efc_pos < efc_margin),
    exists_con: (ncon,) bool — contact slot active (for elliptic cones).
    """
    dtype = jar.dtype
    force = jnp.zeros_like(jar)
    cost = jnp.zeros((), dtype)

    if meta.quad_rows.size:
        r = meta.quad_rows
        active = (jar[r] < 0) & exists_row[r]
        f = jnp.where(active, -efc_D[r] * jar[r], 0.0)
        force = force.at[r].set(f)
        cost = cost + 0.5 * jnp.sum(jnp.where(active, efc_D[r] * jar[r] ** 2, 0.0))

    if meta.ell_con.size:
        slots = meta.ell_con
        rows = meta.ell_rows  # (nell, dim)
        mu = pairs_friction[slots, 0]  # reference coefficient (slide1)
        # tangent row i is scaled by friction[i-1]/mu: [slide1, slide2]/mu
        fr = pairs_friction[slots, 0:2]
        n = jar[rows[:, 0]]
        # friction-scaled tangential components: u_i = jar_i * friction_i / mu
        u_t = jar[rows[:, 1:]] * fr / mu[:, None]
        tsqr = jnp.sum(u_t * u_t, axis=-1)
        t = jnp.sqrt(jnp.maximum(tsqr, M.MINVAL * M.MINVAL))
        g = exists_con[slots]
        dn = efc_D[rows[:, 0]]
        bottom = g & (mu * n + t <= 0)
        middle = g & ~bottom & (n < mu * t)
        dm = dn / jnp.maximum(1 + mu * mu, M.MINVAL)  # oracle-fitted: D_n/(1+mu^2)
        nmt = n - mu * t
        # bottom zone: independent quadratics on all rows
        d_all = efc_D[rows]  # (nell, dim)
        jar_all = jar[rows]
        cost = cost + jnp.sum(
            jnp.where(bottom, 0.5 * jnp.sum(d_all * jar_all**2, -1), 0.0)
        )
        f_bottom = -d_all * jar_all
        # middle zone: cone distance cost
        cost = cost + jnp.sum(jnp.where(middle, 0.5 * dm * nmt * nmt, 0.0))
        fn_mid = -dm * nmt
        ft_mid = (dm * nmt * mu)[:, None] * (u_t / t[:, None]) * fr / mu[:, None]
        f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=-1)
        f = jnp.where(bottom[:, None], f_bottom, jnp.where(middle[:, None], f_mid, 0.0))
        valid = jnp.asarray(rows >= 0)
        force = force.at[np.maximum(rows, 0)].add(jnp.where(valid, f, 0.0))

    return cost, force


def _linesearch(m, meta, friction, exists_row, exists_con, ctx, p, jar_p, mp,
                efc_D):
    """Exact line search along p: bracket phi' sign change, safeguarded Newton.

    phi(alpha) is convex piecewise-smooth; dphi evaluates (phi', phi'') for a
    *batch* of alphas at once so the bracket expansion is a single wide op.
    """
    dtype = ctx.x.dtype
    pmp = jnp.dot(p, mp)
    # gauss part: phi_g(a) = 0.5||x + a p - a0||_M^2 -> phi_g' = p'M(x-a0) + a p'Mp
    gauss_p = jnp.dot(p, ctx.mxa)

    def dphi(alpha):
        """alpha: (...,) -> (phi'(alpha), phi''(alpha)) elementwise."""
        a = alpha[..., None]
        jar = ctx.jar + a * jar_p  # (..., nefc)
        dval = gauss_p + alpha * pmp
        ddval = jnp.broadcast_to(pmp, alpha.shape)
        if meta.quad_rows.size:
            r = meta.quad_rows
            active = (jar[..., r] < 0) & exists_row[r]
            dval = dval + jnp.sum(
                jnp.where(active, efc_D[r] * jar[..., r] * jar_p[r], 0.0), -1
            )
            ddval = ddval + jnp.sum(
                jnp.where(active, efc_D[r] * jar_p[r] ** 2, 0.0), -1
            )
        if meta.ell_con.size:
            slots = meta.ell_con
            rows = meta.ell_rows
            mu = friction[slots, 0]
            fr = friction[slots, 0:2]  # tangent scale = [slide1, slide2]/mu
            n = jar[..., rows[:, 0]]
            np_ = jar_p[rows[:, 0]]
            scale = fr / mu[:, None]
            u_t = jar[..., rows[:, 1:]] * scale
            u_tp = jar_p[rows[:, 1:]] * scale
            tsqr = jnp.sum(u_t * u_t, -1)
            t = jnp.sqrt(jnp.maximum(tsqr, M.MINVAL * M.MINVAL))
            tp_dot = jnp.sum(u_t * u_tp, -1)
            tpsqr = jnp.sum(u_tp * u_tp, -1)
            g = exists_con[slots]
            dn = efc_D[rows[:, 0]]
            bottom = g & (mu * n + t <= 0)
            middle = g & ~bottom & (n < mu * t)
            dm = dn / jnp.maximum(1 + mu * mu, M.MINVAL)  # oracle-fitted
            nmt = n - mu * t
            tprime = tp_dot / t
            tdprime = jnp.maximum(tpsqr - tprime * tprime, 0.0) / t
            dval = dval + jnp.sum(
                jnp.where(middle, dm * nmt * (np_ - mu * tprime), 0.0), -1
            )
            ddval = ddval + jnp.sum(
                jnp.where(
                    middle,
                    dm * ((np_ - mu * tprime) ** 2 - nmt * mu * tdprime),
                    0.0,
                ),
                -1,
            )
            d_all = efc_D[rows]
            jar_all = jar[..., rows]
            dval = dval + jnp.sum(
                jnp.where(bottom, jnp.sum(d_all * jar_all * jar_p[rows], -1), 0.0),
                -1,
            )
            ddval = ddval + jnp.sum(
                jnp.where(bottom, jnp.sum(d_all * jar_p[rows] ** 2, -1), 0.0), -1
            )
        return dval, ddval

    d0, dd0 = dphi(jnp.zeros((1,), dtype))
    guess = jnp.maximum(-d0[0] / jnp.maximum(dd0[0], M.MINVAL), M.MINVAL)
    # bracket: evaluate guess * 2^k for all k in one call
    cand = guess * jnp.asarray(2.0 ** np.arange(13), dtype)
    dcand, _ = dphi(cand)
    pos = dcand >= 0
    hi = jnp.min(jnp.where(pos, cand, cand[-1]))
    lo = jnp.max(jnp.where(~pos & (cand < hi), cand, 0.0))
    alpha = jnp.minimum(guess, hi)

    ls_gtol = (
        m.opt.tolerance.astype(dtype)
        * m.opt.meaninertia.astype(dtype)
        * max(1, m.nv)
    )

    def ls_step(alpha, lo, hi):
        dv, ddv = dphi(alpha[None])
        dv, ddv = dv[0], ddv[0]
        # freeze once converged (see _cg_arrays.ls_iter)
        conv = jnp.abs(dv) < ls_gtol
        lo2 = jnp.where(dv < 0, alpha, lo)
        hi2 = jnp.where(dv >= 0, alpha, hi)
        newton = alpha - dv / jnp.maximum(ddv, M.MINVAL)
        inside = (newton > lo2) & (newton < hi2)
        alpha2 = jnp.where(inside, newton, 0.5 * (lo2 + hi2))
        alpha = jnp.where(conv, alpha, alpha2)
        lo = jnp.where(conv, lo, lo2)
        hi = jnp.where(conv, hi, hi2)
        return alpha, lo, hi, conv

    n_ls = max(int(m.opt.ls_iterations), 1)
    if n_ls <= 16:
        def ls_iter(carry, _):
            alpha, lo, hi = carry
            alpha, lo, hi, _ = ls_step(alpha, lo, hi)
            return (alpha, lo, hi), None

        (alpha, _, _), _ = jax.lax.scan(
            ls_iter, (alpha, lo, hi), (), length=n_ls, unroll=True
        )
    else:
        # big budgets (Newton default: 50) exit as soon as the bracketed
        # Newton converges (typically <= 5 iterations; under vmap the batch
        # runs to its slowest lane) instead of burning the full budget
        def ls_cond(c):
            _, _, _, it, conv = c
            return ~conv & (it < n_ls)

        def ls_body(c):
            alpha, lo, hi, it, _ = c
            alpha, lo, hi, conv = ls_step(alpha, lo, hi)
            return (alpha, lo, hi, it + 1, conv)

        alpha, _, _, _, _ = jax.lax.while_loop(
            ls_cond, ls_body,
            (alpha, lo, hi, jnp.zeros((), jnp.int32), jnp.zeros((), bool)),
        )
    return alpha


def solve(m: M.Model, d: M.Data) -> M.Data:
    """Constraint solve for qacc; writes qacc, qfrc_constraint, efc_force.

    Dispatch on ``m.opt.solver`` (static):
    - NEWTON: exact-Hessian Newton with early exit (_solve_newton) — the
      MuJoCo default; ``rodent_pair.xml`` has no <option> line so it
      compiles to Newton/100 (SURVEY.md §2a#15).
    - CG: quad-only models (limits + pyramidal contacts) dispatch through a
      custom_vmap — the env-batched TPU path runs the whole solve as one
      Pallas megakernel (ops/cg.py); elliptic-cone models (fly) and
      unbatched/CPU calls use the XLA implementation below.
    - PGS: not implemented — fails loudly rather than silently
      substituting a different algorithm.
    """
    dtype = d.qpos.dtype
    layout = Cn.efc_layout(m)
    if layout.nefc == 0 or m.nv == 0:
        return d.replace(
            qacc=d.qacc_smooth,
            qfrc_constraint=jnp.zeros(m.nv, dtype),
            efc_force=jnp.zeros(0, dtype),
        )
    meta = _cone_meta(m, layout)
    if m.opt.solver == M.SOLVER_NEWTON:
        if quad_kernel_eligible(m):
            return _solve_newton_fused(m, d, layout, meta)
        return _solve_newton(m, d, layout, meta)
    if m.opt.solver != M.SOLVER_CG:
        raise NotImplementedError(
            f"solver {m.opt.solver} (PGS?) is not implemented; use "
            "newton or cg (spec.set_solver_options)"
        )
    if quad_kernel_eligible(m):
        return _solve_quad(m, d, layout)
    return _solve_xla(m, d, layout, meta)


def quad_kernel_eligible(m: M.Model) -> bool:
    """True when the constraint cost fits the megakernel layout (one-sided
    quadratic rows plus at most one uniform dim-3 elliptic block) and the
    iteration count is unrollable — the _solve_quad / _solve_newton_fused
    megakernel path.

    Models on this path skip materializing qMinv/qMhinv in forward():
    the solve computes qacc_smooth and the Euler velocity update itself.
    """
    if m.nv == 0:
        return False
    if m.opt.solver not in (M.SOLVER_CG, M.SOLVER_NEWTON):
        # PGS fails loudly in solve()
        return False
    layout = Cn.efc_layout(m)
    if layout.nefc == 0:
        return False
    meta = _cone_meta(m, layout)
    if max(int(m.opt.iterations), 1) > 128:
        # the kernel rolls iteration counts > 16 into a fori_loop, but far
        # past ~128 the fixed-trip loop wastes too much masked work
        return False
    if meta.ell_con.size:
        # elliptic contacts are kernelizable when their rows form one
        # contiguous block of uniform dim 3 (fly: 12 x [n,t1,t2])
        er = meta.ell_rows
        if set(meta.ell_dim.tolist()) != {3}:
            return False
        if not np.array_equal(
            np.sort(er.ravel()), np.arange(er.min(), er.max() + 1)
        ):
            return False
        if not np.array_equal(er[:, 0], er.min() + 3 * np.arange(er.shape[0])):
            return False
    elif meta.quad_rows.size != layout.nefc:
        return False
    # in-kernel J assembly covers one-hot scalar limit rows plus contact
    # rows built from the 3 translational jacobian rows per slot
    if layout.limit_ball_jnt.size:
        return False
    if m.ncon and int(np.max(layout.con_dim)) > 3:
        return False
    if _fused_statics(m, layout) is None:
        return False
    # VMEM budget: resident tiles are J (Rp,Vp,128), qM + sweep scratch +
    # the M^-1 copy (3x Vp,Vp,128); the J/qM product temporaries are
    # row-chunked to ~6 MB each (ops/cg._chunk_rows), so they no longer
    # scale with the model. rodent_pair (nv=146, nefc~590: ~94 MB) fits.
    rp = (layout.nefc + 7) // 8 * 8
    vp = (m.nv + 7) // 8 * 8
    vmem = (rp * vp + 3 * vp * vp) * 128 * 4 + int(12e6)
    return vmem < int(100e6)


def _fused_statics(m: M.Model, layout: Cn.EfcLayout):
    """Static metadata for in-kernel qM/J assembly (ops/cg.cg_solve_fused).

    Returns None when the model violates the layout assumptions the kernel
    relies on (DFS-contiguous dof subtrees / root dof ranges) — MuJoCo's
    compiler always produces them, so this is a safety net, not a real
    restriction.
    """
    mask = np.asarray(m.dof_ancestor_mask)  # [i, j] = j anc-or-self of i
    nv = m.nv
    sz = mask.sum(axis=0).astype(int)  # subtree size per dof j
    for j in range(nv):
        expect = np.zeros(nv, bool)
        expect[j : j + sz[j]] = True
        if not np.array_equal(mask[:, j], expect):
            return None
    dof_root = np.asarray(m.body_rootid)[np.asarray(m.dof_bodyid)]
    roots = np.unique(dof_root)
    bounds = []
    for r in roots:
        idx = np.nonzero(dof_root == r)[0]
        if idx.size and not np.array_equal(idx, np.arange(idx[0], idx[-1] + 1)):
            return None
        bounds.append((int(idx[0]), int(idx[-1] + 1)))

    # static row-combination coefficients: J_con = (P @ A) @ cdof * md
    ncon = m.ncon
    P = np.zeros((layout.nefc, ncon * 3))
    friction = np.asarray(m.pairs.friction) if ncon else np.zeros((0, 5))
    for r in range(layout.nefc):
        slot = int(layout.row_con[r])
        if slot < 0:
            continue
        t = int(layout.row_type[r])
        k = int(layout.row_fdim[r])
        pf = friction[int(layout.con_pair[slot])]
        if t == Cn.ROW_CON_PYRAMID:
            i_pyr = k // 2
            sgn = 1.0 - 2.0 * (k % 2)
            P[r, slot * 3] = 1.0
            P[r, slot * 3 + i_pyr + 1] = sgn * pf[i_pyr]
        else:  # normal / elliptic friction row: direct selection
            P[r, slot * 3 + k] = 1.0

    if ncon:
        b1 = np.asarray(m.geom_bodyid)[layout.con_geom1]
        b2 = np.asarray(m.geom_bodyid)[layout.con_geom2]
        bdm = np.asarray(m.body_dof_mask)
        md = bdm[b2].astype(np.float64) - bdm[b1].astype(np.float64)
    else:
        md = np.zeros((0, nv))
    return dict(
        P=P,
        md=md,
        row_slot=tuple(int(s) for s in layout.row_con),
        sz=tuple(int(s) for s in sz),
        root_bounds=tuple(bounds),
        limit_dadr=tuple(int(a) for a in Cn.limit_dofs(m)),
    )


def _solve_quad(m: M.Model, d: M.Data, layout: Cn.EfcLayout) -> M.Data:
    """Dispatch for purely one-sided-quadratic constraint costs.

    Beyond the CG solve itself this also produces qacc_smooth and the Euler
    implicit-damping velocity update (qvel_next) — on the batched TPU path
    the whole tail of the substep runs as one Pallas megakernel in which
    M^-1 never leaves VMEM.
    """
    nv = m.nv
    nlim = int(layout.limit_rows.size)
    dadr_lim = Cn.limit_dofs(m)
    L1 = np.eye(nv, dtype=np.float64)[dadr_lim]  # (nlim, nv) static
    iters = max(int(m.opt.iterations), 1)
    ls_iters = max(int(m.opt.ls_iterations), 1)
    tol = (
        float(np.asarray(m.opt.tolerance))
        * float(np.asarray(m.opt.meaninertia))
        * max(1, nv)
    )
    dt = float(np.asarray(m.opt.timestep))
    damp = np.asarray(m.dof_damping, np.float64) * dt
    has_damping = bool(m.has_damping)
    exists_row = d.efc_pos < d.efc_margin

    # elliptic-cone statics (empty for quad-only models)
    meta = _cone_meta(m, layout)
    nell = int(meta.ell_con.size)
    if nell:
        ell0 = int(meta.ell_rows.min())
        # friction is per PAIR; elliptic slot ids map through con_pair
        # (a pair can own several slots, e.g. a 4-point box manifold)
        cp = layout.con_pair[meta.ell_con]
        ell_mu = np.asarray(m.pairs.friction, np.float64)[cp, 0]
        # tangent scale = [slide1, slide2] / mu (row i uses friction[i-1])
        fr = np.asarray(m.pairs.friction, np.float64)[cp, 0:2]
        ell_scale = fr / ell_mu[:, None]  # (nell, 2)
        quad_mask = np.zeros(layout.nefc, np.float64)
        quad_mask[meta.quad_rows] = 1.0
        includemargin = m.pairs.margin[cp].astype(d.qpos.dtype)
        exists_con = d.contact_dist[meta.ell_con] < includemargin
    else:
        ell0 = layout.nefc
        ell_mu = np.zeros(0, np.float64)
        ell_scale = np.zeros((0, 2), np.float64)
        quad_mask = np.ones(layout.nefc, np.float64)
        exists_con = jnp.zeros((0,), bool)

    statics = dict(
        L1=L1, iters=iters, ls_iters=ls_iters, tol=tol, dt=dt, damp=damp,
        has_damping=has_damping, quad_mask=quad_mask, ell0=ell0,
        ell_mu=ell_mu, ell_scale=ell_scale,
    )
    fstat = _fused_statics(m, layout)
    armature = m.dof_armature
    ncon = m.ncon

    # f / cdof / con_A are the low-rank qM and J factors: the batched TPU
    # rule assembles qM and J from them INSIDE the megakernel, and the
    # XLA-side dense qM / efc_Jc producers become dead code on that path.
    # The primal (unbatched / CPU) uses qM / Jc directly, so its numerics
    # are bit-identical to the pre-fusion implementation.
    @jax.custom_batching.custom_vmap
    def cg(qM, Jc, jsign, D, aref, exists, e_con, qfrc_smooth, qvel,
           f, cdof, con_A):
        return _cg_arrays(
            qM, Jc, jsign, D, aref, exists, e_con, qfrc_smooth, qvel, **statics
        )

    @cg.def_vmap
    def _cg_vmap(
        axis_size, in_batched, qM, Jc, jsign, D, aref, exists, e_con,
        qfrc_smooth, qvel, f, cdof, con_A
    ):
        from brax_tracking_tpu.ops import cholesky as ops_chol

        if all(
            b for b, a in zip(in_batched, (qM, Jc, jsign, D, aref, exists,
                                           e_con, qfrc_smooth, qvel,
                                           f, cdof, con_A))
            if a.size
        ) and ops_chol._use_pallas(qM):
            from brax_tracking_tpu.ops import cg as ops_cg

            exists_q = exists & (jnp.asarray(quad_mask) > 0.5)[None]
            out = ops_cg.cg_solve_fused(
                f, cdof, con_A,
                jsign if nlim else jnp.zeros((axis_size, 0), qM.dtype),
                D, aref, exists_q, e_con, qfrc_smooth, qvel,
                jnp.asarray(damp, qM.dtype),
                jnp.asarray(fstat["P"], qM.dtype),
                jnp.asarray(fstat["md"], qM.dtype),
                armature.astype(qM.dtype),
                iters=iters, ls_iters=ls_iters, tol=tol, dt=dt,
                has_damping=has_damping,
                row_slot=fstat["row_slot"], sz=fstat["sz"],
                root_bounds=fstat["root_bounds"],
                limit_dadr=fstat["limit_dadr"],
                ell0=ell0, ell_mu=tuple(ell_mu.tolist()),
                ell_scale=tuple(map(tuple, ell_scale.tolist())),
                **_kernel_unroll(iters, ls_iters),
            )
            return out[:5], (True,) * 5

        # Map only the batched operands: e.g. for quad-only models e_con is
        # an unbatched bool[0] constant and must be passed through (in_axes
        # None), not mapped — mapping it raises "vmap got inconsistent sizes".
        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(
            lambda qM, Jc, jsign, D, aref, exists, e_con, qfs, qv, *_:
            _cg_arrays(qM, Jc, jsign, D, aref, exists, e_con, qfs, qv,
                       **statics),
            in_axes=in_axes,
        )(qM, Jc, jsign, D, aref, exists, e_con, qfrc_smooth, qvel,
          f, cdof, con_A)
        return out, (True,) * 5

    con_A = d.con_A if d.con_A is not None else jnp.zeros(
        (1, 0, 3, 6), d.qpos.dtype
    )
    x, force, qfrc, a0, qvel_next = cg(
        d.qM,
        d.efc_Jc,
        d.efc_jsign,
        d.efc_D,
        d.efc_aref,
        exists_row,
        exists_con,
        d.qfrc_smooth,
        d.qvel,
        d.crb_f,
        d.cdof,
        con_A,
    )
    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc,
        efc_force=force,
        qacc_smooth=a0,
        qvel_next=qvel_next,
    )


# f32 stall floor for the megakernel's convergence freeze: relative cost
# improvement below ~32 eps_f32 is rounding noise — further iterations
# cannot move the iterate (see ops/cg._cg_core)
_STALL_TOL_F32 = 4e-6


def _kernel_unroll(iters: int, ls_iters: int) -> dict:
    """Choose unrolled vs rolled forms for the kernel's loops. Compile cost
    scales with iters*ls_iters copies of the (already large) CG body: the
    production rodent/fly configs (4x4) are cheap fully unrolled, but the
    rodent_pair Newton chunks (16x16 after the chunk/LS caps) cost 20+
    minutes of Mosaic compile through the axon tunnel. Rolling the LINE
    SEARCH shrinks the program ~16x — its fori carry is just (alpha, lo,
    hi), three (1, L) tiles. The CG iteration loop always stays unrolled:
    its carries are (Rp, L)/(Vp, L) tensors and rolling them makes the
    register allocator spill ~100 MB past VMEM at pair scale (measured).
    BTT_KERNEL_UNROLL=0/1 forces both knobs for A/B runs."""
    override = os.environ.get("BTT_KERNEL_UNROLL")
    if override is not None:
        on = override == "1"
        return dict(unroll_iters=True, unroll_ls=on)
    return dict(unroll_iters=True, unroll_ls=iters * ls_iters <= 64)


def _solve_newton_fused(
    m: M.Model, d: M.Data, layout: Cn.EfcLayout, meta: _ConeMeta
) -> M.Data:
    """Newton models whose constraint cost fits the megakernel layout.

    Primal (unbatched / CPU, the oracle-parity path) and the non-Pallas
    batched fallback run exact-Hessian Newton (_newton_iterate) with
    mj_warmstart, plus the qacc_smooth and Euler implicit-damping products
    the kernel fuses in. The batched TPU path runs the ops/cg megakernel —
    preconditioned CG with warmstart and f32 stall-exit on the IDENTICAL
    strictly convex primal cost, converging to the same optimum within
    solver tolerance (equivalence tested in tests/test_newton_solver.py).
    This is a documented performance dispatch, not a silent algorithm
    substitution: per-env Newton's batched cost is max-lane iterations of
    (B, nv, nv) Hessian GEMM + Cholesky round trips through HBM, while the
    megakernel's whole solve stays VMEM-resident. BTT_NEWTON_XLA=1 forces
    the per-env Newton path on TPU for A/B runs.
    """
    import os

    nv = m.nv
    dtype = d.qpos.dtype
    nlim = int(layout.limit_rows.size)
    iters = max(int(m.opt.iterations), 1)
    ls_iters = max(int(m.opt.ls_iterations), 1)
    tol = (
        float(np.asarray(m.opt.tolerance))
        * float(np.asarray(m.opt.meaninertia))
        * max(1, nv)
    )
    dt = float(np.asarray(m.opt.timestep))
    damp = np.asarray(m.dof_damping, np.float64) * dt
    has_damping = bool(m.has_damping)
    friction = (
        m.pairs.friction[layout.con_pair].astype(dtype)
        if m.ncon
        else jnp.zeros((0, 5), dtype)
    )
    exists_row = d.efc_pos < d.efc_margin
    if m.ncon:
        includemargin = m.pairs.margin[layout.con_pair].astype(dtype)
        exists_con = d.contact_dist < includemargin
    else:
        exists_con = jnp.zeros((0,), bool)

    # megakernel statics (same wiring as _solve_quad)
    nell = int(meta.ell_con.size)
    quad_mask = np.zeros(layout.nefc, np.float64)
    quad_mask[meta.quad_rows] = 1.0
    if nell:
        ell0 = int(meta.ell_rows.min())
        cp = layout.con_pair[meta.ell_con]
        ell_mu = np.asarray(m.pairs.friction, np.float64)[cp, 0]
        fr = np.asarray(m.pairs.friction, np.float64)[cp, 0:2]
        ell_scale = fr / ell_mu[:, None]
    else:
        ell0 = layout.nefc
        ell_mu = np.zeros(0, np.float64)
        ell_scale = np.zeros((0, 2), np.float64)
    fstat = _fused_statics(m, layout)
    armature = m.dof_armature
    has_ws = d.qacc_warmstart is not None
    force_xla = os.environ.get("BTT_NEWTON_XLA", "0") == "1"

    def _primal(qM, Jc, jsign, D_, aref, exists, e_con, qfrc_smooth, qvel,
                ws, f, cdof, con_A):
        from brax_tracking_tpu.ops import cholesky as ops_chol

        a0 = ops_chol.spd_solve(qM, qfrc_smooth)
        x, force, qfrc = _newton_iterate(
            m, layout, meta,
            qM=qM, Jc=Jc, jsign=jsign, efc_D=D_, efc_aref=aref,
            exists_row=exists, exists_con=e_con, friction=friction,
            a0=a0, ws=ws if has_ws else None,
        )
        qfrc_total = qfrc_smooth + qfrc
        if has_damping:
            qvel_next = qvel + dt * ops_chol.spd_solve(
                qM + jnp.diag(jnp.asarray(damp, qM.dtype)), qfrc_total
            )
        else:
            qvel_next = qvel + dt * x
        return x, force, qfrc, a0, qvel_next

    @jax.custom_batching.custom_vmap
    def newt(qM, Jc, jsign, D_, aref, exists, e_con, qfrc_smooth, qvel,
             ws, f, cdof, con_A):
        return _primal(qM, Jc, jsign, D_, aref, exists, e_con, qfrc_smooth,
                       qvel, ws, f, cdof, con_A)

    @newt.def_vmap
    def _newt_vmap(
        axis_size, in_batched, qM, Jc, jsign, D_, aref, exists, e_con,
        qfrc_smooth, qvel, ws, f, cdof, con_A
    ):
        from brax_tracking_tpu.ops import cholesky as ops_chol

        args = (qM, Jc, jsign, D_, aref, exists, e_con, qfrc_smooth,
                qvel, ws, f, cdof, con_A)
        # ws is an unbatched zeros placeholder when the model has no
        # warmstart yet (first forward after make_data) — exempt it
        need_batched = [
            b for (b, a), name in zip(
                zip(in_batched, args),
                ("qM", "Jc", "jsign", "D", "aref", "exists", "e_con",
                 "qfrc_smooth", "qvel", "ws", "f", "cdof", "con_A"),
            )
            if a.size and (name != "ws" or has_ws)
        ]
        if (
            not force_xla
            and all(need_batched)
            and ops_chol._use_pallas(qM)
        ):
            from brax_tracking_tpu.ops import cg as ops_cg

            exists_q = exists & (jnp.asarray(quad_mask) > 0.5)[None]
            e_con_k = (
                e_con[:, meta.ell_con] if nell
                else jnp.zeros((axis_size, 0), bool)
            )

            # Chunked restart: Mosaic cannot lower an in-kernel while on
            # large tiles, so the early exit lives at the XLA level — run
            # the kernel in unrolled chunks of <=8 CG iterations, feed
            # its qacc back in as the warmstart (the better-of-cost select
            # makes this an exact resume; CG direction restarts, which is
            # standard restarted-CG), and stop as soon as the kernel's
            # per-env done flags all freeze or the model's iteration
            # budget is spent. The LS budget is capped at 16 bracketed
            # Newton steps per iteration — in f32 the safeguarded Newton
            # on the piecewise-quadratic phi converges well inside that.
            # K=4: the kernel's scoped VMEM demand grows with the number
            # of unrolled CG bodies (each body's live set + the rolled-LS
            # loop boundary); at pair scale K=8 demands ~126 MiB against
            # the chip's 128 MiB VMEM — K=4 leaves compile headroom, and
            # the XLA-level done-flag restart loop keeps the average
            # iteration count unchanged (warmstarted envs converge in a
            # couple of chunks).
            K = min(iters, 4)
            n_chunks = -(-iters // K)

            def chunk(x0):
                # has_damping=False: the in-kernel Euler tail would redo a
                # full (M + hB) sweep inversion EVERY chunk; the implicit-
                # damping update is a single-rhs solve done once after the
                # loop instead
                return ops_cg.cg_solve_fused(
                    f, cdof, con_A,
                    jsign if nlim else jnp.zeros((axis_size, 0), qM.dtype),
                    D_, aref, exists_q, e_con_k, qfrc_smooth, qvel,
                    jnp.asarray(damp, qM.dtype),
                    jnp.asarray(fstat["P"], qM.dtype),
                    jnp.asarray(fstat["md"], qM.dtype),
                    armature.astype(qM.dtype),
                    iters=K, ls_iters=min(ls_iters, 16), tol=tol, dt=dt,
                    has_damping=False,
                    row_slot=fstat["row_slot"], sz=fstat["sz"],
                    root_bounds=fstat["root_bounds"],
                    limit_dadr=fstat["limit_dadr"],
                    ell0=ell0, ell_mu=tuple(ell_mu.tolist()),
                    ell_scale=tuple(map(tuple, ell_scale.tolist())),
                    warmstart=x0,
                    stall_tol=_STALL_TOL_F32,
                    **_kernel_unroll(K, min(ls_iters, 16)),
                )

            # always-warmstarted kernel (zeros when the model has none:
            # x=0 is just a candidate the better-of-cost select discards)
            # -> ONE Mosaic program instead of a ws/no-ws pair; pair-scale
            # kernel compiles cost ~10 min each through the axon tunnel
            ws0 = ws if has_ws else jnp.zeros_like(qfrc_smooth)
            out0 = chunk(ws0)
            if n_chunks > 1:
                def cond(c):
                    it = c[0]
                    done = c[1][5]
                    return (it < n_chunks) & ~jnp.all(done)

                def body(c):
                    it, out = c
                    return it + 1, chunk(out[0])

                _, out0 = jax.lax.while_loop(
                    cond, body, (jnp.ones((), jnp.int32), out0)
                )
            x_k, force_k, qfrc_k, a0_k = out0[0], out0[1], out0[2], out0[3]
            if has_damping:
                qfrc_total = qfrc_smooth + qfrc_k
                mh = qM + jnp.diag(jnp.asarray(damp, qM.dtype))[None]
                qvn_k = qvel + dt * jax.vmap(ops_chol.spd_solve)(
                    mh, qfrc_total
                )
            else:
                qvn_k = out0[4]
            return (x_k, force_k, qfrc_k, a0_k, qvn_k), (True,) * 5

        in_axes = tuple(0 if b else None for b in in_batched)
        out = jax.vmap(_primal, in_axes=in_axes)(
            qM, Jc, jsign, D_, aref, exists, e_con, qfrc_smooth, qvel, ws,
            f, cdof, con_A
        )
        return out, (True,) * 5

    con_A = d.con_A if d.con_A is not None else jnp.zeros(
        (1, 0, 3, 6), dtype
    )
    ws = d.qacc_warmstart if has_ws else jnp.zeros(nv, dtype)
    x, force, qfrc, a0, qvel_next = newt(
        d.qM,
        d.efc_Jc,
        d.efc_jsign,
        d.efc_D,
        d.efc_aref,
        exists_row,
        exists_con,
        d.qfrc_smooth,
        d.qvel,
        ws,
        d.crb_f,
        d.cdof,
        con_A,
    )
    return d.replace(
        qacc=x,
        qfrc_constraint=qfrc,
        efc_force=force,
        qacc_smooth=a0,
        qvel_next=qvel_next,
    )


def _sweep_inverse(a: jax.Array) -> jax.Array:
    """SPD inverse by the sweep operator — the SAME elimination order and
    update formulas as ops/cg._sweep_invert, so this array path and the
    Pallas megakernel produce (near-)identical iterates and the kernel
    parity test can hold a tight per-element tolerance."""

    def body(k, s):
        row = s[k]  # (n,)
        col = s[:, k]  # (n,)
        dinv = 1.0 / s[k, k]
        row_d = row * dinv
        s = s - col[:, None] * row_d[None, :]
        s = s.at[k].set(row_d)
        s = s.at[:, k].set(-col * dinv)
        s = s.at[k, k].set(dinv)
        return s

    return jax.lax.fori_loop(0, a.shape[0], body, a)


def _cg_arrays(qM, Jc, jsign, D, aref, exists, e_con, qfrc_smooth, qvel, *,
               L1, iters, ls_iters, tol, dt, damp, has_damping, quad_mask,
               ell0, ell_mu, ell_scale):
    """Per-env CG on plain arrays (reference path for the Pallas kernel;
    same math as _solve_xla for quadratic rows plus contiguous uniform-dim-3
    elliptic blocks, plus the qacc_smooth / Euler-damping products the
    kernel fuses in)."""
    dtype = qM.dtype
    nlim = jsign.shape[0]
    dadr_lim = np.nonzero(L1)[1] if nlim else np.zeros(0, np.int64)
    minval = M.MINVAL
    nell = int(ell_mu.shape[0]) if hasattr(ell_mu, "shape") else len(ell_mu)
    qmask = jnp.asarray(quad_mask, dtype) > 0.5  # (nefc,) static
    mu = jnp.asarray(ell_mu, dtype)  # (nell,)
    sc = jnp.asarray(ell_scale, dtype)  # (nell, 2)

    def ell_view(v):
        """Rows [ell0, ell0+3*nell) as (nell, 3) [n, t1, t2]."""
        return v[ell0 : ell0 + 3 * nell].reshape(nell, 3)

    eye = jnp.eye(qM.shape[0], dtype=dtype)
    qMinv = _sweep_inverse(qM)
    a0 = qMinv @ qfrc_smooth

    def jmul(x):
        parts = []
        if nlim:
            parts.append(jsign * x[dadr_lim])
        if Jc.shape[0]:
            parts.append(Jc @ x)
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)

    def jtmul(f):
        out = jnp.zeros(qM.shape[0], dtype)
        if nlim:
            out = out + (jsign * f[:nlim]) @ jnp.asarray(L1, dtype)
        if Jc.shape[0]:
            out = out + Jc.T @ f[nlim:]
        return out

    def cost_force(jar):
        active = (jar < 0) & exists & qmask
        f = jnp.where(active, -D * jar, 0.0)
        cost = 0.5 * jnp.sum(jnp.where(active, D * jar**2, 0.0))
        if nell:
            jar_e = ell_view(jar)  # (nell, 3)
            d_e = ell_view(D)
            n = jar_e[:, 0]
            u = jar_e[:, 1:] * sc
            t = jnp.sqrt(jnp.maximum(u[:, 0] ** 2 + u[:, 1] ** 2,
                                     minval * minval))
            g = e_con
            dn = d_e[:, 0]
            bottom = g & (mu * n + t <= 0)
            middle = g & ~bottom & (n < mu * t)
            dm = dn / jnp.maximum(1 + mu * mu, minval)
            nmt = n - mu * t
            cost = cost + jnp.sum(
                jnp.where(bottom, 0.5 * jnp.sum(d_e * jar_e**2, -1), 0.0)
            )
            cost = cost + jnp.sum(jnp.where(middle, 0.5 * dm * nmt * nmt, 0.0))
            f_bottom = -d_e * jar_e
            fn_mid = -dm * nmt
            ft_mid = (dm * nmt * mu)[:, None] * (u / t[:, None]) * sc
            f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=-1)
            f_e = jnp.where(
                bottom[:, None], f_bottom, jnp.where(middle[:, None], f_mid, 0.0)
            )
            f = jnp.concatenate(
                [f[:ell0], f_e.reshape(-1), f[ell0 + 3 * nell :]]
            )
        return cost, f

    def eval_ctx(x, jar, mxa):
        cost, force = cost_force(jar)
        gauss = 0.5 * jnp.dot(x - a0, mxa)
        grad = mxa - jtmul(force)
        mgrad = qMinv @ grad
        return force, cost + gauss, grad, mgrad

    x = a0
    jar = jmul(x) - aref
    mxa = jnp.zeros_like(x)
    force, cost, grad, mgrad = eval_ctx(x, jar, mxa)
    p = -mgrad
    done = jnp.zeros((), bool)

    def cg_iter(carry, _):
        x, jar, mxa, force, cost, grad, mgrad, p, done = carry
        jar_p = jmul(p)
        mp = qM @ p
        pmp = jnp.dot(p, mp)
        gauss_p = jnp.dot(p, mxa)

        def dphi(alpha):
            a = alpha[..., None]
            jar_a = jar + a * jar_p
            active = (jar_a < 0) & exists & qmask
            dval = gauss_p + alpha * pmp + jnp.sum(
                jnp.where(active, D * jar_a * jar_p, 0.0), -1
            )
            ddval = pmp + jnp.sum(jnp.where(active, D * jar_p**2, 0.0), -1)
            if nell:
                # elliptic rows: (..., nell, 3) views
                jar_ae = jar_a[..., ell0 : ell0 + 3 * nell].reshape(
                    alpha.shape + (nell, 3)
                )
                jp_e = ell_view(jar_p)  # (nell, 3)
                d_e = ell_view(D)
                n = jar_ae[..., 0]
                np_ = jp_e[:, 0]
                u = jar_ae[..., 1:] * sc
                up = jp_e[:, 1:] * sc
                tsqr = jnp.sum(u * u, -1)
                t = jnp.sqrt(jnp.maximum(tsqr, minval * minval))
                tp_dot = jnp.sum(u * up, -1)
                tpsqr = jnp.sum(up * up, -1)
                g = e_con
                dn = d_e[:, 0]
                bottom = g & (mu * n + t <= 0)
                middle = g & ~bottom & (n < mu * t)
                dm = dn / jnp.maximum(1 + mu * mu, minval)
                nmt = n - mu * t
                tprime = tp_dot / t
                tdprime = jnp.maximum(tpsqr - tprime * tprime, 0.0) / t
                dval = dval + jnp.sum(
                    jnp.where(middle, dm * nmt * (np_ - mu * tprime), 0.0), -1
                )
                ddval = ddval + jnp.sum(
                    jnp.where(
                        middle,
                        dm * ((np_ - mu * tprime) ** 2 - nmt * mu * tdprime),
                        0.0,
                    ),
                    -1,
                )
                dval = dval + jnp.sum(
                    jnp.where(bottom, jnp.sum(d_e * jar_ae * jp_e, -1), 0.0), -1
                )
                ddval = ddval + jnp.sum(
                    jnp.where(bottom, jnp.sum(d_e * jp_e**2, -1), 0.0), -1
                )
            return dval, ddval

        d0, dd0 = dphi(jnp.zeros((1,), dtype))
        guess = jnp.maximum(-d0[0] / jnp.maximum(dd0[0], minval), minval)
        cand = guess * jnp.asarray(2.0 ** np.arange(13), dtype)
        dcand, _ = dphi(cand)
        pos = dcand >= 0
        hi = jnp.min(jnp.where(pos, cand, cand[-1]))
        lo = jnp.max(jnp.where(~pos & (cand < hi), cand, 0.0))
        alpha = jnp.minimum(guess, hi)

        def ls_iter(c, _):
            alpha, lo, hi = c
            dv, ddv = dphi(alpha[None])
            dv, ddv = dv[0], ddv[0]
            # freeze once converged: at dv ~ 0 the Newton step underflows to
            # newton == alpha == lo, the open-interval safeguard would bisect
            # AWAY from the optimum, and post-convergence iterates are pure
            # rounding-noise amplification
            conv = jnp.abs(dv) < tol
            lo2 = jnp.where(dv < 0, alpha, lo)
            hi2 = jnp.where(dv >= 0, alpha, hi)
            newton = alpha - dv / jnp.maximum(ddv, minval)
            inside = (newton > lo2) & (newton < hi2)
            alpha2 = jnp.where(inside, newton, 0.5 * (lo2 + hi2))
            alpha = jnp.where(conv, alpha, alpha2)
            lo = jnp.where(conv, lo, lo2)
            hi = jnp.where(conv, hi, hi2)
            return (alpha, lo, hi), None

        (alpha, _, _), _ = jax.lax.scan(
            ls_iter, (alpha, lo, hi), (), length=ls_iters, unroll=ls_iters <= 16
        )

        x_new = x + alpha * p
        jar_new = jar + alpha * jar_p
        mxa_new = mxa + alpha * mp
        force_new, cost_new, grad_new, mgrad_new = eval_ctx(
            x_new, jar_new, mxa_new
        )
        improvement = cost - cost_new
        gradient = jnp.linalg.norm(grad_new)
        beta = jnp.dot(grad_new, mgrad_new - mgrad) / jnp.maximum(
            jnp.dot(grad, mgrad), minval
        )
        beta = jnp.maximum(0.0, beta)
        p_new = -mgrad_new + beta * p
        step_done = (improvement < tol) | (gradient < tol)
        new = (x_new, jar_new, mxa_new, force_new, cost_new, grad_new, mgrad_new, p_new)
        old = (x, jar, mxa, force, cost, grad, mgrad, p)
        frozen = jax.tree.map(lambda a, b: jnp.where(done, b, a), new, old)
        return frozen + (done | step_done,), None

    carry = (x, jar, mxa, force, cost, grad, mgrad, p, done)
    carry, _ = jax.lax.scan(cg_iter, carry, (), length=iters, unroll=iters <= 16)
    x, _, _, force, _, _, _, _, _ = carry
    qfrc_constraint = jtmul(force)

    # Euler implicit-damping velocity update (step.py consumes qvel_next)
    qfrc_total = qfrc_smooth + qfrc_constraint
    if has_damping:
        mh = qM + jnp.diag(jnp.asarray(damp, dtype))
        mhinv = _sweep_inverse(mh)
        qvel_next = qvel + dt * (mhinv @ qfrc_total)
    else:
        qvel_next = qvel + dt * x
    return x, force, qfrc_constraint, a0, qvel_next


def _solve_newton(
    m: M.Model, d: M.Data, layout: Cn.EfcLayout, meta: _ConeMeta,
    count_only: bool = False,
):
    """Exact-Hessian Newton solve (mjSOL_NEWTON; engine_solver.c semantics).

    Thin Data wrapper over ``_newton_iterate``; used for Newton models that
    are NOT megakernel-eligible (see ``solve``) and for iteration-count
    profiling. Expects d.qacc_smooth materialized (step.forward does this
    for non-kernel Newton models via ops/cholesky.spd_solve).

    Validated against C-oracle qacc/qfrc_constraint in
    tests/test_newton_solver.py.
    """
    dtype = d.qpos.dtype
    friction = (
        m.pairs.friction[layout.con_pair].astype(dtype)
        if m.ncon
        else jnp.zeros((0, 5), dtype)
    )
    exists_row = d.efc_pos < d.efc_margin
    if m.ncon:
        includemargin = m.pairs.margin[layout.con_pair].astype(dtype)
        exists_con = d.contact_dist < includemargin
    else:
        exists_con = jnp.zeros((0,), bool)
    out = _newton_iterate(
        m, layout, meta,
        qM=d.qM, Jc=d.efc_Jc, jsign=d.efc_jsign, efc_D=d.efc_D,
        efc_aref=d.efc_aref, exists_row=exists_row, exists_con=exists_con,
        friction=friction, a0=d.qacc_smooth, ws=d.qacc_warmstart,
        count_only=count_only,
    )
    if count_only:
        return out
    x, force, qfrc_constraint = out
    return d.replace(
        qacc=x, qfrc_constraint=qfrc_constraint, efc_force=force
    )


def _newton_iterate(
    m: M.Model, layout: Cn.EfcLayout, meta: _ConeMeta, *,
    qM, Jc, jsign, efc_D, efc_aref, exists_row, exists_con, friction,
    a0, ws, count_only: bool = False,
):
    """Exact-Hessian Newton on plain arrays (one env).

    Same convex primal cost as the CG path; the search direction is
    H^-1 grad with H = M + J' W J where W holds D * active for quadratic
    rows (limits, pyramidal / frictionless-normal contacts, bottom-zone
    elliptic cones) plus dense dim x dim cone-Hessian blocks for
    middle-zone elliptic contacts. The iteration runs under
    ``lax.while_loop`` so converged problems exit after ~2-5 Newton steps
    instead of burning a fixed iteration budget — under vmap the batch
    steps until the slowest env converges.

    ``a0`` = qacc_smooth; ``ws`` = qacc_warmstart or None.
    Returns (qacc, efc_force, qfrc_constraint), or the per-env iteration
    count when ``count_only``.
    """
    dtype = qM.dtype
    nv = m.nv

    # J splits into one-hot scalar-limit rows (rows [0, nlim): a diagonal
    # contribution to H) and the dense block Jc (ball limits + contacts,
    # rows [nlim, nefc)) — assembling H from the parts instead of a
    # materialized dense_J keeps the (B, nefc, nv) scatter out of HBM and
    # shrinks the J'WJ GEMM to the dense rows only.
    dadr_lim = Cn.limit_dofs(m)  # static (nlim,) dof addresses
    nlim = int(np.asarray(dadr_lim).size)
    quad_w_mask = np.zeros(layout.nefc, bool)
    quad_w_mask[meta.quad_rows] = True
    nell = int(meta.ell_con.size)
    if nell:
        # elliptic condim <= 3 (torsional/rolling friction rows are not
        # assembled by constraint.py for the target models)
        assert int(meta.ell_dim.max()) <= 3, "elliptic condim > 3"
        ell_rows = np.maximum(meta.ell_rows, 0)  # (nell, 3)
        assert int(ell_rows.min()) >= nlim, "elliptic rows precede limits"
        ell_rows_c = ell_rows - nlim  # indices into the dense Jc block
        mu = friction[meta.ell_con, 0]
        # tangent scale = [slide1, slide2] / mu (row i uses friction[i-1])
        sc = friction[meta.ell_con, 0:2] / mu[:, None]  # (nell, 2)

    def jmul(x):
        parts = []
        if nlim:
            parts.append(jsign * x[dadr_lim])
        if Jc.shape[0]:
            parts.append(Jc @ x)
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)

    L1 = (
        jnp.asarray(np.eye(nv, dtype=np.float64)[dadr_lim], dtype)
        if nlim
        else None
    )

    def jtmul(f):
        out = jnp.zeros(nv, dtype)
        if nlim:
            out = out + (jsign * f[:nlim]) @ L1
        if Jc.shape[0]:
            out = out + Jc.T @ f[nlim:]
        return out

    def hess(jar):
        """H = M + J' W J at the current jar (active set + cone zones)."""
        active = (jar < 0) & exists_row & jnp.asarray(quad_w_mask)
        w = jnp.where(active, efc_D, 0.0)
        if nell:
            n = jar[ell_rows[:, 0]]
            u = jar[ell_rows[:, 1:]] * sc
            t = jnp.sqrt(jnp.maximum(u[:, 0] ** 2 + u[:, 1] ** 2,
                                     M.MINVAL * M.MINVAL))
            g_con = exists_con[meta.ell_con]
            bottom = g_con & (mu * n + t <= 0)
            middle = g_con & ~bottom & (n < mu * t)
            # bottom zone: independent quadratics on the cone's rows
            w = w.at[ell_rows].add(
                jnp.where(bottom[:, None], efc_D[ell_rows], 0.0)
            )
            # middle zone: dense 3x3 cone Hessian
            # B = dm h h' + c (diag(0, s^2) - ghat ghat'), h = [1, -mu g],
            # ghat = [0, g], g_i = s_i u_i / t, c = -dm (n - mu t) mu / t
            dn = efc_D[ell_rows[:, 0]]
            dm = dn / jnp.maximum(1 + mu * mu, M.MINVAL)
            nmt = n - mu * t
            g = sc * u / t[:, None]  # (nell, 2)
            h = jnp.concatenate(
                [jnp.ones_like(mu)[:, None], -mu[:, None] * g], axis=-1
            )  # (nell, 3)
            ghat = jnp.concatenate([jnp.zeros_like(mu)[:, None], g], -1)
            c = -dm * nmt * mu / t
            s2 = jnp.concatenate(
                [jnp.zeros_like(mu)[:, None], sc * sc], -1
            )  # (nell, 3)
            B = (
                dm[:, None, None] * h[:, :, None] * h[:, None, :]
                + c[:, None, None]
                * (
                    jnp.eye(3, dtype=dtype) * s2[:, None, :]
                    - ghat[:, :, None] * ghat[:, None, :]
                )
            )
            B = jnp.where(middle[:, None, None], B, 0.0)
            Jb = Jc[ell_rows_c]  # (nell, 3, nv)
            H_ell = jnp.einsum("cin,cij,cjm->nm", Jb, B, Jb)
        else:
            H_ell = jnp.zeros((nv, nv), dtype)
        H = qM + (Jc * w[nlim:, None]).T @ Jc + H_ell
        if nlim:
            # scalar limit rows are +/-1 one-hot: W contribution is a
            # diagonal scatter-add (jsign^2 == 1)
            diag_w = jnp.zeros(nv, dtype).at[dadr_lim].add(w[:nlim])
            H = H + jnp.diag(diag_w)
        return H

    def eval_ctx(x, jar, mxa):
        cost, force = _eval_cost_force(
            m, meta, layout, friction, exists_row, exists_con, jar, efc_D
        )
        gauss = 0.5 * jnp.dot(x - a0, mxa)
        grad = mxa - jtmul(force)
        return _Ctx(x, jar, mxa, force, cost + gauss, grad, grad)

    jar0 = jmul(a0) - efc_aref
    ctx0 = eval_ctx(a0, jar0, jnp.zeros(nv, dtype))
    if ws is not None:
        # mj_warmstart: start from whichever of {qacc_warmstart,
        # qacc_smooth} has lower primal cost (both reach the same optimum -
        # the problem is strictly convex - but the warm start is typically
        # 1-2 Newton steps from it instead of 5-8)
        jar_w = jmul(ws) - efc_aref
        ctx_w = eval_ctx(ws, jar_w, qM @ (ws - a0))
        better = ctx_w.cost < ctx0.cost
        ctx0 = jax.tree.map(
            lambda a, b: jnp.where(better, a, b), ctx_w, ctx0
        )

    tol = (
        m.opt.tolerance.astype(dtype)
        * m.opt.meaninertia.astype(dtype)
        * max(1, nv)
    )
    iters = max(int(m.opt.iterations), 1)
    done0 = jnp.linalg.norm(ctx0.grad) < tol

    def cond(carry):
        _, done, it = carry
        return ~done & (it < iters)

    def body(carry):
        ctx, done, it = carry
        H = hess(ctx.jar)
        from brax_tracking_tpu.ops import cholesky as ops_chol

        # fused factor + single-rhs solve: Newton needs only H^-1 grad -
        # one Pallas kernel (batched TPU) does the blocked Cholesky
        # (static trailing updates, ~3x fewer VPU FLOPs than the scalar
        # rank-1 sweep) and both substitutions with U resident in VMEM;
        # H changes every iteration, so unlike qM a full inverse is never
        # amortized. Unbatched/CPU oracle calls use scipy Cholesky.
        p = -ops_chol.spd_solve(H, ctx.grad)
        jar_p = jmul(p)
        mp = qM @ p
        alpha = _linesearch(
            m, meta, friction, exists_row, exists_con, ctx, p,
            jar_p, mp, efc_D,
        )
        new_ctx = eval_ctx(
            ctx.x + alpha * p, ctx.jar + alpha * jar_p, ctx.mxa + alpha * mp
        )
        improvement = ctx.cost - new_ctx.cost
        gradient = jnp.linalg.norm(new_ctx.grad)
        step_done = (improvement < tol) | (gradient < tol)
        ctx = jax.tree.map(
            lambda new, old: jnp.where(done, old, new), new_ctx, ctx
        )
        # masked increment: under vmap the loop runs until the slowest env
        # converges; per-env counts stay exact for profiling (profile_pair)
        return ctx, done | step_done, it + jnp.where(done, 0, 1)

    ctx, _, it = jax.lax.while_loop(
        cond, body, (ctx0, done0, jnp.zeros((), jnp.int32))
    )
    if count_only:
        return it
    return ctx.x, ctx.force, jtmul(ctx.force)


def _solve_xla(m: M.Model, d: M.Data, layout: Cn.EfcLayout, meta: _ConeMeta) -> M.Data:
    """General (incl. elliptic-cone) CG solve in plain XLA."""
    dtype = d.qpos.dtype
    # per-SLOT friction (pairs own several slots for multi-point manifolds)
    friction = (
        m.pairs.friction[layout.con_pair].astype(dtype)
        if m.ncon
        else jnp.zeros((0, 5), dtype)
    )
    # spatial gating: a row is instantiated iff its pos is within margin
    exists_row = d.efc_pos < d.efc_margin
    if m.ncon:
        cp = layout.con_pair
        includemargin = m.pairs.margin[cp].astype(dtype)
        exists_con = d.contact_dist < includemargin
    else:
        exists_con = jnp.zeros((0,), bool)

    def eval_ctx(x, jar, mxa):
        """Cost/grad at x given incrementally-tracked jar = Jx - aref and
        mxa = M (x - a0). Only J^T force and the M^-1 solve stream matrices;
        MuJoCo's CG tracks jar/Mx the same way (engine_solver.c)."""
        cost, force = _eval_cost_force(
            m, meta, layout, friction, exists_row, exists_con, jar, d.efc_D
        )
        gauss = 0.5 * jnp.dot(x - d.qacc_smooth, mxa)
        grad = mxa - Cn.jac_t_mul(m, d, force)
        mgrad = D.solve_m(m, d, grad)
        return _Ctx(x, jar, mxa, force, cost + gauss, grad, mgrad)

    jar0 = Cn.jac_mul(m, d, d.qacc_smooth) - d.efc_aref
    ctx = eval_ctx(d.qacc_smooth, jar0, jnp.zeros(m.nv, dtype))
    if d.qacc_warmstart is not None:
        # mj_warmstart (see _solve_newton): lower-cost start point wins
        ws = d.qacc_warmstart
        jar_w = Cn.jac_mul(m, d, ws) - d.efc_aref
        ctx_w = eval_ctx(ws, jar_w, d.qM @ (ws - d.qacc_smooth))
        better = ctx_w.cost < ctx.cost
        ctx = jax.tree.map(lambda a, b: jnp.where(better, a, b), ctx_w, ctx)
    p = -ctx.mgrad

    tol = m.opt.tolerance.astype(dtype) * m.opt.meaninertia.astype(dtype) * max(1, m.nv)

    def cg_iter(carry, _):
        ctx, p, done = carry
        jar_p = Cn.jac_mul(m, d, p)
        mp = d.qM @ p
        alpha = _linesearch(
            m, meta, friction, exists_row, exists_con, ctx, p, jar_p, mp,
            d.efc_D,
        )
        x_new = ctx.x + alpha * p
        new_ctx = eval_ctx(x_new, ctx.jar + alpha * jar_p, ctx.mxa + alpha * mp)
        improvement = ctx.cost - new_ctx.cost
        gradient = jnp.linalg.norm(new_ctx.grad)
        # Polak-Ribiere
        beta = jnp.dot(new_ctx.grad, new_ctx.mgrad - ctx.mgrad) / jnp.maximum(
            jnp.dot(ctx.grad, ctx.mgrad), M.MINVAL
        )
        beta = jnp.maximum(0.0, beta)
        p_new = -new_ctx.mgrad + beta * p
        step_done = (improvement < tol) | (gradient < tol)
        # freeze after convergence
        ctx = jax.tree.map(lambda new, old: jnp.where(done, old, new), new_ctx, ctx)
        p = jnp.where(done, p, p_new)
        return (ctx, p, done | step_done), None

    # Unroll small iteration counts (training configs use 4-6): cross-
    # iteration fusion removes per-iteration kernel-launch + carry round
    # trips, which dominate at these tiny per-env op sizes. Keep a rolled
    # scan for models like rodent_pair that ask for 100 iterations, where
    # an unrolled graph makes compile time scale with the count.
    n_cg = max(int(m.opt.iterations), 1)
    (ctx, p, _), _ = jax.lax.scan(
        cg_iter,
        (ctx, p, jnp.zeros((), bool)),
        (),
        length=n_cg,
        unroll=n_cg <= 16,
    )

    qfrc_constraint = Cn.jac_t_mul(m, d, ctx.force)
    return d.replace(
        qacc=ctx.x, qfrc_constraint=qfrc_constraint, efc_force=ctx.force
    )
