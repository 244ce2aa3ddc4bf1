"""Batched constraint solve + implicit-damping update as one Pallas kernel.

The CG solver's per-iteration work is dozens of tiny (nv,)/(nefc,) vector
ops; as XLA ops at 2048 envs each costs a full HBM round trip and fixed
kernel overhead (profiled ~10 ms of a ~34 ms rodent control step), and the
M^-1 / (M+hB)^-1 sweep inversions plus their lane-layout staging cost
another ~11 ms. This kernel runs the WHOLE tail of the substep on one
VMEM-resident (rows, dofs, 128-env) tile:

  1. sweep-invert M (M^-1 never leaves VMEM),
  2. qacc_smooth = M^-1 qfrc_smooth,
  3. the full MuJoCo-CG solve — matvecs, one-sided quadratic and
     elliptic-cone costs, bracketed Newton line search, Polak-Ribiere,
     per-env convergence freezing,
  4. sweep-invert (M + h diag(B)) and produce the Euler implicit-damping
     velocity update.

Cone support: one-sided quadratic rows (limits, pyramidal and dim-1
contacts) plus ONE contiguous block of uniform dim-3 elliptic contacts
(the fly's 12 x [n, t1, t2]). The wrapper row-permutes the elliptic block
into [all n][all t1][all t2] so every in-kernel access is a contiguous
static slice — no strided loads or sublane reshapes for Mosaic to reject.

Layout: batch rides the 128-lane dimension; rows/dofs are sublanes.
Reduction outputs get `+ 0 * <ref-layout value>` anchors: Mosaic's
axis-reduce results otherwise carry implicit-dim layouts that later
elementwise ops cannot relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sweep_invert(nv: int, s_ref):
    """In-place SPD inversion of the (Vp, Vp, L) scratch tile by the
    blocked sweep operator (shared with ops/cholesky; nv/8 full-tile
    passes instead of nv, sublane-aligned panel slices)."""
    from brax_tracking_tpu.ops.cholesky import sweep_invert_ref

    sweep_invert_ref(nv, s_ref)


def _chunk_rows(total: int, vp: int, lane: int, budget: int = 6_000_000) -> int:
    """Row-chunk size (multiple of the sublane) keeping one (RB, Vp, L)
    f32 product temporary under ``budget`` bytes."""
    rb = max(_SUBLANE, (budget // (vp * lane * 4)) // _SUBLANE * _SUBLANE)
    return min(total, rb)


def _cg_kernel(
    nv: int,
    nefc: int,
    iters: int,
    ls_iters: int,
    tol: float,
    minval: float,
    dt: float,
    has_damping: bool,
    ell0: int,
    nell: int,
    has_warmstart: bool,
    stall_tol: float,
    unroll_iters: bool,
    unroll_ls: bool,
    qM_ref,
    J_ref,
    D_ref,
    aref_ref,
    exists_ref,
    mu_ref,
    sc1_ref,
    sc2_ref,
    econ_ref,
    qfrc_smooth_ref,
    qvel_ref,
    damp_ref,
    ws_ref,
    x_ref,
    force_ref,
    qfrc_ref,
    a0_ref,
    qvel_new_ref,
    done_ref,
    scratch_ref,
    tail_b_ref,
    tail_y_ref,
    tail_acc_ref,
):
    _cg_core(
        nv, nefc, iters, ls_iters, tol, minval, dt, has_damping, ell0, nell,
        has_warmstart, stall_tol, unroll_iters, unroll_ls,
        qM_ref, J_ref, D_ref, aref_ref, exists_ref, mu_ref, sc1_ref,
        sc2_ref, econ_ref, qfrc_smooth_ref, qvel_ref, damp_ref, ws_ref,
        x_ref, force_ref, qfrc_ref, a0_ref, qvel_new_ref, done_ref,
        scratch_ref, tail_b_ref, tail_y_ref, tail_acc_ref,
    )


def _cg_core(
    nv, nefc, iters, ls_iters, tol, minval, dt, has_damping, ell0, nell,
    has_warmstart, stall_tol, unroll_iters, unroll_ls,
    qM_ref,  # (Vp, Vp, L) ref (input tile or in-kernel-assembled scratch)
    J_ref,  # (Rp, Vp, L) ref — input tile or scratch, read chunk-by-chunk
    D_ref, aref_ref, exists_ref, mu_ref, sc1_ref, sc2_ref, econ_ref,
    qfrc_smooth_ref, qvel_ref, damp_ref, ws_ref,
    x_ref, force_ref, qfrc_ref, a0_ref, qvel_new_ref, done_ref, scratch_ref,
    tail_b_ref, tail_y_ref, tail_acc_ref,
):
    # qM and M^-1 are only ever touched through refs, chunk-by-chunk: a
    # loaded (Vp, Vp, L) VALUE (~12 MB at pair scale) stays live across
    # every CG iteration and line-search loop, and the register allocator
    # spills it (measured: two such values put the pair kernel ~80 MB of
    # spill slots past the VMEM cap).
    f32 = jnp.float32
    D = D_ref[:]  # (Rp, L)
    aref = aref_ref[:]
    # exists is pre-masked by the wrapper to quad rows only (0 on ell rows)
    exists = exists_ref[:]  # (Rp, L) 0/1
    qfrc_smooth = qfrc_smooth_ref[:]  # (Vp, L)

    Rp, Vp, L = J_ref.shape

    # layout anchors (see module docstring)
    zV = qfrc_smooth * 0.0  # (Vp, L)
    zR = aref * 0.0  # (Rp, L)

    # J products are row-chunked: each chunk's (RB, Vp, L) product temp
    # stays a few MB so large models (rodent_pair: Rp=592, Vp=152, J 46 MB
    # resident) fit the VMEM budget — J itself is read from the ref
    # slice-by-slice and never duplicated into a full-size temporary.
    RB = _chunk_rows(Rp, Vp, L)

    def jmul(x):  # (Vp, L) -> (Rp, L)
        xb = x[None, :, :]
        parts = []
        for off in range(0, Rp, RB):
            n = min(RB, Rp - off)
            Jc = J_ref[pl.ds(off, n)]
            parts.append(jnp.sum(Jc * jnp.broadcast_to(xb, Jc.shape), axis=1))
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out + zR

    def jtmul(f):  # (Rp, L) -> (Vp, L)
        out = zV
        for off in range(0, Rp, RB):
            n = min(RB, Rp - off)
            Jc = J_ref[pl.ds(off, n)]
            fc = jax.lax.slice_in_dim(f, off, off + n, axis=0)[:, None, :]
            out = out + jnp.sum(Jc * jnp.broadcast_to(fc, Jc.shape), axis=0)
        return out

    VB = _chunk_rows(Vp, Vp, L)

    def mmul(mat_ref, x):  # (Vp, Vp, L) ref, (Vp, L) -> (Vp, L)
        xb = x[None, :, :]
        parts = []
        for off in range(0, Vp, VB):
            n = min(VB, Vp - off)
            mc = mat_ref[pl.ds(off, n)]
            parts.append(jnp.sum(mc * jnp.broadcast_to(xb, mc.shape), axis=1))
        out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return out + zV

    def copy_qM_into_scratch(extra_diag=None):
        # chunked ref-to-ref copy (a whole-tile load would be a ~12 MB
        # live value); extra_diag (Vp, L) adds to the diagonal in place
        for off in range(0, Vp, VB):
            n = min(VB, Vp - off)
            blk = qM_ref[pl.ds(off, n)]
            if extra_diag is not None:
                rows = off + jax.lax.broadcasted_iota(jnp.int32, (n, Vp, 1), 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, (n, Vp, 1), 1)
                dslice = jax.lax.slice_in_dim(
                    extra_diag, off, off + n, axis=0
                )[:, None, :]
                blk = blk + jnp.where(rows == cols, 1.0, 0.0) * dslice
            scratch_ref[pl.ds(off, n)] = blk

    # --- M^-1 lives only in VMEM --------------------------------------
    copy_qM_into_scratch()
    _sweep_invert(nv, scratch_ref)
    a0 = mmul(scratch_ref, qfrc_smooth)  # qacc_smooth

    C = nell
    if nell:
        mu = mu_ref[pl.ds(0, C)]  # (C, L) shared across envs
        sc1 = sc1_ref[pl.ds(0, C)]
        sc2 = sc2_ref[pl.ds(0, C)]
        econ = econ_ref[pl.ds(0, C)]  # (C, L) 0/1 per env
        dm_denom = jnp.maximum(1.0 + mu * mu, minval)

        def ell_parts(v):  # v (Rp, L) -> n, t1, t2 each (C, L)
            return (
                v[ell0 : ell0 + C],
                v[ell0 + C : ell0 + 2 * C],
                v[ell0 + 2 * C : ell0 + 3 * C],
            )

        dn, d1, d2 = ell_parts(D)

    def cost_force(jar):
        active = jnp.where(jar < 0.0, exists, 0.0)
        f = -D * jar * active
        cost = 0.5 * jnp.sum(active * D * jar * jar, axis=0, keepdims=True)
        if nell:
            n, t1, t2 = ell_parts(jar)
            u1 = t1 * sc1
            u2 = t2 * sc2
            t = jnp.sqrt(jnp.maximum(u1 * u1 + u2 * u2, minval * minval))
            bottom = econ * jnp.where(mu * n + t <= 0.0, 1.0, 0.0)
            middle = econ * (1.0 - bottom) * jnp.where(n < mu * t, 1.0, 0.0)
            dm = dn / dm_denom
            nmt = n - mu * t
            cost = cost + jnp.sum(
                bottom * 0.5 * (dn * n * n + d1 * t1 * t1 + d2 * t2 * t2)
                + middle * (0.5 * dm * nmt * nmt),
                axis=0,
                keepdims=True,
            )
            coef = middle * dm * nmt * mu / t
            f_n = bottom * (-dn * n) + middle * (-dm * nmt)
            f_1 = bottom * (-d1 * t1) + coef * u1 * sc1
            f_2 = bottom * (-d2 * t2) + coef * u2 * sc2
            f = jnp.concatenate(
                [f[:ell0], f_n, f_1, f_2, f[ell0 + 3 * C :]], axis=0
            )
        return cost, f  # (1, L), (Rp, L)

    def eval_ctx(x, jar, mxa):
        cost_c, force = cost_force(jar)
        gauss = 0.5 * jnp.sum((x - a0) * mxa, axis=0, keepdims=True)
        grad = mxa - jtmul(force)
        mgrad = mmul(scratch_ref, grad)
        return force, cost_c + gauss, grad, mgrad

    x = a0
    jar = jmul(x) - aref
    mxa = jnp.zeros_like(x)
    force, cost, grad, mgrad = eval_ctx(x, jar, mxa)
    if has_warmstart:
        # mj_warmstart: start from whichever of {warmstart, a0} has lower
        # primal cost (strictly convex: same optimum, fewer iterations)
        ws = ws_ref[:]
        jar_w = jmul(ws) - aref
        mxa_w = mmul(qM_ref, ws - a0)
        force_w, cost_w, grad_w, mgrad_w = eval_ctx(ws, jar_w, mxa_w)
        bet = jnp.where(cost_w < cost, 1.0, 0.0)  # (1, L)
        bV = jnp.broadcast_to(bet, x.shape)
        bR = jnp.broadcast_to(bet, jar.shape)
        x = bV * ws + (1.0 - bV) * x
        jar = bR * jar_w + (1.0 - bR) * jar
        mxa = bV * mxa_w + (1.0 - bV) * mxa
        force = bR * force_w + (1.0 - bR) * force
        cost = bet * cost_w + (1.0 - bet) * cost
        grad = bV * grad_w + (1.0 - bV) * grad
        mgrad = bV * mgrad_w + (1.0 - bV) * mgrad
    p = -mgrad
    done = jnp.zeros((1, x.shape[-1]), f32)  # 0/1 per lane

    def cg_body(carry):
        x, jar, mxa, force, cost, grad, mgrad, p, done = carry
        jar_p = jmul(p)
        mp = mmul(qM_ref, p)
        pmp = jnp.sum(p * mp, axis=0, keepdims=True)
        gauss_p = jnp.sum(p * mxa, axis=0, keepdims=True)

        d_jp = D * jar_p  # hoisted: reused by every dphi eval
        if nell:
            np_, p1, p2 = ell_parts(jar_p)
            up1 = p1 * sc1
            up2 = p2 * sc2

        def dphi(alpha):
            """alpha: (A, L) -> (dval, ddval) each (A, L)."""
            A = alpha.shape[0]
            shape3 = (A,) + jar.shape
            jar_a = jnp.broadcast_to(jar[None], shape3) + jnp.broadcast_to(
                alpha[:, None, :], shape3
            ) * jnp.broadcast_to(jar_p[None], shape3)
            active = jnp.where(
                jar_a < 0.0, jnp.broadcast_to(exists[None], shape3), 0.0
            )
            dval = (
                jnp.broadcast_to(gauss_p, alpha.shape)
                + alpha * jnp.broadcast_to(pmp, alpha.shape)
                + jnp.sum(
                    active * jnp.broadcast_to(d_jp[None], shape3) * jar_a, axis=1
                )
            )
            ddval = jnp.broadcast_to(pmp, alpha.shape) + jnp.sum(
                active
                * jnp.broadcast_to(d_jp[None], shape3)
                * jnp.broadcast_to(jar_p[None], shape3),
                axis=1,
            )
            if nell:
                sC = (A, C, alpha.shape[-1])

                def b3(v):
                    return jnp.broadcast_to(v[None], sC)

                n_a = jar_a[:, ell0 : ell0 + C]
                t1_a = jar_a[:, ell0 + C : ell0 + 2 * C]
                t2_a = jar_a[:, ell0 + 2 * C : ell0 + 3 * C]
                u1a = t1_a * b3(sc1)
                u2a = t2_a * b3(sc2)
                t = jnp.sqrt(
                    jnp.maximum(u1a * u1a + u2a * u2a, minval * minval)
                )
                tp_dot = u1a * b3(up1) + u2a * b3(up2)
                tpsqr = b3(up1 * up1 + up2 * up2)
                bottom = b3(econ) * jnp.where(
                    b3(mu) * n_a + t <= 0.0, 1.0, 0.0
                )
                middle = (
                    b3(econ)
                    * (1.0 - bottom)
                    * jnp.where(n_a < b3(mu) * t, 1.0, 0.0)
                )
                dm = b3(dn / dm_denom)
                nmt = n_a - b3(mu) * t
                tprime = tp_dot / t
                tdprime = jnp.maximum(tpsqr - tprime * tprime, 0.0) / t
                npb = b3(np_)
                dval = dval + jnp.sum(
                    middle * dm * nmt * (npb - b3(mu) * tprime), axis=1
                )
                ddval = ddval + jnp.sum(
                    middle
                    * dm
                    * ((npb - b3(mu) * tprime) ** 2 - nmt * b3(mu) * tdprime),
                    axis=1,
                )
                dval = dval + jnp.sum(
                    bottom
                    * (
                        b3(dn) * n_a * npb
                        + b3(d1) * t1_a * b3(p1)
                        + b3(d2) * t2_a * b3(p2)
                    ),
                    axis=1,
                )
                ddval = ddval + jnp.sum(
                    bottom * b3(dn * np_ * np_ + d1 * p1 * p1 + d2 * p2 * p2),
                    axis=1,
                )
            return dval, ddval

        d0, dd0 = dphi(jnp.zeros((1, x.shape[-1]), f32))
        guess = jnp.maximum(-d0 / jnp.maximum(dd0, minval), minval)
        # 2^k bracket candidates; built in-kernel (captured constants are
        # not allowed in Mosaic kernels)
        pow2 = jnp.exp2(
            jax.lax.broadcasted_iota(jnp.int32, (13, 1), 0).astype(f32)
        )
        cand = jnp.broadcast_to(guess, (13, guess.shape[-1])) * jnp.broadcast_to(
            pow2, (13, guess.shape[-1])
        )
        # Evaluate the candidates in row-budgeted chunks: dphi(A, L) builds
        # (A, Rp, L) temporaries, and at pair scale (Rp=592) the full A=13
        # evaluation is ~40 MB of live vregs — the register allocator
        # spills ~80 MB past the 128 MB VMEM cap. Chunks of a few
        # candidates serialize those temporaries at identical total FLOPs.
        a_chunk = max(1, int(2_000_000 // (Rp * L * 4)))
        if a_chunk >= 13:
            dcand, _ = dphi(cand)
        else:
            parts = []
            for a0_ in range(0, 13, a_chunk):
                n_ = min(a_chunk, 13 - a0_)
                parts.append(
                    dphi(jax.lax.slice_in_dim(cand, a0_, a0_ + n_, axis=0))[0]
                )
            dcand = jnp.concatenate(parts, axis=0)
        pos = dcand >= 0.0
        hi = jnp.min(
            jnp.where(pos, cand, jnp.broadcast_to(cand[-1:], cand.shape)),
            axis=0,
            keepdims=True,
        )
        lo = jnp.max(
            jnp.where(
                jnp.logical_and(~pos, cand < jnp.broadcast_to(hi, cand.shape)),
                cand,
                0.0,
            ),
            axis=0,
            keepdims=True,
        )
        alpha = jnp.minimum(guess, hi)

        # f32 stall floor for |phi'|: once the directional derivative is
        # rounding noise relative to its initial magnitude, further LS
        # iterations are noise amplification (stall_tol=0 disables; only
        # the Newton-dispatch path sets it — CG callers keep bit-identical
        # behavior)
        d0_scale = jnp.abs(d0) * stall_tol if stall_tol else None

        def ls_body(c):
            alpha, lo, hi = c
            dv, ddv = dphi(alpha)
            # freeze once converged: at dv ~ 0 the Newton step underflows to
            # newton == alpha == lo and the open-interval safeguard would
            # bisect AWAY from the optimum (same fix as solver._cg_arrays)
            conv = jnp.where(jnp.abs(dv) < tol, 1.0, 0.0)
            if d0_scale is not None:
                conv = jnp.maximum(
                    conv, jnp.where(jnp.abs(dv) < d0_scale, 1.0, 0.0)
                )
            lo2 = jnp.where(dv < 0.0, alpha, lo)
            hi2 = jnp.where(dv >= 0.0, alpha, hi)
            newton = alpha - dv / jnp.maximum(ddv, minval)
            inside = jnp.logical_and(newton > lo2, newton < hi2)
            alpha2 = jnp.where(inside, newton, 0.5 * (lo2 + hi2))
            alpha = conv * alpha + (1.0 - conv) * alpha2
            lo = conv * lo + (1.0 - conv) * lo2
            hi = conv * hi + (1.0 - conv) * hi2
            return alpha, lo, hi

        lsc = (alpha, lo, hi)
        if unroll_ls and ls_iters <= 16:
            for _ in range(ls_iters):
                lsc = ls_body(lsc)
        else:
            # rolled budget (no in-kernel early exit: Mosaic's while
            # lowering crashes on large tiles — the Newton dispatch caps
            # ls_iters at 16 instead, see solver._solve_newton_fused).
            # Also taken with unroll_ls=False: at pair-scale tiles a
            # fully-unrolled 16x16 iters-x-ls body costs 20+ min of
            # Mosaic compile; rolling the LS (tiny alpha/lo/hi carry)
            # shrinks the program ~16x without VMEM spills.
            lsc = jax.lax.fori_loop(
                0, ls_iters, lambda _, c: ls_body(c), lsc
            )
        alpha, lo, hi = lsc

        aV = jnp.broadcast_to(alpha, x.shape)
        aR = jnp.broadcast_to(alpha, jar.shape)
        x_new = x + aV * p
        jar_new = jar + aR * jar_p
        mxa_new = mxa + aV * mp
        force_new, cost_new, grad_new, mgrad_new = eval_ctx(
            x_new, jar_new, mxa_new
        )
        improvement = cost - cost_new
        gradnorm = jnp.sqrt(jnp.sum(grad_new * grad_new, axis=0, keepdims=True))
        beta = jnp.sum(grad_new * (mgrad_new - mgrad), axis=0, keepdims=True)
        beta = beta / jnp.maximum(
            jnp.sum(grad * mgrad, axis=0, keepdims=True), minval
        )
        beta = jnp.maximum(0.0, beta)
        p_new = -mgrad_new + jnp.broadcast_to(beta, p.shape) * p
        step_done = jnp.where(
            jnp.logical_or(improvement < tol, gradnorm < tol), 1.0, 0.0
        )
        if stall_tol:
            # f32 stall: the model tolerance (1e-8-scaled, an f64
            # assumption) never triggers in f32 — freeze lanes whose cost
            # improvement is rounding noise; accuracy is identical to
            # running the remaining budget (the iterates can no longer
            # move the cost)
            stalled = jnp.where(
                improvement < stall_tol * jnp.abs(cost_new), 1.0, 0.0
            )
            step_done = jnp.maximum(step_done, stalled)
        # freeze lanes that converged BEFORE this iteration
        keep = 1.0 - done
        dV = jnp.broadcast_to(done, x.shape)
        kV = jnp.broadcast_to(keep, x.shape)
        dR = jnp.broadcast_to(done, jar.shape)
        kR = jnp.broadcast_to(keep, jar.shape)
        x = dV * x + kV * x_new
        jar = dR * jar + kR * jar_new
        mxa = dV * mxa + kV * mxa_new
        force = dR * force + kR * force_new
        cost = done * cost + keep * cost_new
        grad = dV * grad + kV * grad_new
        mgrad = dV * mgrad + kV * mgrad_new
        p = dV * p + kV * p_new
        done = jnp.maximum(done, step_done)
        return (x, jar, mxa, force, cost, grad, mgrad, p, done)

    carry = (x, jar, mxa, force, cost, grad, mgrad, p, done)
    if unroll_iters and iters <= 16:
        for _ in range(iters):
            carry = cg_body(carry)
    else:
        # rolled loop for big iteration counts — an unrolled Mosaic body
        # would blow up code size and compile time. NOTE: no in-kernel
        # early exit — Mosaic's while lowering crashes on large-tile
        # carries (rodent_pair scale); budget-exceeding solves early-exit
        # at the XLA level instead, by re-invoking the kernel with
        # warmstart=x in chunks of <=16 unrolled iterations and testing
        # the `done` output between invocations (solver._solve_newton_fused).
        carry = jax.lax.fori_loop(0, iters, lambda _, c: cg_body(c), carry)
    x, jar, mxa, force, cost, grad, mgrad, p, done = carry
    done_ref[:] = jnp.broadcast_to(done, done_ref.shape)

    qfrc_constraint = jtmul(force)
    x_ref[:] = x
    force_ref[:] = force
    qfrc_ref[:] = qfrc_constraint
    a0_ref[:] = a0

    # --- Euler velocity update ----------------------------------------
    qvel = qvel_ref[:]
    qfrc_total = qfrc_smooth + qfrc_constraint
    if has_damping:
        # (M + h diag(B))^-1: rebuild scratch from the qM ref with the
        # (static) damping diagonal added chunk-by-chunk, then Cholesky
        # factor + substitution for the single rhs: ~n^3/3 FLOPs instead
        # of the sweep inverse's ~2n^3 + the n^2 mmul (the tail was ~half
        # the kernel's FLOPs; profile_rodent.json). The padded diagonal is
        # identity (wrapper) + 0 damp, so all Vp elimination steps are
        # exact no-ops past nv.
        from brax_tracking_tpu.ops.cholesky import (
            _factor_ref_blocked,
            _solve_ref,
        )

        copy_qM_into_scratch(extra_diag=damp_ref[:])  # damp = h*dof_damping
        _factor_ref_blocked(Vp, scratch_ref)
        tail_b_ref[:] = qfrc_total
        _solve_ref(nv, scratch_ref, tail_b_ref, qvel_new_ref, tail_y_ref,
                   tail_acc_ref)
        qvel_new_ref[:] = qvel + dt * qvel_new_ref[:]
    else:
        qvel_new_ref[:] = qvel + dt * x


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "ls_iters", "tol", "dt", "has_damping", "ell0", "ell_mu",
        "ell_scale", "stall_tol", "unroll_iters", "unroll_ls", "interpret",
    ),
)
def cg_solve_batched(
    qM: jax.Array,  # (B, nv, nv)
    J: jax.Array,  # (B, nefc, nv) dense constraint jacobian
    D: jax.Array,  # (B, nefc)
    aref: jax.Array,  # (B, nefc)
    exists: jax.Array,  # (B, nefc) 0/1 — QUAD rows only (0 on ell rows)
    exists_con: jax.Array,  # (B, nell) 0/1 elliptic contact activation
    qfrc_smooth: jax.Array,  # (B, nv)
    qvel: jax.Array,  # (B, nv)
    damp: jax.Array,  # (nv,) h * dof_damping (shared across batch)
    iters: int,
    ls_iters: int,
    tol: float,
    dt: float,
    has_damping: bool,
    ell0: int = 0,
    ell_mu: tuple = (),
    ell_scale: tuple = (),
    warmstart: jax.Array = None,  # (B, nv) qacc_warmstart or None
    stall_tol: float = 0.0,
    unroll_iters: bool = True,
    unroll_ls: bool = True,
    interpret: bool = False,
):
    """Returns (qacc, efc_force, qfrc_constraint, qacc_smooth, qvel_new).

    ell_mu/ell_scale: static per-contact friction for ONE contiguous block
    of dim-3 elliptic rows starting at row ell0 (row order [n,t1,t2] per
    contact in the INPUT; permuted to [n...][t1...][t2...] internally).

    ``unroll_iters``/``unroll_ls`` choose unrolled vs fori_loop forms for
    the CG iteration and line-search loops: same math, and rolling shrinks
    the Mosaic program (pair-scale: a 16x16 fully-unrolled body costs 20+
    minutes of compile; rolling the LS cuts it ~16x with only the tiny
    alpha/lo/hi carry in the loop — rolling the CG loop too is NOT viable
    at large tiles, its big carries spill ~100 MB past VMEM).
    """
    B, nefc, nv = J.shape
    nell = len(ell_mu)
    Vp = _round_up(nv, _SUBLANE)
    Rp = _round_up(nefc, _SUBLANE)
    Bp = _round_up(B, LANE)
    Cp = _round_up(max(nell, 1), _SUBLANE)
    dtype = qM.dtype

    # permute the elliptic block [n,t1,t2]*C -> [n*C][t1*C][t2*C]
    if nell:
        head = np.arange(ell0)
        blk = ell0 + 3 * np.arange(nell)
        tail = np.arange(ell0 + 3 * nell, nefc)
        perm = np.concatenate([head, blk, blk + 1, blk + 2, tail])
        inv_perm = np.argsort(perm)
        J = J[:, perm]
        D = D[:, perm]
        aref = aref[:, perm]
        exists = exists[:, perm]

    def pad(x, shape):
        out = jnp.zeros(shape, dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    qMp = pad(qM, (B, Vp, Vp))
    # identity pad block keeps padded dofs inert through the inversions
    idx = jnp.arange(nv, Vp)
    qMp = qMp.at[:, idx, idx].set(1.0)
    Jp = pad(J, (B, Rp, Vp))
    Dp = pad(D, (B, Rp))
    arefp = pad(aref, (B, Rp))
    existsp = pad(exists.astype(dtype), (B, Rp))
    econp = pad(exists_con.astype(dtype), (B, Cp))
    fsp = pad(qfrc_smooth, (B, Vp))
    qvp = pad(qvel, (B, Vp))
    has_warmstart = warmstart is not None
    wsp = pad(
        warmstart if has_warmstart else jnp.zeros((B, nv), dtype), (B, Vp)
    )
    dampp = jnp.zeros((Vp,), dtype).at[:nv].set(damp.astype(dtype))
    dampt = jnp.broadcast_to(dampp[:, None], (Vp, LANE))
    mu_np = np.zeros(Cp)
    sc_np = np.zeros((Cp, 2))
    if nell:
        mu_np[:nell] = np.asarray(ell_mu)
        sc_np[:nell] = np.asarray(ell_scale)
    mut = jnp.broadcast_to(jnp.asarray(mu_np, dtype)[:, None], (Cp, LANE))
    sc1t = jnp.broadcast_to(jnp.asarray(sc_np[:, 0], dtype)[:, None], (Cp, LANE))
    sc2t = jnp.broadcast_to(jnp.asarray(sc_np[:, 1], dtype)[:, None], (Cp, LANE))

    def bpad(x):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.tile(x[-1:], (Bp - B,) + (1,) * (x.ndim - 1))], 0
        )

    # batch to lanes
    qMt = jnp.transpose(bpad(qMp), (1, 2, 0))
    Jt = jnp.transpose(bpad(Jp), (1, 2, 0))
    Dt = jnp.transpose(bpad(Dp), (1, 0))
    areft = jnp.transpose(bpad(arefp), (1, 0))
    existst = jnp.transpose(bpad(existsp), (1, 0))
    econt = jnp.transpose(bpad(econp), (1, 0))
    fst = jnp.transpose(bpad(fsp), (1, 0))
    qvt = jnp.transpose(bpad(qvp), (1, 0))
    wst = jnp.transpose(bpad(wsp), (1, 0))

    grid = (Bp // LANE,)
    mat_spec = pl.BlockSpec(
        (Vp, Vp, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    j_spec = pl.BlockSpec(
        (Rp, Vp, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec((Rp, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    dof_spec = pl.BlockSpec((Vp, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    con_spec = pl.BlockSpec((Cp, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    shared_con = pl.BlockSpec(
        (Cp, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    shared_dof = pl.BlockSpec(
        (Vp, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    x_t, force_t, qfrc_t, a0_t, qvn_t, done_t = pl.pallas_call(
        functools.partial(
            _cg_kernel, nv, nefc, iters, ls_iters, tol, 1e-15, dt,
            has_damping, ell0, nell, has_warmstart, stall_tol,
            unroll_iters, unroll_ls,
        ),
        grid=grid,
        in_specs=[
            mat_spec,
            j_spec,
            row_spec,
            row_spec,
            row_spec,
            shared_con,
            shared_con,
            shared_con,
            con_spec,
            dof_spec,
            dof_spec,
            shared_dof,
            dof_spec,
        ],
        out_specs=[dof_spec, row_spec, dof_spec, dof_spec, dof_spec,
                   pl.BlockSpec((_SUBLANE, LANE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Rp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((_SUBLANE, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Vp, Vp, LANE), dtype),
            pltpu.VMEM((Vp, LANE), dtype),  # tail_b
            pltpu.VMEM((Vp, LANE), dtype),  # tail_y
            pltpu.VMEM((Vp, LANE), dtype),  # tail_acc
        ],
        interpret=interpret,
        # 128 MiB is the chip's full VMEM; the pair-scale kernel needs
        # ~118 MiB of scoped stack (J/qM/sweep scratch + live vregs)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(128e6)),
    )(qMt, Jt, Dt, areft, existst, mut, sc1t, sc2t, econt, fst, qvt, dampt,
      wst)
    force = jnp.transpose(force_t, (1, 0))[:B, :nefc]
    if nell:
        force = force[:, inv_perm]
    return (
        jnp.transpose(x_t, (1, 0))[:B, :nv],
        force,
        jnp.transpose(qfrc_t, (1, 0))[:B, :nv],
        jnp.transpose(a0_t, (1, 0))[:B, :nv],
        jnp.transpose(qvn_t, (1, 0))[:B, :nv],
        done_t[0, :B] > 0.5,
    )


# ---------------------------------------------------------------------------
# Fused variant: qM and J are ASSEMBLED IN VMEM from their low-rank factors
# instead of being read as (nv,nv,B)/(nefc,nv,B) tiles from HBM.
#
# qM[i,j] = masksym_ij( sum_c f[c,i] cdof[c,j] ) + diag(armature): the
# ancestor mask is built from iota compares using the DFS property that
# dof j's subtree is the contiguous index range [j, j+sz_j).
# J contact rows r = md[slot(r), :] * sum_{root,c} Bm[root,c,r] G[root,c,:]
# with G[root,c] = cdof[c] masked to the root's contiguous dof range and
# Bm = P @ A (P = static pyramid/elliptic row-combination coefficients,
# A = per-contact [off x F | F] operator). Scalar limit rows are one-hot
# jsign writes. This removes the dominant HBM traffic of the batched step:
# the XLA-side (B,nv,nv)/(B,nefc,nv) einsums and their lane-layout
# transposes are dead-code-eliminated once nothing consumes them.
# ---------------------------------------------------------------------------


def _assemble_qM_J(
    nv, nroots, root_bounds, md_groups, limit_writes,
    ft_ref, ct_ref, Bm_ref, jsign_ref, mdT_ref, szv_ref, arm_ref,
    J_scr, qM_scr,
):
    f32 = jnp.float32
    ftv = ft_ref[:]  # (6, Vp, L)
    ctv = ct_ref[:]
    _, Vp, L = ftv.shape
    Rp = J_scr.shape[0]
    szv = szv_ref[:]  # (Vp, L) int32 dof-subtree sizes (0 at padded dofs)
    armv = arm_ref[:]  # (Vp, L) f32 armature (1.0 at padded diag)

    # ---- qM rows, chunked ----
    VB = _chunk_rows(Vp, Vp, L, budget=3_000_000)
    for off in range(0, Vp, VB):
        n = min(VB, Vp - off)
        acc = None
        accT = None
        for c in range(6):
            fr = jax.lax.slice_in_dim(ftv[c], off, off + n, axis=0)  # (n, L)
            cr = jax.lax.slice_in_dim(ctv[c], off, off + n, axis=0)
            t1 = fr[:, None, :] * ctv[c][None, :, :]  # (n, Vp, L)
            t2 = cr[:, None, :] * ftv[c][None, :, :]
            acc = t1 if acc is None else acc + t1
            accT = t2 if accT is None else accT + t2
        shape3 = (n, Vp, L)
        i3 = off + jax.lax.broadcasted_iota(jnp.int32, shape3, 0)
        j3 = jax.lax.broadcasted_iota(jnp.int32, shape3, 1)
        szj = jnp.broadcast_to(szv[None, :, :], shape3)
        szi = jnp.broadcast_to(
            jax.lax.slice_in_dim(szv, off, off + n, axis=0)[:, None, :], shape3
        )
        armi = jnp.broadcast_to(
            jax.lax.slice_in_dim(armv, off, off + n, axis=0)[:, None, :], shape3
        )
        # j ancestor-or-self of i  <=>  i in subtree(j) = [j, j+sz_j)
        m1 = jnp.logical_and(i3 >= j3, i3 < j3 + szj)
        m2 = jnp.logical_and(j3 > i3, j3 < i3 + szi)  # strict: diag in m1
        qm = (
            jnp.where(m1, acc, 0.0)
            + jnp.where(m2, accT, 0.0)
            + jnp.where(i3 == j3, armi, 0.0)
        )
        qM_scr[pl.ds(off, n)] = qm

    # ---- J contact rows: rank-(6*nroots) bulk build ----
    viota = jax.lax.broadcasted_iota(jnp.int32, (Vp, L), 0)
    Gs = []
    for lo, hi in root_bounds:
        if nroots == 1:
            rm = None
        else:
            rm = jnp.logical_and(viota >= lo, viota < hi)
        for c in range(6):
            Gs.append(ctv[c] if rm is None else jnp.where(rm, ctv[c], 0.0))
    Bmv = Bm_ref[:]  # (6*nroots, Rp, L)
    RB = _chunk_rows(Rp, Vp, L, budget=3_000_000)
    for off in range(0, Rp, RB):
        n = min(RB, Rp - off)
        acc = None
        for k in range(6 * nroots):
            b = jax.lax.slice_in_dim(Bmv[k], off, off + n, axis=0)  # (n, L)
            t = b[:, None, :] * Gs[k][None, :, :]
            acc = t if acc is None else acc + t
        J_scr[pl.ds(off, n)] = acc

    # ---- md sign/support masks, per contiguous run of same-slot rows ----
    for row0, nrows, slot in md_groups:
        mdc = jnp.broadcast_to(mdT_ref[:, pl.ds(slot, 1)], (Vp, L))
        J_scr[pl.ds(row0, nrows)] = J_scr[pl.ds(row0, nrows)] * mdc[None, :, :]

    # ---- scalar limit rows: one-hot jsign at static (row, dof) ----
    if limit_writes:
        jsv = jsign_ref[:]  # (NLp, L)
        for r, dadr, i in limit_writes:
            J_scr[pl.ds(r, 1), pl.ds(dadr, 1)] = jax.lax.slice_in_dim(
                jsv, i, i + 1, axis=0
            )[None]


def _cg_fused_kernel(
    nv, nefc, iters, ls_iters, tol, minval, dt, has_damping, ell0, nell,
    has_warmstart, stall_tol, unroll_iters, unroll_ls,
    nroots, root_bounds, md_groups, limit_writes,
    ft_ref, ct_ref, Bm_ref, jsign_ref, mdT_ref, szv_ref, arm_ref,
    D_ref, aref_ref, exists_ref, mu_ref, sc1_ref, sc2_ref, econ_ref,
    qfrc_smooth_ref, qvel_ref, damp_ref, ws_ref,
    x_ref, force_ref, qfrc_ref, a0_ref, qvel_new_ref, done_ref,
    J_scr, qM_scr, sweep_scr, tail_b_ref, tail_y_ref, tail_acc_ref,
):
    _assemble_qM_J(
        nv, nroots, root_bounds, md_groups, limit_writes,
        ft_ref, ct_ref, Bm_ref, jsign_ref, mdT_ref, szv_ref, arm_ref,
        J_scr, qM_scr,
    )
    _cg_core(
        nv, nefc, iters, ls_iters, tol, minval, dt, has_damping, ell0, nell,
        has_warmstart, stall_tol, unroll_iters, unroll_ls,
        qM_scr, J_scr, D_ref, aref_ref, exists_ref, mu_ref, sc1_ref,
        sc2_ref, econ_ref, qfrc_smooth_ref, qvel_ref, damp_ref, ws_ref,
        x_ref, force_ref, qfrc_ref, a0_ref, qvel_new_ref, done_ref,
        sweep_scr, tail_b_ref, tail_y_ref, tail_acc_ref,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters", "ls_iters", "tol", "dt", "has_damping", "ell0", "ell_mu",
        "ell_scale", "row_slot", "sz", "root_bounds", "limit_dadr",
        "stall_tol", "unroll_iters", "unroll_ls", "interpret",
    ),
)
def cg_solve_fused(
    f: jax.Array,  # (B, 6, nv) composite-inertia factor (crb_f)
    cdof: jax.Array,  # (B, 6, nv)
    A: jax.Array,  # (B, nroots, ncon, 3, 6) contact point operators
    jsign: jax.Array,  # (B, nlim) scalar limit signs
    D: jax.Array,  # (B, nefc)
    aref: jax.Array,  # (B, nefc)
    exists: jax.Array,  # (B, nefc) 0/1 — QUAD rows only
    exists_con: jax.Array,  # (B, nell)
    qfrc_smooth: jax.Array,  # (B, nv)
    qvel: jax.Array,  # (B, nv)
    damp: jax.Array,  # (nv,)
    P: jax.Array,  # (nefc, ncon*3) static row-combination coefficients
    md: jax.Array,  # (ncon, nv) static +-1/0 contact support masks
    armature: jax.Array,  # (nv,)
    iters: int,
    ls_iters: int,
    tol: float,
    dt: float,
    has_damping: bool,
    row_slot: tuple,  # (nefc,) contact slot per row, -1 for limit rows
    sz: tuple,  # (nv,) dof subtree sizes (DFS-contiguous)
    root_bounds: tuple,  # ((lo, hi), ...) contiguous dof range per root
    limit_dadr: tuple,  # (nlim,) dof address of each scalar limit row
    ell0: int = 0,
    ell_mu: tuple = (),
    ell_scale: tuple = (),
    warmstart: jax.Array = None,  # (B, nv) qacc_warmstart or None
    stall_tol: float = 0.0,
    unroll_iters: bool = True,
    unroll_ls: bool = True,
    interpret: bool = False,
):
    """cg_solve_batched with in-kernel qM/J assembly from low-rank factors.

    Returns (qacc, efc_force, qfrc_constraint, qacc_smooth, qvel_new).
    ``unroll_iters``/``unroll_ls`` roll the in-kernel loops — see
    cg_solve_batched.
    """
    B, _, nv = f.shape
    nefc = D.shape[1]
    nlim = jsign.shape[1]
    nroots = len(root_bounds)
    ncon = md.shape[0]
    nell = len(ell_mu)
    Vp = _round_up(nv, _SUBLANE)
    Rp = _round_up(nefc, _SUBLANE)
    Bp = _round_up(B, LANE)
    Cp = _round_up(max(nell, 1), _SUBLANE)
    NLp = _round_up(max(nlim, 1), _SUBLANE)
    MDp = _round_up(max(ncon, 1), LANE)
    dtype = f.dtype

    row_slot = np.asarray(row_slot, np.int32)
    if nell:
        head = np.arange(ell0)
        blk = ell0 + 3 * np.arange(nell)
        tail = np.arange(ell0 + 3 * nell, nefc)
        perm = np.concatenate([head, blk, blk + 1, blk + 2, tail])
        inv_perm = np.argsort(perm)
        D = D[:, perm]
        aref = aref[:, perm]
        exists = exists[:, perm]
        P = P[perm]
        row_slot = row_slot[perm]

    # contiguous same-slot row runs (md is applied per run)
    md_groups = []
    r = 0
    while r < nefc:
        s = int(row_slot[r])
        if s < 0:
            r += 1
            continue
        r0 = r
        while r < nefc and int(row_slot[r]) == s:
            r += 1
        md_groups.append((r0, r - r0, s))
    md_groups = tuple(md_groups)
    limit_writes = tuple(
        (i, int(limit_dadr[i]), i) for i in range(nlim)
    )

    def pad(x, shape):
        out = jnp.zeros(shape, dtype)
        return out.at[tuple(slice(0, s) for s in x.shape)].set(x)

    def bpad(x):
        if Bp == B:
            return x
        return jnp.concatenate(
            [x, jnp.tile(x[-1:], (Bp - B,) + (1,) * (x.ndim - 1))], 0
        )

    # low-rank J factor: Bm[b, root*6+c, r] = sum_k P[r, k] A[b, root, k, c]
    Ar = A.reshape(B, nroots, ncon * 3, 6) if ncon else jnp.zeros(
        (B, nroots, 0, 6), dtype
    )
    Bm = jnp.einsum("rk,bnkc->bncr", P, Ar).reshape(B, nroots * 6, nefc)

    ft = jnp.transpose(bpad(pad(f, (B, 6, Vp))), (1, 2, 0))
    ct = jnp.transpose(bpad(pad(cdof, (B, 6, Vp))), (1, 2, 0))
    Bmt = jnp.transpose(bpad(pad(Bm, (B, nroots * 6, Rp))), (1, 2, 0))
    jst = jnp.transpose(bpad(pad(jsign, (B, NLp))), (1, 0))
    Dt = jnp.transpose(bpad(pad(D, (B, Rp))), (1, 0))
    areft = jnp.transpose(bpad(pad(aref, (B, Rp))), (1, 0))
    existst = jnp.transpose(bpad(pad(exists.astype(dtype), (B, Rp))), (1, 0))
    econt = jnp.transpose(
        bpad(pad(exists_con.astype(dtype), (B, Cp))), (1, 0)
    )
    fst = jnp.transpose(bpad(pad(qfrc_smooth, (B, Vp))), (1, 0))
    qvt = jnp.transpose(bpad(pad(qvel, (B, Vp))), (1, 0))
    has_warmstart = warmstart is not None
    wst = jnp.transpose(
        bpad(pad(
            warmstart if has_warmstart else jnp.zeros((B, nv), dtype),
            (B, Vp),
        )),
        (1, 0),
    )

    dampp = jnp.zeros((Vp,), dtype).at[:nv].set(damp.astype(dtype))
    dampt = jnp.broadcast_to(dampp[:, None], (Vp, LANE))
    mdT = pad(md.T.astype(dtype), (Vp, MDp))
    szp = jnp.zeros((Vp,), jnp.int32).at[:nv].set(jnp.asarray(sz, jnp.int32))
    szt = jnp.broadcast_to(szp[:, None], (Vp, LANE))
    armp = jnp.ones((Vp,), dtype).at[:nv].set(armature.astype(dtype))
    armt = jnp.broadcast_to(armp[:, None], (Vp, LANE))

    mu_np = np.zeros(Cp)
    sc_np = np.zeros((Cp, 2))
    if nell:
        mu_np[:nell] = np.asarray(ell_mu)
        sc_np[:nell] = np.asarray(ell_scale)
    mut = jnp.broadcast_to(jnp.asarray(mu_np, dtype)[:, None], (Cp, LANE))
    sc1t = jnp.broadcast_to(jnp.asarray(sc_np[:, 0], dtype)[:, None], (Cp, LANE))
    sc2t = jnp.broadcast_to(jnp.asarray(sc_np[:, 1], dtype)[:, None], (Cp, LANE))

    grid = (Bp // LANE,)

    def lane3(d0, d1):
        return pl.BlockSpec((d0, d1, LANE), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def lane2(d0):
        return pl.BlockSpec((d0, LANE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def shared2(d0, d1):
        return pl.BlockSpec((d0, d1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    x_t, force_t, qfrc_t, a0_t, qvn_t, done_t = pl.pallas_call(
        functools.partial(
            _cg_fused_kernel, nv, nefc, iters, ls_iters, tol, 1e-15, dt,
            has_damping, ell0, nell, has_warmstart, stall_tol,
            unroll_iters, unroll_ls,
            nroots, tuple(root_bounds), md_groups, limit_writes,
        ),
        grid=grid,
        in_specs=[
            lane3(6, Vp),  # ft
            lane3(6, Vp),  # ct
            lane3(nroots * 6, Rp),  # Bm
            lane2(NLp),  # jsign
            shared2(Vp, MDp),  # mdT
            shared2(Vp, LANE),  # szv
            shared2(Vp, LANE),  # arm
            lane2(Rp),  # D
            lane2(Rp),  # aref
            lane2(Rp),  # exists
            shared2(Cp, LANE),  # mu
            shared2(Cp, LANE),  # sc1
            shared2(Cp, LANE),  # sc2
            lane2(Cp),  # econ
            lane2(Vp),  # qfrc_smooth
            lane2(Vp),  # qvel
            shared2(Vp, LANE),  # damp
            lane2(Vp),  # warmstart
        ],
        out_specs=[lane2(Vp), lane2(Rp), lane2(Vp), lane2(Vp), lane2(Vp),
                   lane2(_SUBLANE)],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Rp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((_SUBLANE, Bp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Rp, Vp, LANE), dtype),  # J
            pltpu.VMEM((Vp, Vp, LANE), dtype),  # qM
            pltpu.VMEM((Vp, Vp, LANE), dtype),  # sweep
            pltpu.VMEM((Vp, LANE), dtype),  # tail_b
            pltpu.VMEM((Vp, LANE), dtype),  # tail_y
            pltpu.VMEM((Vp, LANE), dtype),  # tail_acc
        ],
        interpret=interpret,
        # 128 MiB is the chip's full VMEM; the pair-scale kernel needs
        # ~118 MiB of scoped stack (J/qM/sweep scratch + live vregs)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(128e6)),
    )(
        ft, ct, Bmt, jst, mdT, szt, armt, Dt, areft, existst, mut, sc1t,
        sc2t, econt, fst, qvt, dampt, wst,
    )
    force = jnp.transpose(force_t, (1, 0))[:B, :nefc]
    if nell:
        force = force[:, inv_perm]
    return (
        jnp.transpose(x_t, (1, 0))[:B, :nv],
        force,
        jnp.transpose(qfrc_t, (1, 0))[:B, :nv],
        jnp.transpose(a0_t, (1, 0))[:B, :nv],
        jnp.transpose(qvn_t, (1, 0))[:B, :nv],
        done_t[0, :B] > 0.5,
    )
