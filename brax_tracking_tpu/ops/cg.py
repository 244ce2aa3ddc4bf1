"""Batched constraint solve + implicit-damping update as one Pallas kernel.

The CG solver's per-iteration work is dozens of tiny (nv,)/(nefc,) vector
ops; as XLA ops at 2048 envs each costs a full HBM round trip and fixed
kernel overhead (profiled ~10 ms of a ~34 ms rodent control step), and the
M^-1 / (M+hB)^-1 sweep inversions plus their lane-layout staging cost
another ~11 ms. This kernel runs the WHOLE tail of the substep on one
VMEM-resident (rows, dofs, 128-env) tile:

  1. sweep-invert M (M^-1 never leaves VMEM),
  2. qacc_smooth = M^-1 qfrc_smooth,
  3. the full MuJoCo-CG solve — matvecs, one-sided quadratic cost,
     bracketed Newton line search, Polak-Ribiere, per-env convergence
     freezing,
  4. sweep-invert (M + h diag(B)) and produce the Euler implicit-damping
     velocity update.

Scope: models whose constraint cost is purely one-sided quadratic (joint
limits + pyramidal or frictionless contacts — rodent, rodent_pair,
minirat). Elliptic-cone models (fly) keep the XLA path in physics/solver.py.
Mirrors that implementation's math exactly (same MuJoCo CG semantics).

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
    """In-place SPD inversion of the (Vp, Vp, L) scratch tile by the sweep
    operator (same math as ops/cholesky._inverse_kernel)."""

    def body(k, _):
        row = s_ref[pl.ds(k, 1)][0]  # (Vp, L)
        col = s_ref[:, pl.ds(k, 1)][:, 0]  # (Vp, L)
        dinv = 1.0 / s_ref[pl.ds(k, 1), pl.ds(k, 1)][0]  # (1, L)
        row_d = row * jnp.broadcast_to(dinv, row.shape)
        s_ref[:] = s_ref[:] - col[:, None, :] * row_d[None, :, :]
        s_ref[pl.ds(k, 1)] = row_d[None]
        s_ref[:, pl.ds(k, 1)] = -(col * jnp.broadcast_to(dinv, col.shape))[
            :, None, :
        ]
        s_ref[pl.ds(k, 1), pl.ds(k, 1)] = dinv[None]
        return 0

    jax.lax.fori_loop(0, nv, body, 0)


def _cg_kernel(
    nv: int,
    nefc: int,
    iters: int,
    ls_iters: int,
    tol: float,
    minval: float,
    dt: float,
    has_damping: bool,
    qM_ref,
    J_ref,
    D_ref,
    aref_ref,
    exists_ref,
    qfrc_smooth_ref,
    qvel_ref,
    damp_ref,
    x_ref,
    force_ref,
    qfrc_ref,
    a0_ref,
    qvel_new_ref,
    scratch_ref,
):
    f32 = jnp.float32
    qM = qM_ref[:]  # (Vp, Vp, L)
    J = J_ref[:]  # (Rp, Vp, L)
    D = D_ref[:]  # (Rp, L)
    aref = aref_ref[:]
    exists = exists_ref[:]  # (Rp, L) 0/1
    qfrc_smooth = qfrc_smooth_ref[:]  # (Vp, L)

    # layout anchors (see module docstring)
    zV = qfrc_smooth * 0.0  # (Vp, L)
    zR = aref * 0.0  # (Rp, L)

    def jmul(x):  # (Vp, L) -> (Rp, L)
        return jnp.sum(J * jnp.broadcast_to(x[None, :, :], J.shape), axis=1) + zR

    def jtmul(f):  # (Rp, L) -> (Vp, L)
        return jnp.sum(J * jnp.broadcast_to(f[:, None, :], J.shape), axis=0) + zV

    def mmul(mat, x):  # (Vp, Vp, L), (Vp, L) -> (Vp, L)
        return (
            jnp.sum(mat * jnp.broadcast_to(x[None, :, :], mat.shape), axis=1) + zV
        )

    # --- M^-1 lives only in VMEM --------------------------------------
    scratch_ref[:] = qM
    _sweep_invert(nv, scratch_ref)
    qMinv = scratch_ref[:]
    a0 = mmul(qMinv, qfrc_smooth)  # qacc_smooth

    def cost_force(jar):
        active = jnp.where(jar < 0.0, exists, 0.0)
        f = -D * jar * active
        cost = 0.5 * jnp.sum(active * D * jar * jar, axis=0, keepdims=True)
        return cost, f  # (1, L), (Rp, L)

    def eval_ctx(x, jar, mxa):
        cost_c, force = cost_force(jar)
        gauss = 0.5 * jnp.sum((x - a0) * mxa, axis=0, keepdims=True)
        grad = mxa - jtmul(force)
        mgrad = mmul(qMinv, grad)
        return force, cost_c + gauss, grad, mgrad

    x = a0
    jar = jmul(x) - aref
    mxa = jnp.zeros_like(x)
    force, cost, grad, mgrad = eval_ctx(x, jar, mxa)
    p = -mgrad
    done = jnp.zeros((1, x.shape[-1]), f32)  # 0/1 per lane

    for _ in range(iters):
        jar_p = jmul(p)
        mp = mmul(qM, p)
        pmp = jnp.sum(p * mp, axis=0, keepdims=True)
        gauss_p = jnp.sum(p * mxa, axis=0, keepdims=True)

        d_jp = D * jar_p  # hoisted: reused by every dphi eval

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
        dcand, _ = dphi(cand)
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
        for _ in range(ls_iters):
            dv, ddv = dphi(alpha)
            lo = jnp.where(dv < 0.0, alpha, lo)
            hi = jnp.where(dv >= 0.0, alpha, hi)
            newton = alpha - dv / jnp.maximum(ddv, minval)
            inside = jnp.logical_and(newton > lo, newton < hi)
            alpha = jnp.where(inside, newton, 0.5 * (lo + hi))

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

    qfrc_constraint = jtmul(force)
    x_ref[:] = x
    force_ref[:] = force
    qfrc_ref[:] = qfrc_constraint
    a0_ref[:] = a0

    # --- Euler velocity update ----------------------------------------
    qvel = qvel_ref[:]
    qfrc_total = qfrc_smooth + qfrc_constraint
    if has_damping:
        # (M + h diag(B))^-1: rebuild scratch, add the (static) damping
        # diagonal, sweep again
        i_idx = jax.lax.broadcasted_iota(jnp.int32, (qM.shape[0], qM.shape[1], 1), 0)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (qM.shape[0], qM.shape[1], 1), 1)
        eye = jnp.where(i_idx == j_idx, 1.0, 0.0)
        damp = damp_ref[:]  # (Vp, L), already h * dof_damping
        scratch_ref[:] = qM + eye * damp[:, None, :]
        _sweep_invert(nv, scratch_ref)
        mhinv = scratch_ref[:]
        qvel_new_ref[:] = qvel + dt * mmul(mhinv, qfrc_total)
    else:
        qvel_new_ref[:] = qvel + dt * x


@functools.partial(
    jax.jit,
    static_argnames=("iters", "ls_iters", "tol", "dt", "has_damping", "interpret"),
)
def cg_solve_batched(
    qM: jax.Array,  # (B, nv, nv)
    J: jax.Array,  # (B, nefc, nv) dense constraint jacobian
    D: jax.Array,  # (B, nefc)
    aref: jax.Array,  # (B, nefc)
    exists: jax.Array,  # (B, nefc) 0/1
    qfrc_smooth: jax.Array,  # (B, nv)
    qvel: jax.Array,  # (B, nv)
    damp: jax.Array,  # (nv,) h * dof_damping (shared across batch)
    iters: int,
    ls_iters: int,
    tol: float,
    dt: float,
    has_damping: bool,
    interpret: bool = False,
):
    """Returns (qacc, efc_force, qfrc_constraint, qacc_smooth, qvel_new)."""
    B, nefc, nv = J.shape
    Vp = _round_up(nv, _SUBLANE)
    Rp = _round_up(nefc, _SUBLANE)
    Bp = _round_up(B, LANE)
    dtype = qM.dtype

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
    fsp = pad(qfrc_smooth, (B, Vp))
    qvp = pad(qvel, (B, Vp))
    dampp = jnp.zeros((Vp,), dtype).at[:nv].set(damp.astype(dtype))
    dampt = jnp.broadcast_to(dampp[:, None], (Vp, LANE))

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
    fst = jnp.transpose(bpad(fsp), (1, 0))
    qvt = jnp.transpose(bpad(qvp), (1, 0))

    grid = (Bp // LANE,)
    mat_spec = pl.BlockSpec(
        (Vp, Vp, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    j_spec = pl.BlockSpec(
        (Rp, Vp, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec((Rp, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    dof_spec = pl.BlockSpec((Vp, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    damp_spec = pl.BlockSpec(
        (Vp, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    x_t, force_t, qfrc_t, a0_t, qvn_t = pl.pallas_call(
        functools.partial(
            _cg_kernel, nv, nefc, iters, ls_iters, tol, 1e-15, dt, has_damping
        ),
        grid=grid,
        in_specs=[
            mat_spec,
            j_spec,
            row_spec,
            row_spec,
            row_spec,
            dof_spec,
            dof_spec,
            damp_spec,
        ],
        out_specs=[dof_spec, row_spec, dof_spec, dof_spec, dof_spec],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Rp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
            jax.ShapeDtypeStruct((Vp, Bp), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Vp, Vp, LANE), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(110e6)),
    )(qMt, Jt, Dt, areft, existst, fst, qvt, dampt)
    return (
        jnp.transpose(x_t, (1, 0))[:B, :nv],
        jnp.transpose(force_t, (1, 0))[:B, :nefc],
        jnp.transpose(qfrc_t, (1, 0))[:B, :nv],
        jnp.transpose(a0_t, (1, 0))[:B, :nv],
        jnp.transpose(qvn_t, (1, 0))[:B, :nv],
    )
