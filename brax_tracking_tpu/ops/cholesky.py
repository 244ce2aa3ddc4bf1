"""Batched Cholesky factor + solve as Pallas TPU kernels.

Why: the mass matrix is small (nv<=73) but the env batch is huge (2048+).
XLA's batched (B, nv, nv) Cholesky streams the whole batch through HBM once
per elimination column (~nv round trips). These kernels put the batch in
the LANE dimension — each grid program owns a (nv, nv, 128) tile resident
in VMEM — so the nv sequential elimination steps run at VPU speed with zero
HBM traffic in between. Measured ~10x on the rodent model (nv=73, B=2048)
vs jax.scipy.linalg.cholesky under vmap on a v5e chip.

Representation: the factor is the UPPER factor U with M = U^T U (rows of U
are written one per elimination step — row access only, which is what VMEM
wants). Both triangular solves also use only row access:
  - forward  (U^T y = b): running accumulator acc_k = sum_{i<k} U[i]*y_i;
  - backward (U  x = y): masked row-dot against the partially-built x.

The unbatched path (and any non-TPU backend) falls back to jax.scipy —
keeping float64 CPU parity tests on the exact scipy numerics.
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


def _compiler_params(n: int):
    """Raise the scoped-VMEM limit for big-nv tiles (rodent_pair nv=146:
    a (152, 152, 128) f32 in+out pair needs ~45 MB; the default limit is
    16 MB while v5e has 128 MB VMEM)."""
    if n <= 96:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(110e6))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# kernels (operate on one (n, n, LANE) / (n, LANE) tile)
# ---------------------------------------------------------------------------


def _factor_kernel(nv: int, a_ref, u_ref):
    """Right-looking Cholesky; A and U live as (n, n, LANE) VMEM tiles.

    Invariant entering step k: rows <k of u_ref hold finished U rows; the
    trailing block holds the Schur complement. All dynamic indexing is on
    refs via pl.ds (Mosaic has no value-level dynamic_slice).
    """
    n = a_ref.shape[0]
    u_ref[:] = a_ref[:]
    i_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # i index of a row
    j_row = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)  # j index

    def body(k, _):
        row = u_ref[pl.ds(k, 1)][0]  # (n, LANE)
        pivot = u_ref[pl.ds(k, 1), pl.ds(k, 1)][0]  # (1, LANE)
        c = jax.lax.rsqrt(pivot)
        u_k = jnp.where(i_col >= k, row * c, 0.0)  # finished row k of U
        # rank-1 downdate of rows j>k (full i range; the sub-diagonal half
        # is dead weight the VPU does for free)
        outer = u_k[:, None, :] * u_k[None, :, :]  # (n, n, LANE)
        u_ref[:] = u_ref[:] - jnp.where(j_row > k, outer, 0.0)
        u_ref[pl.ds(k, 1)] = u_k[None]
        return 0

    jax.lax.fori_loop(0, nv, body, 0)


def _solve_ref(nv: int, u_ref, b_ref, x_ref, y_ref, acc_ref):
    """Solve (U^T U) x = b for one (n, LANE) rhs tile; row access only."""
    zeros = jnp.zeros(x_ref.shape, x_ref.dtype)
    acc_ref[:] = zeros

    # forward: U^T y = b, with acc_k = sum_{i<k} U[i] * y_i held in VMEM
    def fwd(k, _):
        u_k = u_ref[pl.ds(k, 1)][0]  # (n, LANE)
        diag = u_ref[pl.ds(k, 1), pl.ds(k, 1)][0]  # (1, LANE)
        y_k = (b_ref[pl.ds(k, 1)] - acc_ref[pl.ds(k, 1)]) / diag
        acc_ref[:] = acc_ref[:] + u_k * y_k
        y_ref[pl.ds(k, 1)] = y_k
        return 0

    jax.lax.fori_loop(0, nv, fwd, 0)

    # backward: U x = y (reverse; x[i] for i<=k is still zero, and U row k
    # has zeros for i<k, so the plain row-dot needs no mask)
    x_ref[:] = zeros

    def bwd(idx, _):
        k = nv - 1 - idx
        u_k = u_ref[pl.ds(k, 1)][0]
        diag = u_ref[pl.ds(k, 1), pl.ds(k, 1)][0]
        s = jnp.sum(u_k * x_ref[:], axis=0, keepdims=True)
        x_ref[pl.ds(k, 1)] = (y_ref[pl.ds(k, 1)] - s) / diag
        return 0

    jax.lax.fori_loop(0, nv, bwd, 0)


def _solve_kernel(nv: int, u_ref, b_ref, x_ref, y_ref, acc_ref):
    _solve_ref(nv, u_ref, b_ref, x_ref, y_ref, acc_ref)


def _factor_ref_blocked(n: int, u_ref, block: int = _SUBLANE):
    """In-place blocked Cholesky of an (n, n, LANE) VMEM tile.

    The tile must hold an SPD matrix whose padded diagonal (rows >= the
    logical nv) is the identity (_pad_spd guarantees this), so all n
    elimination steps are exact (padded pivots sweep as no-ops). On exit
    the rows hold the upper factor U with M = U^T U (sub-diagonal entries
    of trailing rows carry garbage that every consumer masks, exactly as
    in _factor_kernel).

    Why blocked: the scalar kernel does n rank-1 FULL-TILE passes (the
    square update plus the dead sub-diagonal half is ~6x the triangle's
    FLOPs). Here the panel is swept with `block` tiny steps and the Schur
    update touches only the STATIC trailing rows — python-unrolled block
    bounds keep every slice static for Mosaic.
    """
    i_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    j_row = jax.lax.broadcasted_iota(jnp.int32, (block, 1, 1), 0)
    for kb in range(0, n, block):
        P = u_ref[pl.ds(kb, block)]  # (block, n, LANE) panel values
        for k in range(block):
            row = P[k]  # (n, LANE)
            pivot = row[kb + k]  # (LANE,)
            c = jax.lax.rsqrt(pivot)
            u_k = jnp.where(i_col >= kb + k, row * c[None], 0.0)
            fac = u_k[kb : kb + block]  # (block, LANE) panel column of U
            P = P - jnp.where(j_row > k, fac[:, None, :] * u_k[None], 0.0)
            P = jnp.where(j_row == k, u_k[None], P)
        u_ref[pl.ds(kb, block)] = P
        rem = n - kb - block
        if rem > 0:
            # Schur update of trailing rows only: S[j] -= sum_k U_k[j] U_k
            fac_t = P[:, kb + block :]  # (block, rem, LANE)
            upd = sum(
                fac_t[k][:, None, :] * P[k][None, :, :] for k in range(block)
            )  # (rem, n, LANE)
            u_ref[pl.ds(kb + block, rem)] = u_ref[pl.ds(kb + block, rem)] - upd


def _factor_solve_kernel(n: int, nv: int, a_ref, b_ref, x_ref, u_ref, y_ref,
                         acc_ref):
    """Fused factor + solve: U never leaves VMEM (one kernel, no HBM
    round trip for the (n, n, B) factor between the two stages)."""
    u_ref[:] = a_ref[:]
    _factor_ref_blocked(n, u_ref)
    _solve_ref(nv, u_ref, b_ref, x_ref, y_ref, acc_ref)


# ---------------------------------------------------------------------------
# batched entry points (B leading, like vmap produces)
# ---------------------------------------------------------------------------


def _pad_spd(qM: jax.Array, n_pad: int) -> jax.Array:
    """Pad (B, nv, nv) SPD matrices to (B, n_pad, n_pad), identity block."""
    B, nv, _ = qM.shape
    if n_pad == nv:
        return qM
    out = jnp.zeros((B, n_pad, n_pad), qM.dtype)
    out = out.at[:, :nv, :nv].set(qM)
    idx = jnp.arange(nv, n_pad)
    return out.at[:, idx, idx].set(1.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_batched(qM: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, nv, nv) SPD -> (B, nv, nv) upper U with M = U^T U."""
    B, nv, _ = qM.shape
    n = _round_up(nv, _SUBLANE)
    Bp = _round_up(B, LANE)
    a = _pad_spd(qM, n)
    if Bp != B:
        a = jnp.concatenate([a, jnp.tile(a[-1:], (Bp - B, 1, 1))], axis=0)
    at = jnp.transpose(a, (1, 2, 0))  # (n, n, Bp): batch in lanes
    ut = pl.pallas_call(
        functools.partial(_factor_kernel, nv),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), qM.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(n),
    )(at)
    return jnp.transpose(ut, (2, 0, 1))[:B, :nv, :nv]


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_batched(U: jax.Array, b: jax.Array, interpret: bool = False) -> jax.Array:
    """Solve M x = b from the upper factor; U (B, nv, nv), b (B, nv)."""
    B, nv, _ = U.shape
    n = _round_up(nv, _SUBLANE)
    Bp = _round_up(B, LANE)
    u = jnp.zeros((B, n, n), U.dtype).at[:, :nv, :nv].set(U)
    idx = jnp.arange(nv, n)
    u = u.at[:, idx, idx].set(1.0)
    bb = jnp.zeros((B, n), b.dtype).at[:, :nv].set(b)
    if Bp != B:
        u = jnp.concatenate([u, jnp.tile(u[-1:], (Bp - B, 1, 1))], axis=0)
        bb = jnp.concatenate([bb, jnp.tile(bb[-1:], (Bp - B, 1))], axis=0)
    ut = jnp.transpose(u, (1, 2, 0))
    bt = jnp.transpose(bb, (1, 0))
    xt = pl.pallas_call(
        functools.partial(_solve_kernel, nv),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, LANE), b.dtype),
            pltpu.VMEM((n, LANE), b.dtype),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(n),
    )(ut, bt)
    return jnp.transpose(xt, (1, 0))[:B, :nv]


# ---------------------------------------------------------------------------
# custom_vmap dispatch: scalar call -> scipy; vmapped call on TPU -> pallas
# ---------------------------------------------------------------------------


def _use_pallas(x: jax.Array) -> bool:
    # Measured on v5e (chained, elision-proof timing; B=2048, nv=73):
    # factor 15 ms (XLA) -> ~0.5 ms (Pallas); solve 5.7 ms -> 1.5 ms.
    # BTT_PALLAS_CHOLESKY=0 opts out (e.g. for XLA-vs-Pallas A/B runs).
    import os

    if os.environ.get("BTT_PALLAS_CHOLESKY", "1") != "1":
        return False
    return jax.default_backend() == "tpu" and x.dtype == jnp.float32


@jax.custom_batching.custom_vmap
def cholesky_factor(qM: jax.Array) -> jax.Array:
    """(nv, nv) SPD -> upper U with M = U^T U."""
    return jax.scipy.linalg.cholesky(qM, lower=False)


@cholesky_factor.def_vmap
def _cholesky_factor_vmap(axis_size, in_batched, qM):
    (batched,) = in_batched
    if not batched:
        return cholesky_factor(qM), False
    if _use_pallas(qM):
        return factor_batched(qM), True
    return jax.vmap(jax.scipy.linalg.cholesky)(qM), True


def sweep_invert_ref(nv: int, s_ref, block: int = _SUBLANE):
    """In-place SPD inversion of an (n, n, LANE) VMEM tile by the *blocked*
    sweep operator (block Gauss-Jordan / Schur-complement form).

    Per block [kb, kb+b): with S = [[A, R'], [C', N]] (A the pivot block):
      S <- [[A^-1, A^-1 R'], [-C' A^-1, N - C' A^-1 R']]
    Sweeping all pivots leaves S = inverse (same convention as the scalar
    sweep, verified identical numerically). Why blocked: the scalar sweep
    makes nv full-tile read-modify-write passes; the blocked form makes
    nv/block passes with a block-deep FMA tree that stays in registers, and
    its column-panel extraction is sublane-aligned (the scalar version
    slices single sublanes at 1/8 utilization). The panel sizes match the
    TPU sublane (8), so kb slices land on tile boundaries.

    Rows/cols >= nv are never modified logically: the final partial block
    is masked to the identity in the pivot and zero in the panels.
    """
    for kb in range(0, nv, block):
        b = min(block, nv - kb)
        R = s_ref[pl.ds(kb, block)]  # (block, n, LANE) row panel
        C = s_ref[:, pl.ds(kb, block)]  # (n, block, LANE) col panel
        A = jax.lax.slice_in_dim(R, kb, kb + block, axis=1)  # (block, block, L)
        ii = jax.lax.broadcasted_iota(jnp.int32, (block, block, 1), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (block, block, 1), 1)
        if b < block:
            # extend the pivot block with the identity and mask the panels:
            # padded pivots then sweep as exact no-ops
            keep = (ii < b) & (jj < b)
            eye = (ii == jj).astype(A.dtype)
            A = jnp.where(keep, A, jnp.where(ii == jj, eye, 0.0))
            jc = jax.lax.broadcasted_iota(jnp.int32, (1, block, 1), 1)
            C = jnp.where(jc < b, C, 0.0)
        # --- invert the pivot block by `block` scalar sweeps (tiny tile) ---
        # row/col/diag writes use iota masks, NOT .at[].set: value-updates
        # at integer indices lower to lax.scatter, which Pallas TPU (Mosaic)
        # cannot lower — masked selects vectorize fine on the VPU
        Ai = A
        for k in range(block):
            rowk = Ai[k]  # (block, LANE)
            colk = Ai[:, k]  # (block, LANE)
            dinv = 1.0 / Ai[k, k]  # (LANE,)
            row_d = rowk * dinv[None, :]
            Ai = Ai - colk[:, None, :] * row_d[None, :, :]
            Ai = jnp.where(ii == k, row_d[None, :, :], Ai)
            Ai = jnp.where(jj == k, (-colk * dinv[None, :])[:, None, :], Ai)
            Ai = jnp.where((ii == k) & (jj == k), dinv[None, None, :], Ai)
        # --- panel products (block-deep, stay in registers) ---
        # NB: a[:, j][:, None, :] (slice then expand), never a[:, j, None, :]:
        # mixing an int index with None falls off jnp's slice fast-path into
        # lax.gather, which Mosaic only lowers in 2D
        # RD[i] = sum_j Ai[i, j] * R[j]  -> A^-1 R'
        RD = sum(Ai[:, j][:, None, :] * R[j][None] for j in range(block))
        # CA[:, i] = sum_j C[:, j] * Ai[j, i] -> C' A^-1
        CA = sum(C[:, j][:, None, :] * Ai[j][None, :, :] for j in range(block))
        # --- Schur update, row-chunked ---
        # NOT one whole-tile pass: `s_ref[:] - upd` materializes two full
        # (n, n, LANE) values (~12 MB each at rodent_pair's n=152), and
        # with nv/8 unrolled passes the register allocator spills ~80 MB
        # past the VMEM cap. Chunking bounds the live set to one
        # (CHUNK, n, LANE) slab; per-element arithmetic is identical.
        n_rows = s_ref.shape[0]
        chunk = max(
            _SUBLANE,
            (3_000_000 // (s_ref.shape[1] * s_ref.shape[2] * 4))
            // _SUBLANE
            * _SUBLANE,
        )
        for off in range(0, n_rows, chunk):
            m_ = min(chunk, n_rows - off)
            Cc = jax.lax.slice_in_dim(C, off, off + m_, axis=0)
            upd_c = sum(
                Cc[:, j][:, None, :] * RD[j][None] for j in range(block)
            )
            s_ref[pl.ds(off, m_)] = s_ref[pl.ds(off, m_)] - upd_c
        s_ref[pl.ds(kb, block)] = RD
        s_ref[:, pl.ds(kb, block)] = -CA
        s_ref[pl.ds(kb, block), pl.ds(kb, block)] = Ai


def _inverse_kernel(nv: int, a_ref, o_ref):
    """In-place SPD inversion by the blocked sweep; (n, n, LANE) tile.

    One inversion ~= one factorization in FLOPs — and it turns every
    downstream M^-1 rhs into a single matmul instead of an nv-step
    substitution. See sweep_invert_ref for the blocked-sweep math.
    """
    o_ref[:] = a_ref[:]
    sweep_invert_ref(nv, o_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def inverse_batched(qM: jax.Array, interpret: bool = False) -> jax.Array:
    """(B, nv, nv) SPD -> (B, nv, nv) inverse via the sweep kernel."""
    B, nv, _ = qM.shape
    n = _round_up(nv, _SUBLANE)
    Bp = _round_up(B, LANE)
    a = _pad_spd(qM, n)
    if Bp != B:
        a = jnp.concatenate([a, jnp.tile(a[-1:], (Bp - B, 1, 1))], axis=0)
    at = jnp.transpose(a, (1, 2, 0))
    ot = pl.pallas_call(
        functools.partial(_inverse_kernel, nv),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), qM.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(n),
    )(at)
    return jnp.transpose(ot, (2, 0, 1))[:B, :nv, :nv]


@functools.partial(jax.jit, static_argnames=("interpret",))
def inverse2_batched(
    qM: jax.Array, damp: jax.Array, interpret: bool = False
):
    """inv(M) and inv(M + diag(damp)) sharing one transpose+pad of M.

    The lane-batched layout transform (B,n,n) -> (n,n,Bp) is a significant
    fraction of an inversion's cost; the Euler implicit-damping solve needs
    the second inverse every substep, so both are produced from one staged
    operand. damp: (nv,) static per-dof damping*dt.
    """
    B, nv, _ = qM.shape
    n = _round_up(nv, _SUBLANE)
    Bp = _round_up(B, LANE)
    a = _pad_spd(qM, n)
    if Bp != B:
        a = jnp.concatenate([a, jnp.tile(a[-1:], (Bp - B, 1, 1))], axis=0)
    at = jnp.transpose(a, (1, 2, 0))  # (n, n, Bp)

    def run(x):
        return pl.pallas_call(
            functools.partial(_inverse_kernel, nv),
            grid=(Bp // LANE,),
            in_specs=[
                pl.BlockSpec(
                    (n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, n, Bp), qM.dtype),
            interpret=interpret,
            compiler_params=_compiler_params(n),
        )(x)

    inv1 = run(at)
    idx = jnp.arange(nv)
    at2 = at.at[idx, idx].add(damp.astype(qM.dtype)[:, None])
    inv2 = run(at2)
    return (
        jnp.transpose(inv1, (2, 0, 1))[:B, :nv, :nv],
        jnp.transpose(inv2, (2, 0, 1))[:B, :nv, :nv],
    )


@jax.custom_batching.custom_vmap
def spd_inverse2(qM: jax.Array, damp: jax.Array):
    """(inv(M), inv(M + diag(damp))) — unbatched/CPU via Cholesky."""
    eye = jnp.eye(qM.shape[0], dtype=qM.dtype)
    c1 = jax.scipy.linalg.cho_factor(qM)
    c2 = jax.scipy.linalg.cho_factor(qM + jnp.diag(damp.astype(qM.dtype)))
    return jax.scipy.linalg.cho_solve(c1, eye), jax.scipy.linalg.cho_solve(c2, eye)


@spd_inverse2.def_vmap
def _spd_inverse2_vmap(axis_size, in_batched, qM, damp):
    qm_b, d_b = in_batched
    if not qm_b:
        return spd_inverse2(qM, damp), (False, False)
    if d_b:
        damp0 = damp[0]
    else:
        damp0 = damp
    if _use_pallas(qM):
        return inverse2_batched(qM, damp0), (True, True)

    def _one(q):
        eye = jnp.eye(q.shape[0], dtype=q.dtype)
        c1 = jax.scipy.linalg.cho_factor(q)
        c2 = jax.scipy.linalg.cho_factor(q + jnp.diag(damp0.astype(q.dtype)))
        return (
            jax.scipy.linalg.cho_solve(c1, eye),
            jax.scipy.linalg.cho_solve(c2, eye),
        )

    return jax.vmap(_one)(qM), (True, True)


@jax.custom_batching.custom_vmap
def spd_inverse(qM: jax.Array) -> jax.Array:
    """(nv, nv) SPD -> inverse (Cholesky-based on the unbatched/CPU path)."""
    c = jax.scipy.linalg.cho_factor(qM)
    return jax.scipy.linalg.cho_solve(c, jnp.eye(qM.shape[0], dtype=qM.dtype))


@spd_inverse.def_vmap
def _spd_inverse_vmap(axis_size, in_batched, qM):
    (batched,) = in_batched
    if not batched:
        return spd_inverse(qM), False
    if _use_pallas(qM):
        return inverse_batched(qM), True

    def _one(q):
        c = jax.scipy.linalg.cho_factor(q)
        return jax.scipy.linalg.cho_solve(c, jnp.eye(q.shape[0], dtype=q.dtype))

    return jax.vmap(_one)(qM), True


@functools.partial(jax.jit, static_argnames=("interpret",))
def factor_solve_batched(
    qM: jax.Array, b: jax.Array, interpret: bool = False
) -> jax.Array:
    """Solve M x = b, (B, nv, nv) SPD + (B, nv) rhs, in ONE Pallas kernel
    (blocked factor + both substitutions; the factor stays in VMEM)."""
    B, nv, _ = qM.shape
    n = _round_up(nv, _SUBLANE)
    Bp = _round_up(B, LANE)
    a = _pad_spd(qM, n)
    bb = jnp.zeros((B, n), b.dtype).at[:, :nv].set(b)
    if Bp != B:
        a = jnp.concatenate([a, jnp.tile(a[-1:], (Bp - B, 1, 1))], axis=0)
        bb = jnp.concatenate([bb, jnp.tile(bb[-1:], (Bp - B, 1))], axis=0)
    at = jnp.transpose(a, (1, 2, 0))  # (n, n, Bp): batch in lanes
    bt = jnp.transpose(bb, (1, 0))
    xt = pl.pallas_call(
        functools.partial(_factor_solve_kernel, n, nv),
        grid=(Bp // LANE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), b.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANE), qM.dtype),
            pltpu.VMEM((n, LANE), b.dtype),
            pltpu.VMEM((n, LANE), b.dtype),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(n),
    )(at, bt)
    return jnp.transpose(xt, (1, 0))[:B, :nv]


@jax.custom_batching.custom_vmap
def spd_solve(qM: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b for SPD M — unbatched/CPU via scipy Cholesky; batched
    TPU f32 via the fused factor+solve kernel."""
    c = jax.scipy.linalg.cho_factor(qM)
    return jax.scipy.linalg.cho_solve(c, b)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, qM, b):
    m_b, b_b = in_batched
    if not (m_b and b_b):
        qM = qM if m_b else jnp.broadcast_to(qM, (axis_size,) + qM.shape)
        b = b if b_b else jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(qM):
        return factor_solve_batched(qM, b), True

    def one(q, rhs):
        c = jax.scipy.linalg.cho_factor(q)
        return jax.scipy.linalg.cho_solve(c, rhs)

    return jax.vmap(one)(qM, b), True


@jax.custom_batching.custom_vmap
def cholesky_solve(U: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (U^T U) x = b; U upper, b (nv,)."""
    y = jax.scipy.linalg.solve_triangular(U.T, b, lower=True)
    return jax.scipy.linalg.solve_triangular(U, y, lower=False)


@cholesky_solve.def_vmap
def _cholesky_solve_vmap(axis_size, in_batched, U, b):
    u_b, b_b = in_batched
    if not (u_b and b_b):
        U = U if u_b else jnp.broadcast_to(U, (axis_size,) + U.shape)
        b = b if b_b else jnp.broadcast_to(b, (axis_size,) + b.shape)
    if _use_pallas(U):
        return solve_batched(U, b), True

    def one(u, rhs):
        y = jax.scipy.linalg.solve_triangular(u.T, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(u, y, lower=False)

    return jax.vmap(one)(U, b), True
