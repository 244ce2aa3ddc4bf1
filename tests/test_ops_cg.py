"""Pallas CG megakernel vs the per-env array implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tracking_tpu.ops import cg as ops_cg
from brax_tracking_tpu.physics import solver as S


def _problem(rng, B, nv, nlim, ncrow, dtype=np.float32):
    A = rng.randn(B, nv, nv).astype(dtype)
    qM = A @ np.transpose(A, (0, 2, 1)) + nv * np.eye(nv, dtype=dtype)
    Jc = rng.randn(B, ncrow, nv).astype(dtype)
    jsign = np.where(rng.rand(B, nlim) > 0.5, 1.0, -1.0).astype(dtype)
    nefc = nlim + ncrow
    D = (0.5 + rng.rand(B, nefc)).astype(dtype)
    aref = rng.randn(B, nefc).astype(dtype)
    exists = rng.rand(B, nefc) > 0.3
    qfrc = rng.randn(B, nv).astype(dtype)
    qvel = rng.randn(B, nv).astype(dtype)
    damp = (0.1 * rng.rand(nv)).astype(np.float64)
    dadr = rng.permutation(nv)[:nlim]
    L1 = np.eye(nv)[dadr]
    return qM, Jc, jsign, D, aref, exists, qfrc, qvel, damp, L1


def _run_both(rng, B, nv, nlim, ncrow, has_damping, nell=0, dtype=np.float32,
              iters=4, ls_iters=4):
    """nell: number of dim-3 elliptic contacts placed at the START of the
    contact block (rows [nlim, nlim+3*nell))."""
    qM, Jc, jsign, D, aref, exists, qfrc, qvel, damp, L1 = _problem(
        rng, B, nv, nlim, ncrow, dtype
    )
    tol, dt = 1e-8, 0.002
    nefc = nlim + ncrow

    quad_mask = np.ones(nefc)
    ell0 = nlim
    if nell:
        quad_mask[nlim : nlim + 3 * nell] = 0.0
        ell_mu = 0.4 + 0.3 * rng.rand(nell)
        ell_scale = 0.8 + 0.4 * rng.rand(nell, 2)
        e_con = rng.rand(B, nell) > 0.3
    else:
        ell_mu = np.zeros(0)
        ell_scale = np.zeros((0, 2))
        e_con = np.zeros((B, 0), bool)

    J = np.concatenate([jsign[:, :, None] * L1[None], Jc], axis=1).astype(dtype)
    exists_q = exists & (quad_mask > 0.5)[None]
    kout = ops_cg.cg_solve_batched(
        jnp.asarray(qM), jnp.asarray(J), jnp.asarray(D), jnp.asarray(aref),
        jnp.asarray(exists_q), jnp.asarray(e_con), jnp.asarray(qfrc),
        jnp.asarray(qvel), jnp.asarray(damp, dtype),
        iters=iters, ls_iters=ls_iters, tol=tol, dt=dt,
        has_damping=has_damping, ell0=ell0,
        ell_mu=tuple(ell_mu.tolist()),
        ell_scale=tuple(map(tuple, ell_scale.tolist())),
        interpret=True,
    )

    statics = dict(
        L1=L1, iters=iters, ls_iters=ls_iters, tol=tol, dt=dt, damp=damp,
        has_damping=has_damping, quad_mask=quad_mask, ell0=ell0,
        ell_mu=ell_mu, ell_scale=ell_scale,
    )

    def base(qMi, Jci, jsi, Di, arefi, exi, eci, fi, vi):
        return S._cg_arrays(qMi, Jci, jsi, Di, arefi, exi, eci, fi, vi, **statics)

    bout = jax.vmap(base)(
        jnp.asarray(qM), jnp.asarray(Jc), jnp.asarray(jsign), jnp.asarray(D),
        jnp.asarray(aref), jnp.asarray(exists), jnp.asarray(e_con),
        jnp.asarray(qfrc), jnp.asarray(qvel),
    )
    return kout, bout, (
        qM, J, D, aref, exists_q, qfrc, ell0, ell_mu, ell_scale, e_con
    )


def _check(kout, bout, prob, rtol=5e-2, atol=8e-2, cost_rtol=2e-3):
    qM, J, D, aref, exists_q, qfrc, ell0, ell_mu, ell_scale, e_con = prob
    names = ("qacc", "force", "qfrc_constraint", "qacc_smooth", "qvel_next")
    # In f64 the two implementations agree to machine epsilon (the math is
    # identical). In f32, ulp-level rounding differences (sweep inverse vs
    # matmul reduction order) can flip cone-zone/bracket branches on
    # borderline envs, so f32 runs check loosely per-element...
    for nm, k, b in zip(names, kout, bout):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(b), rtol=rtol, atol=atol, err_msg=nm
        )

    # ...and the TOTAL cost matches tight (solution quality)
    nell = len(ell_mu)

    def total_cost(x):
        x64 = np.asarray(x, np.float64)
        a0 = np.linalg.solve(
            qM.astype(np.float64), qfrc.astype(np.float64)[..., None]
        )[..., 0]
        jar = np.einsum("brv,bv->br", J.astype(np.float64), x64) - aref
        active = (jar < 0) & exists_q
        quad = 0.5 * np.sum(np.where(active, D * jar**2, 0.0), -1)
        diff = x64 - a0
        gauss = 0.5 * np.einsum("bv,bvw,bw->b", diff, qM.astype(np.float64), diff)
        cost = quad + gauss
        if nell:
            je = jar[:, ell0 : ell0 + 3 * nell].reshape(-1, nell, 3)
            de = D[:, ell0 : ell0 + 3 * nell].reshape(-1, nell, 3)
            n = je[..., 0]
            u = je[..., 1:] * ell_scale[None]
            t = np.sqrt(np.maximum((u**2).sum(-1), 1e-30))
            mu = ell_mu[None]
            bottom = e_con & (mu * n + t <= 0)
            middle = e_con & ~bottom & (n < mu * t)
            dm = de[..., 0] / (1 + mu**2)
            nmt = n - mu * t
            cost = cost + np.sum(
                np.where(bottom, 0.5 * (de * je**2).sum(-1), 0.0), -1
            )
            cost = cost + np.sum(np.where(middle, 0.5 * dm * nmt**2, 0.0), -1)
        return cost

    np.testing.assert_allclose(
        total_cost(kout[0]), total_cost(bout[0]), rtol=cost_rtol, atol=1e-4
    )


class _x64:
    """Run the enclosed block with float64 enabled, restoring the old state."""

    def __enter__(self):
        self._old = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)

    def __exit__(self, *exc):
        jax.config.update("jax_enable_x64", self._old)


@pytest.mark.parametrize("B,nv,nlim,ncrow,has_damping", [
    (4, 7, 3, 6, True),
    (130, 12, 5, 8, True),
    (8, 9, 0, 5, False),
])
def test_kernel_matches_array_path(B, nv, nlim, ncrow, has_damping):
    """f64 parity: with rounding noise out of the way the kernel and the
    array path must agree to near machine epsilon — the proof that the
    one-sided-quadratic cost/force/line-search math is identical."""
    rng = np.random.RandomState(0)
    with _x64():
        kout, bout, prob = _run_both(
            rng, B, nv, nlim, ncrow, has_damping, dtype=np.float64
        )
        _check(kout, bout, prob, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("B,nv,nlim,nell,extra", [
    (6, 10, 4, 2, 3),   # mixed: limits + 2 elliptic cones + 3 quad contacts
    (130, 12, 0, 4, 0),  # pure elliptic
])
def test_kernel_matches_array_path_elliptic(B, nv, nlim, nell, extra):
    """Same machine-epsilon f64 parity for the elliptic-cone branch."""
    rng = np.random.RandomState(1)
    ncrow = 3 * nell + extra
    with _x64():
        kout, bout, prob = _run_both(
            rng, B, nv, nlim, ncrow, True, nell=nell, dtype=np.float64
        )
        _check(kout, bout, prob, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("B,nv,nlim,nell,extra", [
    (130, 12, 5, 0, 8),  # quad: limits + contacts
    (130, 12, 0, 4, 0),  # pure elliptic
])
def test_kernel_f32_solution_quality(B, nv, nlim, nell, extra):
    """f32 production precision: borderline envs may flip an active-set or
    cone-zone branch between the two implementations (ulp noise through an
    iterative solver), so individual elements are only loosely close — but
    both must reach similarly good minimizers. Measured on the elliptic
    case: ~9/130 envs flip, the worse path is <=11% suboptimal in total
    cost, the flips are SYMMETRIC (each impl wins some), and median
    suboptimality vs a converged f64 reference is ~1e-9 for both — i.e.
    pure convergence noise at 4 CG iterations, not a defect in either."""
    rng = np.random.RandomState(1)
    ncrow = 3 * nell + extra
    kout, bout, prob = _run_both(rng, B, nv, nlim, ncrow, True, nell=nell)
    _check(kout, bout, prob, rtol=5e-1, atol=8e-1, cost_rtol=1.5e-1)


def test_kernel_rolled_loops_match_array_path():
    """iters/ls_iters > 16 take the kernel's fori_loop (rolled) branches —
    the rodent_pair configuration (iterations=100, ls_iterations=50,
    solver.py quad_kernel_eligible). Same f64 machine-epsilon parity as the
    unrolled path, on a problem sized to exercise multi-chunk jmul/jtmul."""
    rng = np.random.RandomState(2)
    with _x64():
        kout, bout, prob = _run_both(
            rng, 4, 24, 6, 40, True, dtype=np.float64, iters=20, ls_iters=20
        )
        _check(kout, bout, prob, rtol=1e-9, atol=1e-11)


def test_unroll_false_matches_unrolled():
    """unroll_ls=False routes the line search through the fori_loop branch
    (the pair-scale compile-time configuration, solver._kernel_unroll).
    The iteration math is identical; only XLA's reassociation within the
    compiled loop body can differ, so f64 agreement is machine-epsilon."""
    rng = np.random.RandomState(3)
    with _x64():
        qM, Jc, jsign, D, aref, exists, qfrc, qvel, damp, L1 = _problem(
            rng, 8, 12, 3, 9, dtype=np.float64
        )
        J = np.concatenate(
            [jsign[:, :, None] * L1[None], Jc], axis=1
        ).astype(np.float64)
        args = (
            jnp.asarray(qM), jnp.asarray(J), jnp.asarray(D),
            jnp.asarray(aref), jnp.asarray(exists),
            jnp.zeros((8, 0), bool), jnp.asarray(qfrc), jnp.asarray(qvel),
            jnp.asarray(damp, np.float64),
        )
        kw = dict(iters=4, ls_iters=4, tol=1e-8, dt=0.002, has_damping=True,
                  interpret=True)
        out_u = ops_cg.cg_solve_batched(*args, unroll_ls=True, **kw)
        out_r = ops_cg.cg_solve_batched(*args, unroll_ls=False, **kw)
        for nm, a, b in zip(
            ("qacc", "force", "qfrc", "a0", "qvel_next", "done"), out_u, out_r
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11,
                err_msg=nm,
            )
