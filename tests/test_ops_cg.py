"""Pallas CG megakernel vs the per-env array implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tracking_tpu.ops import cg as ops_cg
from brax_tracking_tpu.physics import solver as S


def _problem(rng, B, nv, nlim, ncrow):
    A = rng.randn(B, nv, nv).astype(np.float32)
    qM = A @ np.transpose(A, (0, 2, 1)) + nv * np.eye(nv, dtype=np.float32)
    Jc = rng.randn(B, ncrow, nv).astype(np.float32)
    jsign = np.where(rng.rand(B, nlim) > 0.5, 1.0, -1.0).astype(np.float32)
    nefc = nlim + ncrow
    D = (0.5 + rng.rand(B, nefc)).astype(np.float32)
    aref = rng.randn(B, nefc).astype(np.float32)
    exists = rng.rand(B, nefc) > 0.3
    qfrc = rng.randn(B, nv).astype(np.float32)
    qvel = rng.randn(B, nv).astype(np.float32)
    damp = (0.1 * rng.rand(nv)).astype(np.float64)
    dadr = rng.permutation(nv)[:nlim]
    L1 = np.eye(nv)[dadr]
    return qM, Jc, jsign, D, aref, exists, qfrc, qvel, damp, L1


@pytest.mark.parametrize("B,nv,nlim,ncrow,has_damping", [
    (4, 7, 3, 6, True),
    (130, 12, 5, 8, True),
    (8, 9, 0, 5, False),
])
def test_kernel_matches_array_path(B, nv, nlim, ncrow, has_damping):
    rng = np.random.RandomState(0)
    qM, Jc, jsign, D, aref, exists, qfrc, qvel, damp, L1 = _problem(
        rng, B, nv, nlim, ncrow
    )
    iters, ls_iters, tol, dt = 4, 4, 1e-8, 0.002

    J = np.concatenate([jsign[:, :, None] * L1[None], Jc], axis=1).astype(
        np.float32
    )
    kout = ops_cg.cg_solve_batched(
        jnp.asarray(qM), jnp.asarray(J), jnp.asarray(D), jnp.asarray(aref),
        jnp.asarray(exists), jnp.asarray(qfrc), jnp.asarray(qvel),
        jnp.asarray(damp, jnp.float32),
        iters=iters, ls_iters=ls_iters, tol=tol, dt=dt,
        has_damping=has_damping, interpret=True,
    )

    def base(qMi, Jci, jsi, Di, arefi, exi, fi, vi):
        return S._cg_arrays_quad(
            qMi, Jci, jsi, Di, arefi, exi, fi, vi,
            L1=L1, iters=iters, ls_iters=ls_iters, tol=tol, dt=dt, damp=damp,
            has_damping=has_damping,
        )

    bout = jax.vmap(base)(
        jnp.asarray(qM), jnp.asarray(Jc), jnp.asarray(jsign), jnp.asarray(D),
        jnp.asarray(aref), jnp.asarray(exists), jnp.asarray(qfrc),
        jnp.asarray(qvel),
    )
    names = ("qacc", "force", "qfrc_constraint", "qacc_smooth", "qvel_next")
    # f32 branch boundaries (bracket comparisons) can flip between the two
    # implementations on borderline envs; trajectories are loosely close...
    for nm, k, b in zip(names, kout, bout):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(b), rtol=5e-2, atol=2e-2, err_msg=nm
        )

    # ...and solution QUALITY (total cost at the returned qacc) matches tight.
    def total_cost(x):
        x64 = np.asarray(x, np.float64)
        a0 = np.linalg.solve(qM.astype(np.float64), qfrc.astype(np.float64)[..., None])[..., 0]
        jar = np.einsum("brv,bv->br", J.astype(np.float64), x64) - aref
        active = (jar < 0) & exists
        quad = 0.5 * np.sum(np.where(active, D * jar**2, 0.0), -1)
        diff = x64 - a0
        gauss = 0.5 * np.einsum("bv,bvw,bw->b", diff, qM.astype(np.float64), diff)
        return quad + gauss

    np.testing.assert_allclose(
        total_cost(kout[0]), total_cost(bout[0]), rtol=1e-3, atol=1e-5
    )
