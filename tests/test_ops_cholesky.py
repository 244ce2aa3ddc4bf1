"""Pallas batched Cholesky kernels vs jax.scipy (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tracking_tpu.ops import cholesky as oc


def _rand_spd(rng, B, n, dtype=np.float32):
    A = rng.randn(B, n, n).astype(dtype)
    return A @ np.transpose(A, (0, 2, 1)) + n * np.eye(n, dtype=dtype)


@pytest.mark.parametrize("B,n", [(8, 5), (130, 73), (128, 8)])
def test_factor_batched_matches_scipy(B, n):
    rng = np.random.RandomState(0)
    qM = jnp.asarray(_rand_spd(rng, B, n))
    U = oc.factor_batched(qM, interpret=True)
    ref = jax.vmap(lambda a: jax.scipy.linalg.cholesky(a, lower=False))(qM)
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # reconstruction
    rec = np.einsum("bki,bkj->bij", np.asarray(U), np.asarray(U))
    np.testing.assert_allclose(rec, np.asarray(qM), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("B,n", [(8, 5), (130, 73)])
def test_solve_batched_matches_direct(B, n):
    rng = np.random.RandomState(1)
    qM = jnp.asarray(_rand_spd(rng, B, n))
    b = jnp.asarray(rng.randn(B, n).astype(np.float32))
    U = oc.factor_batched(qM, interpret=True)
    x = oc.solve_batched(U, b, interpret=True)
    ref = np.linalg.solve(
        np.asarray(qM, np.float64), np.asarray(b, np.float64)[..., None]
    )[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-3, atol=2e-3)


def test_custom_vmap_dispatch_unbatched():
    rng = np.random.RandomState(2)
    qM = jnp.asarray(_rand_spd(rng, 1, 7)[0], jnp.float64)
    U = oc.cholesky_factor(qM)
    ref = jax.scipy.linalg.cholesky(qM, lower=False)
    np.testing.assert_allclose(np.asarray(U), np.asarray(ref), rtol=1e-12)
    b = jnp.asarray(rng.randn(7))
    x = oc.cholesky_solve(U, b)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(qM), np.asarray(b)), rtol=1e-10
    )


def test_custom_vmap_dispatch_batched_cpu_fallback():
    rng = np.random.RandomState(3)
    qM = jnp.asarray(_rand_spd(rng, 6, 9), jnp.float64)
    b = jnp.asarray(rng.randn(6, 9))
    U = jax.vmap(oc.cholesky_factor)(qM)
    x = jax.vmap(oc.cholesky_solve)(U, b)
    ref = np.linalg.solve(np.asarray(qM), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-10)


@pytest.mark.parametrize("B,n", [(8, 5), (130, 73), (128, 8)])
def test_inverse_batched_matches_numpy(B, n):
    rng = np.random.RandomState(4)
    qM = jnp.asarray(_rand_spd(rng, B, n))
    inv = oc.inverse_batched(qM, interpret=True)
    ref = np.linalg.inv(np.asarray(qM, np.float64))
    np.testing.assert_allclose(np.asarray(inv), ref, rtol=3e-3, atol=3e-3)


def test_spd_inverse_dispatch():
    rng = np.random.RandomState(5)
    qM1 = jnp.asarray(_rand_spd(rng, 1, 7)[0], jnp.float64)
    np.testing.assert_allclose(
        np.asarray(oc.spd_inverse(qM1)), np.linalg.inv(np.asarray(qM1)), rtol=1e-10
    )
    qMb = jnp.asarray(_rand_spd(rng, 6, 9), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(oc.spd_inverse)(qMb)),
        np.linalg.inv(np.asarray(qMb)),
        rtol=1e-10,
    )


@pytest.mark.parametrize("B,n", [(8, 5), (130, 73), (16, 146)])
def test_factor_solve_batched_fused(B, n):
    """Fused blocked-factor + solve kernel (the Newton direction solve)."""
    rng = np.random.RandomState(3)
    qM = jnp.asarray(_rand_spd(rng, B, n))
    b = jnp.asarray(rng.randn(B, n).astype(np.float32))
    x = oc.factor_solve_batched(qM, b, interpret=True)
    ref = np.linalg.solve(
        np.asarray(qM, np.float64), np.asarray(b, np.float64)[..., None]
    )[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, rtol=2e-3, atol=2e-3)


def test_spd_solve_dispatch():
    """spd_solve: unbatched -> scipy exact; batched CPU -> vmap scipy."""
    rng = np.random.RandomState(4)
    qM = jnp.asarray(_rand_spd(rng, 1, 9)[0], jnp.float64)
    b = jnp.asarray(rng.randn(9))
    x = oc.spd_solve(qM, b)
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(np.asarray(qM), np.asarray(b)), rtol=1e-10
    )
    qMb = jnp.asarray(_rand_spd(rng, 4, 9), jnp.float32)
    bb = jnp.asarray(rng.randn(4, 9).astype(np.float32))
    xb = jax.vmap(oc.spd_solve)(qMb, bb)
    ref = np.linalg.solve(np.asarray(qMb, np.float64), np.asarray(bb)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xb), ref, rtol=2e-4, atol=2e-4)
