"""Micro-bench: blocked-sweep inverse vs Cholesky factor+solve on the chip.

Decides the Newton direction strategy (H^-1 grad once per iteration) and
the Newton-model smooth-acceleration path (M^-1 rhs once per substep).

Run: python scripts/bench_chol_ops.py [B] [nv]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NV = int(sys.argv[2]) if len(sys.argv) > 2 else 146


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    from brax_tracking_tpu.ops import cholesky as oc

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, NV, NV), jnp.float32)
    H = A @ jnp.transpose(A, (0, 2, 1)) + 10.0 * jnp.eye(NV)[None]
    g = jax.random.normal(jax.random.PRNGKey(1), (B, NV), jnp.float32)

    inv_then_mv = jax.jit(lambda H, g: jnp.einsum(
        "bij,bj->bi", oc.inverse_batched(H), g))
    fac_then_sv = jax.jit(lambda H, g: oc.solve_batched(
        oc.factor_batched(H), g))
    fac_only = jax.jit(oc.factor_batched)
    inv_only = jax.jit(oc.inverse_batched)
    sv_only = jax.jit(oc.solve_batched)

    t_io = timeit(inv_only, H)
    t_fo = timeit(fac_only, H)
    U = fac_only(H)
    t_so = timeit(sv_only, U, g)
    t_im = timeit(inv_then_mv, H, g)
    t_fs = timeit(fac_then_sv, H, g)
    print(f"B={B} nv={NV}")
    print(f"inverse_batched (blocked sweep):     {t_io*1e3:7.2f} ms")
    print(f"factor_batched:                      {t_fo*1e3:7.2f} ms")
    print(f"solve_batched (1 rhs):               {t_so*1e3:7.2f} ms")
    print(f"inverse + matvec:                    {t_im*1e3:7.2f} ms")
    print(f"factor + solve:                      {t_fs*1e3:7.2f} ms")

    # parity
    import numpy as np
    x1 = inv_then_mv(H, g)
    x2 = fac_then_sv(H, g)
    err = float(jnp.max(jnp.abs(x1 - x2)) / jnp.max(jnp.abs(x1)))
    print(f"relative agreement: {err:.2e}")
    assert np.isfinite(err)


if __name__ == "__main__":
    main()
