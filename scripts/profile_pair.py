"""Micro-profile of the rodent_pair Newton solve on the local accelerator.

Decomposes one control step of the BENCH_WORKLOAD=rodent_pair workload
(B envs, 5 substeps, Newton/iterations=100 per rodent_pair.xml defaults)
into its cost centers:

  - full jitted control step (the bench number's unit)
  - pre-solve forward pipeline (FK..make_constraint)
  - the Newton solve alone (vmapped _solve_newton)
  - Newton iteration count distribution across the batch
  - one batched Hessian assembly (J' W J GEMM)
  - one batched SPD inverse of H (Pallas sweep)
  - one batched exact line search

Run: BENCH_WORKLOAD=rodent_pair python scripts/profile_pair.py [B]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("BENCH_WORKLOAD", "rodent_pair")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from brax_tracking_tpu.cache_guard import ensure_clean_cache

jax.config.update(
    "jax_compilation_cache_dir", ensure_clean_cache("/tmp/btt_jax_cache")
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def timeit(fn, *args, reps=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    import bench
    from brax_tracking_tpu.physics import constraint as Cn
    from brax_tracking_tpu.physics import dynamics as D
    from brax_tracking_tpu.physics import solver as S
    from brax_tracking_tpu.physics import step as St

    env = bench._build_env()
    m = env._model
    layout = Cn.efc_layout(m)
    meta = S._cone_meta(m, layout)
    print(f"nv={m.nv} nefc={layout.nefc} ncon={m.ncon} "
          f"iters={int(m.opt.iterations)} ls_iters={int(m.opt.ls_iterations)}")

    reset = jax.jit(jax.vmap(env.reset))
    state = reset(jax.random.split(jax.random.PRNGKey(0), B))

    @jax.jit
    def ctrl_step(state, key):
        a = jax.random.uniform(key, (B, env.action_size), minval=-0.2, maxval=0.2)
        return jax.vmap(env.step)(state, a)

    # 50 steps to reach the contact-rich regime the bench measures (a
    # fresh reset floats above the floor with near-zero constraint work)
    @jax.jit
    def roll(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (B, env.action_size), minval=-0.2,
                                   maxval=0.2)
            return (jax.vmap(env.step)(s, a), k), None
        (state, _), _ = jax.lax.scan(body, (state, key), (), length=50)
        return state

    state = roll(state, jax.random.PRNGKey(123))
    jax.block_until_ready(state.obs)

    t_full, _ = timeit(ctrl_step, state, jax.random.PRNGKey(99))
    print(f"full control step (5 substeps): {t_full*1e3:8.2f} ms "
          f"-> {B/t_full:,.0f} env-steps/s")

    # --- pre-solve data batch (one substep's input to the solver) ---
    from brax_tracking_tpu.physics import actuation as A
    from brax_tracking_tpu.physics import collision as C
    from brax_tracking_tpu.physics import passive as P

    from brax_tracking_tpu.ops import cholesky as ops_chol
    newton = int(m.opt.solver) == 2  # M.SOLVER_NEWTON

    def _smooth_tail(d):
        qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
        if newton:
            qacc_smooth = ops_chol.spd_solve(d.qM, qfrc_smooth)
        else:
            qacc_smooth = D.solve_m(m, d, qfrc_smooth)
        return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)

    stages = [
        ("fk (fwd_position)", lambda d: St.fwd_position_smooth(m, d)),
        ("collision", lambda d: C.collision(m, d)),
        ("crb", lambda d: D.crb(m, d)),
        ("fwd_velocity", lambda d: St.fwd_velocity_smooth(m, d)),
        ("passive", lambda d: P.passive(m, d)),
        ("rne", lambda d: D.rne(m, d)),
        ("actuation", lambda d: A.fwd_actuation(m, d)),
        ("smooth tail (M^-1 qfrc)", _smooth_tail),
        ("make_constraint", lambda d: Cn.make_constraint(m, d)),
    ]
    if not newton:
        stages.insert(3, ("invert_m", lambda d: D.invert_m(m, d)))

    def presolve(d, a):
        d = d.replace(ctrl=a.astype(d.qpos.dtype))
        for _, fn in stages:
            d = fn(d)
        return d

    a = jax.random.uniform(jax.random.PRNGKey(7), (B, env.action_size),
                           minval=-0.2, maxval=0.2)
    presolve_b = jax.jit(jax.vmap(presolve, in_axes=(0, 0)))
    t_pre, dpre = timeit(presolve_b, state.pipeline_state, a)
    print(f"pre-solve pipeline (1 substep):  {t_pre*1e3:8.2f} ms")

    # per-stage breakdown (isolated jits; ranking survives fusion)
    d_in = state.pipeline_state.replace(ctrl=a.astype(jnp.float32))
    for name, fn in stages:
        fn_b = jax.jit(jax.vmap(fn))
        try:
            t_s, d_out = timeit(fn_b, d_in)
            print(f"  {name:26s} {t_s*1e3:8.2f} ms")
            d_in = d_out
        except Exception as e:  # keep the rest of the profile alive
            print(f"  {name:26s} FAILED: {type(e).__name__}")
            # a deterministically failing stage would fail again here too —
            # skip it and feed the previous d_in to the next stage instead

    solve_b = jax.jit(jax.vmap(lambda d: S.solve(m, d).qacc))
    t_solve, _ = timeit(solve_b, dpre)
    print(f"newton solve (1 substep):        {t_solve*1e3:8.2f} ms")
    print(f"  => approx step = 5*(pre+solve): "
          f"{5*(t_pre+t_solve)*1e3:8.2f} ms")

    # --- iteration counts: expose the while_loop counter ---
    def count_iters(d):
        out = S._solve_newton(m, d, layout, meta, count_only=True)
        return out

    if "count_only" in S._solve_newton.__code__.co_varnames:
        it = jax.jit(jax.vmap(count_iters))(dpre)
        it = np.asarray(it)
        print(f"newton iterations: mean={it.mean():.2f} p50={np.percentile(it,50):.0f} "
              f"p95={np.percentile(it,95):.0f} max={it.max()}")

    # --- component timings ---
    dtype = dpre.qpos.dtype

    def get_jar0(d):
        return Cn.jac_mul(m, d, d.qacc_smooth) - d.efc_aref

    jar0 = jax.jit(jax.vmap(get_jar0))(dpre)

    def hess_one(d, jar):
        exists_row = d.efc_pos < d.efc_margin
        quad_w_mask = np.zeros(layout.nefc, bool)
        quad_w_mask[meta.quad_rows] = True
        active = (jar < 0) & exists_row & jnp.asarray(quad_w_mask)
        w = jnp.where(active, d.efc_D, 0.0)
        nlim = d.efc_jsign.shape[0]
        Jc = d.efc_Jc
        H = d.qM + (Jc * w[nlim:, None]).T @ Jc
        if nlim:
            dadr = Cn.limit_dofs(m)
            H = H + jnp.diag(jnp.zeros(m.nv, H.dtype).at[dadr].add(w[:nlim]))
        return H

    hess_b = jax.jit(jax.vmap(hess_one))
    t_h, H = timeit(hess_b, dpre, jar0)
    print(f"hessian assembly (1 iter):       {t_h*1e3:8.2f} ms")

    from brax_tracking_tpu.ops import cholesky as ops_chol

    g0 = jax.jit(jax.vmap(lambda d: d.qfrc_smooth))(dpre)
    fs_b = jax.jit(lambda H, g: ops_chol.factor_solve_batched(H, g))
    t_i, _ = timeit(fs_b, H, g0)
    print(f"factor_solve(H) (1 iter):        {t_i*1e3:8.2f} ms")

    # linesearch with a synthetic direction p = -H^-1 grad0
    def ls_one(d, jar):
        friction = (m.pairs.friction[layout.con_pair].astype(dtype)
                    if m.ncon else jnp.zeros((0, 5), dtype))
        exists_row = d.efc_pos < d.efc_margin
        if m.ncon:
            includemargin = m.pairs.margin[layout.con_pair].astype(dtype)
            exists_con = d.contact_dist < includemargin
        else:
            exists_con = jnp.zeros((0,), bool)
        cost, force = S._eval_cost_force(
            m, meta, layout, friction, exists_row, exists_con, jar, d.efc_D)
        grad = -Cn.jac_t_mul(m, d, force)
        p = -grad
        jar_p = Cn.jac_mul(m, d, p)
        mp = d.qM @ p
        ctx = S._Ctx(d.qacc_smooth, jar, jnp.zeros(m.nv, dtype), force,
                     cost, grad, grad)
        return S._linesearch(m, meta, friction, exists_row,
                             exists_con, ctx, p, jar_p, mp, d.efc_D)

    ls_b = jax.jit(jax.vmap(ls_one))
    t_l, _ = timeit(ls_b, dpre, jar0)
    print(f"line search     (1 iter):        {t_l*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
