"""Per-stage cost breakdown of the batched control step on the local chip.

For the selected BENCH_WORKLOAD (rodent default), times each stage of the
forward pipeline under its own jit at the bench batch size, plus the full
fused control step for reference. Because stages are timed in isolation the
sum exceeds the fused step (XLA fuses across stages) — the value is the
RELATIVE ranking, which survives fusion.

Writes benchmarks/profile_<workload>.json and prints a table.

Run: BENCH_WORKLOAD=rodent python scripts/profile_stages.py [B]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from brax_tracking_tpu.cache_guard import ensure_clean_cache

jax.config.update(
    "jax_compilation_cache_dir", ensure_clean_cache("/tmp/btt_jax_cache")
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else None
# inner scan reps per stage: amortizes the per-dispatch overhead (the
# axon tunnel costs ~30 ms per call — comparable to a whole stage)
REPS = int(os.environ.get("PROFILE_REPS", 20))


def timeit(fn, *args, reps=5, warm=1):
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
    from brax_tracking_tpu.physics import actuation as A
    from brax_tracking_tpu.physics import collision as C
    from brax_tracking_tpu.physics import constraint as Cn
    from brax_tracking_tpu.physics import dynamics as D
    from brax_tracking_tpu.physics import passive as P
    from brax_tracking_tpu.physics import solver as S
    from brax_tracking_tpu.physics import step as St

    global B
    if B is None:
        B = bench.NUM_ENVS
    env = bench._build_env()
    m = env._model
    quad_kernel = S.quad_kernel_eligible(m)
    print(f"workload={bench.WORKLOAD} B={B} nv={m.nv} ncon={m.ncon} "
          f"quad_kernel={quad_kernel}")

    reset = jax.jit(jax.vmap(env.reset))
    state = reset(jax.random.split(jax.random.PRNGKey(0), B))

    @jax.jit
    def ctrl_step(state, key):
        a = jax.random.uniform(key, (B, env.action_size), minval=-0.2,
                               maxval=0.2)
        return jax.vmap(env.step)(state, a)

    # 50-step warmup reaches the contact-rich regime the bench measures
    # (a fresh reset floats ~1 cm above the floor: near-zero constraint
    # work, which made an early version of this profile wildly optimistic)
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

    @jax.jit
    def ctrl_rep(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (B, env.action_size), minval=-0.2,
                                   maxval=0.2)
            return (jax.vmap(env.step)(s, a), k), None
        (state, _), _ = jax.lax.scan(body, (state, key), (), length=REPS)
        return state

    t_full, _ = timeit(ctrl_rep, state, jax.random.PRNGKey(99))
    t_full /= REPS

    a = jax.random.uniform(jax.random.PRNGKey(7), (B, env.action_size),
                           minval=-0.2, maxval=0.2).astype(state.obs.dtype)
    d0 = state.pipeline_state.replace(ctrl=a)

    stages = []

    def stage(name, fn, dprev):
        fb = jax.vmap(lambda d: fn(d))
        dn = jax.jit(fb)(dprev)  # output structure = scan carry type

        # time REPS chained applications in ONE dispatch: each iteration
        # consumes the previous output, so XLA cannot CSE the bodies and
        # the per-call tunnel overhead is amortized away
        @jax.jit
        def rep(d):
            return jax.lax.scan(lambda dd, _: (fb(dd), None), d, (),
                                length=REPS)[0]

        t, _ = timeit(rep, dn)
        stages.append((name, t / REPS))
        return dn

    d = d0
    d = stage("fwd_position (FK+com+tendon)",
              lambda d: St.fwd_position_smooth(m, d), d)
    d = stage("collision", lambda d: C.collision(m, d), d)
    d = stage("crb (mass matrix)", lambda d: D.crb(m, d), d)
    if not quad_kernel:
        d = stage("invert_m", lambda d: D.invert_m(m, d), d)
    d = stage("com_vel", lambda d: St.fwd_velocity_smooth(m, d), d)
    d = stage("passive", lambda d: P.passive(m, d), d)
    d = stage("rne (bias)", lambda d: D.rne(m, d), d)
    d = stage("actuation", lambda d: A.fwd_actuation(m, d), d)

    def smooth(d):
        qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
        if quad_kernel:
            return d.replace(qfrc_smooth=qfrc_smooth)
        return d.replace(qfrc_smooth=qfrc_smooth,
                         qacc_smooth=D.solve_m(m, d, qfrc_smooth))

    d = stage("smooth accel", smooth, d)
    d = stage("make_constraint", lambda d: Cn.make_constraint(m, d), d)
    d = stage("solve (megakernel/newton)", lambda d: S.solve(m, d), d)

    # env-layer cost: full env.step minus 5x physics substeps
    def substeps(d):
        def body(dd, _):
            return St.step(m, dd), None
        dd, _ = jax.lax.scan(body, d, (), length=env._n_frames,
                             unroll=env._n_frames <= 8)
        return dd

    sub_b = jax.vmap(substeps)
    d1 = jax.jit(sub_b)(d0)

    @jax.jit
    def phys_rep(d):
        return jax.lax.scan(lambda dd, _: (sub_b(dd), None), d, (),
                            length=REPS)[0]

    t_phys, _ = timeit(phys_rep, d1)
    t_phys /= REPS
    stages_total = sum(t for _, t in stages)

    print(f"\nfull control step: {t_full*1e3:8.2f} ms  "
          f"-> {B/t_full:,.0f} env-steps/s")
    print(f"5x physics substeps alone: {t_phys*1e3:8.2f} ms "
          f"({100*t_phys/t_full:.0f}% of step)")
    print(f"env layer (obs/reward/reset): {(t_full-t_phys)*1e3:8.2f} ms")
    print(f"\nper-substep stage breakdown (isolated jits, x5 ~ one step):")
    for name, t in stages:
        print(f"  {name:34s} {t*1e3:8.2f} ms  ({100*t/stages_total:5.1f}% "
              f"of stage sum; x5 = {5*t*1e3:7.2f} ms)")

    out = {
        "workload": bench.WORKLOAD,
        "B": B,
        "full_step_ms": round(t_full * 1e3, 3),
        "env_steps_per_s": round(B / t_full, 1),
        "physics_substeps_ms": round(t_phys * 1e3, 3),
        "env_layer_ms": round((t_full - t_phys) * 1e3, 3),
        "stages_ms_per_substep": {n: round(t * 1e3, 4) for n, t in stages},
    }
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        f"profile_{bench.WORKLOAD}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
