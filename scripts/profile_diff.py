"""Differential pipeline profile: cost of each forward stage IN CONTEXT.

Isolated per-stage jits are useless on this setup (each call pays the
remote-TPU tunnel round trip, a ~30 ms floor that buries every stage).
Instead: for each prefix of the substep pipeline, run a 25-substep jitted
lax.scan (state fed forward, integrating with whatever acceleration exists
at that point) and report the cumulative time; consecutive differences are
the per-stage costs under realistic fusion, with one dispatch per scan.

Run: BENCH_WORKLOAD=rodent_pair python scripts/profile_diff.py [B]
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B = int(sys.argv[1]) if len(sys.argv) > 1 else None
STEPS = 25


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
          f"quad_kernel={quad_kernel}", flush=True)

    reset = jax.jit(jax.vmap(env.reset))
    state = reset(jax.random.split(jax.random.PRNGKey(0), B))

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
    print("warmup done", flush=True)

    d0 = state.pipeline_state
    key0 = jax.random.PRNGKey(9)

    # stage list: (name, fn) applied cumulatively inside the substep
    def smooth(d):
        qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
        if quad_kernel:
            return d.replace(qfrc_smooth=qfrc_smooth)
        return d.replace(qfrc_smooth=qfrc_smooth,
                         qacc_smooth=D.solve_m(m, d, qfrc_smooth))

    stages = [
        ("fwd_position", lambda d: St.fwd_position_smooth(m, d)),
        ("collision", lambda d: C.collision(m, d)),
        ("crb", lambda d: D.crb(m, d)),
    ]
    if not quad_kernel:
        stages.append(("invert_m", lambda d: D.invert_m(m, d)))
    stages += [
        ("com_vel", lambda d: St.fwd_velocity_smooth(m, d)),
        ("passive", lambda d: P.passive(m, d)),
        ("rne", lambda d: D.rne(m, d)),
        ("actuation", lambda d: A.fwd_actuation(m, d)),
        ("smooth_accel", smooth),
        ("make_constraint", lambda d: Cn.make_constraint(m, d)),
        ("solve", lambda d: S.solve(m, d)),
    ]

    results = []
    prev = 0.0
    for k in range(1, len(stages) + 1):
        prefix = stages[:k]

        def substep(d, key, _prefix=prefix):
            a = jax.random.uniform(key, (m.nu,), minval=-0.2, maxval=0.2)
            d = d.replace(ctrl=a.astype(d.qpos.dtype))
            for _, fn in _prefix:
                d = fn(d)
            # integrate with zero accel: shapes stay static, state stays
            # sane, every listed stage's outputs feed the NEXT substep via
            # the carried qpos/qvel so nothing is dead code... except the
            # stage outputs themselves; anchor them into the carry:
            leaves = [x for x in jax.tree.leaves(d) if x is not None]
            anchor = sum(jnp.reshape(x, (-1,))[0].astype(jnp.float32) * 1e-30
                         for x in leaves if hasattr(x, "dtype")
                         and jnp.issubdtype(x.dtype, jnp.floating)
                         and x.size > 0)
            qvel = d.qvel + anchor.astype(d.qvel.dtype)
            from brax_tracking_tpu.physics.step import _integrate_pos
            qpos = _integrate_pos(m, d.qpos, qvel,
                                  m.opt.timestep.astype(d.qpos.dtype))
            return d.replace(qpos=qpos, qvel=qvel)

        @jax.jit
        def run(d, key):
            def body(carry, _):
                dd, kk = carry
                kk, sub = jax.random.split(kk)
                subs = jax.random.split(sub, B)
                dd = jax.vmap(substep)(dd, subs)
                return (dd, kk), None
            (dd, _), _ = jax.lax.scan(body, (d, key), (), length=STEPS)
            return dd.qpos

        t, _ = timeit(run, d0, key0)
        per_substep = t / STEPS * 1e3
        results.append((stages[k - 1][0], per_substep, per_substep - prev))
        print(f"  through {stages[k-1][0]:16s}: {per_substep:8.3f} ms/substep "
              f"(+{per_substep - prev:7.3f})", flush=True)
        prev = per_substep

    # reference: the real full step via env.step (5 substeps + env layer)
    @jax.jit
    def ctrl_step(state, key):
        a = jax.random.uniform(key, (B, env.action_size), minval=-0.2,
                               maxval=0.2)
        return jax.vmap(env.step)(state, a)

    @jax.jit
    def run20(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(sub, (B, env.action_size), minval=-0.2,
                                   maxval=0.2)
            return (jax.vmap(env.step)(s, a), k), None
        (s, _), _ = jax.lax.scan(body, (state, key), (), length=20)
        return s

    t20, _ = timeit(run20, state, jax.random.PRNGKey(5))
    per_step = t20 / 20
    print(f"\nfull control step (20-step scan): {per_step*1e3:8.2f} ms "
          f"-> {B/per_step:,.0f} env-steps/s", flush=True)

    out = {
        "workload": bench.WORKLOAD,
        "B": B,
        "full_step_ms": round(per_step * 1e3, 3),
        "env_steps_per_s": round(B / per_step, 1),
        "cumulative_ms_per_substep": {n: round(c, 4) for n, c, _ in results},
        "delta_ms_per_substep": {n: round(dl, 4) for n, _, dl in results},
    }
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        f"profile_{bench.WORKLOAD}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
