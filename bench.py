"""Benchmark: rodent tracking env throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": "env_steps_per_s_per_chip", "value": N, "unit": "env-steps/s",
   "vs_baseline": R}

Workload = BASELINE.json config 2's env side: the rodent single-clip
tracking env (nq=74, nv=73, ngeom=101, CG contact solve, 5 physics substeps
per control step) stepping 2048 vectorized instances in lockstep under one
jit'd lax.scan, with per-step random actions. One env-step = one control
step (the unit the reference's training/sps counts, custom_ppo.py:373-382).

Baseline: the reference publishes no numbers (BASELINE.md) and its engine
(MJX on CUDA) is not installable here, so the baseline is *measured* —
MuJoCo C (the engine the reference wraps) stepping the same model with all
host cores via threaded batches. Measured once and cached in
BASELINE_MEASURED.json.
"""

from __future__ import annotations

import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")
RODENT_XML = "/root/reference/assets/rodent.xml"
NUM_ENVS = int(os.environ.get("BENCH_ENVS", 2048))
NUM_STEPS = int(os.environ.get("BENCH_STEPS", 50))
SUBSTEPS = 5  # physics substeps per control step (configs/dataset env_config)


def measure_mujoco_c_baseline(seconds: float = 10.0) -> float:
    """MuJoCo C control-steps/s using every host core (threaded, nogil)."""
    import threading

    import mujoco
    import numpy as np

    m = mujoco.MjModel.from_xml_path(RODENT_XML)
    m.opt.iterations = 4
    m.opt.ls_iterations = 4
    n_threads = os.cpu_count() or 1
    counts = [0] * n_threads
    stop = time.time() + seconds

    def worker(i):
        d = mujoco.MjData(m)
        rng = np.random.RandomState(i)
        while time.time() < stop:
            d.ctrl[:] = rng.uniform(-0.2, 0.2, m.nu)
            mujoco.mj_step(m, d, nstep=SUBSTEPS)
            counts[i] += 1
            if not np.all(np.isfinite(d.qpos)):
                mujoco.mj_resetData(m, d)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return sum(counts) / (time.time() - t0)


def get_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    baseline = {
        "baseline_metric": "MuJoCo C (reference engine core) rodent control-steps/s,"
        " all host cores threaded",
        "value": measure_mujoco_c_baseline(),
        "cpu_count": os.cpu_count(),
    }
    with open(BASELINE_CACHE, "w") as f:
        json.dump(baseline, f, indent=1)
    return baseline


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/btt_jax_cache")

    from brax_tracking_tpu.data import clips as C
    from brax_tracking_tpu.envs.rodent import RodentSingleClip
    from brax_tracking_tpu.physics import spec as bspec

    model = bspec.build_model(RODENT_XML, dtype=jnp.float32)
    T = 128
    qpos = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
    qpos[:, 2] += 0.01
    qpos[:, 0] += np.linspace(0.0, 0.1, T)
    clip = C.process_clip(model, jnp.asarray(qpos, jnp.float32))
    env = RodentSingleClip(
        reference_clip=clip,
        center_of_mass="torso",
        end_eff_names=["foot_L", "foot_R", "hand_L", "hand_R"],
        body_names=["torso", "pelvis", "skull"],
        joint_names=["vertebra_1_extend", "hip_L_supinate"],
        mjcf_path=RODENT_XML,
    )

    reset = jax.jit(jax.vmap(env.reset))
    keys = jax.random.split(jax.random.PRNGKey(0), NUM_ENVS)
    state = reset(keys)

    def run(state, key):
        def body(carry, _):
            s, k = carry
            k, sub = jax.random.split(k)
            a = jax.random.uniform(
                sub, (NUM_ENVS, env.action_size), minval=-0.2, maxval=0.2
            )
            s = jax.vmap(env.step)(s, a)
            return (s, k), None

        (state, _), _ = jax.lax.scan(body, (state, key), (), length=NUM_STEPS)
        return state

    run = jax.jit(run)
    # warmup/compile
    out = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(out.obs)
    # timed
    reps = 3
    t0 = time.time()
    for i in range(reps):
        out = run(out, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out.obs)
    dt = time.time() - t0
    return NUM_ENVS * NUM_STEPS * reps / dt


def main():
    ours = measure_ours()
    baseline = get_baseline()
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_per_chip",
                "value": round(ours, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(ours / baseline["value"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
