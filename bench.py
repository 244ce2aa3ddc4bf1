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
# BENCH_WORKLOAD selects the BASELINE.json config: rodent (default, cfg 2),
# fly (cfg 3), rodent_pair (cfg 4)
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "rodent")
NUM_ENVS = int(
    os.environ.get("BENCH_ENVS", {"rodent": 2048, "fly": 2048, "rodent_pair": 1024}[WORKLOAD])
)
NUM_STEPS = int(os.environ.get("BENCH_STEPS", 50))
SUBSTEPS = 5  # physics substeps per control step (configs/dataset env_config)


_WORKLOAD_XML = {
    "rodent": RODENT_XML,
    "fly": "/root/reference/assets/fruitfly/fruitfly_force_fast.xml",
    "rodent_pair": "/root/reference/assets/rodent_pair.xml",
}


def measure_mujoco_c_baseline(seconds: float = 10.0) -> float:
    """MuJoCo C control-steps/s using every host core (threaded, nogil)."""
    import threading

    import mujoco
    import numpy as np

    xml = _WORKLOAD_XML[WORKLOAD]
    if WORKLOAD == "fly":
        from brax_tracking_tpu.physics import spec as bspec

        staged = bspec.stage_fly_assets(os.path.dirname(xml))
        xml = os.path.join(staged, os.path.basename(xml))
    m = mujoco.MjModel.from_xml_path(xml)
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
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
        if "value" in cache and WORKLOAD == "rodent":  # legacy single-entry
            cache = {"rodent": cache}
    if WORKLOAD not in cache:
        cache[WORKLOAD] = {
            "baseline_metric": "MuJoCo C (reference engine core) "
            f"{WORKLOAD} control-steps/s, all host cores threaded",
            "value": measure_mujoco_c_baseline(),
            "cpu_count": os.cpu_count(),
        }
        with open(BASELINE_CACHE, "w") as f:
            json.dump(cache, f, indent=1)
    return cache[WORKLOAD]


def _build_env():
    import jax.numpy as jnp
    import numpy as np

    from brax_tracking_tpu.data import clips as C
    from brax_tracking_tpu.physics import spec as bspec

    def synth_clip(model, T=128, walk=0.1):
        qpos = np.tile(np.asarray(model.qpos0, np.float64), (T, 1))
        qpos[:, 2] += 0.01
        qpos[:, 0] += np.linspace(0.0, walk, T)
        return C.process_clip(model, jnp.asarray(qpos, jnp.float32))

    if WORKLOAD == "rodent":
        from brax_tracking_tpu.envs.rodent import RodentSingleClip

        model = bspec.build_model(RODENT_XML, dtype=jnp.float32)
        # iterations/ls_iterations = 4: the reference's training env_config
        # (configs/dataset env_args, fruitfly.py:70-79) and the MuJoCo C
        # baseline measurement above both use 4 — not the XML default of 6.
        return RodentSingleClip(
            reference_clip=synth_clip(model),
            center_of_mass="torso",
            end_eff_names=["foot_L", "foot_R", "hand_L", "hand_R"],
            body_names=["torso", "pelvis", "skull"],
            joint_names=["vertebra_1_extend", "hip_L_supinate"],
            mjcf_path=RODENT_XML,
            iterations=4,
            ls_iterations=4,
        )
    if WORKLOAD == "fly":
        from brax_tracking_tpu.envs.fly import FlyTethered

        fly_xml = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"
        model = bspec.build_model(
            fly_xml, free_jnt=False, solver="cg", iterations=4, ls_iterations=4,
            dtype=jnp.float32,
        )
        return FlyTethered(
            reference_clip=synth_clip(model, walk=0.0),
            center_of_mass="thorax",
            end_eff_names=["claw_T1_left", "claw_T1_right"],
            body_names=["thorax", "head", "abdomen"],
            joint_names=["coxa_flexion_T1_left", "coxa_flexion_T1_right"],
            mjcf_path=fly_xml,
            iterations=4,
            ls_iterations=4,
            physics_steps_per_control_step=5,
        )
    if WORKLOAD == "rodent_pair":
        from brax_tracking_tpu.envs.tracking import GenericSingleClip

        pair_xml = "/root/reference/assets/rodent_pair.xml"
        model = bspec.build_model(pair_xml, dtype=jnp.float32)
        # solver=None keeps the XML defaults: rodent_pair.xml has no
        # <option> line, so it compiles to MuJoCo's default solver =
        # NEWTON, iterations=100, ls_iterations=50 (SURVEY.md §2a#15) —
        # the parity-faithful configuration for this workload. The Newton
        # path's while_loop exits after ~2-5 iterations per substep.
        return GenericSingleClip(
            reference_clip=synth_clip(model, walk=0.05),
            mjcf_path=pair_xml,
            center_of_mass="torso",
            end_eff_names=["foot_L", "foot_R"],
            body_names=["torso", "pelvis"],
            joint_names=["vertebra_1_extend"],
            strict_name_lookup=False,
            physics_steps_per_control_step=5,
            solver=None,
        )
    raise ValueError(f"unknown BENCH_WORKLOAD {WORKLOAD!r}")


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp

    from brax_tracking_tpu.cache_guard import ensure_clean_cache

    jax.config.update(
        "jax_compilation_cache_dir", ensure_clean_cache("/tmp/btt_jax_cache")
    )

    env = _build_env()

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


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast (clear message, nonzero exit) when the accelerator backend
    cannot initialize — e.g. the axon TPU tunnel is down. Backend init
    otherwise hangs for many minutes and the caller only sees a timeout."""
    import threading

    import jax

    result: dict = {}

    def probe():
        try:
            result["devices"] = jax.devices()
        except Exception as e:  # backend init error
            result["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise SystemExit(
            f"bench: accelerator backend init did not complete in "
            f"{timeout_s:.0f}s — the TPU tunnel is likely down"
        )
    if "error" in result:
        raise SystemExit(f"bench: backend init failed: {result['error']}")
    import sys

    print(f"# devices: {result['devices']}", file=sys.stderr, flush=True)


def main():
    _probe_backend()
    ours = measure_ours()
    baseline = get_baseline()
    metric = "env_steps_per_s_per_chip"
    if WORKLOAD != "rodent":
        metric += f"_{WORKLOAD}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(ours, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(ours / baseline["value"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
