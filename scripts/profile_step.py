"""Profile the bench workload's control step and print top ops by time.

Traces a few jitted batched control steps with jax.profiler, then parses
the xplane proto directly (the tensorboard profile-plugin converter is
broken in this image) and prints per-op self-time totals for the device
plane — the ground truth for where the step spends its time.

Usage:
  BENCH_WORKLOAD=rodent python scripts/profile_step.py [num_envs] [steps]
  BTT_PROFILE_CPU=1 ... to force the CPU backend (e.g. TPU tunnel down).
"""

from __future__ import annotations

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_xplane(logdir: str, top: int = 35) -> None:
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        # device planes: '/device:TPU:0' (tpu) or '/host:CPU' XLA modules
        is_dev = plane.name.startswith("/device:") or "TPU" in plane.name
        if not (is_dev or os.environ.get("BTT_PROFILE_CPU")):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        per_op = collections.Counter()
        total = 0
        for line in plane.lines:
            # XLA op lines carry the fusion/kernel names; skip step lines
            if "step" in line.name.lower():
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                total += ev.duration_ps
        if not per_op:
            continue
        print(f"\n== plane: {plane.name}  (total {total/1e12*1e3:.3f} ms traced)")
        for name, ps in per_op.most_common(top):
            print(f"  {ps/1e9:10.3f} ms  {100.0*ps/max(total,1):5.1f}%  {name[:110]}")


def main() -> None:
    workload = os.environ.get("BENCH_WORKLOAD", "rodent")
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax

    if os.environ.get("BTT_PROFILE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    from brax_tracking_tpu.cache_guard import ensure_clean_cache

    jax.config.update(
        "jax_compilation_cache_dir", ensure_clean_cache("/tmp/btt_jax_cache")
    )
    import jax.numpy as jnp

    os.environ["BENCH_ENVS"] = str(num_envs)
    import bench

    bench.NUM_ENVS = num_envs
    env = bench._build_env()

    reset = jax.jit(jax.vmap(env.reset))
    state = reset(jax.random.split(jax.random.PRNGKey(0), num_envs))

    @jax.jit
    def step(s, key):
        a = jax.random.uniform(
            key, (num_envs, env.action_size), minval=-0.2, maxval=0.2
        )
        return jax.vmap(env.step)(s, a)

    # warm up (compile outside the trace)
    state = step(state, jax.random.PRNGKey(1))
    jax.block_until_ready(state)

    logdir = f"/tmp/btt_profile_{workload}"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(steps):
            state = step(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(state)

    print(f"workload={workload} envs={num_envs} steps={steps}")
    _parse_xplane(logdir)


if __name__ == "__main__":
    main()
