"""Generate a realistic stac-format mocap file for the rodent or fly.

No real stac-fitted mocap ships in this image, so this rolls the MuJoCo C
oracle (the same engine the reference's stac pipeline fits against) under
slow time-varying actuation and writes the resulting qpos trajectory in the
reference's exact .h5 layout (preprocessing/preprocess.py:66-74 reads
``data["qpos"]``). Unlike a synthetic home-pose clip, the trajectory has
contacts, joint coupling and non-smooth velocities, so training against it
exercises the same feature/velocity extraction paths real mocap would.

Usage: python scripts/make_demo_stac.py [out.h5] [n_frames] [rodent|fly] [amp]
Defaults: data/Rodent/transform_snips.h5, 250 frames @ 50 Hz, rodent,
amp=1.0 (actuation amplitude scale — raise it for a clip vigorous enough
that a passive/random policy tracks poorly, so learning curves have
headroom). ``fly`` rolls the TETHERED fly (free joint stripped, like
FlyTethered) so the clip matches the reference's transform_tethered
layout.
"""

from __future__ import annotations

import os
import sys

import mujoco
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> str:
    out = sys.argv[1] if len(sys.argv) > 1 else "data/Rodent/transform_snips.h5"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    which = sys.argv[3] if len(sys.argv) > 3 else "rodent"
    amp_scale = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tool; never
    # touch the accelerator (the axon sitecustomize preimports jax, so the
    # JAX_PLATFORMS env var is too late — set the config explicitly)
    import jax.numpy as jnp

    import brax_tracking_tpu.physics.spec as bspec
    from brax_tracking_tpu.data import h5io

    if which in ("fly", "fly_free"):
        # tethered fly: free joint stripped, like FlyTethered's model;
        # fly_free keeps the free root (FlyFree / train_fly_freejnt)
        _, mj_model = bspec.build_model(
            "/root/reference/assets/fruitfly/fruitfly_force_fast.xml",
            dtype=jnp.float32,
            free_jnt=(which == "fly_free"),
            return_mj=True,
        )
        mjd = mujoco.MjData(mj_model)
        mujoco.mj_resetData(mj_model, mjd)
    else:
        # the env's exact model: subtree-rescaled 0.9 like the reference
        # (rodent.py:51-65, preprocess.py:80-89)
        _, mj_model = bspec.build_model(
            "/root/reference/assets/rodent.xml",
            dtype=jnp.float32,
            scale_factor=0.9,
            return_mj=True,
        )
        mjd = mujoco.MjData(mj_model)
        mujoco.mj_resetData(mj_model, mjd)
        mjd.qpos[2] += 0.005

    rng = np.random.RandomState(17)
    phase = rng.uniform(0, 2 * np.pi, mj_model.nu)
    freq = rng.uniform(0.5, 2.5, mj_model.nu)  # slow, gait-scale motion
    amp = rng.uniform(0.15, 0.45, mj_model.nu) * amp_scale
    if which in ("fly", "fly_free"):
        amp *= 0.5  # milligram-scale limbs: keep motion gait-scale

    mocap_dt = 0.02  # 50 Hz, configs/dataset/rodent.yaml mocap_hz
    substeps = max(int(round(mocap_dt / mj_model.opt.timestep)), 1)
    qpos = np.zeros((n_frames, mj_model.nq))
    t = 0.0
    for i in range(n_frames):
        qpos[i] = mjd.qpos
        for _ in range(substeps):
            mjd.ctrl[:] = amp * np.sin(2 * np.pi * freq * t + phase)
            mujoco.mj_step(mj_model, mjd)
            t += mj_model.opt.timestep
    assert np.isfinite(qpos).all(), "oracle rollout diverged"
    assert np.abs(np.diff(qpos, axis=0)).max() > 1e-3, "trajectory is static"

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    h5io.save(out, {"qpos": qpos, "n_frames": int(n_frames)})
    print(f"wrote {out}: qpos {qpos.shape}, root z range "
          f"[{qpos[:, 2].min():.4f}, {qpos[:, 2].max():.4f}]")
    return out


if __name__ == "__main__":
    main()
