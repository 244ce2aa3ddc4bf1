#!/usr/bin/env python3
"""Contact-force visualization — the framework's equivalent of the
reference notebook's contact cells (Env_Testing_Fly01.ipynb cells 13-16):
roll a tracking env, decode per-contact wrenches from the constraint
solution (physics/support.contact_force, the mj_contactForce analog), and
render frames with world-frame force arrows overlaid on the native C++
rasterizer's output. Also prints a per-step table of active contacts.

Usage:
  python examples/contact_force_demo.py [rodent|fly] [--steps 40]
      [--video contact_forces.avi] [--scale 0.002]

Headless-safe: no GL, no ffmpeg (MJPEG-AVI writer, native/video.py).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.env_rollout_demo import build_env  # noqa: E402


def _project(viewproj: np.ndarray, pts: np.ndarray, w: int, h: int):
    """World points (N,3) -> pixel coords (N,2) + in-front mask."""
    hom = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    clip = hom @ viewproj.T
    ok = clip[:, 3] > 1e-6
    ndc = clip[:, :3] / np.maximum(clip[:, 3:4], 1e-6)
    px = (ndc[:, 0] + 1.0) * 0.5 * w
    py = (1.0 - ndc[:, 1]) * 0.5 * h
    return np.stack([px, py], axis=1), ok


def _draw_line(img: np.ndarray, p0, p1, color):
    """Tiny Bresenham-ish line into an (H, W, 3) uint8 frame."""
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n + 1).round().astype(int)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[keep], xs[keep]] = color
    # thicken by one pixel for visibility
    keep2 = keep & (ys + 1 < h)
    img[ys[keep2] + 1, xs[keep2]] = color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", nargs="?", default="rodent", choices=["rodent", "fly"])
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--video", default="contact_forces.avi")
    ap.add_argument("--scale", type=float, default=0.002,
                    help="meters of arrow per Newton of force")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    env, xml = build_env(args.env)
    model = env.unwrapped.model if hasattr(env, "unwrapped") else env.model
    from brax_tracking_tpu.physics import support

    jit_reset = jax.jit(env.reset)

    def step_with_forces(state, action):
        nstate = env.step(state, action)
        ps = nstate.pipeline_state
        force = support.contact_force(model, ps, world_frame=True)
        return nstate, (ps.qpos, ps.contact_pos, ps.contact_dist, force)

    jit_step = jax.jit(step_with_forces)

    state = jit_reset(jax.random.PRNGKey(0))
    action = jnp.zeros((env.action_size,), jnp.float32)
    qposes, cpos, cdist, cforce = [], [], [], []
    for _ in range(args.steps):
        state, (qpos, pos, dist, force) = jit_step(state, action)
        qposes.append(np.asarray(qpos))
        cpos.append(np.asarray(pos))
        cdist.append(np.asarray(dist))
        cforce.append(np.asarray(force))

    # per-step console table of active contacts (reference cell 13 analog)
    for t in (0, len(qposes) // 2, len(qposes) - 1):
        active = np.nonzero(cdist[t] < 0)[0]
        print(f"step {t}: {len(active)} active contacts")
        for s in active[:8]:
            f = cforce[t][s]
            print(
                f"  slot {s:3d} |f_n|={np.linalg.norm(f[:3]):8.4f} "
                f"pos={np.round(cpos[t][s], 4)}"
            )

    # replay through MuJoCo C for render geometry (host-side, like the
    # reference's render path) and overlay world-frame force arrows
    import mujoco

    from brax_tracking_tpu.native.softraster import NativeRenderer
    from brax_tracking_tpu.native.video import write_mjpeg_avi

    from brax_tracking_tpu.physics import spec as bspec

    _, mj = bspec.build_model(
        xml,
        free_jnt=(args.env == "rodent"),
        scale_factor=0.9 if args.env == "rodent" else 1.0,
        rescale_root="torso" if args.env == "rodent" else "thorax",
        return_mj=True,
    )
    mjd = mujoco.MjData(mj)
    renderer = NativeRenderer(mj, height=480, width=640)

    frames = []
    red = np.array([230, 40, 40], np.uint8)
    for t in range(len(qposes)):
        mjd.qpos[: mj.nq] = qposes[t][: mj.nq]
        mujoco.mj_forward(mj, mjd)
        renderer.update_scene(mjd, camera=-1)
        img = renderer.render()
        active = np.nonzero(cdist[t] < 0)[0]
        if active.size:
            p0 = cpos[t][active]
            p1 = p0 + args.scale * cforce[t][active, :3]
            px0, ok0 = _project(renderer._viewproj, p0, 640, 480)
            px1, ok1 = _project(renderer._viewproj, p1, 640, 480)
            for a, b, ok in zip(px0, px1, ok0 & ok1):
                if ok:
                    _draw_line(img, a, b, red)
        frames.append(img)
    write_mjpeg_avi(args.video, frames, fps=50)
    print(f"wrote {args.video} ({len(frames)} frames with force overlays)")


if __name__ == "__main__":
    main()
