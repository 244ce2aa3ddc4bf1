"""Host-side video rendering: policy vs reference side-by-side replay.

Capability parity with /root/reference/main.py:279-325: build the
``<replicate>`` pair model, strip free joints for tethered variants, replay
qposes_ref ++ qposes_rollout through MuJoCo C's mj_forward, rasterize, and
encode video. Pure host-side tooling — never in the hot path.

Backends: ``mujoco.Renderer`` (GL) when a GL stack exists, else the
first-party native C++ software rasterizer (native/rasterizer.cc via
native/softraster.py) — headless TPU hosts have no OSMesa/EGL. Encoding:
MP4 via imageio/ffmpeg when available, else first-party MJPEG AVI
(native/video.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def reference_qpos_trajectory(ref_traj, free_jnt: bool) -> np.ndarray:
    """Reassemble full qpos frames from a ReferenceClip (main.py:146-152)."""
    joints = np.asarray(ref_traj.joints)
    if free_jnt and ref_traj.position is not None:
        return np.concatenate(
            [np.asarray(ref_traj.position), np.asarray(ref_traj.quaternion), joints],
            axis=1,
        )
    return joints


def render_rollout_vs_reference(
    pair_mjcf: str,
    qposes_rollout: np.ndarray,
    ref_traj,
    out_path: str,
    camera=1,
    free_jnt: bool = True,
    height: int = 480,
    width: int = 640,
    fps: float = 50.0,
    frame_stride: Optional[int] = None,
) -> str:
    """Renders [qpos_ref ++ qpos_rollout] through the pair model.

    With a single (non-pair) model whose nq matches the rollout, only the
    rollout is replayed (datasets without a pair scene, e.g. minirat).
    """
    import mujoco

    if pair_mjcf.startswith("builtin:"):
        from brax_tracking_tpu.physics import spec as bspec
        import os

        pair_mjcf = os.path.join(
            os.path.dirname(bspec.__file__), "..", "assets",
            pair_mjcf[len("builtin:"):],
        )
    spec = mujoco.MjSpec.from_file(pair_mjcf)
    if not free_jnt:
        # tethered: drop the replicated free joints (main.py:283-287)
        for joint in list(spec.joints):
            if joint.type == mujoco.mjtJoint.mjJNT_FREE:
                joint.delete()
    mj_model = spec.compile()
    mj_data = mujoco.MjData(mj_model)
    mujoco.mj_kinematics(mj_model, mj_data)

    qposes_ref = reference_qpos_trajectory(ref_traj, free_jnt)
    # env steps per mocap frame: subsample rollout to the mocap rate
    if frame_stride is None:
        frame_stride = max(1, round(len(qposes_rollout) / len(qposes_ref)))
    qposes_rollout = qposes_rollout[::frame_stride]
    T = min(len(qposes_ref), len(qposes_rollout))

    pair = mj_model.nq != qposes_rollout.shape[1]
    renderer = make_renderer(mj_model, height=height, width=width)
    frames = []
    for t in range(T):
        if pair:
            mj_data.qpos = np.concatenate([qposes_ref[t], qposes_rollout[t]])
        else:
            mj_data.qpos = qposes_rollout[t][: mj_model.nq]
        mujoco.mj_forward(mj_model, mj_data)
        renderer.update_scene(mj_data, camera=camera)
        frames.append(renderer.render())
    renderer.close()

    from brax_tracking_tpu.native.video import save_video

    return save_video(out_path, frames, fps=fps)


def make_renderer(mj_model, height: int = 480, width: int = 640):
    """GL renderer when a GL stack exists, else the native software one."""
    import mujoco

    try:
        r = mujoco.Renderer(mj_model, height=height, width=width)
        # surface a GL failure now, not on first render()
        d = mujoco.MjData(mj_model)
        mujoco.mj_forward(mj_model, d)
        r.update_scene(d)
        r.render()
        return r
    except Exception:
        from brax_tracking_tpu.native.softraster import NativeRenderer

        return NativeRenderer(mj_model, height=height, width=width)
