#!/usr/bin/env python3
"""Interactive env bring-up script — the framework's equivalent of the
reference's Env_Testing_Fly01.ipynb (SURVEY.md §2a component 13): build a
tracking env, jit reset/step, roll a constant action, print reward/metric
stats, and (headless-safe) render the rollout to video with the native
C++ rasterizer.

Usage:
  python examples/env_rollout_demo.py [rodent|fly] [--steps 100] [--video out]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_env(which: str):
    from brax_tracking_tpu.data import clips as C
    from brax_tracking_tpu.physics import spec as bspec

    if which == "fly":
        from brax_tracking_tpu.envs.fly import FlyTethered

        xml = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"
        model = bspec.build_model(
            xml, free_jnt=False, iterations=4, ls_iterations=4, dtype=jnp.float32
        )
        qpos = np.tile(np.asarray(model.qpos0, np.float64), (128, 1))
        clip = C.process_clip(model, jnp.asarray(qpos, jnp.float32))
        return FlyTethered(
            reference_clip=clip,
            mjcf_path=xml,
            center_of_mass="thorax",
            end_eff_names=["claw_T1_left", "claw_T1_right"],
            body_names=["thorax", "head", "abdomen"],
            joint_names=["coxa_flexion_T1_left", "coxa_flexion_T1_right"],
            iterations=4,
            ls_iterations=4,
        ), xml
    from brax_tracking_tpu.envs.rodent import RodentSingleClip

    xml = "/root/reference/assets/rodent.xml"
    model = bspec.build_model(xml, dtype=jnp.float32)
    qpos = np.tile(np.asarray(model.qpos0, np.float64), (128, 1))
    qpos[:, 2] += 0.01
    qpos[:, 0] += np.linspace(0.0, 0.05, 128)
    clip = C.process_clip(model, jnp.asarray(qpos, jnp.float32))
    return RodentSingleClip(
        reference_clip=clip, mjcf_path=xml, iterations=4, ls_iterations=4
    ), xml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env", nargs="?", default="rodent", choices=["rodent", "fly"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--video", default="")
    ap.add_argument("--contacts", action="store_true",
                    help="print the per-contact force table at the last step")
    args = ap.parse_args()

    env, xml = build_env(args.env)
    print(f"{args.env}: nq={env.model.nq} nv={env.model.nv} nu={env.model.nu} "
          f"obs={env.observation_size} act={env.action_size}")

    jit_reset = jax.jit(env.reset)
    jit_step = jax.jit(env.step)
    state = jit_reset(jax.random.PRNGKey(0))
    action = jnp.zeros(env.action_size)

    t0 = time.time()
    state = jit_step(state, action)
    jax.block_until_ready(state.obs)
    print(f"first jit step: {time.time() - t0:.1f}s (compile)")

    rollout = [state]
    t0 = time.time()
    for _ in range(args.steps):
        state = jit_step(state, action)
        rollout.append(state)
    jax.block_until_ready(state.obs)
    print(f"{args.steps} steps: {(time.time() - t0) / args.steps * 1e3:.2f} ms/step "
          "(single env, host-loop dispatch — training batches thousands)")

    rewards = np.asarray([float(s.reward) for s in rollout])
    print(f"reward: mean {rewards.mean():.4f} min {rewards.min():.4f} "
          f"max {rewards.max():.4f}")
    for k, v in rollout[-1].metrics.items():
        print(f"  metrics[{k}] = {float(v):.4f}")

    if args.contacts:
        # per-contact wrench table — the notebook's contact-force
        # visualization data (Env_Testing_Fly01.ipynb cells 13-16,
        # mj_contactForce equivalent)
        from brax_tracking_tpu.physics import support

        d_last = rollout[-1].pipeline_state
        forces = np.asarray(support.contact_force(env.model, d_last))
        act = np.asarray(support.active_contacts(env.model, d_last))
        pos = np.asarray(d_last.contact_pos)
        dist = np.asarray(d_last.contact_dist)
        g1 = np.asarray(env.model.pairs.geom1)
        g2 = np.asarray(env.model.pairs.geom2)
        slot_pair = np.repeat(
            np.arange(g1.size), np.asarray(env.model.pairs.npoint)
        )
        print(f"contacts at final step: {int(act.sum())}/{act.size} slots")
        for s in np.nonzero(act)[0]:
            pr = slot_pair[s]
            print(
                f"  geoms {g1[pr]:3d}-{g2[pr]:3d}  dist {dist[s]:+.5f}  "
                f"pos {np.round(pos[s], 4)}  "
                f"f[n,t1,t2] {np.round(forces[s, :3], 4)}"
            )

    if args.video:
        import mujoco

        from brax_tracking_tpu.harness.render import make_renderer
        from brax_tracking_tpu.native.video import save_video
        from brax_tracking_tpu.physics import spec as bspec

        if args.env == "fly":
            staged = bspec.stage_fly_assets(
                "/root/reference/assets/fruitfly"
            )
            import os

            mj_model = mujoco.MjModel.from_xml_path(
                os.path.join(staged, "fruitfly_force_fast.xml")
            )
        else:
            mj_model = mujoco.MjModel.from_xml_path(xml)
        mj_data = mujoco.MjData(mj_model)
        renderer = make_renderer(mj_model)
        frames = []
        for s in rollout[:: max(1, len(rollout) // 250)]:
            mj_data.qpos[:] = np.asarray(s.pipeline_state.qpos, np.float64)[: mj_model.nq]
            mujoco.mj_forward(mj_model, mj_data)
            renderer.update_scene(mj_data, camera=-1)
            frames.append(renderer.render())
        out = save_video(args.video, frames, fps=50)
        print("video:", out)


if __name__ == "__main__":
    main()
