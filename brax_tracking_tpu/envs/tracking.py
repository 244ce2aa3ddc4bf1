"""Core motion-tracking MDP.

Reimplements the tracking environment family of the reference
(/root/reference/envs/fruitfly.py:18-669, envs/rodent.py:17-375) over the
TPU engine: frame clock, six tracking reward terms, termination (including
NaN guard), and the reference-window observation builder.

Reference quirks preserved bit-for-bit (SURVEY.md §7 checklist):
- reward shapes are exp(-k * (sum diff)^2): sum *then* square
  (fruitfly.py:190,201-210);
- tethered fly computes joint_distance over the FULL qpos
  (fruitfly.py:201) while free-joint envs use qpos[7:] (fruitfly.py:528);
- reset start frame is randint(0, 44) (fruitfly.py:126);
- body_pos_dist_local rotates by qpos[3:7] even when those entries are not
  a quaternion in tethered models (fruitfly.py:303-305);
- done on NaN anywhere in the pipeline state (fruitfly.py:245-250);
- name lookups use mj_name2id semantics (missing name -> -1 -> indexes the
  last element); ``strict_name_lookup=True`` turns typos into errors
  instead (the reference fly config contains such typos,
  configs/dataset/fly.yaml:120-148).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brax_tracking_tpu import math as btm
from brax_tracking_tpu.data.clips import ReferenceClip
from brax_tracking_tpu.envs.base import PipelineEnv, State
from brax_tracking_tpu.physics import model as M
from brax_tracking_tpu.physics import spec as bspec


def _lookup(model: M.Model, objtype: str, names: Sequence[str], strict: bool):
    idxs = [bspec.name2id(model, objtype, n) for n in names]
    if strict:
        missing = [n for n, i in zip(names, idxs) if i < 0]
        if missing:
            raise ValueError(f"unknown {objtype} names: {missing}")
    return np.array(idxs, np.int32)


class TrackingEnv(PipelineEnv):
    """Single-clip tracking MDP over a compiled model.

    ``appendage_names`` is accepted for config/signature parity but unused,
    exactly like the reference: its envs bind ``end_eff_names`` and leave
    ``appendage_names`` dead (fruitfly.py:101-102 "using this for appendage
    for now bc im to lazy to rename"). Kept so reference dataset configs
    load unchanged; the end-effector reward/obs terms come from
    ``end_eff_names``.
    """

    def __init__(
        self,
        model: M.Model,
        reference_clip: ReferenceClip,
        center_of_mass: str,
        end_eff_names: List[str],
        body_names: List[str],
        joint_names: List[str],
        appendage_names: Optional[List[str]] = None,
        mocap_hz: int = 50,
        ref_len: int = 5,
        too_far_dist: float = 0.1,
        bad_pose_dist: float = jnp.inf,
        bad_quat_dist: float = jnp.inf,
        ctrl_cost_weight: float = 0.01,
        pos_reward_weight: float = 0.0,
        quat_reward_weight: float = 1.0,
        joint_reward_weight: float = 10.0,
        angvel_reward_weight: float = 1.0,
        bodypos_reward_weight: float = 1.0,
        endeff_reward_weight: float = 1.0,
        healthy_reward: float = 0.25,
        healthy_z_range: Tuple[float, float] = (0.03, 0.5),
        physics_steps_per_control_step: int = 10,
        reset_noise_scale: float = 1e-3,
        terminate_when_unhealthy: bool = True,
        free_jnt: bool = True,
        joint_obs_over_full_qpos: Optional[bool] = None,
        include_root_obs: Optional[bool] = None,
        start_frame_range: Tuple[int, int] = (0, 44),
        strict_name_lookup: bool = False,
        **kwargs,
    ):
        super().__init__(model, n_frames=physics_steps_per_control_step)

        # physics substeps per mocap frame (fruitfly.py:85-93)
        # round, not truncate: a float32 timestep of 0.002 is 0.002000000095,
        # which would otherwise floor 10.0 substeps down to 9.
        max_steps = round(1.0 / (mocap_hz * float(np.asarray(model.opt.timestep))))
        if max_steps % physics_steps_per_control_step != 0:
            raise ValueError(
                f"physics_steps_per_control_step ({physics_steps_per_control_step})"
                f" must be a factor of ({max_steps})"
            )
        self._steps_for_cur_frame = max_steps // physics_steps_per_control_step

        self._thorax_idx = bspec.name2id(model, "body", center_of_mass)
        self._joint_idxs = _lookup(model, "joint", joint_names, strict_name_lookup)
        self._body_idxs = _lookup(model, "body", body_names, strict_name_lookup)
        self._endeff_idxs = _lookup(model, "body", end_eff_names, strict_name_lookup)

        self._free_jnt = free_jnt
        self._has_free_root = model.njnt > 0 and model.jnt_type[0] == M.JNT_FREE
        self._mocap_hz = mocap_hz
        # numpy leaves (e.g. a pickled clip cache) break tracer indexing
        self._ref_traj = jax.tree.map(
            lambda x: None if x is None else jnp.asarray(x),
            reference_clip,
            is_leaf=lambda x: x is None,
        )
        self._ref_len = ref_len
        self._too_far_dist = too_far_dist
        self._bad_pose_dist = bad_pose_dist
        self._bad_quat_dist = bad_quat_dist
        self._ctrl_cost_weight = ctrl_cost_weight
        self._pos_reward_weight = pos_reward_weight
        self._quat_reward_weight = quat_reward_weight
        self._joint_reward_weight = joint_reward_weight
        self._angvel_reward_weight = angvel_reward_weight
        self._bodypos_reward_weight = bodypos_reward_weight
        self._endeff_reward_weight = endeff_reward_weight
        self._healthy_reward = healthy_reward
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._start_frame_range = start_frame_range
        # joint tracking over full qpos (tethered fly) vs qpos[7:] (free)
        if joint_obs_over_full_qpos is None:
            joint_obs_over_full_qpos = not self._has_free_root
        self._joint_full_qpos = joint_obs_over_full_qpos
        # root-relative obs terms (track_pos_local, quat_dist) are only in
        # the free variant (fruitfly.py:613-625 vs 286-298)
        if include_root_obs is None:
            include_root_obs = self._has_free_root
        self._include_root_obs = include_root_obs

    # ------------------------------------------------------------------
    @property
    def observation_size(self) -> int:
        # cached, and derived via eval_shape: abstract tracing only — no
        # compilation or device compute of the physics pipeline just to
        # learn a shape (trainer setup calls this)
        size = getattr(self, "_obs_size_cache", None)
        if size is None:
            out = jax.eval_shape(self.reset, jax.ShapeDtypeStruct((2,), jnp.uint32))
            size = int(out.obs.shape[-1])
            object.__setattr__(self, "_obs_size_cache", size)
        return size

    def _init_metrics(self, dtype):
        zero = jnp.zeros((), dtype)
        return {
            k: zero
            for k in (
                "pos_reward",
                "quat_reward",
                "joint_reward",
                "angvel_reward",
                "bodypos_reward",
                "endeff_reward",
                "reward_quadctrl",
                "reward_alive",
                "too_far",
                "bad_pose",
                "bad_quat",
                "fall",
            )
        }

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        lo_f, hi_f = self._start_frame_range
        start_frame = jax.random.randint(rng, (), lo_f, hi_f)
        return self.reset_to_frame(start_frame, rng1, rng2)

    def reset_to_frame(
        self, start_frame: jax.Array, rng1: jax.Array, rng2: jax.Array
    ) -> State:
        m = self.model
        dtype = m.qpos0.dtype
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        qpos = m.qpos0 + jax.random.uniform(rng1, (m.nq,), dtype, low, hi)
        qvel = jax.random.uniform(rng2, (m.nv,), dtype, low, hi)
        data = self.pipeline_init(qpos, qvel)
        info = {
            "cur_frame": jnp.asarray(start_frame, jnp.int32),
            "steps_taken_cur_frame": jnp.zeros((), jnp.int32),
            "summed_pos_distance": jnp.zeros((), dtype),
            "quat_distance": jnp.zeros((), dtype),
            "joint_distance": jnp.zeros((), dtype),
        }
        obs = self._get_obs(data, start_frame)
        zero = jnp.zeros((), dtype)
        return State(
            pipeline_state=data,
            obs=obs,
            reward=zero,
            done=zero,
            metrics=self._init_metrics(dtype),
            info=info,
        )

    # ------------------------------------------------------------------
    def step(self, state: State, action: jax.Array) -> State:
        m = self.model
        dtype = state.obs.dtype
        action = action.astype(dtype)
        data = self.pipeline_step(state.pipeline_state, action)

        info = dict(state.info)
        steps_taken = info["steps_taken_cur_frame"] + 1
        rolled = steps_taken == self._steps_for_cur_frame
        info["cur_frame"] = info["cur_frame"] + jnp.where(rolled, 1, 0)
        info["steps_taken_cur_frame"] = jnp.where(rolled, 0, steps_taken)
        cur_frame = info["cur_frame"]

        ref = self._ref_traj
        if ref.position is not None:
            track_pos = ref.position[cur_frame]
            pos_distance = data.qpos[:3] - track_pos
            pos_reward = self._pos_reward_weight * jnp.exp(
                -400.0 * jnp.sum(pos_distance) ** 2
            )
            quat_distance = jnp.sum(
                btm.bounded_quat_dist(data.qpos[3:7], ref.quaternion[cur_frame])
                ** 2
            )
            quat_reward = self._quat_reward_weight * jnp.exp(-4.0 * quat_distance)
        else:
            pos_distance = jnp.zeros(3, dtype)
            quat_distance = jnp.zeros((), dtype)
            pos_reward = jnp.zeros((), dtype)
            quat_reward = jnp.zeros((), dtype)

        qpos_joints = data.qpos if self._joint_full_qpos else data.qpos[7:]
        joint_distance = jnp.sum(qpos_joints - ref.joints[cur_frame]) ** 2
        joint_reward = self._joint_reward_weight * jnp.exp(-0.5 * joint_distance)
        info["joint_distance"] = joint_distance

        angvel_reward = self._angvel_reward_weight * jnp.exp(
            -0.5
            * jnp.sum(data.qvel[3:6] - ref.angular_velocity[cur_frame]) ** 2
        )
        track_bodypos = ref.body_positions[cur_frame]
        bodypos_reward = self._bodypos_reward_weight * jnp.exp(
            -6.0
            * jnp.sum(
                (data.xpos[self._body_idxs] - track_bodypos[self._body_idxs]).flatten()
            )
            ** 2
        )
        endeff_reward = self._endeff_reward_weight * jnp.exp(
            -0.75
            * jnp.sum(
                (
                    data.xpos[self._endeff_idxs] - track_bodypos[self._endeff_idxs]
                ).flatten()
            )
            ** 2
        )

        min_z, max_z = self._healthy_z_range
        one, zero = jnp.ones((), dtype), jnp.zeros((), dtype)
        thorax_z = data.xpos[self._thorax_idx, 2]
        is_healthy = jnp.where(thorax_z < min_z, zero, one)
        is_healthy = jnp.where(thorax_z > max_z, zero, is_healthy)
        if self._terminate_when_unhealthy:
            healthy_reward = jnp.asarray(self._healthy_reward, dtype)
        else:
            healthy_reward = self._healthy_reward * is_healthy

        summed_pos_distance = jnp.sum(
            (pos_distance * jnp.array([1.0, 1.0, 0.2], dtype)) ** 2
        )
        too_far = jnp.where(summed_pos_distance > self._too_far_dist, one, zero)
        info["summed_pos_distance"] = summed_pos_distance
        info["quat_distance"] = quat_distance
        bad_pose = jnp.where(joint_distance > self._bad_pose_dist, one, zero)
        bad_quat = jnp.where(quat_distance > self._bad_quat_dist, one, zero)
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        obs = self._get_obs(data, cur_frame)
        reward = (
            joint_reward
            + pos_reward
            + quat_reward
            + angvel_reward
            + bodypos_reward
            + endeff_reward
            + healthy_reward
            - ctrl_cost
        )
        if self._terminate_when_unhealthy:
            done = one - is_healthy
        else:
            done = jnp.zeros((), dtype)
        done = jnp.max(jnp.stack([done, too_far, bad_pose, bad_quat]))

        # NaN guard: reset env on any NaN in the pipeline state
        reward = jnp.nan_to_num(reward)
        obs = jnp.nan_to_num(obs)
        leaves = [
            x
            for x in jax.tree_util.tree_leaves(data)
            if jnp.issubdtype(x.dtype, jnp.floating)
        ]
        any_nan = jnp.any(jnp.stack([jnp.any(jnp.isnan(x)) for x in leaves]))
        done = jnp.maximum(jnp.where(any_nan, one, zero), done)

        metrics = dict(state.metrics)
        metrics.update(
            pos_reward=pos_reward,
            quat_reward=quat_reward,
            joint_reward=joint_reward,
            angvel_reward=angvel_reward,
            bodypos_reward=bodypos_reward,
            endeff_reward=endeff_reward,
            reward_quadctrl=-ctrl_cost,
            reward_alive=healthy_reward,
            too_far=too_far,
            bad_pose=bad_pose,
            bad_quat=bad_quat,
            fall=1.0 - is_healthy,
        )
        return state.replace(
            pipeline_state=data,
            obs=obs,
            reward=reward,
            done=done,
            metrics=metrics,
            info=info,
        )

    # ------------------------------------------------------------------
    def _get_obs(self, data: M.Data, cur_frame: jax.Array) -> jax.Array:
        ref = self._ref_traj

        # Window via gather, not dynamic_slice: vmapping a per-env
        # dynamic_slice lowers to thousands of scalar slice/while ops on TPU
        # (profiled ~13% of the control step); a per-env index gather stays
        # one batched op. Start clamping mirrors dynamic_slice semantics.
        def window(x):
            if x is None or x.ndim == 1:
                return None
            start = jnp.clip(cur_frame + 1, 0, x.shape[0] - self._ref_len)
            idx = start + jnp.arange(self._ref_len)
            return x[idx]

        parts = []
        parts.append(data.qpos)
        parts.append(data.qvel)

        if self._include_root_obs and ref.position is not None:
            track_pos = window(ref.position)
            track_pos_local = jax.vmap(btm.rotate, in_axes=(0, None))(
                track_pos - data.qpos[:3], data.qpos[3:7]
            ).flatten()
            quat_dist = jax.vmap(btm.relative_quat, in_axes=(None, 0))(
                data.qpos[3:7], window(ref.quaternion)
            ).flatten()
            parts.append(track_pos_local)
            parts.append(quat_dist)

        qpos_joints = data.qpos if self._joint_full_qpos else data.qpos[7:]
        joint_dist = (window(ref.joints) - qpos_joints)[:, self._joint_idxs].flatten()
        parts.append(joint_dist)

        body_pos_dist_local = jax.vmap(
            lambda a, b: jax.vmap(btm.rotate, in_axes=(0, None))(a, b),
            in_axes=(0, None),
        )(
            (window(ref.body_positions) - data.xpos)[:, self._body_idxs],
            data.qpos[3:7],
        ).flatten()
        parts.append(body_pos_dist_local)

        return jnp.concatenate(parts)


class GenericSingleClip(TrackingEnv):
    """Registry-constructible tracking env: compiles its model from
    ``mjcf_path`` (supports ``builtin:`` package assets). Used by the
    harness for models with no dedicated env class (e.g. minirat)."""

    def __init__(
        self,
        reference_clip: ReferenceClip,
        mjcf_path: str,
        scale_factor: float = 1.0,
        torque_actuators: bool = False,
        solver: str = "cg",
        iterations: int = 4,
        ls_iterations: int = 4,
        free_jnt: bool = True,
        dtype=None,
        **kwargs,
    ):
        model = bspec.build_model(
            mjcf_path,
            free_jnt=free_jnt,
            torque_actuators=torque_actuators,
            scale_factor=scale_factor,
            rescale_root=kwargs.get("center_of_mass", "torso"),
            solver=solver,
            iterations=iterations,
            ls_iterations=ls_iterations,
            dtype=dtype or jnp.float32,
        )
        super().__init__(
            model=model, reference_clip=reference_clip, free_jnt=free_jnt, **kwargs
        )


class MultiClipMixin:
    """Per-env clip selection over a stacked ReferenceClip.

    Implements the capability the reference left as a stub
    (/root/reference/envs/rodent.py:377 RodentMultiClip) and BASELINE.json
    config 5 requires. The active clip index rides in
    ``state.info["clip_idx"]``; every reward/obs consumer reads the env's
    clip view, which is bound for exactly the duration of the traced call
    (saved/restored so no tracer leaks into the shared env object).
    """

    def _init_multiclip(self, reference_clips: ReferenceClip) -> ReferenceClip:
        self._all_clips = reference_clips
        self._n_clips = int(reference_clips.joints.shape[0])
        return jax.tree.map(
            lambda x: None if x is None else x[0],
            reference_clips,
            is_leaf=lambda x: x is None,
        )

    def _select_clip(self, clip_idx: jax.Array) -> ReferenceClip:
        return jax.tree.map(
            lambda x: None if x is None else x[clip_idx],
            self._all_clips,
            is_leaf=lambda x: x is None,
        )

    def _with_clip(self, clip: ReferenceClip, fn):
        # Contract: the swap is only sound when all traces of this env
        # object run on one thread. Same-thread nesting (reset ->
        # reset_to_frame) is well-ordered via try/finally; two *threads*
        # interleaving would each see the other's clip — fail loudly
        # instead of silently mixing tracers.
        import threading

        me = threading.get_ident()
        owner = getattr(self, "_clip_swap_owner", None)
        if owner is not None and owner != me:
            raise RuntimeError(
                "concurrent _with_clip on the same env object from two "
                "threads — trace this env from one thread at a time (or "
                "use separate env copies)"
            )
        old = self._ref_traj
        self._clip_swap_owner = me
        self._ref_traj = clip
        try:
            return fn()
        finally:
            self._ref_traj = old
            self._clip_swap_owner = owner

    def reset(self, rng: jax.Array) -> State:
        rng, rng_clip = jax.random.split(rng)
        clip_idx = jax.random.randint(rng_clip, (), 0, self._n_clips)
        state = self._with_clip(
            self._select_clip(clip_idx), lambda: super(MultiClipMixin, self).reset(rng)
        )
        state.info["clip_idx"] = clip_idx
        return state

    def reset_to_clip(self, clip_idx: jax.Array, rng: jax.Array) -> State:
        """Reset pinned to ``clip_idx`` (random start frame) — the per-clip
        eval entry point (driver logs eval/episode_reward_clip{i})."""
        clip_idx = jnp.asarray(clip_idx, jnp.int32)
        state = self._with_clip(
            self._select_clip(clip_idx),
            lambda: super(MultiClipMixin, self).reset(rng),
        )
        state.info["clip_idx"] = clip_idx
        return state

    def reset_to_frame(
        self, start_frame: jax.Array, rng1: jax.Array, rng2: jax.Array
    ) -> State:
        # deterministic eval path (RenderRolloutWrapperTracking) pins clip 0,
        # mirroring how it pins frame 0
        clip_idx = jnp.zeros((), jnp.int32)
        state = self._with_clip(
            self._select_clip(clip_idx),
            lambda: super(MultiClipMixin, self).reset_to_frame(
                start_frame, rng1, rng2
            ),
        )
        state.info["clip_idx"] = clip_idx
        return state

    def step(self, state: State, action: jax.Array) -> State:
        clip_idx = state.info["clip_idx"]
        new_state = self._with_clip(
            self._select_clip(clip_idx),
            lambda: super(MultiClipMixin, self).step(state, action),
        )
        new_state.info["clip_idx"] = clip_idx
        return new_state


class GenericMultiClip(MultiClipMixin, GenericSingleClip):
    """Registry-constructible multi-clip tracking env."""

    def __init__(self, reference_clip: ReferenceClip, **kwargs):
        clip0 = self._init_multiclip(reference_clip)
        super().__init__(reference_clip=clip0, **kwargs)
