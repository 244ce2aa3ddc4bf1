"""Rodent tracking envs.

The reference's envs/rodent.py:17-375 is stale/broken as checked in (its
step() references undefined attributes — SURVEY.md §2 component 5). This
implements the *intended* behavior: the fly-style frame clock and the same
six tracking reward terms, over the rescaled rodent model
(dm_control-equivalent subtree rescale at build, rodent.py:51-65).

``RodentMultiClip`` implements the multi-clip capability the reference
stubbed (rodent.py:377-378): a per-env clip index (sampled at reset) selects
the tracked clip from a stacked ReferenceClip.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from brax_tracking_tpu.data.clips import ReferenceClip
from brax_tracking_tpu.envs.base import State
from brax_tracking_tpu.envs.tracking import MultiClipMixin as TrackingMultiClipMixin, TrackingEnv
from brax_tracking_tpu.physics import spec as bspec

_DEF_RODENT_XML = "/root/reference/assets/rodent.xml"


class RodentSingleClip(TrackingEnv):
    def __init__(
        self,
        reference_clip: ReferenceClip,
        center_of_mass: str = "torso",
        end_eff_names: Optional[List[str]] = None,
        body_names: Optional[List[str]] = None,
        joint_names: Optional[List[str]] = None,
        appendage_names: Optional[List[str]] = None,
        mjcf_path: str = _DEF_RODENT_XML,
        scale_factor: float = 0.9,
        torque_actuators: bool = False,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        healthy_z_range=(0.0325, 0.5),
        dtype=None,
        **kwargs,
    ):
        model = bspec.build_model(
            mjcf_path,
            free_jnt=True,
            torque_actuators=torque_actuators,
            scale_factor=scale_factor,
            rescale_root="torso",
            solver=solver,
            iterations=iterations,
            ls_iterations=ls_iterations,
            dtype=dtype or jnp.float32,
        )
        end_eff_names = end_eff_names or ["foot_L", "foot_R", "hand_L", "hand_R"]
        body_names = body_names or ["torso", "pelvis", "skull"]
        joint_names = joint_names or [
            n for n in model.names["joint"] if n and n != "free"
        ]
        kwargs.setdefault("physics_steps_per_control_step", 5)
        kwargs.setdefault("pos_reward_weight", 1.0)
        kwargs.setdefault("joint_reward_weight", 1.0)
        kwargs.setdefault("too_far_dist", 0.01)
        kwargs.pop("free_jnt", None)  # rodent is always free-root
        super().__init__(
            model=model,
            reference_clip=reference_clip,
            center_of_mass=center_of_mass,
            end_eff_names=end_eff_names,
            body_names=body_names,
            joint_names=joint_names,
            appendage_names=appendage_names,
            healthy_z_range=healthy_z_range,
            free_jnt=True,
            joint_obs_over_full_qpos=False,
            include_root_obs=True,
            **kwargs,
        )


class RodentMultiClip(TrackingMultiClipMixin, RodentSingleClip):
    """Multi-clip rodent tracking: per-env clip selection at reset.

    Implements the capability the reference left as a stub
    (/root/reference/envs/rodent.py:377-378); see tracking.MultiClipMixin.
    """

    def __init__(self, reference_clip: ReferenceClip, **kwargs):
        clip0 = self._init_multiclip(reference_clip)
        super().__init__(reference_clip=clip0, **kwargs)
