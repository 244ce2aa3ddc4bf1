"""Fruitfly tracking envs.

Capability parity with /root/reference/envs/fruitfly.py:
- ``FlyTethered``      <-> Fruitfly_Tethered (18-341): free joint stripped,
  joint tracking over the full qpos, no root-relative obs terms.
- ``FlyFreeJoint``     <-> Fruitfly_Tethered_Free (344-669): free joint kept,
  root pos/quat tracking active, root-relative obs terms included.

Both compile the model offline via physics.spec.build_model (free-joint
strip fruitfly.py:54-60, torque rewrite 63-69, solver overrides 70-79).
"""

from __future__ import annotations

from typing import List, Optional

from brax_tracking_tpu.data.clips import ReferenceClip
from brax_tracking_tpu.envs.tracking import TrackingEnv
from brax_tracking_tpu.physics import spec as bspec

_DEF_FLY_XML = "/root/reference/assets/fruitfly/fruitfly_force_fast.xml"


def _build(mjcf_path, free_jnt, torque_actuators, solver, iterations, ls_iterations, dtype=None):
    import jax.numpy as jnp

    return bspec.build_model(
        mjcf_path,
        free_jnt=free_jnt,
        torque_actuators=torque_actuators,
        solver=solver,
        iterations=iterations,
        ls_iterations=ls_iterations,
        dtype=dtype or jnp.float32,
    )


class FlyTethered(TrackingEnv):
    """Tethered fly single-clip tracking (reference: fly_single_clip)."""

    def __init__(
        self,
        reference_clip: ReferenceClip,
        center_of_mass: str,
        end_eff_names: List[str],
        body_names: List[str],
        joint_names: List[str],
        appendage_names: Optional[List[str]] = None,
        mjcf_path: str = _DEF_FLY_XML,
        scale_factor: float = 1.0,
        torque_actuators: bool = False,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        free_jnt: bool = False,
        dtype=None,
        **kwargs,
    ):
        model = _build(
            mjcf_path, free_jnt, torque_actuators, solver, iterations, ls_iterations, dtype
        )
        kwargs.setdefault("physics_steps_per_control_step", 10)
        super().__init__(
            model=model,
            reference_clip=reference_clip,
            center_of_mass=center_of_mass,
            end_eff_names=end_eff_names,
            body_names=body_names,
            joint_names=joint_names,
            appendage_names=appendage_names,
            free_jnt=free_jnt,
            joint_obs_over_full_qpos=True,
            include_root_obs=False,
            **kwargs,
        )


class FlyFreeJoint(TrackingEnv):
    """Free-joint fly single-clip tracking (reference: fly_single_clip_freejnt)."""

    def __init__(
        self,
        reference_clip: ReferenceClip,
        center_of_mass: str,
        end_eff_names: List[str],
        body_names: List[str],
        joint_names: List[str],
        appendage_names: Optional[List[str]] = None,
        mjcf_path: str = _DEF_FLY_XML,
        scale_factor: float = 1.0,
        torque_actuators: bool = False,
        solver: str = "cg",
        iterations: int = 6,
        ls_iterations: int = 6,
        free_jnt: bool = True,
        dtype=None,
        **kwargs,
    ):
        model = _build(
            mjcf_path, free_jnt, torque_actuators, solver, iterations, ls_iterations, dtype
        )
        kwargs.setdefault("physics_steps_per_control_step", 10)
        super().__init__(
            model=model,
            reference_clip=reference_clip,
            center_of_mass=center_of_mass,
            end_eff_names=end_eff_names,
            body_names=body_names,
            joint_names=joint_names,
            appendage_names=appendage_names,
            free_jnt=free_jnt,
            joint_obs_over_full_qpos=False,
            include_root_obs=True,
            **kwargs,
        )
