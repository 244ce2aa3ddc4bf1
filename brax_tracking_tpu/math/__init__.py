"""Quaternion and spatial-vector algebra (pure jnp, batch-friendly).

Covers the math surface the reference consumes from
``preprocessing/transformations.py`` (quat_mul/conj/diff/axisangle,
/root/reference/preprocessing/transformations.py:30-139) and from ``brax.math``
(rotate, relative_quat — call sites /root/reference/envs/fruitfly.py:304,613-632),
plus the MuJoCo-convention spatial algebra the physics engine is built on.
"""

from brax_tracking_tpu.math.quaternion import (
    axis_angle_to_quat,
    bounded_quat_dist,
    quat_conj,
    quat_diff,
    quat_integrate,
    quat_inv,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
    quat_to_axis_angle,
    quat_to_mat,
    mat_to_quat,
    relative_quat,
    rotate,
)
from brax_tracking_tpu.math.spatial import (
    inert_mul,
    motion_cross,
    motion_cross_force,
    transform_inertia,
)

__all__ = [
    "axis_angle_to_quat",
    "bounded_quat_dist",
    "quat_conj",
    "quat_diff",
    "quat_integrate",
    "quat_inv",
    "quat_mul",
    "quat_normalize",
    "quat_rotate",
    "quat_rotate_inv",
    "quat_to_axis_angle",
    "quat_to_mat",
    "mat_to_quat",
    "relative_quat",
    "rotate",
    "inert_mul",
    "motion_cross",
    "motion_cross_force",
    "transform_inertia",
]
