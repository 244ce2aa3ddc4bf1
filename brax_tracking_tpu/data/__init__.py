"""Reference-clip dataset layer: preprocessing, storage, batching."""

from brax_tracking_tpu.data.clips import (
    ReferenceClip,
    compute_velocity_from_kinematics,
    process_clip,
    process_clip_to_train,
)
from brax_tracking_tpu.data import h5io

__all__ = [
    "ReferenceClip",
    "compute_velocity_from_kinematics",
    "process_clip",
    "process_clip_to_train",
    "h5io",
]
