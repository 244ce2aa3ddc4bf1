"""Tracking environments and wrapper stack."""

from brax_tracking_tpu.envs.base import Env, State, Wrapper
from brax_tracking_tpu.envs.registry import get_environment, register_environment

__all__ = [
    "Env",
    "State",
    "Wrapper",
    "get_environment",
    "register_environment",
]
