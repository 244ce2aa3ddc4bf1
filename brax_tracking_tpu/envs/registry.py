"""Env registry (brax.envs.register_environment/get_environment parity;
reference call sites /root/reference/main.py:44-45, 77-81)."""

from __future__ import annotations

from typing import Dict, Type

from brax_tracking_tpu.envs.base import Env

_REGISTRY: Dict[str, Type[Env]] = {}


def register_environment(name: str, cls: Type[Env]) -> None:
    _REGISTRY[name] = cls


def get_environment(name: str, **kwargs) -> Env:
    if name not in _REGISTRY:
        raise KeyError(f"unknown environment {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def _register_defaults():
    from brax_tracking_tpu.envs.fly import FlyFreeJoint, FlyTethered
    from brax_tracking_tpu.envs.rodent import RodentMultiClip, RodentSingleClip
    from brax_tracking_tpu.envs.tracking import GenericSingleClip

    from brax_tracking_tpu.envs.tracking import GenericMultiClip

    register_environment("single_clip_tracking", GenericSingleClip)
    register_environment("multi_clip_tracking", GenericMultiClip)
    register_environment("fly_single_clip", FlyTethered)
    register_environment("fly_single_clip_freejnt", FlyFreeJoint)
    register_environment("rodent_single_clip", RodentSingleClip)
    register_environment("rodent_multi_clip", RodentMultiClip)


_register_defaults()
