"""Env base: State pytree, Env/Wrapper protocol, pipeline helpers.

The capability surface mirrors brax's PipelineEnv/State contract the
reference trains through (/root/reference/envs/fruitfly.py:4,87,150,173):
``reset(rng) -> State``, ``step(State, action) -> State``,
State = (pipeline_state, obs, reward, done, metrics, info).

TPU-first notes: envs are single-instance and functional; batching comes
from vmap (wrappers) or sharding at the trainer, never from object state.
The physics substep loop is a lax.scan so the whole control step is one
traced region.
"""

from __future__ import annotations

import abc
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from brax_tracking_tpu.physics import model as M
import brax_tracking_tpu.physics.step as pstep


@struct.dataclass
class State:
    """Env state; identical field contract to the reference's brax State."""

    pipeline_state: M.Data
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class Env(abc.ABC):
    """Abstract env over the physics engine."""

    @abc.abstractmethod
    def reset(self, rng: jax.Array) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action: jax.Array) -> State:
        ...

    @property
    @abc.abstractmethod
    def observation_size(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def action_size(self) -> int:
        ...

    @property
    def unwrapped(self) -> "Env":
        return self


class PipelineEnv(Env):
    """Env owning a physics Model; provides init/substep helpers.

    Equivalent role to brax.envs.base.PipelineEnv with backend="mjx"
    (fruitfly.py:82-87): ``pipeline_step`` scans ``n_frames`` physics
    substeps per control step.
    """

    def __init__(self, model: M.Model, n_frames: int = 1):
        self._model = model
        self._n_frames = n_frames

    @property
    def model(self) -> M.Model:
        return self._model

    @property
    def dt(self) -> jax.Array:
        """Control timestep (physics dt * substeps)."""
        return self._model.opt.timestep * self._n_frames

    @property
    def action_size(self) -> int:
        return self._model.nu

    def pipeline_init(self, qpos: jax.Array, qvel: jax.Array) -> M.Data:
        d = pstep.make_data(self._model, dtype=qpos.dtype)
        d = d.replace(qpos=qpos, qvel=qvel)
        return pstep.forward(self._model, d)

    def pipeline_step(self, data: M.Data, action: jax.Array) -> M.Data:
        # cast: callers may pass f64 actions under x64; the model dtype rules
        data = data.replace(ctrl=action.astype(data.qpos.dtype))

        def substep(d, _):
            return pstep.step(self._model, d), None

        # unroll the (small) substep count: cross-substep fusion removes the
        # scan carry round-trip through HBM for the full Data pytree
        data, _ = jax.lax.scan(
            substep, data, None, length=self._n_frames, unroll=self._n_frames <= 8
        )
        return data


class Wrapper(Env):
    """Delegating wrapper base."""

    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng: jax.Array) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return self.env.step(state, action)

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def unwrapped(self) -> Env:
        return self.env.unwrapped

    def __getattr__(self, name):
        if name == "env":
            raise AttributeError("env")
        return getattr(self.env, name)
