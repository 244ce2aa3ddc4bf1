"""Training wrapper stack.

Capability parity with /root/reference/custom_brax/custom_wrappers.py and
the brax training wrappers it composes (custom_wrappers.py:3-9):

- ``EpisodeWrapper``: step counting + truncation flag.
- ``VmapWrapper``: batches an env over a leading axis.
- ``DomainRandomizationVmapWrapper``: per-env randomized physics Model.
- ``AutoResetWrapperTracking``: restores the reset-time state where done,
  including the tracking clock fields (custom_wrappers.py:43-80).
- ``RenderRolloutWrapperTracking``: deterministic reset to frame 0
  (custom_wrappers.py:82-125).
- ``wrap``: the composition the trainer applies (custom_wrappers.py:14-40).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from brax_tracking_tpu.envs.base import Env, State, Wrapper
from brax_tracking_tpu.physics import model as M


def wrap(
    env: Env,
    episode_length: int = 1000,
    action_repeat: int = 1,
    randomization_fn: Optional[Callable] = None,
) -> Wrapper:
    """Episode bookkeeping + vmap batching + tracking-aware auto-reset."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    if randomization_fn is None:
        env = VmapWrapper(env)
    else:
        env = DomainRandomizationVmapWrapper(env, randomization_fn)
    env = AutoResetWrapperTracking(env)
    return env


class EpisodeWrapper(Wrapper):
    """Truncates episodes at episode_length steps (with action_repeat)."""

    def __init__(self, env: Env, episode_length: int, action_repeat: int):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        state.info["steps"] = jnp.zeros((), jnp.int32)
        state.info["truncation"] = jnp.zeros((), state.reward.dtype)
        return state

    def step(self, state: State, action: jax.Array) -> State:
        def f(state, _):
            nstate = self.env.step(state, action)
            return nstate, nstate.reward

        state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
        state = state.replace(reward=jnp.sum(rewards, axis=0))
        steps = state.info["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        zero = jnp.zeros_like(state.done)
        episode_length = jnp.array(self.episode_length, dtype=jnp.int32)
        done = jnp.where(steps >= episode_length, one, state.done)
        state.info["truncation"] = jnp.where(
            steps >= episode_length, 1 - state.done, zero
        )
        state.info["steps"] = steps
        return state.replace(done=done)


class VmapWrapper(Wrapper):
    """Vectorizes the env over a leading batch axis."""

    def __init__(self, env: Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jax.Array) -> State:
        if self.batch_size is not None and rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: State, action: jax.Array) -> State:
        return jax.vmap(self.env.step)(state, action)


class DomainRandomizationVmapWrapper(Wrapper):
    """Per-env randomized physics parameters.

    ``randomization_fn(model) -> (batched_model, in_axes)`` returns a Model
    pytree whose randomized leaves carry a leading env axis, plus the
    matching vmap in_axes prefix (same contract as brax's wrapper,
    custom_wrappers.py:8).
    """

    def __init__(self, env: Env, randomization_fn: Callable):
        super().__init__(env)
        self._model_v, self._in_axes = randomization_fn(self.env.unwrapped.model)

    def _with_model(self, model: M.Model, fn):
        """Runs fn with the env's model swapped, restoring afterwards so no
        traced model leaks into the (shared, stateful) env object.

        Contract: sound only when all traces of this env object run on one
        thread (same-thread nesting is well-ordered via try/finally); two
        *threads* interleaving raises instead of silently mixing models."""
        import threading

        unwrapped = self.env.unwrapped
        me = threading.get_ident()
        owner = getattr(unwrapped, "_model_swap_owner", None)
        if owner is not None and owner != me:
            raise RuntimeError(
                "concurrent _with_model on the same env object from two "
                "threads — trace this env from one thread at a time (or "
                "use separate env copies)"
            )
        old = unwrapped._model
        unwrapped._model_swap_owner = me
        unwrapped._model = model
        try:
            return fn()
        finally:
            unwrapped._model = old
            unwrapped._model_swap_owner = owner

    def reset(self, rng: jax.Array) -> State:
        def reset_one(model, r):
            return self._with_model(model, lambda: self.env.reset(r))

        return jax.vmap(reset_one, in_axes=[self._in_axes, 0])(self._model_v, rng)

    def step(self, state: State, action: jax.Array) -> State:
        def step_one(model, s, a):
            return self._with_model(model, lambda: self.env.step(s, a))

        return jax.vmap(step_one, in_axes=[self._in_axes, 0, 0])(
            self._model_v, state, action
        )


class AutoResetWrapperTracking(Wrapper):
    """Restores the reset-time snapshot where done (cheap pseudo-reset).

    Behavioral parity with the reference (custom_wrappers.py:43-80): done
    envs are rolled back to their *initial* (reset-time) state — pipeline
    state, observation, and the tracking clock — rather than re-sampled.
    The snapshot lives in ``info["autoreset_snapshot"]`` as one nested
    pytree and the rollback is a single masked merge over it.
    """

    # tracking-clock info fields snapshotted when the env provides them
    _CLOCK_KEYS = ("cur_frame", "steps_taken_cur_frame")

    def reset(self, rng: jax.Array) -> State:
        state = self.env.reset(rng)
        snap = {"pipeline_state": state.pipeline_state, "obs": state.obs}
        for k in self._CLOCK_KEYS:
            if k in state.info:
                snap[k] = state.info[k]
        state.info["autoreset_snapshot"] = snap
        return state

    def step(self, state: State, action: jax.Array) -> State:
        # a finished env re-enters the pool: zero its episode clock and
        # clear the flag before stepping
        if "steps" in state.info:
            state.info["steps"] = jnp.where(
                state.done.astype(bool),
                jnp.zeros_like(state.info["steps"]),
                state.info["steps"],
            )
        state = self.env.step(state.replace(done=jnp.zeros_like(state.done)), action)

        snap = state.info["autoreset_snapshot"]
        fresh = {
            k: (
                state.pipeline_state
                if k == "pipeline_state"
                else state.obs if k == "obs" else state.info[k]
            )
            for k in snap
        }
        rollback = state.done.astype(bool)

        def merge(initial, current):
            mask = rollback[(...,) + (None,) * (current.ndim - rollback.ndim)]
            return jnp.where(mask, initial, current)

        merged = jax.tree.map(merge, snap, fresh)
        for k in self._CLOCK_KEYS:
            if k in merged:
                state.info[k] = merged[k]
        return state.replace(
            pipeline_state=merged["pipeline_state"], obs=merged["obs"]
        )


class RenderRolloutWrapperTracking(Wrapper):
    """Deterministic eval resets: always frame 0 (custom_wrappers.py:82-125)."""

    def reset(self, rng: jax.Array) -> State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        return self.env.unwrapped.reset_to_frame(
            jnp.zeros((), jnp.int32), rng1, rng2
        )
