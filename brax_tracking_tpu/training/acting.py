"""Rollout collection and evaluation.

Re-provides brax.training.acting's capability surface, which the reference
trainer consumes for rollouts and eval (/root/reference/custom_brax/
custom_ppo.py:14, generate_unroll at 299-306, Evaluator at 435-449):

- ``actor_step``: one policy+env step producing a Transition;
- ``generate_unroll``: lax.scan of actor_step over unroll_length — the hot
  loop of training (SURVEY.md §3.2 ★);
- ``EvalWrapper`` + ``Evaluator``: full-episode metric aggregation.

The whole module is jit-traceable; the env batch dimension comes from the
wrapper stack (or from sharding at the trainer), never from this module.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_tracking_tpu.envs.base import Env, State, Wrapper
from brax_tracking_tpu.training.types import Metrics, Policy, PRNGKey, Transition


def actor_step(
    env: Env,
    env_state: State,
    policy: Policy,
    key: PRNGKey,
    extra_fields: Sequence[str] = (),
) -> Tuple[State, Transition]:
    """One policy action + env step; records requested info fields."""
    actions, policy_extras = policy(env_state.obs, key)
    nstate = env.step(env_state, actions)
    state_extras = {f: nstate.info[f] for f in extra_fields}
    return nstate, Transition(
        observation=env_state.obs,
        action=actions,
        reward=nstate.reward,
        discount=1 - nstate.done,
        next_observation=nstate.obs,
        extras={"policy_extras": policy_extras, "state_extras": state_extras},
    )


def generate_unroll(
    env: Env,
    env_state: State,
    policy: Policy,
    key: PRNGKey,
    unroll_length: int,
    extra_fields: Sequence[str] = (),
    compact: bool = False,
) -> Tuple[State, Transition]:
    """Collect an unroll_length trajectory; Transition fields get a leading
    time axis [T, ...].

    ``compact=True`` skips stacking the fields the PPO loss never reads per
    step — ``next_observation`` (only its last step is used, and that equals
    the returned final_state.obs) and the squashed ``action`` (the loss
    reconstructs log-probs from raw_action) — saving ~40% of rollout HBM
    with bit-identical numerics.
    """

    def f(carry, _):
        state, current_key = carry
        current_key, next_key = jax.random.split(current_key)
        nstate, transition = actor_step(
            env, state, policy, current_key, extra_fields=extra_fields
        )
        if compact:
            # keep the env-batch dims so downstream reshapes/gathers stay valid
            empty = jnp.zeros(
                transition.observation.shape[:-1] + (0,),
                transition.observation.dtype,
            )
            transition = transition.replace(next_observation=empty, action=empty)
        return (nstate, next_key), transition

    (final_state, _), data = jax.lax.scan(
        f, (env_state, key), (), length=unroll_length
    )
    return final_state, data


@struct.dataclass
class EvalMetrics:
    """Per-env episode metric sums, active-episode mask, episode lengths."""

    episode_metrics: Dict[str, jax.Array]
    active_episodes: jax.Array
    episode_steps: jax.Array


class EvalWrapper(Wrapper):
    """Accumulates per-episode metric sums in state.info['eval_metrics']."""

    def reset(self, rng: jax.Array) -> State:
        reset_state = self.env.reset(rng)
        reset_state.metrics["reward"] = reset_state.reward
        eval_metrics = EvalMetrics(
            episode_metrics=jax.tree_util.tree_map(
                jnp.zeros_like, reset_state.metrics
            ),
            active_episodes=jnp.ones_like(reset_state.reward),
            episode_steps=jnp.zeros_like(reset_state.reward),
        )
        reset_state.info["eval_metrics"] = eval_metrics
        return reset_state

    def step(self, state: State, action: jax.Array) -> State:
        state_metrics = state.info["eval_metrics"]
        if not isinstance(state_metrics, EvalMetrics):
            raise ValueError(f"Incorrect type for state_metrics: {type(state_metrics)}")
        del state.info["eval_metrics"]
        nstate = self.env.step(state, action)
        nstate.metrics["reward"] = nstate.reward
        episode_steps = jnp.where(
            state_metrics.active_episodes,
            nstate.info.get("steps", state_metrics.episode_steps + 1),
            state_metrics.episode_steps,
        )
        episode_metrics = jax.tree_util.tree_map(
            lambda a, b: a + b * state_metrics.active_episodes,
            state_metrics.episode_metrics,
            nstate.metrics,
        )
        active_episodes = state_metrics.active_episodes * (1 - nstate.done)
        eval_metrics = EvalMetrics(
            episode_metrics=episode_metrics,
            active_episodes=active_episodes,
            episode_steps=episode_steps,
        )
        nstate.info["eval_metrics"] = eval_metrics
        return nstate


class Evaluator:
    """Runs full-episode evaluations (custom_ppo.py:435-449 contract)."""

    def __init__(
        self,
        eval_env: Env,
        eval_policy_fn: Callable[..., Policy],
        num_eval_envs: int,
        episode_length: int,
        action_repeat: int,
        key: PRNGKey,
    ):
        self._key = key
        self._eval_walltime = 0.0
        eval_env = EvalWrapper(eval_env)

        def generate_eval_unroll(policy_params, key: PRNGKey) -> State:
            reset_keys = jax.random.split(key, num_eval_envs)
            eval_first_state = eval_env.reset(reset_keys)
            return generate_unroll(
                eval_env,
                eval_first_state,
                eval_policy_fn(policy_params),
                key,
                unroll_length=episode_length // action_repeat,
            )[0]

        self._generate_eval_unroll = jax.jit(generate_eval_unroll)
        self._steps_per_unroll = episode_length * num_eval_envs

    def run_evaluation(
        self, policy_params, training_metrics: Metrics, aggregate_episodes: bool = True
    ) -> Metrics:
        self._key, unroll_key = jax.random.split(self._key)
        t = time.time()
        eval_state = self._generate_eval_unroll(policy_params, unroll_key)
        eval_metrics = eval_state.info["eval_metrics"]
        eval_metrics.active_episodes.block_until_ready()
        epoch_eval_time = time.time() - t
        metrics = {}
        for fn in [jnp.mean, jnp.std]:
            suffix = "_std" if fn == jnp.std else ""
            metrics.update(
                {
                    f"eval/episode_{name}{suffix}": (
                        fn(value) if aggregate_episodes else value
                    )
                    for name, value in eval_metrics.episode_metrics.items()
                }
            )
        metrics["eval/avg_episode_length"] = jnp.mean(eval_metrics.episode_steps)
        metrics["eval/epoch_eval_time"] = epoch_eval_time
        metrics["eval/sps"] = self._steps_per_unroll / epoch_eval_time
        self._eval_walltime = self._eval_walltime + epoch_eval_time
        metrics = {"eval/walltime": self._eval_walltime, **training_metrics, **metrics}
        return metrics
