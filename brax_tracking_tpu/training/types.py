"""Shared training types.

Mirrors the contract of brax.training.types that the reference trainer
builds on (/root/reference/custom_brax/custom_ppo.py:17,22-23): a
``Transition`` record collected by the actor and consumed by the PPO loss,
plus policy/params aliases.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Tuple

import jax
from flax import struct

Params = Any
PRNGKey = jax.Array
Metrics = Dict[str, jax.Array]
Observation = jax.Array
Action = jax.Array
Extra = Mapping[str, Any]

# policy(observation, rng) -> (action, extras)
Policy = Callable[[Observation, PRNGKey], Tuple[Action, Extra]]


@struct.dataclass
class Transition:
    """One env transition (reference consumes brax.training.types.Transition).

    ``extras`` carries ``policy_extras`` (log_prob, raw_action) and
    ``state_extras`` (e.g. truncation) exactly as the reference's unroll
    requests them (custom_ppo.py:299-306).
    """

    observation: jax.Array
    action: jax.Array
    reward: jax.Array
    discount: jax.Array
    next_observation: jax.Array
    extras: Extra = struct.field(default_factory=dict)
