"""PPO loss: GAE targets + clipped surrogate + value + entropy terms.

Re-provides the brax ppo_losses capability the reference binds
(/root/reference/custom_brax/custom_ppo.py:20, partial at 235-244, applied
per minibatch at 250-261). Numerics must match for learning-curve parity
(SURVEY.md §7 hard part 4):

- GAE with truncation masking: deltas are zeroed where the episode was
  *truncated* (time limit) rather than terminated, and the bootstrap value
  chain is cut by ``termination``;
- advantages optionally standardized across the whole minibatch;
- value loss is 0.25 * mean((vs - baseline)^2) (the brax 0.5*0.5 factor);
- entropy is the single-sample estimator from the action distribution.

Data layout: Transition fields arrive [batch, unroll_length, ...] and are
swapped to time-major [T, B, ...] inside the loss, as the reference does.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_tracking_tpu.agents.ppo.networks import PPONetworks
from brax_tracking_tpu.training.types import Params, PRNGKey, Transition


@struct.dataclass
class PPONetworkParams:
    """Policy + value params trained jointly (custom_ppo.py TrainingState)."""

    policy: Params
    value: Params


def compute_gae(
    truncation: jax.Array,
    termination: jax.Array,
    rewards: jax.Array,
    values: jax.Array,
    bootstrap_value: jax.Array,
    lambda_: float = 1.0,
    discount: float = 0.99,
) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation over a time-major [T, B] batch.

    Returns (vs, advantages), both stop-gradiented. ``truncation`` marks
    time-limit cuts (no learning signal through them), ``termination``
    marks true environment terminations (value chain stops).
    """
    truncation_mask = 1 - truncation
    values_t_plus_1 = jnp.concatenate(
        [values[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0
    )
    deltas = rewards + discount * (1 - termination) * values_t_plus_1 - values
    deltas *= truncation_mask

    acc = jnp.zeros_like(bootstrap_value)

    def scan_fn(acc, xs):
        trunc_mask, delta, term = xs
        acc = delta + discount * (1 - term) * trunc_mask * lambda_ * acc
        return acc, acc

    _, vs_minus_v_xs = jax.lax.scan(
        scan_fn, acc, (truncation_mask, deltas, termination), reverse=True
    )
    vs = vs_minus_v_xs + values
    vs_t_plus_1 = jnp.concatenate([vs[1:], jnp.expand_dims(bootstrap_value, 0)], axis=0)
    advantages = (
        rewards + discount * (1 - termination) * vs_t_plus_1 - values
    ) * truncation_mask
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


def compute_ppo_loss(
    params: PPONetworkParams,
    normalizer_params: Any,
    data: Transition,
    rng: PRNGKey,
    ppo_network: PPONetworks,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
) -> Tuple[jax.Array, dict]:
    """Scalar PPO loss + metric dict over one minibatch of transitions."""
    dist = ppo_network.parametric_action_distribution

    # [B, T, ...] -> [T, B, ...]
    data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), data)

    policy_logits = ppo_network.policy_network.apply(
        normalizer_params, params.policy, data.observation
    )
    baseline = ppo_network.value_network.apply(
        normalizer_params, params.value, data.observation
    )
    bootstrap_value = ppo_network.value_network.apply(
        normalizer_params, params.value, data.next_observation[-1]
    )

    rewards = data.reward * reward_scaling
    truncation = data.extras["state_extras"]["truncation"]
    termination = (1 - data.discount) * (1 - truncation)

    target_action_log_probs = dist.log_prob(
        policy_logits, data.extras["policy_extras"]["raw_action"]
    )
    behaviour_action_log_probs = data.extras["policy_extras"]["log_prob"]

    vs, advantages = compute_gae(
        truncation=truncation,
        termination=termination,
        rewards=rewards,
        values=baseline,
        bootstrap_value=bootstrap_value,
        lambda_=gae_lambda,
        discount=discounting,
    )
    if normalize_advantage:
        advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
    rho_s = jnp.exp(target_action_log_probs - behaviour_action_log_probs)

    surrogate_loss1 = rho_s * advantages
    surrogate_loss2 = (
        jnp.clip(rho_s, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
    )
    policy_loss = -jnp.mean(jnp.minimum(surrogate_loss1, surrogate_loss2))

    v_error = vs - baseline
    v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5

    entropy = jnp.mean(dist.entropy(policy_logits, rng))
    entropy_loss = entropy_cost * -entropy

    total_loss = policy_loss + v_loss + entropy_loss
    return total_loss, {
        "total_loss": total_loss,
        "policy_loss": policy_loss,
        "v_loss": v_loss,
        "entropy_loss": entropy_loss,
    }
