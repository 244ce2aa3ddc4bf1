"""PPO policy/value networks.

Re-provides the brax ppo_networks capability the reference binds
(/root/reference/main.py:21,106-110; custom_ppo.py:228-231): an MLP policy
head feeding a NormalTanhDistribution plus an MLP value head, and
``make_inference_fn`` producing the deployable policy closure.

TPU notes: plain-pytree MLPs (no framework module system in the hot path);
matmuls stay batched so XLA tiles them onto the MXU; parameters and
activations default to float32 with an optional bfloat16 compute dtype for
the large-batch rollout path.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_tracking_tpu.training import running_statistics
from brax_tracking_tpu.training.distribution import NormalTanhDistribution
from brax_tracking_tpu.training.types import PRNGKey

ActivationFn = Callable[[jax.Array], jax.Array]
PreprocessFn = Callable[[Any, Any], Any]


def _lecun_uniform(key: PRNGKey, shape, dtype):
    fan_in = shape[0]
    bound = jnp.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_mlp(
    key: PRNGKey,
    layer_sizes: Sequence[int],
    obs_size: int,
    dtype=jnp.float32,
):
    """Returns list of {'kernel','bias'} dicts for an MLP."""
    sizes = [obs_size] + list(layer_sizes)
    params = []
    for i in range(len(layer_sizes)):
        key, sub = jax.random.split(key)
        params.append(
            {
                "kernel": _lecun_uniform(sub, (sizes[i], sizes[i + 1]), dtype),
                "bias": jnp.zeros((sizes[i + 1],), dtype),
            }
        )
    return params


def apply_mlp(
    params,
    x: jax.Array,
    activation: ActivationFn,
    activate_final: bool = False,
    compute_dtype=None,
) -> jax.Array:
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    n = len(params)
    for i, layer in enumerate(params):
        k, b = layer["kernel"], layer["bias"]
        if compute_dtype is not None:
            k, b = k.astype(compute_dtype), b.astype(compute_dtype)
        x = x @ k + b
        if i < n - 1 or activate_final:
            x = activation(x)
    return x.astype(in_dtype)


@struct.dataclass
class FeedForwardNetwork:
    init: Callable = struct.field(pytree_node=False)
    apply: Callable = struct.field(pytree_node=False)


@struct.dataclass
class PPONetworks:
    policy_network: FeedForwardNetwork = struct.field(pytree_node=False)
    value_network: FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: NormalTanhDistribution = struct.field(
        pytree_node=False
    )


def make_policy_network(
    param_size: int,
    obs_size: int,
    preprocess_observations_fn: PreprocessFn,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = jax.nn.swish,
    compute_dtype=None,
) -> FeedForwardNetwork:
    sizes = list(hidden_layer_sizes) + [param_size]

    def init(key):
        return init_mlp(key, sizes, obs_size)

    def apply(processor_params, params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return apply_mlp(params, obs, activation, compute_dtype=compute_dtype)

    return FeedForwardNetwork(init=init, apply=apply)


def make_value_network(
    obs_size: int,
    preprocess_observations_fn: PreprocessFn,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = jax.nn.swish,
    compute_dtype=None,
) -> FeedForwardNetwork:
    sizes = list(hidden_layer_sizes) + [1]

    def init(key):
        return init_mlp(key, sizes, obs_size)

    def apply(processor_params, params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return jnp.squeeze(
            apply_mlp(params, obs, activation, compute_dtype=compute_dtype), axis=-1
        )

    return FeedForwardNetwork(init=init, apply=apply)


def make_ppo_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn: PreprocessFn = lambda obs, _: obs,
    policy_hidden_layer_sizes: Sequence[int] = (256, 256),
    value_hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = jax.nn.swish,
    compute_dtype=None,
) -> PPONetworks:
    dist = NormalTanhDistribution(event_size=action_size)
    return PPONetworks(
        policy_network=make_policy_network(
            dist.param_size,
            observation_size,
            preprocess_observations_fn,
            policy_hidden_layer_sizes,
            activation,
            compute_dtype,
        ),
        value_network=make_value_network(
            observation_size,
            preprocess_observations_fn,
            value_hidden_layer_sizes,
            activation,
            compute_dtype,
        ),
        parametric_action_distribution=dist,
    )


def make_inference_fn(ppo_networks: PPONetworks):
    """Policy factory: params -> policy(obs, rng) -> (action, extras).

    Matches the reference's make_policy contract (custom_ppo.py:228-231,
    292-294): params = (normalizer_state, policy_params).
    """

    def make_policy(params: Tuple, deterministic: bool = False):
        policy_network = ppo_networks.policy_network
        dist = ppo_networks.parametric_action_distribution

        def policy(observations, key_sample):
            normalizer_params, policy_params = params[0], params[1]
            logits = policy_network.apply(normalizer_params, policy_params, observations)
            if deterministic:
                return dist.mode(logits), {}
            raw = dist.sample_no_postprocessing(logits, key_sample)
            log_prob = dist.log_prob(logits, raw)
            return dist.postprocess(raw), {"log_prob": log_prob, "raw_action": raw}

        return policy

    return make_policy


def normalize_preprocessor(obs, normalizer_state):
    """Observation preprocessor used when normalize_observations=True."""
    return running_statistics.normalize(obs, normalizer_state)
