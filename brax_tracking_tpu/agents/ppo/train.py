"""PPO trainer: one shard_map'd epoch function on a device mesh.

Capability parity with the reference trainer fork
(/root/reference/custom_brax/custom_ppo.py:65-506): identical scan nesting
(training_epoch -> training_step -> rollout scan + normalizer update ->
sgd_step -> minibatch_step -> grad update), identical step accounting
(env_step_per_training_step = batch*unroll*minibatches*action_repeat,
custom_ppo.py:172-175), identical RNG discipline (global key for identical
network init across processes, local key folded with process id for env
decorrelation, custom_ppo.py:189-197).

TPU-first differences:
- pmap -> ``shard_map`` over a 1-D ``env`` mesh axis: env state is a
  global array sharded on its leading axis, params are replicated, and
  the gradient/normalizer reductions are ``lax.pmean/psum`` over the mesh
  axis (ICI within a slice, DCN across slices — XLA picks transport).
- checkpoints capture the FULL state (params + optimizer + normalizer +
  env_steps), fixing the reference's resume gap (custom_ppo.py:411-423).
- restore also accepts the reference's (normalizer, params)-only layout.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P
from brax_tracking_tpu.distributed.mesh import shard_map_compat

from brax_tracking_tpu.agents.ppo import losses as ppo_losses
from brax_tracking_tpu.agents.ppo import networks as ppo_networks
from brax_tracking_tpu.distributed import mesh as dmesh
from brax_tracking_tpu.envs import wrappers
from brax_tracking_tpu.envs.base import Env
from brax_tracking_tpu.training import acting, checkpoint, gradients
from brax_tracking_tpu.training import running_statistics
from brax_tracking_tpu.training.types import Metrics, PRNGKey

_logger = logging.getLogger(__name__)


@struct.dataclass
class TrainingState:
    """Learner state (custom_ppo.py:41-48 parity + restorable env_steps)."""

    optimizer_state: optax.OptState
    params: ppo_losses.PPONetworkParams
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jax.Array


def _global_array(host_fn, shape, dtype, sharding: NamedSharding):
    """Build a globally-sharded array from a host computation that every
    process can evaluate (multihost-safe device_put)."""
    data = np.asarray(host_fn(), dtype=dtype).reshape(shape)
    return jax.make_array_from_callback(shape, sharding, lambda idx: data[idx])


def train(
    environment: Env,
    num_timesteps: int,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    max_devices_per_host: Optional[int] = None,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 1,
    num_resets_per_eval: int = 0,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    deterministic_eval: bool = False,
    network_factory: Callable = ppo_networks.make_ppo_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    normalize_advantage: bool = True,
    eval_env: Optional[Env] = None,
    policy_params_fn: Callable[..., None] = lambda *args: None,
    randomization_fn: Optional[Callable] = None,
    restore_checkpoint_path: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    mesh: Optional[dmesh.TrainMesh] = None,
    epoch_mode: str = "fused",
):
    """PPO training. Returns (make_policy, (normalizer, policy_params), metrics).

    Argument semantics match the reference train() (custom_ppo.py:65-150);
    ``mesh`` lets callers supply a premade device mesh (tests use an 8-way
    virtual CPU mesh; the driver's dryrun uses N virtual devices).
    """
    assert batch_size * num_minibatches % num_envs == 0
    xt = time.time()

    if mesh is None:
        mesh = dmesh.make_train_mesh(max_devices_per_host=max_devices_per_host)
    axis = mesh.axis_name
    num_shards = mesh.num_shards
    process_count = jax.process_count()
    process_id = jax.process_index()
    _logger.info(
        "mesh shards: %d, process count: %d (id %d)",
        num_shards,
        process_count,
        process_id,
    )

    env_step_per_training_step = (
        batch_size * unroll_length * num_minibatches * action_repeat
    )
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = int(
        np.ceil(
            num_timesteps
            / (
                num_evals_after_init
                * env_step_per_training_step
                * max(num_resets_per_eval, 1)
            )
        )
    )

    # RNG discipline (custom_ppo.py:189-197): global stream for identical
    # network init everywhere; local stream decorrelates env rollouts. With
    # a single-controller global mesh the env keys are themselves global
    # (sharded), which subsumes the reference's per-process fold.
    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key, key_env, eval_key = jax.random.split(local_key, 3)
    key_policy, key_value = jax.random.split(global_key)
    del global_key

    assert num_envs % num_shards == 0
    assert (batch_size * num_minibatches) % num_envs == 0
    local_envs = num_envs // num_shards

    v_randomization_fn = None
    if randomization_fn is not None:
        randomization_rng = jax.random.split(key_env, local_envs)
        v_randomization_fn = functools.partial(randomization_fn, rng=randomization_rng)

    env = wrappers.wrap(
        environment,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=v_randomization_fn,
    )

    # --- env state: global array sharded over the env axis ---------------
    key_envs = jax.random.split(key_env, num_envs)
    keys_sharded = _global_array(
        lambda: jax.device_get(key_envs),
        key_envs.shape,
        key_envs.dtype,
        mesh.env_sharded,
    )
    reset_fn = jax.jit(
        env.reset,
        in_shardings=mesh.env_sharded,
        out_shardings=mesh.env_sharded,
    )
    env_state = reset_fn(keys_sharded)

    obs_size = env_state.obs.shape[-1]
    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    ppo_network = network_factory(
        obs_size, env.action_size, preprocess_observations_fn=normalize
    )
    make_policy = ppo_networks.make_inference_fn(ppo_network)

    optimizer = optax.adam(learning_rate=learning_rate)

    loss_fn = functools.partial(
        ppo_losses.compute_ppo_loss,
        ppo_network=ppo_network,
        entropy_cost=entropy_cost,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
    )

    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=axis, has_aux=True
    )

    def minibatch_step(carry, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params, normalizer_params, data, key_loss, optimizer_state=optimizer_state
        )
        return (optimizer_state, params, key), metrics

    def sgd_step(carry, unused_t, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        # Permute INDICES and gather one minibatch per scan step instead of
        # materializing a fully-shuffled copy of the (multi-GB) batch: same
        # rows per minibatch as the reference's permutation
        # (custom_ppo.py:272-277 — jax permutes arrays via exactly this
        # index permutation), but the peak memory is one minibatch, which is
        # what lets the 2048-env config fit a single chip's HBM.
        n_rows = data.discount.shape[0]
        perm = jax.random.permutation(key_perm, n_rows)
        minibatch_idx = jnp.reshape(perm, (num_minibatches, -1))

        def gathered_step(carry, idx):
            mb = jax.tree_util.tree_map(lambda x: x[idx], data)
            return minibatch_step(carry, mb, normalizer_params=normalizer_params)

        (optimizer_state, params, _), metrics = jax.lax.scan(
            gathered_step,
            (optimizer_state, params, key_grad),
            minibatch_idx,
            length=num_minibatches,
        )
        return (optimizer_state, params, key), metrics

    def rollout_step(training_state, state, key):
        """Rollout + reshape + normalizer update (the acting half)."""
        key_sgd, key_generate_unroll, new_key = jax.random.split(key, 3)

        policy = make_policy(
            (training_state.normalizer_params, training_state.params.policy)
        )

        def f(carry, unused_t):
            current_state, current_key = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data = acting.generate_unroll(
                env,
                current_state,
                policy,
                current_key,
                unroll_length,
                extra_fields=("truncation",),
                compact=True,
            )
            # bootstrap observation for this unroll segment: the state after
            # its last step (== the transition's last next_observation)
            return (next_state, next_key), (data, next_state.obs)

        (state, _), (data, boot_obs) = jax.lax.scan(
            f,
            (state, key_generate_unroll),
            (),
            length=batch_size * num_minibatches // num_envs,
        )
        # [n_unrolls, T, local_envs, ...] -> [rows, T, ...]
        # (explicit row count: -1 breaks on the compact 0-width placeholders)
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (x.shape[0] * x.shape[1],) + x.shape[2:]),
            data,
        )
        # re-attach the (rows, 1, obs) bootstrap so the loss's
        # next_observation[-1] sees exactly the reference value
        boot_obs = jnp.reshape(boot_obs, (-1,) + boot_obs.shape[2:])
        data = data.replace(next_observation=boot_obs[:, None, :])

        normalizer_params = running_statistics.update(
            training_state.normalizer_params,
            data.observation,
            pmean_axis_name=axis,
        )
        return state, data, normalizer_params, key_sgd, new_key

    def learn_step(training_state, data, normalizer_params, key_sgd):
        """Minibatched policy/value updates (the learner half)."""
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(sgd_step, data=data, normalizer_params=normalizer_params),
            (training_state.optimizer_state, training_state.params, key_sgd),
            (),
            length=num_updates_per_batch,
        )
        new_training_state = TrainingState(
            optimizer_state=optimizer_state,
            params=params,
            normalizer_params=normalizer_params,
            env_steps=training_state.env_steps + env_step_per_training_step,
        )
        return new_training_state, metrics

    def training_step(carry, unused_t):
        training_state, state, key = carry
        state, data, normalizer_params, key_sgd, new_key = rollout_step(
            training_state, state, key
        )
        new_training_state, metrics = learn_step(
            training_state, data, normalizer_params, key_sgd
        )
        return (new_training_state, state, new_key), metrics

    def training_epoch(training_state, state, key):
        # key arrives with a sharded leading axis of size 1 per shard.
        key = key[0]
        (training_state, state, _), loss_metrics = jax.lax.scan(
            training_step,
            (training_state, state, key),
            (),
            length=num_training_steps_per_epoch,
        )
        loss_metrics = jax.tree_util.tree_map(jnp.mean, loss_metrics)
        # Reduce metrics so the replicated output is identical on all shards.
        loss_metrics = jax.lax.pmean(loss_metrics, axis)
        return training_state, state, loss_metrics

    training_epoch = jax.jit(
        shard_map_compat(
            training_epoch,
            mesh=mesh.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P(axis), P()),
        )
    )

    # --- split mode: rollout and learner as two device programs ----------
    # Same math/collectives as the fused epoch, but each training step is
    # two smaller executables with one host sync between them. Exists
    # because some deployment targets choke on the monolithic epoch program
    # (e.g. remote-compile services); also halves peak program size.
    def _rollout_sm(training_state, state, key):
        key = key[0]
        state, data, normalizer_params, key_sgd, new_key = rollout_step(
            training_state, state, key
        )
        return state, data, normalizer_params, key_sgd[None], new_key[None]

    def _learn_sm(training_state, data, normalizer_params, key_sgd):
        new_training_state, metrics = learn_step(
            training_state, data, normalizer_params, key_sgd[0]
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        metrics = jax.lax.pmean(metrics, axis)
        return new_training_state, metrics

    rollout_exec = jax.jit(
        shard_map_compat(
            _rollout_sm,
            mesh=mesh.mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
        )
    )
    learn_exec = jax.jit(
        shard_map_compat(
            _learn_sm,
            mesh=mesh.mesh,
            in_specs=(P(), P(axis), P(), P(axis)),
            out_specs=(P(), P()),
        )
    )

    def training_epoch_split(training_state, state, keys):
        all_metrics = []
        for _ in range(num_training_steps_per_epoch):
            state, data, normalizer_params, key_sgd, keys = rollout_exec(
                training_state, state, keys
            )
            training_state, metrics = learn_exec(
                training_state, data, normalizer_params, key_sgd
            )
            all_metrics.append(metrics)
        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *all_metrics
        )
        return training_state, state, metrics

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, env_state, key):
        nonlocal training_walltime
        t = time.time()
        if epoch_mode == "split":
            training_state, env_state, metrics = training_epoch_split(
                training_state, env_state, key
            )
        else:
            training_state, env_state, metrics = training_epoch(
                training_state, env_state, key
            )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        jax.block_until_ready(metrics)

        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (
            num_training_steps_per_epoch
            * env_step_per_training_step
            * max(num_resets_per_eval, 1)
        ) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": float(value) for name, value in metrics.items()},
        }
        return training_state, env_state, metrics

    # --- init learner state ----------------------------------------------
    init_params = ppo_losses.PPONetworkParams(
        policy=ppo_network.policy_network.init(key_policy),
        value=ppo_network.value_network.init(key_value),
    )
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            jnp.zeros((obs_size,), env_state.obs.dtype)
        ),
        env_steps=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
    )

    if num_timesteps == 0:
        return (
            make_policy,
            (training_state.normalizer_params, training_state.params),
            {},
        )

    if restore_checkpoint_path is not None:
        import os

        if os.path.exists(restore_checkpoint_path):
            # Probe the layout first so a corrupt/partial checkpoint fails
            # with ITS error, not a confusing secondary layout mismatch.
            layout = checkpoint.checkpoint_layout(restore_checkpoint_path)
            _logger.info(
                "restoring from checkpoint %s (layout: %s)",
                restore_checkpoint_path,
                layout,
            )
            if layout == "reference":
                # Reference-layout checkpoint: (normalizer, params) only
                # (custom_ppo.py:416-423); optimizer state / env_steps
                # restart, matching the reference's resume semantics.
                normalizer_params, restored_params = checkpoint.restore_checkpoint(
                    restore_checkpoint_path,
                    (training_state.normalizer_params, init_params),
                )
                training_state = training_state.replace(
                    normalizer_params=normalizer_params, params=restored_params
                )
            else:
                training_state = checkpoint.restore_checkpoint(
                    restore_checkpoint_path, training_state
                )

    training_state = jax.device_put(training_state, mesh.replicated)

    if not eval_env:
        eval_env = environment
    if randomization_fn is not None:
        v_randomization_fn = functools.partial(
            randomization_fn, rng=jax.random.split(eval_key, num_eval_envs)
        )
    eval_env = wrappers.wrap(
        eval_env,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=v_randomization_fn,
    )
    evaluator = acting.Evaluator(
        eval_env,
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
    )

    metrics = {}
    if process_id == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.params.policy),
            training_metrics={},
        )
        _logger.info("initial eval: %s", metrics)
        # key by the restored step count so a resumed run's pre-training
        # eval lands at the right x on the learning curve (0 on fresh runs)
        progress_fn(int(training_state.env_steps), metrics)

    training_metrics = {}
    current_step = 0
    for it in range(num_evals_after_init):
        _logger.info("starting iteration %s %.1fs", it, time.time() - xt)

        for _ in range(max(num_resets_per_eval, 1)):
            epoch_key, local_key = jax.random.split(local_key)
            epoch_keys = jax.random.split(epoch_key, num_shards)
            epoch_keys = jax.device_put(epoch_keys, mesh.env_sharded)
            (training_state, env_state, training_metrics) = (
                training_epoch_with_timing(training_state, env_state, epoch_keys)
            )
            current_step = int(jax.device_get(training_state.env_steps))

            if num_resets_per_eval > 0:
                key_env, reset_key = jax.random.split(key_env)
                new_keys = jax.random.split(reset_key, num_envs)
                env_state = reset_fn(jax.device_put(new_keys, mesh.env_sharded))

        if process_id == 0:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.params.policy),
                training_metrics,
            )
            _logger.info("eval @%d: %s", current_step, metrics)
            progress_fn(current_step, metrics)
            params = (training_state.normalizer_params, training_state.params.policy)
            policy_params_fn(current_step, make_policy, params)
        if checkpoint_dir is not None:
            checkpoint.save_checkpoint(
                f"{checkpoint_dir}/{current_step}", training_state
            )

    total_steps = current_step
    assert total_steps >= num_timesteps

    dmesh.assert_is_replicated(training_state, mesh)
    params = (training_state.normalizer_params, training_state.params.policy)
    _logger.info("total steps: %s", total_steps)
    dmesh.synchronize_hosts()
    return (make_policy, params, metrics)
