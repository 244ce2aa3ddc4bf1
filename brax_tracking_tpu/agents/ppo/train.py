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
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from brax_tracking_tpu.agents.ppo import losses as losses_lib
from brax_tracking_tpu.agents.ppo import networks as networks_lib
from brax_tracking_tpu.distributed import mesh as dmesh
from brax_tracking_tpu.distributed.mesh import shard_map_compat
from brax_tracking_tpu.envs import wrappers
from brax_tracking_tpu.envs.base import Env
from brax_tracking_tpu.training import acting, checkpoint, gradients
from brax_tracking_tpu.training import running_statistics
from brax_tracking_tpu.training.types import Metrics

_logger = logging.getLogger(__name__)


@struct.dataclass
class TrainingState:
    """Learner state (custom_ppo.py:41-48 parity + restorable env_steps)."""

    optimizer_state: optax.OptState
    params: losses_lib.PPONetworkParams
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
    # --- rollout geometry -------------------------------------------------
    num_envs: int = 1,
    unroll_length: int = 10,
    action_repeat: int = 1,
    # --- optimization -----------------------------------------------------
    learning_rate: float = 1e-4,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    normalize_advantage: bool = True,
    normalize_observations: bool = False,
    # --- evaluation -------------------------------------------------------
    num_evals: int = 1,
    num_eval_envs: int = 128,
    num_resets_per_eval: int = 0,
    deterministic_eval: bool = False,
    eval_env: Optional[Env] = None,
    # --- plumbing ---------------------------------------------------------
    seed: int = 0,
    max_devices_per_host: Optional[int] = None,
    network_factory: Callable = networks_lib.make_ppo_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
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
    if (batch_size * num_minibatches) % num_envs != 0:
        raise ValueError("batch_size * num_minibatches must divide by num_envs")
    t_start = time.time()

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

    # Step accounting (custom_ppo.py:172-175): one training step consumes
    # minibatches*batch rows of unroll_length transitions each.
    steps_per_train_step = (
        num_minibatches * batch_size * unroll_length * action_repeat
    )
    epochs = max(num_evals - 1, 1)
    resets_per_epoch = max(num_resets_per_eval, 1)
    # ceil-divide so the requested step budget is always reached
    train_steps_per_epoch = -(
        -num_timesteps // (epochs * steps_per_train_step * resets_per_epoch)
    )

    # RNG discipline (custom_ppo.py:189-197): global stream for identical
    # network init everywhere; local stream decorrelates env rollouts. With
    # a single-controller global mesh the env keys are themselves global
    # (sharded), which subsumes the reference's per-process fold.
    root_rng = jax.random.PRNGKey(seed)
    init_rng, run_rng = jax.random.split(root_rng)
    del root_rng
    run_rng, env_rng, eval_rng = jax.random.split(run_rng, 3)
    policy_rng, value_rng = jax.random.split(init_rng)
    del init_rng

    if num_envs % num_shards != 0:
        raise ValueError(f"num_envs={num_envs} not divisible by {num_shards} shards")
    envs_per_shard = num_envs // num_shards

    wrap_for_training = functools.partial(
        wrappers.wrap,
        episode_length=episode_length,
        action_repeat=action_repeat,
    )

    v_randomization_fn = None
    if randomization_fn is not None:
        v_randomization_fn = functools.partial(
            randomization_fn, rng=jax.random.split(env_rng, envs_per_shard)
        )

    env = wrap_for_training(environment, randomization_fn=v_randomization_fn)

    # --- env state: global array sharded over the env axis ---------------
    per_env_rngs = jax.random.split(env_rng, num_envs)
    keys_sharded = _global_array(
        lambda: jax.device_get(per_env_rngs),
        per_env_rngs.shape,
        per_env_rngs.dtype,
        mesh.env_sharded,
    )
    reset_fn = jax.jit(
        env.reset,
        in_shardings=mesh.env_sharded,
        out_shardings=mesh.env_sharded,
    )
    env_state = reset_fn(keys_sharded)

    obs_size = env_state.obs.shape[-1]
    preprocess = (
        running_statistics.normalize if normalize_observations else (lambda x, y: x)
    )
    ppo_network = network_factory(
        obs_size, env.action_size, preprocess_observations_fn=preprocess
    )
    make_policy = networks_lib.make_inference_fn(ppo_network)
    optimizer = optax.adam(learning_rate=learning_rate)

    loss_hparams = {
        "ppo_network": ppo_network,
        "entropy_cost": entropy_cost,
        "discounting": discounting,
        "reward_scaling": reward_scaling,
        "gae_lambda": gae_lambda,
        "clipping_epsilon": clipping_epsilon,
        "normalize_advantage": normalize_advantage,
    }
    loss_fn = functools.partial(losses_lib.compute_ppo_loss, **loss_hparams)
    update_params = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=axis, has_aux=True
    )

    def eval_params(ts):
        """(normalizer, policy) tuple — the inference-side parameter view."""
        return (ts.normalizer_params, ts.params.policy)

    def minibatch_step(carry, mb, normalizer_params):
        opt_state, params, rng = carry
        rng, loss_rng = jax.random.split(rng)
        (_, metrics), params, opt_state = update_params(
            params, normalizer_params, mb, loss_rng, optimizer_state=opt_state
        )
        return (opt_state, params, rng), metrics

    def sgd_step(carry, data, normalizer_params):
        opt_state, params, rng = carry
        rng, perm_rng, grad_rng = jax.random.split(rng, 3)

        # Permute INDICES and gather one minibatch per scan step instead of
        # materializing a fully-shuffled copy of the (multi-GB) batch: same
        # rows per minibatch as the reference's permutation
        # (custom_ppo.py:272-277 — jax permutes arrays via exactly this
        # index permutation), but the peak memory is one minibatch, which is
        # what lets the 2048-env config fit a single chip's HBM.
        row_perm = jax.random.permutation(perm_rng, data.discount.shape[0])
        mb_rows = row_perm.reshape(num_minibatches, -1)

        def take_rows_step(c, rows):
            mb = jax.tree_util.tree_map(lambda x: x[rows], data)
            return minibatch_step(c, mb, normalizer_params=normalizer_params)

        (opt_state, params, _), metrics = jax.lax.scan(
            take_rows_step,
            (opt_state, params, grad_rng),
            mb_rows,
            length=num_minibatches,
        )
        return (opt_state, params, rng), metrics

    n_unrolls = (batch_size * num_minibatches) // num_envs

    def rollout_step(training_state, state, rng):
        """Rollout + reshape + normalizer update (the acting half)."""
        sgd_rng, unroll_rng, carry_rng = jax.random.split(rng, 3)
        policy = make_policy(eval_params(training_state))

        def unroll_once(carry, _):
            es, r = carry
            use_rng, next_rng = jax.random.split(r)
            es, segment = acting.generate_unroll(
                env,
                es,
                policy,
                use_rng,
                unroll_length,
                extra_fields=("truncation",),
                compact=True,
            )
            # bootstrap observation for this unroll segment: the state after
            # its last step (== the transition's last next_observation)
            return (es, next_rng), (segment, es.obs)

        (state, _), (data, boot_obs) = jax.lax.scan(
            unroll_once, (state, unroll_rng), (), length=n_unrolls
        )

        # [n_unrolls, T, envs_per_shard, ...] -> [rows, T, ...]
        # (explicit row count: -1 breaks on the compact 0-width placeholders)
        def to_rows(x):
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        data = jax.tree_util.tree_map(to_rows, data)
        # re-attach the (rows, 1, obs) bootstrap so the loss's
        # next_observation[-1] sees exactly the reference value
        boot_obs = boot_obs.reshape((-1,) + boot_obs.shape[2:])
        data = data.replace(next_observation=boot_obs[:, None, :])

        normalizer_params = running_statistics.update(
            training_state.normalizer_params,
            data.observation,
            pmean_axis_name=axis,
        )
        return state, data, normalizer_params, sgd_rng, carry_rng

    def learn_step(training_state, data, normalizer_params, sgd_rng):
        """Minibatched policy/value updates (the learner half)."""
        (opt_state, params, _), metrics = jax.lax.scan(
            lambda c, _: sgd_step(c, data, normalizer_params),
            (training_state.optimizer_state, training_state.params, sgd_rng),
            (),
            length=num_updates_per_batch,
        )
        return (
            TrainingState(
                optimizer_state=opt_state,
                params=params,
                normalizer_params=normalizer_params,
                env_steps=training_state.env_steps + steps_per_train_step,
            ),
            metrics,
        )

    def training_step(carry, _):
        training_state, state, rng = carry
        state, data, normalizer_params, sgd_rng, rng = rollout_step(
            training_state, state, rng
        )
        training_state, metrics = learn_step(
            training_state, data, normalizer_params, sgd_rng
        )
        return (training_state, state, rng), metrics

    def training_epoch(training_state, state, rng):
        # rng arrives with a sharded leading axis of size 1 per shard.
        (training_state, state, _), loss_metrics = jax.lax.scan(
            training_step,
            (training_state, state, rng[0]),
            (),
            length=train_steps_per_epoch,
        )
        # Reduce metrics so the replicated output is identical on all shards.
        loss_metrics = jax.lax.pmean(
            jax.tree_util.tree_map(jnp.mean, loss_metrics), axis
        )
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
    def _rollout_sm(training_state, state, rng):
        state, data, normalizer_params, sgd_rng, carry_rng = rollout_step(
            training_state, state, rng[0]
        )
        return state, data, normalizer_params, sgd_rng[None], carry_rng[None]

    def _learn_sm(training_state, data, normalizer_params, sgd_rng):
        training_state, metrics = learn_step(
            training_state, data, normalizer_params, sgd_rng[0]
        )
        metrics = jax.lax.pmean(jax.tree_util.tree_map(jnp.mean, metrics), axis)
        return training_state, metrics

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

    def training_epoch_split(training_state, state, rngs):
        per_step_metrics = []
        for _ in range(train_steps_per_epoch):
            state, data, normalizer_params, sgd_rng, rngs = rollout_exec(
                training_state, state, rngs
            )
            training_state, metrics = learn_exec(
                training_state, data, normalizer_params, sgd_rng
            )
            per_step_metrics.append(metrics)
        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *per_step_metrics
        )
        return training_state, state, metrics

    training_walltime = 0.0

    def run_one_epoch(training_state, env_state, rngs):
        """Dispatch one epoch program and fold its timing into the metrics."""
        nonlocal training_walltime
        epoch_fn = training_epoch_split if epoch_mode == "split" else training_epoch
        t0 = time.time()
        training_state, env_state, device_metrics = epoch_fn(
            training_state, env_state, rngs
        )
        device_metrics = jax.tree_util.tree_map(jnp.mean, device_metrics)
        jax.block_until_ready(device_metrics)
        dt = time.time() - t0

        training_walltime += dt
        steps_this_epoch = (
            train_steps_per_epoch * steps_per_train_step * resets_per_epoch
        )
        metrics = {
            "training/sps": steps_this_epoch / dt,
            "training/walltime": training_walltime,
        }
        for name, value in device_metrics.items():
            metrics[f"training/{name}"] = float(value)
        return training_state, env_state, metrics

    # --- init learner state ----------------------------------------------
    init_params = losses_lib.PPONetworkParams(
        policy=ppo_network.policy_network.init(policy_rng),
        value=ppo_network.value_network.init(value_rng),
    )
    step_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    training_state = TrainingState(
        optimizer_state=optimizer.init(init_params),
        params=init_params,
        normalizer_params=running_statistics.init_state(
            jnp.zeros((obs_size,), env_state.obs.dtype)
        ),
        env_steps=jnp.zeros((), step_dtype),
    )

    if num_timesteps == 0:
        packed = (training_state.normalizer_params, training_state.params)
        return make_policy, packed, {}

    if restore_checkpoint_path is not None and os.path.exists(
        restore_checkpoint_path
    ):
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

    eval_base = eval_env if eval_env else environment
    if randomization_fn is not None:
        v_randomization_fn = functools.partial(
            randomization_fn, rng=jax.random.split(eval_rng, num_eval_envs)
        )
    evaluator = acting.Evaluator(
        wrap_for_training(eval_base, randomization_fn=v_randomization_fn),
        functools.partial(make_policy, deterministic=deterministic_eval),
        key=eval_rng,
        action_repeat=action_repeat,
        episode_length=episode_length,
        num_eval_envs=num_eval_envs,
    )

    metrics = {}
    if process_id == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(eval_params(training_state), training_metrics={})
        _logger.info("initial eval: %s", metrics)
        # key by the restored step count so a resumed run's pre-training
        # eval lands at the right x on the learning curve (0 on fresh runs)
        progress_fn(int(training_state.env_steps), metrics)

    training_metrics = {}
    current_step = 0
    for it in range(epochs):
        _logger.info("starting iteration %s %.1fs", it, time.time() - t_start)

        for _ in range(resets_per_epoch):
            epoch_rng, run_rng = jax.random.split(run_rng)
            shard_rngs = jax.device_put(
                jax.random.split(epoch_rng, num_shards), mesh.env_sharded
            )
            training_state, env_state, training_metrics = run_one_epoch(
                training_state, env_state, shard_rngs
            )
            current_step = int(jax.device_get(training_state.env_steps))

            if num_resets_per_eval > 0:
                env_rng, reset_rng = jax.random.split(env_rng)
                env_state = reset_fn(
                    jax.device_put(
                        jax.random.split(reset_rng, num_envs), mesh.env_sharded
                    )
                )

        if process_id == 0:
            metrics = evaluator.run_evaluation(
                eval_params(training_state), training_metrics
            )
            _logger.info("eval @%d: %s", current_step, metrics)
            progress_fn(current_step, metrics)
            policy_params_fn(current_step, make_policy, eval_params(training_state))
        if checkpoint_dir is not None:
            checkpoint.save_checkpoint(
                f"{checkpoint_dir}/{current_step}", training_state
            )

    if current_step < num_timesteps:
        raise AssertionError(
            f"trained {current_step} < requested {num_timesteps} steps"
        )

    dmesh.assert_is_replicated(training_state, mesh)
    _logger.info("total steps: %s", current_step)
    dmesh.synchronize_hosts()
    return make_policy, eval_params(training_state), metrics
