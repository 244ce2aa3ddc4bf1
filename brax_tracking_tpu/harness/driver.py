"""Experiment driver: config -> clip cache -> env -> PPO -> eval artifacts.

Capability parity with /root/reference/main.py:48-334:
- path management (51-54), clip load-or-build with pickle cache (57-74),
- env construction via the registry (77-81),
- episode_length = (clip_length - 50 - ref_len) * steps_for_cur_frame (84-87),
- metrics logging (119-127; wandb -> JSONL fallback here),
- per-eval callback: param snapshot, deterministic rollout from frame 0,
  per-frame reward stats, optional policy-vs-reference video (136-325),
- final param save + resolved-config snapshot (327-334).

Run: ``python -m brax_tracking_tpu.harness.driver [group=choice] [a.b=v]``
e.g. ``python -m brax_tracking_tpu.harness.driver train=smoke dataset=rodent``

Demo mode: with ``dataset.stac_path=''`` a synthetic mocap clip is built
from the model's home pose (no stac data ships with this image).
"""

from __future__ import annotations

import functools
import logging
import os
import pickle
import sys
from typing import Dict, Optional

import numpy as np

_logger = logging.getLogger(__name__)


def _build_one_clip(cfg: Dict, env_model, clip_idx: int):
    """Load-or-build one ReferenceClip with the reference's pickle cache
    keyed by clip index (main.py:57-74)."""
    import jax.numpy as jnp

    from brax_tracking_tpu.data import clips as C

    ds = cfg["dataset"]
    clip_dir = os.path.join(cfg["paths"]["data_dir"], "clips")
    os.makedirs(clip_dir, exist_ok=True)
    cache = os.path.join(clip_dir, f"{clip_idx}.p")
    if os.path.exists(cache):
        return C.load_clip(cache)
    dt = 1.0 / ds.get("mocap_hz", 50)
    if ds.get("stac_path") and not os.path.exists(ds["stac_path"]):
        _logger.warning(
            "dataset.stac_path %s does not exist -> synthetic demo clip",
            ds["stac_path"],
        )
        ds = dict(ds, stac_path="")
    if ds.get("stac_path"):
        clip = C.process_clip_to_train(
            ds["stac_path"],
            env_model,
            start_step=clip_idx * ds["clip_length"],
            clip_length=ds["clip_length"],
            dt=dt,
            nan_policy=ds.get("nan_policy", "error"),
        )
    else:
        _logger.warning("dataset.stac_path empty -> synthetic demo clip %d", clip_idx)
        T = ds["clip_length"]
        qpos = np.tile(np.asarray(env_model.qpos0, np.float64), (T, 1))
        qpos[:, 2] += 0.01
        # distinct synthetic clips walk in distinct directions
        ang = 2.0 * np.pi * clip_idx / max(int(ds.get("n_clips", 1)), 1)
        qpos[:, 0] += np.cos(ang) * np.linspace(0.0, 0.2, T)
        qpos[:, 1] += np.sin(ang) * np.linspace(0.0, 0.2, T)
        clip = C.process_clip(env_model, jnp.asarray(qpos, jnp.float32), dt=dt)
    C.save_clip(cache, clip)
    return clip


def _build_clip(cfg: Dict, env_model):
    """Single clip, or a stacked multi-clip dataset when dataset.n_clips > 1
    (BASELINE.json config 5; the reference left this a stub at
    envs/rodent.py:377)."""
    from brax_tracking_tpu.data import clips as C

    ds = cfg["dataset"]
    n_clips = int(ds.get("n_clips", 1))
    if n_clips <= 1:
        return _build_one_clip(cfg, env_model, int(ds["clip_idx"]))
    start = int(ds.get("clip_idx", 0))
    return C.stack_clips(
        [_build_one_clip(cfg, env_model, start + i) for i in range(n_clips)]
    )


def _eval_callback(cfg: Dict, env, logger, model_path: str, fig_dir: str = ""):
    """policy_params_fn parity (main.py:136-325): snapshot + rollout stats,
    per-frame reward/ thorax-height artifacts (+ optional video)."""
    import jax
    import jax.numpy as jnp

    from brax_tracking_tpu.envs.wrappers import RenderRolloutWrapperTracking
    from brax_tracking_tpu.harness import eval_plots
    from brax_tracking_tpu.training import checkpoint

    rollout_env = RenderRolloutWrapperTracking(env)
    n_steps = int(
        (cfg["dataset"]["clip_length"] - cfg["dataset"]["ref_traj_length"])
        * env._steps_for_cur_frame
    )
    dist_keys = ("summed_pos_distance", "quat_distance", "joint_distance")

    # The whole deterministic eval rollout runs as ONE device program: a
    # host loop of n_steps jit_step calls pays per-call dispatch latency
    # (hundreds of ms over an axon tunnel), which dominated epoch time.
    _rollout_fn = None

    def _compile_rollout(make_policy):
        def _roll(params, rng):
            policy = make_policy(params, deterministic=True)
            state0 = rollout_env.reset(rng)

            def body(carry, _):
                state, rng = carry
                rng, key = jax.random.split(rng)
                action, _ = policy(state.obs, key)
                state = rollout_env.step(state, action)
                out = (
                    state.metrics,
                    {
                        k: state.info.get(k, jnp.full((), jnp.nan))
                        for k in dist_keys
                    },
                    state.pipeline_state.xpos[env._thorax_idx, 2],
                    state.pipeline_state.qpos,
                )
                return (state, rng), out

            _, outs = jax.lax.scan(body, (state0, rng), (), length=n_steps)
            first = (
                state0.pipeline_state.xpos[env._thorax_idx, 2],
                state0.pipeline_state.qpos,
            )
            return outs, first

        return jax.jit(_roll)

    # per-clip eval for multi-clip envs: one compiled program, invoked once
    # per clip with the clip index as a traced argument
    n_clips = int(getattr(env, "_n_clips", 1))
    _clip_eval_fn = None

    def _compile_clip_eval(make_policy, batch=32):
        def _one(params, clip_idx, rng):
            policy = make_policy(params, deterministic=True)
            keys = jax.random.split(rng, batch)
            idx = jnp.full((batch,), clip_idx, jnp.int32)
            state = jax.vmap(env.reset_to_clip)(idx, keys)

            def body(carry, _):
                state, rng, ret, alive = carry
                rng, key = jax.random.split(rng)
                action, _ = policy(state.obs, key)
                state = jax.vmap(env.step)(state, action)
                ret = ret + state.reward * alive
                alive = alive * (1.0 - state.done)
                return (state, rng, ret, alive), None

            init = (state, rng, jnp.zeros(batch), jnp.ones(batch))
            (_, _, ret, _), _ = jax.lax.scan(body, init, (), length=n_steps)
            return jnp.mean(ret)

        return jax.jit(_one)

    def policy_params_fn(num_steps, make_policy, params):
        nonlocal _rollout_fn, _clip_eval_fn
        os.makedirs(model_path, exist_ok=True)
        checkpoint.save_params(os.path.join(model_path, str(num_steps)), params)
        if n_clips > 1:
            if _clip_eval_fn is None:
                _clip_eval_fn = _compile_clip_eval(make_policy)
            per_clip = {
                f"eval/episode_reward_clip{j}": float(
                    _clip_eval_fn(params, j, jax.random.PRNGKey(j))
                )
                for j in range(n_clips)
            }
            logger.log(per_clip, step=num_steps)
        if _rollout_fn is None:
            _rollout_fn = _compile_rollout(make_policy)
        (metrics_seq, dists_seq, thorax_seq, qpos_seq), (thorax0, qpos0) = (
            jax.device_get(_rollout_fn(params, jax.random.PRNGKey(0)))
        )
        # per-frame reward stats (reference logs full tables; we log the
        # summary curve stats + dump the table to disk)
        table = {k: np.asarray(v) for k, v in metrics_seq.items()}
        stats = {}
        for k, v in table.items():
            stats[f"rollout/{k}_mean"] = float(np.nanmean(v))
            stats[f"rollout/{k}_min"] = float(np.nanmin(v))
        distances = {k: np.asarray(v) for k, v in dists_seq.items()}
        stats["rollout/summed_pos_distance_mean"] = float(
            np.nanmean(distances["summed_pos_distance"])
        )
        logger.log(stats, step=num_steps)
        with open(os.path.join(model_path, f"rollout_{num_steps}.p"), "wb") as f:
            pickle.dump(table, f)

        # per-frame deep-dive artifacts (reference main.py:154-258 logs these
        # as wandb line-plot tables; here: CSV + PNGs under fig_dir)
        try:
            thorax = np.concatenate([[thorax0], np.asarray(thorax_seq)])
            ref_bp = getattr(env._ref_traj, "body_positions", None)
            ref_thorax = None
            if ref_bp is not None:
                bp = np.asarray(ref_bp)
                if bp.ndim == 4:  # multi-clip: (n_clips, T, nbody, 3) -> clip 0
                    bp = bp[0]
                # one entry per control step to share the x axis
                frames = np.minimum(
                    (
                        np.arange(len(thorax)) / max(env._steps_for_cur_frame, 1)
                    ).astype(int),
                    bp.shape[0] - 1,
                )
                ref_thorax = bp[frames, env._thorax_idx, 2]
            paths = eval_plots.emit_eval_artifacts(
                fig_dir or model_path, num_steps, table, distances,
                thorax, ref_thorax,
            )
            logger.log(
                {f"rollout/{k}": v for k, v in paths.items()}, step=num_steps
            )
        except Exception as e:  # artifacts must never kill training
            _logger.warning("per-frame eval artifacts failed: %s", e)

        if cfg["train"].get("render_video"):
            try:
                from brax_tracking_tpu.harness import render as R

                qposes_roll = np.concatenate(
                    [qpos0[None], np.asarray(qpos_seq)]
                )
                video_path = os.path.join(model_path, f"rollout_{num_steps}.mp4")
                R.render_rollout_vs_reference(
                    cfg["dataset"].get("rendering_mjcf")
                    or cfg["dataset"]["env_args"]["mjcf_path"],
                    qposes_roll,
                    env._ref_traj,
                    video_path,
                    camera=cfg["dataset"].get("camera", 1),
                    free_jnt=cfg["dataset"]["env_args"].get("free_jnt", True),
                )
                logger.log({"rollout/video": video_path}, step=num_steps)
            except Exception as e:  # GL stack may be absent; never kill training
                _logger.warning("video render failed: %s", e)

    return policy_params_fn


def build_env_from_cfg(cfg: Dict):
    """Compile the model, build/load the reference clip, construct the env —
    the shared prologue of training (main) and offline replay (examples/
    policy_replay.py)."""
    import jax.numpy as jnp

    from brax_tracking_tpu.envs import registry
    from brax_tracking_tpu.physics import spec as bspec

    ds, tr = cfg["dataset"], cfg["train"]
    env_args = dict(ds["env_args"])

    # offline model compile for the clip builder (same transforms as the env)
    model = bspec.build_model(
        env_args["mjcf_path"],
        free_jnt=env_args.get("free_jnt", True),
        torque_actuators=env_args.get("torque_actuators", False),
        scale_factor=env_args.get("scale_factor", 1.0),
        rescale_root=env_args.get("center_of_mass", "torso"),
        solver=env_args.get("solver", "cg"),
        iterations=env_args.get("iterations", 4),
        ls_iterations=env_args.get("ls_iterations", 4),
        dtype=jnp.float32,
    )
    clip = _build_clip(cfg, model)

    return registry.get_environment(
        tr["env_name"],
        reference_clip=clip,
        mocap_hz=ds.get("mocap_hz", 50),
        ref_len=ds.get("ref_traj_length", 5),
        **env_args,
    )


def main(argv=None) -> Dict:
    logging.basicConfig(level=logging.INFO)
    argv = sys.argv[1:] if argv is None else argv

    from brax_tracking_tpu.harness.config import load_config, save_config
    from brax_tracking_tpu.harness.metrics import MetricsLogger

    cfg = load_config(argv)
    paths = cfg["paths"]
    for key in ("base_dir", "save_dir", "log_dir", "ckpt_dir", "fig_dir", "data_dir"):
        os.makedirs(paths[key], exist_ok=True)
    save_config(cfg, os.path.join(paths["save_dir"], "run_config.yaml"))

    import jax

    # persistent executable cache: the reference-scale trainer graph takes
    # minutes to compile cold; restarts and repeat runs hit the cache.
    # ensure_clean_cache tracks crashed runs via PID markers (entries left
    # by a killed run are harmless — jax recompiles truncated ones).
    cache_dir = cfg.get("compilation_cache_dir", "~/.cache/btt_jax_cache")
    if cache_dir:
        from brax_tracking_tpu.cache_guard import ensure_clean_cache

        jax.config.update(
            "jax_compilation_cache_dir", ensure_clean_cache(cache_dir)
        )
    if os.environ.get("BTT_DEBUG_NANS") == "1" or cfg.get("debug_nans"):
        # fail fast at the op that produced the first NaN (SURVEY §5:
        # sanitizer mode; default training instead relies on the envs'
        # NaN-to-done guards)
        jax.config.update("jax_debug_nans", True)
    profile_dir = cfg.get("profile_dir") or os.environ.get("BTT_PROFILE_DIR")
    if profile_dir:
        # capture a device trace of the first post-init epochs; inspect with
        # tensorboard's profile plugin or the xplane proto directly
        jax.profiler.start_trace(os.path.expanduser(profile_dir))
        import atexit

        atexit.register(jax.profiler.stop_trace)

    from brax_tracking_tpu.agents.ppo import train as ppo_train
    from brax_tracking_tpu.agents.ppo import networks as ppo_networks

    ds, tr = cfg["dataset"], cfg["train"]
    env = build_env_from_cfg(cfg)
    # the reference derives episode_length from the clip, overriding the
    # config value (main.py:84-87); force_episode_length opts out (smoke runs)
    if tr.get("force_episode_length"):
        episode_length = int(tr["episode_length"])
    else:
        episode_length = int(
            (ds["clip_length"] - 50 - ds["ref_traj_length"])
            * env._steps_for_cur_frame
        )
    _logger.info("episode_length=%d", episode_length)

    run_name = f"{tr['env_name']}_{tr['task_name']}_{tr['version']}"
    logger = MetricsLogger(
        project=tr.get("wandb_project", "brax_tracking_tpu"),
        run_name=run_name,
        log_dir=paths["log_dir"],
        config=cfg,
    )

    model_path = os.path.join(paths["ckpt_dir"], run_name)
    policy_params_fn = _eval_callback(
        cfg, env, logger, model_path, fig_dir=paths["fig_dir"]
    )

    def progress_fn(num_steps, metrics):
        logger.log(metrics, step=num_steps)
        _logger.info("steps=%s %s", num_steps, {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if k in ("eval/episode_reward", "training/sps")
        })

    network_factory = functools.partial(
        ppo_networks.make_ppo_networks,
        policy_hidden_layer_sizes=tuple(tr["mlp_policy_layer_sizes"]),
        value_hidden_layer_sizes=tuple(
            tr.get("mlp_value_layer_sizes", tr["mlp_policy_layer_sizes"])
        ),
    )

    make_policy, params, metrics = ppo_train.train(
        environment=env,
        num_timesteps=int(tr["num_timesteps"]),
        episode_length=episode_length,
        action_repeat=tr.get("action_repeat", 1),
        num_envs=int(tr["num_envs"]),
        num_eval_envs=int(tr.get("num_eval_envs", 128)),
        learning_rate=float(tr["learning_rate"]),
        entropy_cost=float(tr.get("entropy_cost", 1e-3)),
        discounting=float(tr.get("discounting", 0.99)),
        seed=int(cfg.get("seed", 0)),
        unroll_length=int(tr.get("unroll_length", 16)),
        batch_size=int(tr["batch_size"]),
        num_minibatches=int(tr.get("num_minibatches", 32)),
        num_updates_per_batch=int(tr.get("num_updates_per_batch", 16)),
        num_evals=max(int(int(tr["num_timesteps"]) / int(tr["eval_every"])), 1),
        normalize_observations=bool(tr.get("normalize_observations", True)),
        reward_scaling=float(tr.get("reward_scaling", 1.0)),
        clipping_epsilon=float(tr.get("clipping_epsilon", 0.3)),
        deterministic_eval=bool(tr.get("deterministic_eval", False)),
        network_factory=network_factory,
        progress_fn=progress_fn,
        policy_params_fn=policy_params_fn,
        restore_checkpoint_path=cfg.get("checkpoint") or None,
        checkpoint_dir=paths["ckpt_dir"],
        epoch_mode=tr.get("epoch_mode", "fused"),
    )

    from brax_tracking_tpu.training import checkpoint

    final = os.path.join(model_path, "final")
    checkpoint.save_params(final, params)
    logger.log({"final_params": final, **{k: v for k, v in metrics.items()}})
    logger.finish()
    return metrics


if __name__ == "__main__":
    main()
