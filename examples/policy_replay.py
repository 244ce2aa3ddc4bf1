#!/usr/bin/env python3
"""Offline policy replay with the eval deep-dive artifacts.

The framework equivalent of re-running the reference's eval tail
(/root/reference/main.py:136-325) on a saved checkpoint: load a run's
config snapshot and saved policy params, roll the deterministic policy on
the tracking env, and emit the per-frame reward CSV, reward
small-multiples, thorax-height trace, and (optionally) the
rollout-vs-reference video — without retraining.

Usage:
  python examples/policy_replay.py RUN_DIR [--ckpt STEP] [--video]
RUN_DIR is a driver save_dir containing run_config.yaml and
ckpt/<run_name>/<step>/ checkpoints (the layout harness/driver.py writes).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def latest_checkpoint(ckpt_root: str) -> str:
    runs = sorted(glob.glob(os.path.join(ckpt_root, "*", "*")))
    steps = [p for p in runs if os.path.basename(p).isdigit()]
    if not steps:
        raise SystemExit(f"no checkpoints under {ckpt_root}")
    return max(steps, key=lambda p: int(os.path.basename(p)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default=None, help="step number (default: latest)")
    ap.add_argument("--video", action="store_true")
    ap.add_argument("--out", default=None, help="artifact dir (default: RUN_DIR/replay)")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the image's sitecustomize pins the "
        "TPU platform, which hangs when no device is reachable)",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import yaml

    from brax_tracking_tpu.harness import driver
    from brax_tracking_tpu.harness.metrics import MetricsLogger
    from brax_tracking_tpu.training import checkpoint

    cfg_path = os.path.join(args.run_dir, "run_config.yaml")
    if not os.path.exists(cfg_path):
        raise SystemExit(f"missing {cfg_path}")
    with open(cfg_path) as fh:  # fully-resolved snapshot written by main()
        cfg = yaml.safe_load(fh)
    tr = cfg["train"]
    if args.video:
        tr["render_video"] = True

    env = driver.build_env_from_cfg(cfg)

    ckpt_root = cfg["paths"]["ckpt_dir"]
    if args.ckpt:
        run_name = f"{tr['env_name']}_{tr['task_name']}_{tr['version']}"
        ckpt = os.path.join(ckpt_root, run_name, str(args.ckpt))
    else:
        ckpt = latest_checkpoint(ckpt_root)
    print(f"loading params from {ckpt}")
    params = checkpoint.load_params(ckpt)

    # rebuild the policy exactly as the trainer's make_policy does
    from brax_tracking_tpu.agents.ppo import networks as ppo_networks

    obs_size = env.observation_size
    normalize = ppo_networks.normalize_preprocessor if tr.get(
        "normalize_observations", True
    ) else (lambda obs, _: obs)
    nets = ppo_networks.make_ppo_networks(
        obs_size,
        env.action_size,
        preprocess_observations_fn=normalize,
        policy_hidden_layer_sizes=tuple(tr["mlp_policy_layer_sizes"]),
        value_hidden_layer_sizes=tuple(
            tr.get("mlp_value_layer_sizes", tr["mlp_policy_layer_sizes"])
        ),
    )
    make_policy = ppo_networks.make_inference_fn(nets)

    out_dir = args.out or os.path.join(args.run_dir, "replay")
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(
        project="replay", run_name="replay", log_dir=out_dir, config=cfg
    )
    policy_params_fn = driver._eval_callback(
        cfg, env, logger, out_dir, fig_dir=out_dir
    )
    step = int(os.path.basename(ckpt))
    policy_params_fn(step, make_policy, params)
    print(f"replay artifacts written under {out_dir}")


if __name__ == "__main__":
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
