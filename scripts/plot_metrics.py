#!/usr/bin/env python3
"""Offline plots from a run's metrics.jsonl (wandb-dashboard stand-in).

Capability parity with the reference's matplotlib helpers + wandb line
plots (/root/reference/utils/utils.py:18-36, main.py:154-258): training
and eval curves keyed by env steps, plus per-frame rollout reward curves
from the eval callback's pickled tables.

Usage:
  python scripts/plot_metrics.py runs/Rodent/debug/logs/metrics.jsonl -o figs/
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
from collections import defaultdict


def load_jsonl(path):
    series = defaultdict(list)
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "_config" in rec:
                continue
            step = rec.get("_step")
            for k, v in rec.items():
                if k.startswith("_") or not isinstance(v, (int, float)):
                    continue
                series[k].append((step, v))
    return series


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    ap.add_argument("-o", "--out-dir", default="figures")
    ap.add_argument(
        "--keys",
        nargs="*",
        default=["eval/episode_reward", "training/sps", "training/total_loss"],
    )
    ap.add_argument("--rollout-table", help="rollout_<N>.p from the eval callback")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    series = load_jsonl(args.jsonl)

    for key in args.keys:
        if key not in series:
            print(f"skip {key}: not logged")
            continue
        pts = [(s if s is not None else i, v) for i, (s, v) in enumerate(series[key])]
        xs, ys = zip(*pts)
        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(xs, ys)
        ax.set_xlabel("env steps")
        ax.set_ylabel(key)
        ax.set_title(key)
        ax.grid(True, alpha=0.3)
        out = os.path.join(args.out_dir, key.replace("/", "_") + ".png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        print("wrote", out)

    if args.rollout_table:
        with open(args.rollout_table, "rb") as f:
            table = pickle.load(f)
        fig, ax = plt.subplots(figsize=(9, 5))
        for k, v in sorted(table.items()):
            if k.endswith("_reward"):
                ax.plot(v, label=k)
        ax.set_xlabel("control step")
        ax.set_ylabel("per-frame reward")
        ax.legend(fontsize=7)
        ax.grid(True, alpha=0.3)
        out = os.path.join(args.out_dir, "rollout_rewards.png")
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        print("wrote", out)


if __name__ == "__main__":
    main()
