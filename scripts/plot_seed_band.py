#!/usr/bin/env python3
"""Multi-seed learning-curve band (mean ± min/max range).

The strongest in-image substitute for the hardware-blocked MJX
learning-curve-parity target (BASELINE.md): run the same config under
N seeds and show that the curve shape is seed-stable, so any future
cross-framework comparison lands inside a known variance band.

Usage:
  python scripts/plot_seed_band.py runs/Rodent/seed0/logs/metrics.jsonl \
      runs/Rodent/seed1/logs/metrics.jsonl ... -o benchmarks/curve_tpu_rodent_seeds \
      [-k eval/episode_reward]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from plot_metrics import load_jsonl  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonls", nargs="+")
    ap.add_argument("-o", "--outdir", required=True)
    ap.add_argument("-k", "--key", default="eval/episode_reward")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    runs = []
    for p in args.jsonls:
        series = load_jsonl(p).get(args.key, [])
        series = [(s, v) for s, v in series if s is not None]
        if not series:
            print(f"warning: {p} has no {args.key}", file=sys.stderr)
            continue
        series.sort()
        runs.append(dict(series))
    if len(runs) < 2:
        raise SystemExit("need >=2 runs with data for a band")

    # align on steps present in every run
    steps = sorted(set.intersection(*[set(r) for r in runs]))
    mat = np.array([[r[s] for s in steps] for r in runs])  # (n_seeds, T)
    mean = mat.mean(axis=0)
    lo = mat.min(axis=0)
    hi = mat.max(axis=0)

    os.makedirs(args.outdir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 4.2))
    ax.fill_between(steps, lo, hi, alpha=0.25, label=f"range ({len(runs)} seeds)")
    ax.plot(steps, mean, lw=2, label="mean")
    for i, r in enumerate(runs):
        ax.plot(steps, mat[i], lw=0.7, alpha=0.6)
    ax.set_xlabel("env steps")
    ax.set_ylabel(args.key)
    ax.set_title(f"{args.key}: mean ± seed range")
    ax.legend()
    fig.tight_layout()
    png = os.path.join(args.outdir, "seed_band.png")
    fig.savefig(png, dpi=130)

    summary = {
        "key": args.key,
        "n_seeds": len(runs),
        "steps": steps,
        "mean": mean.tolist(),
        "min": lo.tolist(),
        "max": hi.tolist(),
        "final_mean": float(mean[-1]),
        "final_range": [float(lo[-1]), float(hi[-1])],
        "relative_band_width_final": float((hi[-1] - lo[-1]) / max(abs(mean[-1]), 1e-9)),
    }
    with open(os.path.join(args.outdir, "seed_band.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k not in ("steps", "mean", "min", "max")}))
    print(f"wrote {png}")


if __name__ == "__main__":
    main()
