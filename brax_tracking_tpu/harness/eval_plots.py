"""Per-frame eval deep-dive artifacts.

Capability parity with /root/reference/main.py:154-258: the reference logs
wandb line-plot tables of each per-frame reward term / distance and a
thorax-height trace (rollout vs reference). Here the same per-frame series
are written as a CSV table plus PNG figures under ``fig_dir`` (wandb may be
absent; the JSONL metrics logger records the artifact paths).

Design: small multiples, one subplot per series (single hue, no legend);
the thorax-height figure overlays rollout vs reference as a two-series
line chart with a legend and direct end-labels (colorblind-safe
blue/orange pair).
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import numpy as np

# CVD-safe two-series pair (blue / orange), one-hue-per-entity, fixed order
_ROLLOUT_COLOR = "#4269D0"
_REFERENCE_COLOR = "#E8871E"


def write_perframe_csv(path: str, series: Dict[str, np.ndarray]) -> str:
    """All per-frame series as one CSV table (column per series)."""
    keys = sorted(series)
    n = max(len(np.atleast_1d(series[k])) for k in keys)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step"] + keys)
        for i in range(n):
            row = [i]
            for k in keys:
                v = np.atleast_1d(series[k])
                row.append(float(v[i]) if i < len(v) else "")
            w.writerow(row)
    return path


def plot_perframe_rewards(
    path: str, series: Dict[str, np.ndarray], title: str
) -> Optional[str]:
    """Small-multiples grid: one single-hue line subplot per series."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    keys = sorted(series)
    if not keys:
        return None
    ncol = 3
    nrow = (len(keys) + ncol - 1) // ncol
    fig, axes = plt.subplots(
        nrow, ncol, figsize=(4.2 * ncol, 2.6 * nrow), squeeze=False
    )
    for i, k in enumerate(keys):
        ax = axes[i // ncol][i % ncol]
        v = np.atleast_1d(np.asarray(series[k], np.float64))
        ax.plot(np.arange(len(v)), v, color=_ROLLOUT_COLOR, linewidth=1.5)
        ax.set_title(k, fontsize=9)
        ax.grid(True, alpha=0.25, linewidth=0.5)
        ax.tick_params(labelsize=7)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
    for j in range(len(keys), nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.suptitle(title, fontsize=11)
    fig.supxlabel("control step", fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def plot_thorax_height(
    path: str,
    rollout_height: np.ndarray,
    reference_height: Optional[np.ndarray],
    title: str = "thorax height",
) -> Optional[str]:
    """Rollout-vs-reference thorax z trace (reference main.py:243-258)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(8.0, 3.2))
    r = np.atleast_1d(np.asarray(rollout_height, np.float64))
    ax.plot(np.arange(len(r)), r, color=_ROLLOUT_COLOR, linewidth=1.6,
            label="rollout")
    ax.annotate("rollout", (len(r) - 1, r[-1]), color=_ROLLOUT_COLOR,
                fontsize=8, xytext=(4, 0), textcoords="offset points")
    if reference_height is not None and len(reference_height):
        q = np.atleast_1d(np.asarray(reference_height, np.float64))
        ax.plot(np.arange(len(q)), q, color=_REFERENCE_COLOR, linewidth=1.6,
                label="reference")
        ax.annotate("reference", (len(q) - 1, q[-1]), color=_REFERENCE_COLOR,
                    fontsize=8, xytext=(4, 0), textcoords="offset points")
        ax.legend(frameon=False, fontsize=8)
    ax.set_xlabel("control step", fontsize=9)
    ax.set_ylabel("height (m)", fontsize=9)
    ax.set_title(title, fontsize=11)
    ax.grid(True, alpha=0.25, linewidth=0.5)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def emit_eval_artifacts(
    fig_dir: str,
    num_steps: int,
    table: Dict[str, np.ndarray],
    distances: Dict[str, np.ndarray],
    rollout_thorax_z: np.ndarray,
    reference_thorax_z: Optional[np.ndarray],
) -> Dict[str, str]:
    """Write CSV + reward-curve + thorax-height artifacts; returns paths."""
    os.makedirs(fig_dir, exist_ok=True)
    series = dict(table)
    series.update(distances)
    series["thorax_height"] = rollout_thorax_z
    out: Dict[str, str] = {}
    out["perframe_csv"] = write_perframe_csv(
        os.path.join(fig_dir, f"perframe_{num_steps}.csv"), series
    )
    p = plot_perframe_rewards(
        os.path.join(fig_dir, f"perframe_rewards_{num_steps}.png"),
        series,
        f"per-frame eval metrics @ {num_steps} steps",
    )
    if p:
        out["perframe_rewards_png"] = p
    p = plot_thorax_height(
        os.path.join(fig_dir, f"thorax_height_{num_steps}.png"),
        rollout_thorax_z,
        reference_thorax_z,
        f"thorax height @ {num_steps} steps",
    )
    if p:
        out["thorax_height_png"] = p
    return out
