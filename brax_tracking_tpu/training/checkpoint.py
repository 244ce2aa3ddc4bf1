"""Checkpoint/resume: full training state via orbax.

The reference restores only (normalizer, params) and silently drops the
optimizer state and env_steps counter (/root/reference/custom_brax/
custom_ppo.py:411-423 — SURVEY.md §5 flags this as a gap). Here the FULL
TrainingState (params + Adam moments + normalizer + env_steps) round-trips,
multi-host-safe via orbax's process-coordinated writes.

Also provides the pickle param IO the reference uses for policy snapshots
(brax.io.model.save_params/load_params; call sites main.py:139, 332-334).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
from orbax import checkpoint as ocp


def save_checkpoint(path: str, training_state: Any) -> None:
    """Write the full training state at ``path`` (absolute, created)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(training_state), force=True)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree like ``target`` from ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path, item=jax.device_get(target))


def checkpoint_layout(path: str) -> str:
    """Probe a checkpoint's tree structure without restoring it.

    Returns ``"full"`` for this framework's TrainingState layout (dict with
    an ``optimizer_state`` key), ``"reference"`` for the reference's bare
    ``(normalizer_params, params)`` tuple layout (custom_ppo.py:416-423),
    and ``"unknown"`` if the structure matches neither — so callers can
    fail loudly on corrupt/partial checkpoints instead of masking the
    original restore error behind a layout fallback.
    """
    path = os.path.abspath(path)
    try:
        md = ocp.PyTreeCheckpointer().metadata(path)
        tree = md.item_metadata.tree
    except Exception:
        return "unknown"
    if isinstance(tree, dict) and "optimizer_state" in tree:
        return "full"
    if isinstance(tree, (list, tuple)) and len(tree) == 2:
        return "reference"
    return "unknown"


def latest_checkpoint(root: str) -> Optional[str]:
    """Newest step-named subdirectory under ``root`` (restart-from-latest)."""
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(root, max(steps, key=int))


# --- brax.io.model parity (pickled inference params) --------------------


def save_params(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(params), f)


def load_params(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)
