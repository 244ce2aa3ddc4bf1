"""Metrics sink: wandb when available, JSONL + stdout otherwise.

Capability parity with the reference's observability layer (SURVEY.md §5):
`wandb.init` + `wandb.log` keyed by env steps (/root/reference/main.py:
119-127), with the same metric taxonomy (training/*, eval/*). This image
has no wandb, so the default sink is a JSONL file per run — same data,
greppable, plottable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _to_plain(v: Any) -> Any:
    try:
        import numpy as np

        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
        if isinstance(v, (np.ndarray,)):
            return v.tolist()
    except Exception:
        pass
    return v


class MetricsLogger:
    """wandb-compatible log(step, metrics) facade."""

    def __init__(
        self,
        project: str,
        run_name: str,
        log_dir: str,
        config: Optional[Dict] = None,
        use_wandb: Optional[bool] = None,
    ):
        self._wandb = None
        if use_wandb is not False:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config or {})
            except Exception:
                self._wandb = None
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self._path, "a")
        if config is not None:
            self._f.write(json.dumps({"_config": config, "_ts": time.time()}) + "\n")
            self._f.flush()

    @property
    def path(self) -> str:
        return self._path

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {k: _to_plain(v) for k, v in metrics.items()}
        if step is not None:
            rec["_step"] = int(step)
        rec["_ts"] = time.time()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        self._f.close()
