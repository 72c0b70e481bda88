"""Experiment tracking: JSONL metrics + config snapshot (+ TensorBoard if TF).

The reference logs to mlflow (run per launch with a config dump,
``train_stage_1.py:506-513``) and a parallel wandb run on the main process
(``:257-258,722-732``). Neither service exists in this deployment, so the
equivalent here is local-first: an append-only ``metrics.jsonl`` any tool can
tail, a ``config.json`` snapshot, and optional TensorBoard event files (via
tensorflow when importable) for the same scalars.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Tracker:
    def __init__(self, run_dir: str, config: Optional[Dict[str, Any]] = None,
                 tensorboard: bool = True):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._f = open(os.path.join(run_dir, "metrics.jsonl"), "a", buffering=1)
        if config is not None:
            with open(os.path.join(run_dir, "config.json"), "w") as f:
                json.dump(_plain(config), f, indent=2, default=str)
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # optional, present in some images

                self._tb = tf.summary.create_file_writer(
                    os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _plain(obj):
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj
