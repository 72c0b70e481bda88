"""Tracing/profiling: per-step segment timers + jax.profiler capture.

Behavioral parity: reference stage-1 keeps a ``timers`` defaultdict of
wall-clock segments (data/vae/forward/backward) accumulated per step and
averaged into log lines with an ETA every 20 steps
(``train_stage_1.py:533-537,549-576,662-732``); stage 2 logs dataloader time
``td``. Here the same segment names feed a ``StepTimers`` object, and device
work can additionally be captured with XLA-level traces via ``jax.profiler``
(``trace`` context) — the TPU-native upgrade over the reference's host-only
timing (SURVEY §5).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


class StepTimers:
    """Named wall-clock accumulators with periodic averaged logging + ETA."""

    def __init__(self, total_steps: int, log_every: int = 20,
                 log: Optional[logging.Logger] = None):
        self.total_steps = total_steps
        self.log_every = log_every
        self.logger = log or logger
        self.acc: Dict[str, float] = defaultdict(float)
        self.steps_done = 0
        self.t_start = time.time()

    @contextlib.contextmanager
    def segment(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.acc[name] += time.time() - t0

    def step(self, global_step: int, **scalars) -> None:
        """Call once per train step; logs averaged segments every N steps."""
        self.steps_done += 1
        if global_step % self.log_every:
            return
        done = self.steps_done
        segs = " ".join(f"{k} {v / done:.3f}s" for k, v in sorted(self.acc.items()))
        extra = " ".join(f"{k} {v:.4f}" for k, v in scalars.items())
        eta_h = ((time.time() - self.t_start) / done
                 * (self.total_steps - global_step) / 3600)
        self.logger.info("step %d/%d %s | %s | ETA %.2f h",
                         global_step, self.total_steps, extra, segs, eta_h)

    def averages(self) -> Dict[str, float]:
        d = max(self.steps_done, 1)
        return {k: v / d for k, v in self.acc.items()}


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True) -> Iterator[None]:
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


def annotate(name: str):
    """Named region inside a traced step (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
