"""Profiling / timing instrumentation.

The reference measures only wall-clock (AverageMeters at steps/trainer.py:
436-437 and the per-inference tokens/s / RTF print, SURVEY.md §5). Here, in
addition to those meters, real device profiling is wired through
``jax.profiler``: traces capture XLA op timelines viewable in TensorBoard or
Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class AverageMeter:
    """Running average meter (reference steps/trainer_utils.py:177-192)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class MeterBank:
    def __init__(self):
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)

    def update(self, **kv):
        for k, v in kv.items():
            self.meters[k].update(float(v))

    def summary(self) -> Dict[str, float]:
        return {k: m.avg for k, m in self.meters.items()}


@contextlib.contextmanager
def timed(bank: Optional[MeterBank] = None, name: str = "elapsed") -> Iterator:
    t0 = time.time()
    yield
    dt = time.time() - t0
    if bank is not None:
        bank.update(**{name: dt})


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator:
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin /
    Perfetto). Usage:

        with device_trace("exp/profile"):
            run(...)  # traced region
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases inside a device_trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def param_count_breakdown(params) -> Dict[str, int]:
    """Per-subtree parameter counts (reference steps/trainer_utils.py:194-207
    ``print_model_info``)."""
    import jax
    import numpy as np

    counts: Dict[str, int] = {}
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = getattr(path[0], "key", "params") if path else "params"
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        counts[key] = counts.get(key, 0) + n
        total += n
    counts["total"] = total
    return counts
