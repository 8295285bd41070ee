"""Tracing / profiling / FLOP accounting (SURVEY.md section 5.1).

TPU-native equivalents of the reference's profiling surface:
  * NVTX ranges (PoseODERNN.py:103-104)      -> ``jax.named_scope`` /
    :func:`annotate`
  * torch.profiler chrome trace
    (utils/profiler.py:10-20)                 -> :func:`trace` writing an
    XProf/Perfetto trace directory
  * fvcore FlopCountAnalysis (DeepVIO.py:70-74)
                                              -> :func:`flops_analysis` via
    the compiled executable's ``cost_analysis()``
  * parameter counting (utils/profiler.py:23-27)
                                              -> models.deepvio.count_parameters
  * CUDA memory summary (train_model.py:44-46)
                                              -> :func:`device_memory_stats`
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def annotate(name: str):
    """Profiler-visible scope annotation (NVTX-range equivalent)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XProf trace viewable in Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_analysis(fn: Callable, *example_args) -> dict:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes
    accessed, ...)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    analyses = compiled.cost_analysis()
    if analyses is None:
        return {}
    return dict(analyses if isinstance(analyses, dict) else analyses[0])


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    device = device or jax.local_devices()[0]
    stats = getattr(device, "memory_stats", None)
    return dict(stats() or {}) if callable(stats) else {}


class StepTimer:
    """Wall-clock step timing with device sync (CUDA-event timing
    equivalent, KITTI_eval.py:136-149)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def measure(self, result_getter: Optional[Callable] = None):
        t0 = time.perf_counter()
        yield
        if result_getter is not None:
            jax.block_until_ready(result_getter())
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
