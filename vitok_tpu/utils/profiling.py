"""Profiling & observability: traces, timers, analytic MFU, FLOP counting.

The reference has only manual ``perf_counter`` + ``cuda.synchronize`` fences
and an inline MFU formula (SURVEY.md §5.1). TPU-native upgrades:

* ``trace(...)`` — context manager around ``jax.profiler`` writing xplane
  traces viewable in TensorBoard/XProf,
* ``DeviceTimer`` — wall timing with proper device fences,
* ``mfu(...)`` — analytic model-FLOPs-utilization against per-chip peak
  (reference formula 6*N*tokens/s / peak, train_vae.py:406-412),
* ``flops_of(fn, *args)`` — XLA cost analysis of a jitted function, the
  analog of torch's FlopCounterMode used in the reference's perf tests
  (tests/gpu/test_float8_inference.py:186-202).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax

# Per-chip dense peak FLOP/s (bf16) by platform generation.
PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "h100": 989e12,   # reference comparison point (train_vae.py:411)
    "a100": 312e12,
}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vitok_trace", host: bool = True):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class DeviceTimer:
    """Wall-clock timer with device-completion fences.

    The analog of the reference's cuda.synchronize + perf_counter discipline
    (eval_vae.py:133-149).
    """

    def __init__(self):
        self.total = 0.0
        self.count = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1

    def fence(self, value: Any) -> Any:
        """Block on a pytree of device arrays, then stop the clock."""
        jax.block_until_ready(value)
        return value

    @property
    def mean_s(self) -> float:
        return self.total / max(self.count, 1)


def mfu(
    n_params: int,
    tokens_per_s: float,
    n_chips: int = 1,
    peak: str | float = "v5e",
    training: bool = True,
) -> float:
    """Analytic MFU: ``k * N * tokens/s / (peak * chips)``; k=6 train, 2 infer."""
    if isinstance(peak, str):
        peak = PEAK_FLOPS[peak]
    k = 6.0 if training else 2.0
    return k * n_params * tokens_per_s / (peak * n_chips)


def flops_of(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """XLA cost analysis (flops / bytes accessed) of a jitted callable."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns per-device list
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", 0.0)),
        "bytes_accessed": float(analysis.get("bytes accessed", 0.0)),
    }


def device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats (bytes) where the backend exposes them."""
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
        except Exception:
            out[str(d)] = {}
    return out


__all__ = [
    "trace",
    "DeviceTimer",
    "mfu",
    "flops_of",
    "device_memory_stats",
    "PEAK_FLOPS",
]
