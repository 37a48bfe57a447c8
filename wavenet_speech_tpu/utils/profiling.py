"""Profiling / tracing utilities (new vs the reference, which had a single
timeit micro-bench — SURVEY.md §5): jax.profiler trace capture, a step
timer with proper device synchronization, and a model-FLOPs estimator for
MFU reporting.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterable, Optional

import jax
import numpy as np

# v5e peak dense TFLOP/s (bf16); used for MFU reporting
TPU_PEAK_TFLOPS = {"bf16": 197.0, "f32": 49.0}


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times jitted steps with a value-readback sync (block_until_ready on
    donated outputs can return early through the remote-dispatch path; a
    readback is authoritative)."""

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            float(np.asarray(jax.device_get(sync_value)).ravel()[0])
        self.times.append(time.perf_counter() - t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def percentile(self, q: float) -> float:
        return float(np.percentile(self.times, q)) if self.times else float("nan")


def conv_stack_flops(layers: Iterable, seq_len: int, batch: int,
                     train: bool = True, remat: bool = False) -> float:
    """Approximate FLOPs of one step over a SkipSumStack layer list
    [(c_in, c_out, k, d)]: gate conv + fused 1x1 + residual + bottleneck.

    train=True multiplies by 3 (fwd + bwd) — STRICT model FLOPs: MFU by
    definition excludes rematerialization recompute. remat=True adds one
    extra forward; use it only for hardware-FLOPs-utilization reporting
    (how busy the MXU actually is), never for the headline MFU number.
    """
    per_frame = 0.0
    for (c_in, c_out, k, _d) in layers:
        per_frame += 2 * (k * c_in * 2 * c_out    # fused gate conv
                          + c_out * 2 * c_out     # fused residual/skip 1x1
                          + c_in * c_out          # dense residual proj
                          + c_out * c_out)        # skip bottleneck (approx)
    total = per_frame * seq_len * batch
    if train:
        total *= 3
        if remat:
            total += per_frame * seq_len * batch
    return total


def mfu(flops_per_step: float, step_seconds: float,
        dtype: str = "bf16") -> float:
    """Model FLOPs utilization vs chip peak. Pass STRICT model FLOPs
    (3x fwd, no remat recompute); for the includes-recompute number use
    the same function but name the result hw_flops_util."""
    peak = TPU_PEAK_TFLOPS[dtype] * 1e12
    return flops_per_step / step_seconds / peak
