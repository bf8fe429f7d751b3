"""Profiling: FLOPs/param counting + trace capture.

Replaces the reference's thop-based ``CalParams`` (core/utils/utils.py:41-54)
with XLA's own cost model (``jit(...).lower().compile().cost_analysis()``) and
the wall-clock meters with ``jax.profiler`` traces viewable in TensorBoard /
Perfetto (SURVEY §5 tracing).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cal_params(fn: Callable, *example_args) -> Dict[str, float]:
    """FLOPs + memory traffic of a jitted callable (CalParams equivalent)."""
    lowered = jax.jit(fn).lower(*example_args)
    analysis = lowered.compile().cost_analysis() or {}
    flops = float(analysis.get("flops", 0.0))
    bytes_accessed = float(analysis.get("bytes accessed", 0.0))
    return {"flops": flops, "gflops": flops / 1e9,
            "bytes_accessed": bytes_accessed}


def clever_format(value: float, suffix: str = "") -> str:
    for unit in ("", "K", "M", "G", "T", "P"):
        if abs(value) < 1000:
            return f"{value:.3f}{unit}{suffix}"
        value /= 1000
    return f"{value:.3f}E{suffix}"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; open the dump with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def print_model_stats(fn: Callable, params, *example_args, logger=None) -> Dict:
    stats = cal_params(fn, *example_args)
    n_params = count_params(params)
    lines = [
        "[Statistics Information]",
        f"FLOPs: {clever_format(stats['flops'])}",
        f"Params: {clever_format(n_params)}",
    ]
    out = {**stats, "params": n_params}
    for line in lines:
        (logger.info if logger else print)(line)
    return out
