"""Profiling / tracing utilities.

TPU-native replacement for the reference's ad-hoc wall-clock probes
(tools/analysis_tools/benchmark.py:63-100 cuda.synchronize timing;
commented time.time() probes in MSMDFusion.py:590-592): jax.profiler traces
viewable in XProf/TensorBoard, named scopes for per-stage attribution, and
a min-of-N wall timer that is robust to the shared-TPU contention windows
observed on tunneled chips.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jax_trace'):
    """Capture a profiler trace around a block (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate ops for trace attribution (maps to XLA op metadata)."""
    return jax.named_scope(name)


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 3,
            percentile: str = 'min') -> Dict[str, float]:
    """Robust wall timing of a jitted function.

    Uses min/median across iterations: tunneled TPU chips show intermittent
    multi-tenant contention (identical ops measured 0.05ms vs 28ms), so a
    plain mean is meaningless.
    """
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {'min_s': float(arr.min()), 'median_s': float(np.median(arr)),
            'mean_s': float(arr.mean()), 'max_s': float(arr.max())}


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """Compiler-reported FLOP estimate for a jitted function."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get('flops', -1))
    except Exception:
        return None
