"""FLOPs / params counting.

TPU-native equivalent of mmdet3d/apis/flops_counter.py:1-27 (thop profiling
with a custom sparse-conv MAC hook): uses XLA's own compiled cost analysis,
which inherently counts the gather-GEMM sparse convs at their true MAC
count (rulebook-pairs x Cin x Cout equivalent).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax


def count_flops(fn: Callable, *example_args) -> Dict[str, Any]:
    """Compiler-reported cost for one call of a jittable function."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        'flops': float(analysis.get('flops', -1)),
        'bytes_accessed': float(analysis.get('bytes accessed', -1)),
        'gflops': float(analysis.get('flops', 0)) / 1e9,
    }


def count_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
