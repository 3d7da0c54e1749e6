"""Runtime overflow observability for fixed-capacity sites.

Every dynamic-size structure in this framework is a fixed-capacity buffer +
validity mask (SURVEY §7 "static shapes everywhere"); overflow beyond a cap
is dropped deterministically. That is correct XLA design but a silent mAP
leak if a real point cloud exceeds a cap (reference capacity semantics:
hard_voxelize max_voxels/max_points, voxelization_cuda.cu:106-150). This
module makes every drop observable:

- ``record(name, count)`` is called inside jit at each capacity site with
  the number of dropped rows. It is a traced no-op unless
  ``MSMD_OVERFLOW_CHECK=1`` is set *before tracing* — zero cost by default.
- ``counters()`` returns the accumulated host-side {site: dropped_total}.
- bench.py and the real-data tests enable it, report the counters, and
  assert zero overflow on the reference demo scans.

Enabled-mode transport is ``jax.debug.callback`` (host callback per
execution); the accumulation is thread-safe.
"""
from __future__ import annotations

import os
import threading
from typing import Dict

import jax
import jax.numpy as jnp

_LOCK = threading.Lock()
_COUNTS: Dict[str, int] = {}


def enabled() -> bool:
    return os.environ.get('MSMD_OVERFLOW_CHECK', '0') == '1'


def _accumulate(name: str, count) -> None:
    c = int(count)
    if c == 0:
        return
    with _LOCK:
        _COUNTS[name] = _COUNTS.get(name, 0) + c


def record(name: str, count) -> None:
    """Accumulate a scalar dropped-row count under ``name`` (jit-safe).

    ``count`` may be a traced scalar. No-op unless MSMD_OVERFLOW_CHECK=1
    was set before the enclosing function was traced.
    """
    if not enabled():
        return
    jax.debug.callback(
        lambda c, _n=name: _accumulate(_n, c),
        jnp.asarray(count, jnp.int32))


def counters() -> Dict[str, int]:
    """Snapshot of accumulated per-site dropped-row totals."""
    with _LOCK:
        return dict(_COUNTS)


def reset() -> None:
    with _LOCK:
        _COUNTS.clear()


def total() -> int:
    with _LOCK:
        return sum(_COUNTS.values())
