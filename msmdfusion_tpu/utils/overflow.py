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

Two transports:

- ``capture()``: a trace-scoped context manager that collects the traced
  count scalars and hands them back as **function outputs** — zero runtime
  overhead, works on every backend (the axon TPU tunnel does NOT support
  host callbacks, so this is the only transport the real-chip bench can
  use). Scope it *inside* the function being jitted::

      @jax.jit
      def forward(x):
          with overflow.capture() as cap:
              out = model.apply(variables, x)
          return out, cap.counters()   # {site: traced int32 scalar}

- ``MSMD_OVERFLOW_CHECK=1`` env: ``jax.debug.callback`` per execution into
  a host-side accumulator (CPU-backend tests). No-op unless set *before
  tracing* — zero cost by default.
"""
from __future__ import annotations

import os
import threading
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

_LOCK = threading.Lock()
_COUNTS: Dict[str, int] = {}
_CAPTURE_STACK: List[List[Tuple[str, jax.Array]]] = []


class capture:
    """Collect traced overflow counts lexically (see module docstring)."""

    def __enter__(self):
        self._items: List[Tuple[str, jax.Array]] = []
        self._gauges: List[Tuple[str, jax.Array]] = []
        _CAPTURE_STACK.append(self)
        return self

    def __exit__(self, *exc):
        popped = _CAPTURE_STACK.pop()
        assert popped is self
        return False

    def counters(self) -> Dict[str, jax.Array]:
        """{site: int32 scalar} — summed per site, trace-safe outputs."""
        out: Dict[str, jax.Array] = {}
        for name, c in self._items:
            out[name] = out[name] + c if name in out else c
        return out

    def gauge_values(self) -> Dict[str, List[jax.Array]]:
        """{site: [int32 scalar, ...]} — one entry per gauge() call, in
        call order (capacity-probe observability; NOT drop counts)."""
        out: Dict[str, List[jax.Array]] = {}
        for name, v in self._gauges:
            out.setdefault(name, []).append(v)
        return out


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

    ``count`` may be a traced scalar. Inside a ``capture()`` scope the
    count is collected as a traced output; otherwise it is a no-op unless
    MSMD_OVERFLOW_CHECK=1 was set before the enclosing function was traced.
    """
    if _CAPTURE_STACK:
        _CAPTURE_STACK[-1]._items.append(
            (name, jnp.asarray(count, jnp.int32)))
        return
    if not enabled():
        return
    jax.debug.callback(
        lambda c, _n=name: _accumulate(_n, c),
        jnp.asarray(count, jnp.int32))


def gauge(name: str, value) -> None:
    """Record an occupancy/size GAUGE (not a drop count) under ``name``.

    Only collected inside a ``capture()`` scope (capacity-probe runs);
    otherwise free. Each call is kept as a separate entry so per-instance
    values (e.g. the 4 GMA-stage union sizes) stay distinguishable.
    """
    if _CAPTURE_STACK:
        _CAPTURE_STACK[-1]._gauges.append(
            (name, jnp.asarray(value, jnp.int32)))


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
