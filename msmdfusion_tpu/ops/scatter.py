"""Segment scatter/reduce ops.

TPU-native equivalents of the torch_scatter-based helpers
(mmdet3d/ops/centerfusion/centerfusion_ops.py:12-92 ``scatter_v2`` /
``build_mlp``) and core/utils/scatter.py: thin wrappers over
jax.ops.segment_* with fixed segment counts and validity masks.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def scatter_v2(feats, segment_ids, num_segments: int, mode: str = 'max',
               valid=None):
    """Segment reduce with mask support.

    Args:
        feats: [N, C]; segment_ids: [N] int; mode: 'max'|'mean'|'sum'.
    Returns:
        (reduced [num_segments, C], segment_valid [num_segments]).
    """
    if valid is not None:
        segment_ids = jnp.where(valid, segment_ids, num_segments)
    counts = jax.ops.segment_sum(
        jnp.ones_like(segment_ids, jnp.float32), segment_ids,
        num_segments=num_segments + 1)[:num_segments]
    seg_valid = counts > 0
    if mode == 'sum':
        out = jax.ops.segment_sum(feats, segment_ids,
                                  num_segments=num_segments + 1)[:num_segments]
    elif mode == 'mean':
        s = jax.ops.segment_sum(feats, segment_ids,
                                num_segments=num_segments + 1)[:num_segments]
        out = s / jnp.maximum(counts[:, None], 1)
    elif mode == 'max':
        out = jax.ops.segment_max(feats, segment_ids,
                                  num_segments=num_segments + 1)[:num_segments]
        out = jnp.where(jnp.isfinite(out) & seg_valid[:, None], out, 0)
    else:
        raise ValueError(mode)
    return out, seg_valid
