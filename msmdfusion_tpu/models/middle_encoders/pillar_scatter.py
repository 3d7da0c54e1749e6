"""Scatter pillar features onto a dense BEV canvas.

TPU-native equivalent of mmdet3d/models/middle_encoders/pillar_scatter.py:8-101
(``PointPillarsScatter``): one fused scatter with a spill row instead of the
per-sample python loop.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...registry import MIDDLE_ENCODERS


@MIDDLE_ENCODERS.register('PointPillarsScatter')
class PointPillarsScatter(nn.Module):
    in_channels: int = 64
    output_shape: Tuple[int, int] = (496, 432)  # (H=ny, W=nx)

    @nn.compact
    def __call__(self, voxel_features, coors, valid, batch_size: int,
                 train: bool = False):
        """voxel_features [K, C], coors [K, 4] (b, z, y, x) -> [B, H, W, C]."""
        h, w = self.output_shape
        c = voxel_features.shape[-1]
        flat = (coors[:, 0] * h + coors[:, 2]) * w + coors[:, 3]
        flat = jnp.where(valid, flat, batch_size * h * w)
        canvas = jnp.zeros((batch_size * h * w + 1, c), voxel_features.dtype)
        canvas = canvas.at[flat].set(voxel_features, mode='drop')
        return canvas[:-1].reshape(batch_size, h, w, c)
