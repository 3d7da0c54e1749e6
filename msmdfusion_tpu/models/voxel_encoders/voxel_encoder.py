"""Voxel feature encoders.

TPU-native equivalents of mmdet3d/models/voxel_encoders/voxel_encoder.py
(HardSimpleVFE:14-46, DynamicSimpleVFE:50, HardVFE:289) and
pillar_encoder.py (PillarFeatureNet:11-308 with PFNLayer from
voxel_encoders/utils.py). All operate on fixed-capacity voxel buffers with
validity masks instead of dynamic (N, P, C) tensors.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import VOXEL_ENCODERS
from ..layers import MaskedBatchNorm, torch_conv_init


@VOXEL_ENCODERS.register('HardSimpleVFE')
class HardSimpleVFE(nn.Module):
    """Mean of the (<= max_points) points inside each voxel."""
    num_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points, coors=None):
        """voxels [V, P, F], num_points [V] -> [V, F]."""
        total = jnp.sum(voxels, axis=1)
        return total / jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None]


def hard_simple_vfe(voxels, num_points):
    """Functional form of HardSimpleVFE (no params)."""
    total = jnp.sum(voxels, axis=1)
    return total / jnp.maximum(num_points, 1).astype(voxels.dtype)[:, None]


class PFNLayer(nn.Module):
    """Pillar Feature Net layer: linear + BN + relu + (max-aggregate).

    Reference: mmdet3d/models/voxel_encoders/utils.py PFNLayer.
    """
    out_channels: int
    last_layer: bool = False
    norm_eps: float = 1e-3
    norm_momentum: float = 0.01

    @nn.compact
    def __call__(self, inputs, point_mask, train: bool = False):
        units = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(units, use_bias=False, kernel_init=torch_conv_init)(inputs)
        x = MaskedBatchNorm(momentum=self.norm_momentum, eps=self.norm_eps)(
            x, mask=point_mask, train=train)
        x = jnp.maximum(x, 0)
        x = jnp.where(point_mask[..., None], x, -jnp.inf)
        x_max = jnp.max(x, axis=1, keepdims=True)      # [V, 1, C]
        x_max = jnp.where(jnp.isfinite(x_max), x_max, 0)
        if self.last_layer:
            return x_max[:, 0]
        x = jnp.where(point_mask[..., None], x, 0)
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)


@VOXEL_ENCODERS.register('PillarFeatureNet')
class PillarFeatureNet(nn.Module):
    """Decorate pillar points with cluster/center offsets, run PFN layers.

    Reference: mmdet3d/models/voxel_encoders/pillar_encoder.py:11-308.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4.0)
    point_cloud_range: Tuple[float, ...] = (0., -40., -3., 70.4, 40., 1.)
    legacy: bool = True

    @nn.compact
    def __call__(self, voxels, num_points, coors, train: bool = False):
        """voxels [V, P, F], num_points [V], coors [V, 4] (b, z, y, x)."""
        v, p, f = voxels.shape
        point_mask = (jnp.arange(p)[None, :] <
                      num_points[:, None])              # [V, P]
        features = [voxels]
        if self.with_cluster_center:
            mean = (jnp.sum(voxels[..., :3] *
                            point_mask[..., None], axis=1, keepdims=True) /
                    jnp.maximum(num_points, 1)[:, None, None])
            features.append(voxels[..., :3] - mean)
        if self.with_voxel_center:
            vx, vy, vz = self.voxel_size
            x0, y0, z0 = self.point_cloud_range[:3]
            cx = voxels[..., 0:1] - (
                coors[:, 3].astype(voxels.dtype)[:, None, None] * vx +
                (vx / 2 + x0))
            cy = voxels[..., 1:2] - (
                coors[:, 2].astype(voxels.dtype)[:, None, None] * vy +
                (vy / 2 + y0))
            cz = voxels[..., 2:3] - (
                coors[:, 1].astype(voxels.dtype)[:, None, None] * vz +
                (vz / 2 + z0))
            features.append(jnp.concatenate([cx, cy, cz], axis=-1))
        if self.with_distance:
            features.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                            keepdims=True))
        x = jnp.concatenate(features, axis=-1)
        x = jnp.where(point_mask[..., None], x, 0)
        n = len(self.feat_channels)
        for i, c in enumerate(self.feat_channels):
            x = PFNLayer(c, last_layer=(i == n - 1))(x, point_mask,
                                                     train=train)
        return x  # [V, C]
