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


@VOXEL_ENCODERS.register('HardVFE')
class HardVFE(nn.Module):
    """Hard VFE with feature augmentation + stacked VFE layers.

    Reference: mmdet3d/models/voxel_encoders/voxel_encoder.py:289-491
    (HardVFE): augment per-point features with the cluster-center offset,
    voxel-center offset and/or distance, run Dense+BN+ReLU VFE layers with
    per-voxel maxpool concat between layers, and maxpool to voxel features.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coors=None, train: bool = False):
        """voxels [V, P, D], num_points [V], coors [V, 4] (b, z, y, x)."""
        v, p, _ = voxels.shape
        mask = (jnp.arange(p)[None, :] < num_points[:, None])
        feats = [voxels]
        if self.with_cluster_center:
            mean = (voxels[..., :3] * mask[..., None]).sum(1) / jnp.maximum(
                num_points[:, None], 1)
            feats.append(voxels[..., :3] - mean[:, None, :])
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size)
            pcr = jnp.asarray(self.point_cloud_range[:3])
            # coors are (batch, z, y, x); centers from the x/y/z indices
            ctr = (coors[:, [3, 2, 1]].astype(voxels.dtype) + 0.5) * vs + pcr
            feats.append(voxels[..., :3] - ctr[:, None, :])
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * mask[..., None]
        n_layers = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x.reshape(-1, ch)).reshape(
                v, p, ch)
            x = nn.relu(x)
            x = jnp.where(mask[..., None], x, 0)
            if i != n_layers - 1:
                vmax = jnp.max(jnp.where(mask[..., None], x, -jnp.inf),
                               axis=1)
                vmax = jnp.where(jnp.isfinite(vmax), vmax, 0)
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(vmax[:, None], x.shape)], axis=-1)
        out = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=1)
        return jnp.where(jnp.isfinite(out), out, 0)


@VOXEL_ENCODERS.register('DynamicVFE')
class DynamicVFE(nn.Module):
    """Dynamic VFE: per-point MLP + voxel scatter with feature augmentation.

    Reference voxel_encoder.py:89-288 (DynamicVFE): points carry their
    voxel assignment (no per-voxel cap); each layer concatenates the point
    feature with its voxel's pooled feature (gather-back), the scatter/
    gather pair being the DynamicScatter op.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    mode: str = 'max'

    @nn.compact
    def __call__(self, points, coords_zyx, valid, max_voxels: int,
                 train: bool = False):
        """points [N, D], coords_zyx [N, 3] voxel coords, valid [N].

        Returns (voxel_feats [V, C], voxel_coors [V, 3], voxel_valid [V]).
        """
        from ...ops.voxelize import dynamic_scatter
        pcr = self.point_cloud_range
        grid = (int(round((pcr[5] - pcr[2]) / self.voxel_size[2])),
                int(round((pcr[4] - pcr[1]) / self.voxel_size[1])),
                int(round((pcr[3] - pcr[0]) / self.voxel_size[0])))
        feats = [points]
        if self.with_cluster_center:
            mean, _, _, p2v = dynamic_scatter(
                points[:, :3], coords_zyx, valid, grid, max_voxels, 'mean')
            safe = jnp.maximum(p2v, 0)
            feats.append(points[:, :3] - jnp.where(
                (p2v >= 0)[:, None], mean[safe], 0))
        if self.with_voxel_center:
            vs = jnp.asarray(self.voxel_size)
            org = jnp.asarray(pcr[:3])
            ctr = (coords_zyx[:, [2, 1, 0]].astype(points.dtype) + 0.5) \
                * vs + org
            feats.append(points[:, :3] - ctr)
        if self.with_distance:
            feats.append(jnp.linalg.norm(points[:, :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * valid[:, None]
        n_layers = len(self.feat_channels)
        vfeats = vcoors = vvalid = None
        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
            x = nn.relu(x) * valid[:, None]
            vfeats, vcoors, vvalid, p2v = dynamic_scatter(
                x, coords_zyx, valid, grid, max_voxels, self.mode)
            if i != n_layers - 1:
                safe = jnp.maximum(p2v, 0)
                x = jnp.concatenate(
                    [x, jnp.where((p2v >= 0)[:, None], vfeats[safe], 0)],
                    axis=-1)
        return vfeats, vcoors, vvalid
