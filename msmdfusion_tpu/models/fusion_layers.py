"""Camera-LiDAR fusion layers.

TPU-native equivalents of mmdet3d/models/fusion_layers/:
- ``apply_3d_transformation`` (coord_transform.py:214): replay / invert the
  recorded 3D augmentation flow on point sets (used by the TransFusion image
  fusion and PointFusion);
- ``PointFusion`` (point_fusion.py:306): sample image features at projected
  point locations and fuse with point features;
- ``VoteFusion`` is indoor-specific (ImVoteNet) and approximated by the same
  projection + gather machinery.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import FUSION_LAYERS
from .layers import MLP, torch_conv_init


def apply_3d_transformation(points, aug_state: Dict[str, Any],
                            reverse: bool = False):
    """Replay (or invert) the recorded aug flow on [N, 3] points.

    aug_state mirrors the pipeline's record: {'angle', 'scale', 'trans',
    'flip_horizontal', 'flip_vertical'} (reference GlobalRotScaleTrans
    records transformation_3d_flow; coord_transform.py:214 replays it).
    """
    angle = aug_state.get('angle', 0.0)
    scale = aug_state.get('scale', 1.0)
    trans = jnp.asarray(aug_state.get('trans', (0.0, 0.0, 0.0)))
    flip_h = aug_state.get('flip_horizontal', False)
    flip_v = aug_state.get('flip_vertical', False)

    def rot(p, a):
        c, s = jnp.cos(a), jnp.sin(a)
        r = jnp.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], p.dtype)
        return p @ r

    if not reverse:
        points = rot(points, angle) * scale + trans
        if flip_h:
            points = points.at[:, 1].multiply(-1)
        if flip_v:
            points = points.at[:, 0].multiply(-1)
    else:
        if flip_v:
            points = points.at[:, 0].multiply(-1)
        if flip_h:
            points = points.at[:, 1].multiply(-1)
        points = rot((points - trans) / scale, -angle)
    return points


def project_points_to_image(points, lidar2img, img_hw,
                            img_scale_factor=None):
    """Project [N, 3] LiDAR points through a [4, 4] lidar2img matrix.

    Returns (uv [N, 2] in padded-image pixels, in_front+on-image mask [N]).
    """
    hom = jnp.concatenate([points, jnp.ones((points.shape[0], 1),
                                            points.dtype)], axis=-1)
    proj = hom @ lidar2img.T
    depth = proj[:, 2]
    uv = proj[:, :2] / jnp.maximum(depth[:, None], 1e-5)
    if img_scale_factor is not None:
        uv = uv * jnp.asarray(img_scale_factor)
    h, w = img_hw
    ok = (depth > 1e-5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
        (uv[:, 1] >= 0) & (uv[:, 1] < h)
    return uv, ok


@FUSION_LAYERS.register('PointFusion')
class PointFusion(nn.Module):
    """Decorate LiDAR points with sampled multi-level image features.

    Reference: fusion_layers/point_fusion.py:306.
    """
    img_channels: int = 256
    pts_channels: int = 64
    mid_channels: int = 128
    out_channels: int = 128
    img_levels: Sequence[int] = (0, 1, 2, 3, 4)
    align_corners: bool = False
    activate_out: bool = True
    fuse_out: bool = False

    @nn.compact
    def __call__(self, img_feats, points, pts_feats, lidar2img, img_hw,
                 train: bool = False):
        """img_feats: list of [V, h, w, C]; points [N, 3]; pts_feats [N, C].

        Single-sample; vmap externally for batches.
        """
        v = img_feats[0].shape[0]
        sampled = []
        for lvl in self.img_levels:
            feat = img_feats[lvl]
            fh, fw = feat.shape[1:3]
            per_view = []
            for vi in range(v):
                uv, ok = project_points_to_image(points, lidar2img[vi],
                                                 img_hw)
                scale = fw / img_hw[1]
                ui = jnp.clip((uv[:, 0] * scale).astype(jnp.int32), 0,
                              fw - 1)
                vvi = jnp.clip((uv[:, 1] * scale).astype(jnp.int32), 0,
                               fh - 1)
                g = feat[vi][vvi, ui]
                per_view.append(jnp.where(ok[:, None], g, 0))
            sampled.append(sum(per_view))
        img_pts = jnp.concatenate(sampled, axis=-1)
        img_proj = nn.Dense(self.mid_channels,
                            kernel_init=torch_conv_init)(img_pts)
        pts_proj = nn.Dense(self.mid_channels,
                            kernel_init=torch_conv_init)(pts_feats)
        fused = img_proj + pts_proj
        if self.activate_out:
            fused = jnp.maximum(fused, 0)
        if self.fuse_out:
            fused = nn.Dense(self.out_channels,
                             kernel_init=torch_conv_init)(fused)
            fused = jnp.maximum(fused, 0)
        return fused
