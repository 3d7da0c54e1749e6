"""Single-stage LiDAR voxel detectors: VoxelNet / DynamicVoxelNet /
CenterPoint / MVXFasterRCNN-style assembly.

TPU-native equivalents of mmdet3d/models/detectors/voxelnet.py:17-128,
dynamic_voxelnet.py and centerpoint.py:8-197 — all share the
voxelize -> VFE -> middle encoder -> BEV backbone -> neck -> head pipeline
(mvx_two_stage.py:18-541 assembly), expressed as one jittable module.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import (dynamic_scatter, dynamic_voxelize,
                             voxelize_batch, voxelize_mean_batch)
from ...registry import (BACKBONES, DETECTORS, HEADS, MIDDLE_ENCODERS, NECKS,
                         VOXEL_ENCODERS)


class _VoxelDetectorBase(nn.Module):
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.voxel_encoder = VOXEL_ENCODERS.build(dict(self.pts_voxel_encoder))
        self.middle_encoder = MIDDLE_ENCODERS.build(
            dict(self.pts_middle_encoder))
        self.backbone = BACKBONES.build(dict(self.pts_backbone))
        self.neck = NECKS.build(dict(self.pts_neck)) if self.pts_neck else None
        head_cfg = dict(self.pts_bbox_head)
        head_cfg['train_cfg'] = (dict(self.train_cfg['pts'])
                                 if self.train_cfg and 'pts' in self.train_cfg
                                 else (dict(self.train_cfg)
                                       if self.train_cfg else None))
        tcfg = dict(self.test_cfg)
        head_cfg['test_cfg'] = dict(tcfg.get('pts', tcfg))
        self.bbox_head = HEADS.build(head_cfg)

    def extract_feat(self, points, points_mask, train: bool = False):
        vl = self.pts_voxel_layer
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        batch_size = points.shape[0]
        if self.pts_voxel_encoder['type'] == 'HardSimpleVFE':
            voxel_features, coors, valid = voxelize_mean_batch(
                points, points_mask, vl['voxel_size'],
                vl['point_cloud_range'], max_voxels * batch_size)
            x = self.middle_encoder(voxel_features, coors, valid,
                                    batch_size, train=train,
                                    assume_sorted=True)
        else:
            voxels, num_points, coors, valid = voxelize_batch(
                points, points_mask, vl['voxel_size'],
                vl['point_cloud_range'], vl['max_num_points'], max_voxels)
            voxel_features = self.voxel_encoder(voxels, num_points, coors,
                                                train=train) \
                if 'Pillar' in self.pts_voxel_encoder['type'] \
                else self.voxel_encoder(voxels, num_points, coors)
            x = self.middle_encoder(voxel_features, coors, valid,
                                    batch_size, train=train)
        if isinstance(x, tuple):
            x = x[0]
        feats = self.backbone(x, train=train)
        if self.neck is not None:
            feats = self.neck(feats, train=train)
        return feats

    def __call__(self, points, points_mask, train: bool = False):
        feats = self.extract_feat(points, points_mask, train=train)
        return self.bbox_head(feats[0], train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.bbox_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)


@DETECTORS.register('VoxelNet')
class VoxelNet(_VoxelDetectorBase):
    """SECOND-style single stage (reference voxelnet.py:17-128)."""


@DETECTORS.register('CenterPoint')
class CenterPoint(_VoxelDetectorBase):
    """CenterPoint voxel detector (reference centerpoint.py:8-197)."""


@DETECTORS.register('DynamicVoxelNet')
class DynamicVoxelNet(_VoxelDetectorBase):
    """Dynamic voxelization variant (reference dynamic_voxelnet.py)."""

    def extract_feat(self, points, points_mask, train: bool = False):
        vl = self.pts_voxel_layer
        b = points.shape[0]
        flat_pts = points.reshape(b * points.shape[1], -1)
        flat_mask = points_mask.reshape(-1)
        coords, valid = dynamic_voxelize(
            flat_pts, flat_mask, vl['voxel_size'], vl['point_cloud_range'])
        batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32),
                               points.shape[1])
        coords4 = jnp.concatenate([batch_ids[:, None], coords], axis=-1)
        vs = tuple(float(v) for v in vl['voxel_size'])
        pcr = tuple(float(v) for v in vl['point_cloud_range'])
        grid = (int(round((pcr[5] - pcr[2]) / vs[2])),
                int(round((pcr[4] - pcr[1]) / vs[1])),
                int(round((pcr[3] - pcr[0]) / vs[0])))
        bz = (b * grid[0], grid[1], grid[2])
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        # fold batch into z for the segment reduce, then unfold
        coords_folded = coords.at[:, 0].add(batch_ids * grid[0])
        feats, vcoors, vvalid, _ = dynamic_scatter(
            flat_pts, coords_folded, valid, bz, max_voxels, mode='mean')
        vb = vcoors[:, 0] // grid[0]
        vz = vcoors[:, 0] % grid[0]
        coors4 = jnp.stack([vb, vz, vcoors[:, 1], vcoors[:, 2]], axis=-1)
        coors4 = jnp.where(vvalid[:, None], coors4, -1)
        x = self.middle_encoder(feats, coors4, vvalid, b, train=train)
        if isinstance(x, tuple):
            x = x[0]
        feats_out = self.backbone(x, train=train)
        if self.neck is not None:
            feats_out = self.neck(feats_out, train=train)
        return feats_out
