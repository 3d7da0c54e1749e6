"""TransFusion detector (LiDAR-only voxel variant = TransFusion-L).

TPU-native re-design of mmdet3d/models/detectors/transfusion.py:18-215 on top
of the MVXTwoStageDetector assembly (mvx_two_stage.py:18-541): voxelize ->
HardSimpleVFE -> SparseEncoder -> SECOND -> SECONDFPN -> TransFusionHead,
with the whole step expressed as one jittable function over fixed-capacity
batch arrays instead of per-sample python loops.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.voxelize import voxelize_batch, voxelize_mean_batch
from ...registry import (BACKBONES, DETECTORS, HEADS, MIDDLE_ENCODERS, NECKS,
                         VOXEL_ENCODERS)


@DETECTORS.register('TransFusionDetector')
class TransFusionDetector(nn.Module):
    """LiDAR (+ optional camera fusion) detector.

    With img_backbone/img_neck configured and the head's fuse_img=True this
    is the reference's simple LC variant (transfusion.py:18-215): FPN
    level-0 image features feed the head's image cross-attention.
    """
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    freeze_img: bool = True
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.voxel_encoder = VOXEL_ENCODERS.build(dict(self.pts_voxel_encoder))
        self.middle_encoder = MIDDLE_ENCODERS.build(
            dict(self.pts_middle_encoder))
        self.backbone = BACKBONES.build(dict(self.pts_backbone))
        self.neck = NECKS.build(dict(self.pts_neck)) if self.pts_neck else None
        self.backbone_img = (BACKBONES.build(dict(self.img_backbone))
                             if self.img_backbone else None)
        self.neck_img = (NECKS.build(dict(self.img_neck))
                         if self.img_neck else None)
        head_cfg = dict(self.pts_bbox_head)
        head_cfg['train_cfg'] = (dict(self.train_cfg['pts'])
                                 if self.train_cfg else None)
        head_cfg['test_cfg'] = dict(self.test_cfg['pts'])
        self.bbox_head = HEADS.build(head_cfg)

    def voxelize(self, points, points_mask, train: bool):
        vl = self.pts_voxel_layer
        max_voxels = vl['max_voxels']
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0] if train else max_voxels[1]
        return voxelize_batch(
            points, points_mask, vl['voxel_size'], vl['point_cloud_range'],
            vl['max_num_points'], max_voxels)

    def extract_pts_feat(self, points, points_mask, train: bool = False):
        vl = self.pts_voxel_layer
        batch_size = points.shape[0]
        if self.pts_voxel_encoder['type'] == 'HardSimpleVFE':
            # fused voxelize+mean (one sort, sorted rows)
            max_voxels = vl['max_voxels']
            if isinstance(max_voxels, (tuple, list)):
                max_voxels = max_voxels[0] if train else max_voxels[1]
            voxel_features, coors, valid = voxelize_mean_batch(
                points, points_mask, vl['voxel_size'],
                vl['point_cloud_range'], max_voxels * batch_size)
            x, encode_features = self.middle_encoder(
                voxel_features, coors, valid, batch_size, train=train,
                assume_sorted=True)
        else:
            voxels, num_points, coors, valid = self.voxelize(
                points, points_mask, train)
            voxel_features = self.voxel_encoder(voxels, num_points, coors)
            x, encode_features = self.middle_encoder(
                voxel_features, coors, valid, batch_size, train=train)
        feats = self.backbone(x, train=train)
        if self.neck is not None:
            feats = self.neck(feats, train=train)
        return feats, encode_features

    def __call__(self, points, points_mask, img=None, metas=None,
                 train: bool = False):
        """points [B, N, F] (+ optional img [B, V, H, W, 3] and metas dict
        with lidar2img) -> head predictions dict."""
        feats, _ = self.extract_pts_feat(points, points_mask, train=train)
        img_inputs = None
        if img is not None and self.backbone_img is not None:
            b, v = img.shape[:2]
            img_train = train and not self.freeze_img
            img_feats = self.backbone_img(
                img.reshape(b * v, *img.shape[2:]), train=img_train)
            if self.neck_img is not None:
                img_feats = self.neck_img(img_feats, train=img_train)
            lvl0 = img_feats[0]
            img_inputs = lvl0.reshape(b, v, *lvl0.shape[1:])
        return self.bbox_head(feats[0], img_inputs=img_inputs, metas=metas,
                              train=train)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        return self.bbox_head.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)

    def forward_train(self, points, points_mask, gt_bboxes, gt_labels,
                      gt_valid):
        preds = self(points, points_mask, train=True)
        return self.loss(preds, gt_bboxes, gt_labels, gt_valid)

    def simple_test(self, points, points_mask):
        preds = self(points, points_mask, train=False)
        return self.get_bboxes(preds)
