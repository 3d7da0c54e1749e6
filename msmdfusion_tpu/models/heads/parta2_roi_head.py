"""Part-A2 RoI head: part-aware RoI pooling + box refinement.

TPU-native re-design of mmdet3d/models/roi_heads/part_aggregation_roi_head.py
:316 (+ parta2_bbox_head.py:622): fixed-capacity proposal sets, RoI-aware
max/avg pooling of per-voxel part features onto a per-box grid
(ops.sampling.roiaware_pool3d replaces the CUDA roiaware_pool3d), dense 3D
conv stack over the pooled grid (small and regular — ideal MXU work), fc
branches for class-agnostic confidence + box residual refinement.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.coders import DeltaXYZWLHRBBoxCoder
from ...ops.sampling import roiaware_pool3d
from ...registry import HEADS
from ..layers import MLP, MaskedBatchNorm, torch_conv_init
from ..losses import binary_cross_entropy, smooth_l1_loss


@HEADS.register('PartAggregationROIHead')
class PartAggregationROIHead(nn.Module):
    num_classes: int = 3
    roi_grid: Tuple[int, int, int] = (14, 14, 14)
    in_channels: int = 16
    conv_channels: Sequence[int] = (128, 128)
    fc_channels: Sequence[int] = (256, 256)
    train_cfg: Any = None
    test_cfg: Any = None

    @nn.compact
    def __call__(self, seg_points, seg_feats, seg_valid, rois, roi_valid,
                 train: bool = False):
        """Refine proposals.

        Args:
            seg_points: [P, 3] voxel centers at full resolution.
            seg_feats: [P, C] per-voxel features (SparseUNet seg output).
            rois: [R, 7] proposal boxes; roi_valid [R].
        Returns:
            dict cls_score [R, 1], bbox_pred [R, 7].
        """
        pooled = roiaware_pool3d(
            seg_points, jnp.where(seg_valid[:, None], seg_feats, 0), rois,
            self.roi_grid, mode='max')            # [R, gx, gy, gz, C]
        x = pooled
        for i, c in enumerate(self.conv_channels):
            x = nn.Conv(c, (3, 3, 3), padding=1, use_bias=False,
                        kernel_init=torch_conv_init, name=f'conv_{i}')(x)
            x = MaskedBatchNorm(name=f'bn_{i}')(x, train=train)
            x = jnp.maximum(x, 0)
            x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = x.reshape(x.shape[0], -1)
        for i, c in enumerate(self.fc_channels):
            x = nn.Dense(c, kernel_init=torch_conv_init,
                         name=f'fc_{i}')(x)
            x = jnp.maximum(x, 0)
        cls_score = nn.Dense(1, kernel_init=torch_conv_init,
                             name='cls_out')(x)
        bbox_pred = nn.Dense(7, kernel_init=torch_conv_init,
                             name='reg_out')(x)
        return {'cls_score': cls_score, 'bbox_pred': bbox_pred,
                'rois': rois, 'roi_valid': roi_valid}

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """IoU-supervised confidence + corner-aligned residual regression."""
        from ...core.iou3d import boxes_iou_3d
        rois = preds['rois']
        iou = boxes_iou_3d(rois, gt_bboxes[..., :7])
        iou = jnp.where(gt_valid[None, :], iou, 0)
        max_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        cls_tgt = jnp.clip((max_iou - 0.25) / 0.5, 0, 1)   # soft IoU target
        cls_loss = binary_cross_entropy(preds['cls_score'][:, 0], cls_tgt)
        cls_loss = jnp.where(preds['roi_valid'], cls_loss, 0).sum() / \
            jnp.maximum(preds['roi_valid'].sum(), 1)

        coder = DeltaXYZWLHRBBoxCoder()
        gt_for = jnp.take(gt_bboxes[..., :7], best_gt, axis=0)
        tgt = coder.encode(rois, gt_for)
        pos = (max_iou > 0.55) & preds['roi_valid']
        reg = smooth_l1_loss(preds['bbox_pred'], tgt).sum(-1)
        reg_loss = jnp.where(pos, reg, 0).sum() / jnp.maximum(pos.sum(), 1)
        return {'loss_roi_cls': cls_loss, 'loss_roi_bbox': reg_loss}

    def get_bboxes(self, preds):
        coder = DeltaXYZWLHRBBoxCoder()
        boxes = coder.decode(preds['rois'], preds['bbox_pred'])
        scores = jax.nn.sigmoid(preds['cls_score'][:, 0])
        return {'bboxes': boxes, 'scores': scores,
                'valid': preds['roi_valid']}
