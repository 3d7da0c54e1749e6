"""Part-A2 RoI head: dual-branch part-aware pooling + canonical refinement.

TPU-native re-design of
mmdet3d/models/roi_heads/part_aggregation_roi_head.py:12-316 +
roi_heads/bbox_heads/parta2_bbox_head.py:17-622:

- part features (intra-object part coords + seg score) are AVG-pooled and
  seg features MAX-pooled onto the RoI grid (RoIAware pooling;
  ops.sampling.roiaware_pool3d replaces the CUDA kernel);
- each branch runs its own conv stack, is merged, 2x max-pooled and
  down-convolved — the reference uses sparse convs on the pooled grids,
  but a pooled [R, 14^3, C] grid is DENSE and regular, so dense 3D convs
  are the MXU-native form;
- shared FCs + dropout feed class-agnostic confidence and box residuals
  regressed in the ROI-CANONICAL frame (translate to the RoI center,
  rotate by -(ry + pi/2), orientation flipped into (-pi/2, pi/2)) exactly
  like _get_target_single (parta2_bbox_head.py:388-480);
- the loss is soft-IoU-labelled BCE + smooth-L1 on canonical residuals +
  the flip-invariant corner loss (get_corner_loss_lidar :482-530).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.coders import DeltaXYZWLHRBBoxCoder
from ...ops.sampling import roiaware_pool3d
from ...registry import HEADS
from ..layers import MaskedBatchNorm, torch_conv_init
from ..losses import binary_cross_entropy, smooth_l1_loss


def canonical_transform(boxes, roi):
    """World-frame boxes -> the RoI's canonical frame (reference :416-436)."""
    roi_ry = jnp.mod(roi[..., 6], 2 * np.pi)
    ct = boxes.at[..., 0:3].add(-roi[..., 0:3])
    ang = -(roi_ry + np.pi / 2)
    c, s = jnp.cos(ang), jnp.sin(ang)
    x = ct[..., 0] * c - ct[..., 1] * s
    y = ct[..., 0] * s + ct[..., 1] * c
    ct = ct.at[..., 0].set(x).at[..., 1].set(y)
    ry = jnp.mod(ct[..., 6] - roi_ry, 2 * np.pi)
    opposite = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
    ry = jnp.where(opposite, jnp.mod(ry + np.pi, 2 * np.pi), ry)
    ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    ry = jnp.clip(ry, -np.pi / 2, np.pi / 2)
    return ct.at[..., 6].set(ry)


def decanonicalize(boxes_ct, roi):
    """Inverse of canonical_transform for decoded predictions (:337-355)."""
    roi_ry = jnp.mod(roi[..., 6], 2 * np.pi)
    ang = roi_ry + np.pi / 2
    c, s = jnp.cos(ang), jnp.sin(ang)
    x = boxes_ct[..., 0] * c - boxes_ct[..., 1] * s
    y = boxes_ct[..., 0] * s + boxes_ct[..., 1] * c
    out = boxes_ct.at[..., 0].set(x).at[..., 1].set(y)
    out = out.at[..., 0:3].add(roi[..., 0:3])
    return out.at[..., 6].add(roi_ry)


def corner_loss_lidar(pred, gt, delta: float = 1.0):
    """Flip-invariant Huber corner loss (reference :482-530): [N] loss."""
    from ...core.boxes import corners_3d
    pred_c = corners_3d(pred)
    gt_c = corners_3d(gt)
    gt_flip = gt.at[..., 6].add(np.pi)
    gt_cf = corners_3d(gt_flip)
    d = jnp.minimum(jnp.linalg.norm(pred_c - gt_c, axis=-1),
                    jnp.linalg.norm(pred_c - gt_cf, axis=-1))   # [N, 8]
    abs_e = jnp.abs(d)
    huber = jnp.where(abs_e < delta, 0.5 * abs_e ** 2 / delta,
                      abs_e - 0.5 * delta)
    return huber.mean(axis=-1)


@HEADS.register('PartAggregationROIHead')
class PartAggregationROIHead(nn.Module):
    num_classes: int = 3
    roi_grid: Tuple[int, int, int] = (14, 14, 14)
    in_channels: int = 16
    part_in_channels: int = 4
    seg_conv_channels: Sequence[int] = (64, 64)
    part_conv_channels: Sequence[int] = (64, 64)
    merge_conv_channels: Sequence[int] = (128, 128)
    down_conv_channels: Sequence[int] = (128, 256)
    shared_fc_channels: Sequence[int] = (256, 512)
    cls_channels: Sequence[int] = (256, 256)
    reg_channels: Sequence[int] = (256, 256)
    dropout_ratio: float = 0.1
    with_corner_loss: bool = True
    train_cfg: Any = None
    test_cfg: Any = None

    @nn.compact
    def __call__(self, seg_points, seg_feats, seg_valid, rois, roi_valid,
                 part_feats=None, train: bool = False):
        """Refine proposals.

        Args:
            seg_points: [P, 3] voxel centers (full resolution).
            seg_feats: [P, C] per-voxel seg features (SparseUNet output).
            part_feats: [P, Cp] part predictions (3 part coords + score);
                zeros when the detector has no semantic branch.
            rois: [R, 7] proposals; roi_valid [R].
        """
        seg_feats = jnp.where(seg_valid[:, None], seg_feats, 0)
        if part_feats is None:
            part_feats = jnp.zeros(
                (seg_feats.shape[0], self.part_in_channels), seg_feats.dtype)
        part_feats = jnp.where(seg_valid[:, None], part_feats, 0)
        pooled_part = roiaware_pool3d(seg_points, part_feats, rois,
                                      self.roi_grid, mode='avg')
        pooled_seg = roiaware_pool3d(seg_points, seg_feats, rois,
                                     self.roi_grid, mode='max')

        def conv_stack(x, channels, prefix):
            for i, c in enumerate(channels):
                x = nn.Conv(c, (3, 3, 3), padding=1, use_bias=False,
                            kernel_init=torch_conv_init,
                            name=f'{prefix}_{i}')(x)
                x = MaskedBatchNorm(name=f'{prefix}_bn_{i}')(x, train=train)
                x = jnp.maximum(x, 0)
            return x

        xp = conv_stack(pooled_part, self.part_conv_channels, 'part_conv')
        xs = conv_stack(pooled_seg, self.seg_conv_channels, 'seg_conv')
        x = jnp.concatenate([xp, xs], axis=-1)
        x = conv_stack(x, self.merge_conv_channels, 'merge_conv')
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = conv_stack(x, self.down_conv_channels, 'down_conv')
        x = x.reshape(x.shape[0], -1)
        for i, c in enumerate(self.shared_fc_channels):
            x = nn.Dense(c, kernel_init=torch_conv_init,
                         name=f'shared_fc_{i}')(x)
            x = jnp.maximum(x, 0)
            if i == len(self.shared_fc_channels) - 1 and train:
                x = nn.Dropout(self.dropout_ratio, deterministic=False)(x)
        xc = x
        for i, c in enumerate(self.cls_channels):
            xc = nn.Dense(c, kernel_init=torch_conv_init,
                          name=f'cls_fc_{i}')(xc)
            xc = jnp.maximum(xc, 0)
        cls_score = nn.Dense(1, kernel_init=torch_conv_init,
                             name='cls_out')(xc)
        xr = x
        for i, c in enumerate(self.reg_channels):
            xr = nn.Dense(c, kernel_init=torch_conv_init,
                          name=f'reg_fc_{i}')(xr)
            xr = jnp.maximum(xr, 0)
        bbox_pred = nn.Dense(7, kernel_init=torch_conv_init,
                             name='reg_out')(xr)
        return {'cls_score': cls_score, 'bbox_pred': bbox_pred,
                'rois': rois, 'roi_valid': roi_valid}

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Soft-IoU confidence + canonical-frame regression + corner loss
        (reference parta2_bbox_head.py:283-355, :388-480)."""
        from ...core.iou3d import boxes_iou_3d
        tc = dict(self.train_cfg or {})
        cls_pos = tc.get('cls_pos_thr', 0.75)
        cls_neg = tc.get('cls_neg_thr', 0.25)
        reg_pos = tc.get('pos_iou_thr', 0.55)

        rois = preds['rois']
        iou = boxes_iou_3d(rois, gt_bboxes[..., :7])
        iou = jnp.where(gt_valid[None, :], iou, 0)
        max_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        # soft interval labels (reference _get_target_single :404-410)
        label = jnp.where(max_iou > cls_pos, 1.0,
                          jnp.where(max_iou < cls_neg, 0.0,
                                    max_iou * 2 - 0.5))
        cls_loss = binary_cross_entropy(preds['cls_score'][:, 0],
                                        jnp.clip(label, 0, 1))
        cls_loss = jnp.where(preds['roi_valid'], cls_loss, 0).sum() / \
            jnp.maximum(preds['roi_valid'].sum(), 1)

        gt_for = jnp.take(gt_bboxes[..., :7], best_gt, axis=0)
        gt_ct = canonical_transform(gt_for, rois)
        roi_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        coder = DeltaXYZWLHRBBoxCoder()
        tgt = coder.encode(roi_anchor, gt_ct)
        pos = (max_iou > reg_pos) & preds['roi_valid']
        reg = smooth_l1_loss(preds['bbox_pred'], tgt,
                             beta=1.0 / 9.0).sum(-1)
        reg_loss = jnp.where(pos, reg, 0).sum() / jnp.maximum(pos.sum(), 1)
        losses = {'loss_roi_cls': cls_loss, 'loss_roi_bbox': reg_loss * 2.0}
        if self.with_corner_loss:
            pred_ct = coder.decode(roi_anchor, preds['bbox_pred'])
            pred_world = decanonicalize(pred_ct, rois)
            corner = corner_loss_lidar(pred_world, gt_for)
            losses['loss_roi_corner'] = \
                jnp.where(pos, corner, 0).sum() / jnp.maximum(pos.sum(), 1)
        return losses

    def get_bboxes(self, preds):
        """Decode canonical residuals back to the world frame (:337-355)."""
        rois = preds['rois']
        roi_anchor = jnp.concatenate(
            [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
             jnp.zeros_like(rois[..., 6:7])], axis=-1)
        coder = DeltaXYZWLHRBBoxCoder()
        boxes_ct = coder.decode(roi_anchor, preds['bbox_pred'])
        boxes = decanonicalize(boxes_ct, rois)
        scores = jax.nn.sigmoid(preds['cls_score'][:, 0])
        return {'bboxes': boxes, 'scores': scores,
                'valid': preds['roi_valid']}
