"""Anchor-based 3D head for SECOND / PointPillars.

TPU-native re-design of mmdet3d/models/dense_heads/anchor3d_head.py:15-510
(+ train_mixins.py): 1x1 conv branches for cls/reg/dir over dense anchors,
max-IoU assignment vectorized over the full anchor grid (no per-sample
python), focal + smooth-L1 + direction losses, multiclass-NMS decode.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.boxes import limit_period, xywhr2xyxyr
from ...core.iou3d import boxes_iou_bev
from ...core.nms import box3d_multiclass_nms
from ...registry import ANCHOR_GENERATORS, BBOX_CODERS, HEADS
from ..layers import torch_conv_init
from ..losses import (binary_cross_entropy, cross_entropy,
                      sigmoid_focal_loss, smooth_l1_loss)


@HEADS.register('Anchor3DHead')
class Anchor3DHead(nn.Module):
    num_classes: int = 3
    in_channels: int = 384
    feat_channels: int = 384
    use_direction_classifier: bool = True
    anchor_generator: Any = None
    assigner_per_size: bool = False
    assign_per_class: bool = False
    diff_rad_by_sin: bool = True
    dir_offset: float = 0.0
    dir_limit_offset: float = 1.0
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    loss_dir: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.coder = BBOX_CODERS.build(dict(self.bbox_coder or
                                            {'type': 'DeltaXYZWLHRBBoxCoder'}))
        self.anchor_gen = ANCHOR_GENERATORS.build(dict(self.anchor_generator))
        self.num_anchors = self.anchor_gen.num_base_anchors
        code = self.coder.code_size
        self.conv_cls = nn.Conv(self.num_anchors * self.num_classes, (1, 1),
                                kernel_init=torch_conv_init,
                                bias_init=nn.initializers.constant(-4.59512),
                                name='conv_cls')
        self.conv_reg = nn.Conv(self.num_anchors * code, (1, 1),
                                kernel_init=torch_conv_init, name='conv_reg')
        if self.use_direction_classifier:
            self.conv_dir = nn.Conv(self.num_anchors * 2, (1, 1),
                                    kernel_init=torch_conv_init,
                                    name='conv_dir_cls')

    def __call__(self, x, train: bool = False):
        """x [B, H, W, C] -> dict cls [B,H,W,A*K], bbox [B,H,W,A*code], dir."""
        out = {'cls_score': self.conv_cls(x), 'bbox_pred': self.conv_reg(x)}
        if self.use_direction_classifier:
            out['dir_cls'] = self.conv_dir(x)
        return out

    def _flat_anchors(self, feature_size):
        anchors = self.anchor_gen.grid_anchors(feature_size)  # [H, W, A, 7+]
        return jnp.asarray(anchors.reshape(-1, anchors.shape[-1]))

    # ------------------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Max-IoU assignment + focal/smooth-L1/dir losses."""
        tc = self.train_cfg
        cls = preds['cls_score']
        b, h, w, _ = cls.shape
        code = self.coder.code_size
        anchors = self._flat_anchors((h, w))                 # [M, 7+]
        m = anchors.shape[0]
        cls = cls.reshape(b, m, self.num_classes)
        reg = preds['bbox_pred'].reshape(b, m, code)
        dir_cls = preds.get('dir_cls')
        if dir_cls is not None:
            dir_cls = dir_cls.reshape(b, m, 2)

        anc_bev = jnp.concatenate(
            [anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]], axis=-1)

        def assign_one(gts, valid):
            gt_bev = jnp.concatenate(
                [gts[:, 0:2], gts[:, 3:5], gts[:, 6:7]], axis=-1)
            iou = boxes_iou_bev(anc_bev, gt_bev)             # [M, G]
            iou = jnp.where(valid[None, :], iou, -1.0)
            max_iou = jnp.max(iou, axis=1)
            argmax = jnp.argmax(iou, axis=1)
            pos = max_iou >= tc['pos_iou_thr']
            neg = (max_iou < tc['neg_iou_thr']) & (max_iou >= 0)
            # force-assign the best anchor of each gt
            best_anchor = jnp.argmax(iou, axis=0)            # [G]
            gt_best_iou = jnp.max(iou, axis=0)
            force = jnp.zeros((m,), bool).at[best_anchor].set(
                valid & (gt_best_iou > tc.get('min_pos_iou', 0.0)))
            forced_gt = jnp.zeros((m,), jnp.int32).at[best_anchor].set(
                jnp.arange(gts.shape[0], dtype=jnp.int32))
            assigned = jnp.where(force, forced_gt, argmax)
            pos = pos | force
            neg = neg & ~pos
            return assigned, pos, neg

        assigned, pos, neg = jax.vmap(assign_one)(gt_bboxes, gt_valid)
        gt_for = jnp.take_along_axis(gt_bboxes, assigned[..., None], axis=1)
        labels = jnp.take_along_axis(gt_labels, assigned, axis=1)
        labels = jnp.where(pos, labels, self.num_classes)
        weights = (pos | neg).astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(pos), 1)

        loss_cls = sigmoid_focal_loss(
            cls.reshape(-1, self.num_classes), labels.reshape(-1),
            self.num_classes,
            gamma=self.loss_cls.get('gamma', 2.0),
            alpha=self.loss_cls.get('alpha', 0.25))
        loss_cls = (loss_cls * weights.reshape(-1)).sum() / num_pos

        anc_b = jnp.broadcast_to(anchors[None], (b, m, anchors.shape[-1]))
        tgt = self.coder.encode(anc_b, gt_for[..., :anchors.shape[-1]])
        pred_box = reg
        if self.diff_rad_by_sin:
            # sin(a-b) trick: replace yaw residual channel
            ra = pred_box[..., 6]
            rt = tgt[..., 6]
            pred_sin = jnp.sin(ra) * jnp.cos(rt)
            tgt_sin = jnp.cos(ra) * jnp.sin(rt)
            pred_box = pred_box.at[..., 6].set(pred_sin)
            tgt = tgt.at[..., 6].set(tgt_sin)
        l1 = smooth_l1_loss(pred_box, tgt,
                            beta=self.loss_bbox.get('beta', 1.0 / 9.0))
        l1 = jnp.where(pos[..., None], l1, 0)
        loss_bbox = l1.sum() / num_pos * \
            self.loss_bbox.get('loss_weight', 1.0)

        losses = {'loss_cls': loss_cls *
                  self.loss_cls.get('loss_weight', 1.0),
                  'loss_bbox': loss_bbox}
        if dir_cls is not None:
            rot_gt = gt_for[..., 6] - anc_b[..., 6]
            dir_tgt = (limit_period(rot_gt - self.dir_offset, 0, 2 * np.pi)
                       >= np.pi).astype(jnp.int32)
            dce = cross_entropy(dir_cls.reshape(-1, 2), dir_tgt.reshape(-1), 2)
            dce = jnp.where(pos.reshape(-1), dce, 0)
            losses['loss_dir'] = dce.sum() / num_pos * \
                self.loss_dir.get('loss_weight', 1.0)
        return losses

    # ------------------------------------------------------------------
    def get_bboxes(self, preds):
        """Decode + multiclass NMS, fixed-capacity output."""
        tcfg = self.test_cfg
        cls = preds['cls_score']
        b, h, w, _ = cls.shape
        code = self.coder.code_size
        anchors = self._flat_anchors((h, w))
        m = anchors.shape[0]
        scores = jax.nn.sigmoid(cls.reshape(b, m, self.num_classes))
        reg = preds['bbox_pred'].reshape(b, m, code)
        dir_cls = preds.get('dir_cls')

        def decode_one(scores_s, reg_s, dir_s):
            top = jnp.max(scores_s, axis=-1)
            k = min(tcfg.get('nms_pre', 1000), m)
            _, idx = jax.lax.top_k(top, k)
            anc = anchors[idx]
            boxes = self.coder.decode(anc, reg_s[idx])
            if dir_s is not None:
                dir_label = jnp.argmax(dir_s[idx], axis=-1)
                yaw = limit_period(boxes[..., 6] - self.dir_offset,
                                   self.dir_limit_offset, np.pi)
                boxes = boxes.at[..., 6].set(
                    yaw + self.dir_offset + np.pi * dir_label)
            bev = xywhr2xyxyr(jnp.concatenate(
                [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1))
            bev_ctr = jnp.concatenate(
                [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1)
            return box3d_multiclass_nms(
                boxes, bev_ctr, scores_s[idx], tcfg['score_thr'],
                tcfg['nms_thr'], tcfg['max_num'])

        dir_in = (dir_cls.reshape(b, m, 2) if dir_cls is not None
                  else None)
        if dir_in is None:
            return jax.vmap(lambda s, r: decode_one(s, r, None))(scores, reg)
        return jax.vmap(decode_one)(scores, reg, dir_in)
