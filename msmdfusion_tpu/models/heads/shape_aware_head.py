"""Shape-aware grouping head (SSN).

TPU-native re-design of
mmdet3d/models/dense_heads/shape_aware_head.py:11-482: per shape-group
sub-heads (BaseShapeHead: shared 3x3 conv stack, possibly strided, then 1x1
cls/reg/dir branches) whose flattened per-anchor predictions are
concatenated; assignment/losses/decode run over the concatenated anchor
set. Sub-head feature maps can have different strides, so anchors are built
per group at that group's resolution.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.boxes import limit_period, xywhr2xyxyr
from ...core.iou3d import boxes_iou_bev
from ...core.nms import box3d_multiclass_nms
from ...registry import ANCHOR_GENERATORS, BBOX_CODERS, HEADS
from ..layers import torch_conv_init
from ..losses import cross_entropy, sigmoid_focal_loss, smooth_l1_loss


class BaseShapeHead(nn.Module):
    """One shape group's branch (reference shape_aware_head.py:11-137)."""
    num_cls: int
    num_base_anchors: int
    box_code_size: int
    shared_conv_channels: Sequence[int] = (64, 64)
    shared_conv_strides: Sequence[int] = (1, 1)
    use_direction_classifier: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch, st in zip(self.shared_conv_channels,
                          self.shared_conv_strides):
            x = nn.Conv(ch, (3, 3), strides=st, padding=1, use_bias=False,
                        kernel_init=torch_conv_init)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        b, h, w, _ = x.shape
        a = self.num_base_anchors
        cls = nn.Conv(a * self.num_cls, (1, 1),
                      kernel_init=torch_conv_init,
                      bias_init=nn.initializers.constant(-4.59512),
                      name='conv_cls')(x)
        reg = nn.Conv(a * self.box_code_size, (1, 1),
                      kernel_init=torch_conv_init, name='conv_reg')(x)
        out = dict(
            cls_score=cls.reshape(b, h * w * a, self.num_cls),
            bbox_pred=reg.reshape(b, h * w * a, self.box_code_size),
            featmap_size=(h, w))
        if self.use_direction_classifier:
            dir_ = nn.Conv(a * 2, (1, 1), kernel_init=torch_conv_init,
                           name='conv_dir_cls')(x)
            out['dir_cls'] = dir_.reshape(b, h * w * a, 2)
        return out


@HEADS.register('ShapeAwareHead')
class ShapeAwareHead(nn.Module):
    """Multi-group shape-aware head (reference :139-482)."""
    tasks: Sequence[Dict] = ()
    num_classes: int = 3
    in_channels: int = 384
    use_direction_classifier: bool = True
    diff_rad_by_sin: bool = True
    dir_offset: float = 0.0
    dir_limit_offset: float = 1.0
    anchor_generator: Any = None
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    loss_dir: Any = None
    train_cfg: Any = None
    test_cfg: Any = None

    def setup(self):
        self.coder = BBOX_CODERS.build(dict(
            self.bbox_coder or {'type': 'DeltaXYZWLHRBBoxCoder'}))
        self.anchor_gen = ANCHOR_GENERATORS.build(
            dict(self.anchor_generator))
        heads = []
        slices = []
        cls_ptr = 0
        for task in self.tasks:
            n_cls = task['num_class']
            num_size = len(self.anchor_gen.sizes[cls_ptr:cls_ptr + n_cls])
            num_rot = len(self.anchor_gen.rotations)
            heads.append(BaseShapeHead(
                num_cls=self.num_classes,
                num_base_anchors=num_rot * num_size,
                box_code_size=self.coder.code_size,
                shared_conv_channels=tuple(task['shared_conv_channels']),
                shared_conv_strides=tuple(task['shared_conv_strides']),
                use_direction_classifier=self.use_direction_classifier))
            slices.append((cls_ptr, cls_ptr + n_cls))
            cls_ptr += n_cls
        self.heads = heads
        self._task_slices = tuple(slices)

    def __call__(self, x, train: bool = False):
        results = [head(x, train=train) for head in self.heads]
        out = dict(
            cls_score=jnp.concatenate(
                [r['cls_score'] for r in results], axis=1),
            bbox_pred=jnp.concatenate(
                [r['bbox_pred'] for r in results], axis=1),
            featmap_sizes=tuple(r['featmap_size'] for r in results))
        if self.use_direction_classifier:
            out['dir_cls'] = jnp.concatenate(
                [r['dir_cls'] for r in results], axis=1)
        return out

    def _task_anchors(self, featmap_sizes):
        """Concatenated [M, 7+] anchors, one grid per shape group."""
        from ...core.anchors import Anchor3DRangeGenerator
        anchors = []
        for (lo, hi), fs in zip(self._task_slices, featmap_sizes):
            gen = Anchor3DRangeGenerator(
                ranges=self.anchor_gen.ranges[lo:hi],
                sizes=self.anchor_gen.sizes[lo:hi],
                rotations=self.anchor_gen.rotations,
                custom_values=getattr(self.anchor_gen, 'custom_values', ()))
            a = gen.grid_anchors(fs)
            anchors.append(np.asarray(a).reshape(-1, a.shape[-1]))
        return jnp.asarray(np.concatenate(anchors, axis=0))

    # -- training ---------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Max-IoU assignment over the concatenated anchor set
        (reference :300-406 via AnchorTrainMixin)."""
        tc = self.train_cfg
        anchors = self._task_anchors(preds['featmap_sizes'])
        m = anchors.shape[0]
        cls = preds['cls_score']
        b = cls.shape[0]
        reg = preds['bbox_pred']
        dir_cls = preds.get('dir_cls')
        anc_bev = jnp.concatenate(
            [anchors[:, 0:2], anchors[:, 3:5], anchors[:, 6:7]], axis=-1)

        def assign_one(gts, valid):
            gt_bev = jnp.concatenate(
                [gts[:, 0:2], gts[:, 3:5], gts[:, 6:7]], axis=-1)
            iou = boxes_iou_bev(anc_bev, gt_bev)
            iou = jnp.where(valid[None, :], iou, -1.0)
            max_iou = jnp.max(iou, axis=1)
            argmax = jnp.argmax(iou, axis=1)
            pos = max_iou >= tc['pos_iou_thr']
            neg = (max_iou < tc['neg_iou_thr']) & (max_iou >= 0)
            best_anchor = jnp.argmax(iou, axis=0)
            gt_best_iou = jnp.max(iou, axis=0)
            force = jnp.zeros((m,), bool).at[best_anchor].set(
                valid & (gt_best_iou > tc.get('min_pos_iou', 0.0)))
            forced_gt = jnp.zeros((m,), jnp.int32).at[best_anchor].set(
                jnp.arange(gts.shape[0], dtype=jnp.int32))
            assigned = jnp.where(force, forced_gt, argmax)
            return assigned, pos | force, neg & ~(pos | force)

        assigned, pos, neg = jax.vmap(assign_one)(gt_bboxes, gt_valid)
        gt_for = jnp.take_along_axis(gt_bboxes, assigned[..., None], axis=1)
        labels = jnp.take_along_axis(gt_labels, assigned, axis=1)
        labels = jnp.where(pos, labels, self.num_classes)
        weights = (pos | neg).astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(pos), 1)
        loss_cls = sigmoid_focal_loss(
            cls.reshape(-1, self.num_classes), labels.reshape(-1),
            self.num_classes, gamma=self.loss_cls.get('gamma', 2.0),
            alpha=self.loss_cls.get('alpha', 0.25))
        loss_cls = (loss_cls * weights.reshape(-1)).sum() / num_pos
        anc_b = jnp.broadcast_to(anchors[None], (b, m, anchors.shape[-1]))
        tgt = self.coder.encode(anc_b, gt_for[..., :anchors.shape[-1]])
        pred_box = reg
        if self.diff_rad_by_sin:
            ra, rt = pred_box[..., 6], tgt[..., 6]
            pred_box = pred_box.at[..., 6].set(jnp.sin(ra) * jnp.cos(rt))
            tgt = tgt.at[..., 6].set(jnp.cos(ra) * jnp.sin(rt))
        l1 = smooth_l1_loss(pred_box, tgt,
                            beta=self.loss_bbox.get('beta', 1.0 / 9.0))
        l1 = jnp.where(pos[..., None], l1, 0)
        losses = {
            'loss_cls': loss_cls * self.loss_cls.get('loss_weight', 1.0),
            'loss_bbox': l1.sum() / num_pos *
            self.loss_bbox.get('loss_weight', 1.0)}
        if dir_cls is not None:
            rot_gt = gt_for[..., 6] - anc_b[..., 6]
            dir_tgt = (limit_period(rot_gt - self.dir_offset, 0, 2 * np.pi)
                       >= np.pi).astype(jnp.int32)
            dce = cross_entropy(dir_cls.reshape(-1, 2), dir_tgt.reshape(-1),
                                2)
            dce = jnp.where(pos.reshape(-1), dce, 0)
            losses['loss_dir'] = dce.sum() / num_pos * \
                self.loss_dir.get('loss_weight', 1.0)
        return losses

    # -- inference --------------------------------------------------------
    def get_bboxes(self, preds):
        tcfg = self.test_cfg
        anchors = self._task_anchors(preds['featmap_sizes'])
        m = anchors.shape[0]
        cls = preds['cls_score']
        b = cls.shape[0]
        scores = jax.nn.sigmoid(cls)
        reg = preds['bbox_pred']
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
            bev = jnp.concatenate(
                [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1)
            return box3d_multiclass_nms(
                boxes, bev, scores_s[idx], tcfg['score_thr'],
                tcfg['nms_thr'], tcfg['max_num'])

        if dir_cls is None:
            return jax.vmap(lambda s, r: decode_one(s, r, None))(scores, reg)
        return jax.vmap(decode_one)(scores, reg, dir_cls)
