"""FreeAnchor head for 3D detection (learning-to-match bag loss).

TPU-native re-design of
mmdet3d/models/dense_heads/free_anchor3d_head.py:12-283: same conv branches
and decode as Anchor3DHead, but training replaces max-IoU assignment with
the FreeAnchor positive/negative bag losses. All per-sample python loops
are replaced by masked, fixed-shape vmapped math (gt sets are padded with
``gt_valid`` masks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.boxes import limit_period
from ...registry import HEADS
from ..losses import smooth_l1_loss
from .anchor3d_head import Anchor3DHead


def _nearest_bev(boxes):
    """[N, 7+] -> nearest axis-aligned BEV [N, 4] (rbbox2d_to_near_bbox)."""
    rots = jnp.abs(limit_period(boxes[..., 6], 0.5, np.pi))
    cond = (rots > np.pi / 4)[..., None]
    dims = jnp.where(cond, boxes[..., [4, 3]], boxes[..., [3, 4]])
    ctr = boxes[..., :2]
    return jnp.concatenate([ctr - dims / 2, ctr + dims / 2], axis=-1)


def _iou_nearest(a, b):
    """[N, 4] x [M, 4] axis-aligned IoU (bbox_overlaps_nearest_3d)."""
    iw = jnp.clip(
        jnp.minimum(a[:, None, 2], b[None, :, 2])
        - jnp.maximum(a[:, None, 0], b[None, :, 0]), 0)
    ih = jnp.clip(
        jnp.minimum(a[:, None, 3], b[None, :, 3])
        - jnp.maximum(a[:, None, 1], b[None, :, 1]), 0)
    inter = iw * ih
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


@HEADS.register('FreeAnchor3DHead')
class FreeAnchor3DHead(Anchor3DHead):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Positive/negative bag losses (reference :43-245)."""
        cls = preds['cls_score']
        b, h, w, _ = cls.shape
        code = self.coder.code_size
        anchors = self._flat_anchors((h, w))                 # [M, 7+]
        m = anchors.shape[0]
        cls_prob = jax.nn.sigmoid(cls.reshape(b, m, self.num_classes))
        reg = preds['bbox_pred'].reshape(b, m, code)
        dir_cls = preds.get('dir_cls')
        if dir_cls is not None:
            dir_cls = dir_cls.reshape(b, m, 2)
        anc_near = _nearest_bev(anchors)
        code_weight = None
        if self.train_cfg and self.train_cfg.get('code_weight'):
            code_weight = jnp.asarray(self.train_cfg['code_weight'])

        def one(cls_p, reg_p, dir_p, gts, labels, valid):
            # decoded predictions and per-object localization probability
            pred_boxes = jax.lax.stop_gradient(
                self.coder.decode(anchors, reg_p))
            gt_near = _nearest_bev(gts)
            iou = _iou_nearest(gt_near, _nearest_bev(pred_boxes))  # [G, M]
            iou = jnp.where(valid[:, None], iou, 0.0)
            t1 = self.bbox_thr
            t2 = jnp.clip(iou.max(axis=1, keepdims=True), t1 + 1e-12, None)
            obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0, 1)  # [G, M]
            # image_box_prob[j, c] = max_i {label_i == c} obj_box_prob[i, j]
            onehot = jax.nn.one_hot(labels, self.num_classes) * \
                valid[:, None]
            image_box_prob = jnp.max(
                obj_box_prob[:, :, None] * onehot[:, None, :], axis=0)

            # bags: top-k anchors per gt by anchor-gt nearest IoU
            quality = _iou_nearest(gt_near, anc_near)          # [G, M]
            _, matched = jax.lax.top_k(quality, self.pre_anchor_topk)
            matched_cls = jnp.take_along_axis(
                cls_p[matched],                                # [G, K, C]
                labels[:, None, None].astype(jnp.int32), axis=2)[..., 0]
            matched_anchors = anchors[matched]                 # [G, K, 7+]
            tgt = self.coder.encode(
                matched_anchors,
                jnp.broadcast_to(gts[:, None, :matched_anchors.shape[-1]],
                                 matched_anchors.shape))
            pred_m = reg_p[matched]                            # [G, K, code]
            loss_dir = 0.0
            if dir_p is not None:
                rot_gt = gts[:, None, 6] - matched_anchors[..., 6]
                dir_tgt = (limit_period(rot_gt - self.dir_offset, 0,
                                        2 * np.pi) >= np.pi).astype(jnp.int32)
                logp = jax.nn.log_softmax(dir_p[matched], axis=-1)
                loss_dir = -jnp.take_along_axis(
                    logp, dir_tgt[..., None], axis=-1)[..., 0]
            if self.diff_rad_by_sin:
                ra, rt = pred_m[..., 6], tgt[..., 6]
                pred_m = pred_m.at[..., 6].set(jnp.sin(ra) * jnp.cos(rt))
                tgt = tgt.at[..., 6].set(jnp.cos(ra) * jnp.sin(rt))
            l1 = smooth_l1_loss(pred_m, tgt,
                                beta=self.loss_bbox.get('beta', 1.0 / 9.0))
            if code_weight is not None:
                l1 = l1 * code_weight
            loss_bbox = l1.sum(-1) + loss_dir                  # [G, K]
            matched_box_prob = jnp.exp(-loss_bbox)

            # positive bag loss (mean-max weighting, reference :246-264)
            matched_prob = matched_cls * matched_box_prob
            weight = 1.0 / jnp.clip(1 - matched_prob, 1e-12, None)
            weight = weight / weight.sum(axis=1, keepdims=True)
            bag_prob = jnp.clip((weight * matched_prob).sum(axis=1), 1e-12,
                                1.0)
            pos_loss = -self.alpha * jnp.log(bag_prob)         # [G]
            pos_loss = jnp.where(valid, pos_loss, 0.0)

            # negative bag loss (reference :266-283)
            prob = jnp.clip(cls_p * (1 - image_box_prob), 0, 1)
            neg_loss = (1 - self.alpha) * prob ** self.gamma * \
                (-jnp.log(jnp.clip(1 - prob, 1e-12, None)))
            return pos_loss.sum(), neg_loss.sum(), valid.sum()

        dir_in = dir_cls if dir_cls is not None else \
            jnp.zeros((b, m, 2))
        pos, neg, npos = jax.vmap(one)(
            cls_prob, reg, dir_in, gt_bboxes,
            gt_labels.astype(jnp.int32), gt_valid)
        num_pos = jnp.maximum(npos.sum(), 1).astype(jnp.float32)
        return {
            'positive_bag_loss': pos.sum() / num_pos,
            'negative_bag_loss': neg.sum() / jnp.maximum(
                num_pos * self.pre_anchor_topk, 1.0),
        }
