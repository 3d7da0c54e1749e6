"""3DSSD head: F-FPS candidates, spatial-shift votes, anchor-free boxes.

TPU-native re-design of mmdet3d/models/dense_heads/ssd3d_head.py:572 (the
reference registers it for the SSD3DNet detector; round 1 shipped an empty
alias — this is the real head):

- **F-FPS candidate sampling** (:candidate generation): half the candidates
  come from feature-distance FPS (combined xyz + feature metric, the 3DSSD
  "F-FPS"), half from plain D-FPS — `combined_fps` in ops/sampling.
- **spatial shift**: a vote MLP offsets candidates toward box centers
  before aggregation (3DSSD's candidate generation layer).
- **anchor-free regression**: center offset, log-size, dir bin + residual.
- **centerness-weighted classification** (3DSSD's soft target: geometric
  mean of normalized distances to the assigned box's faces).
- corner loss over the 8 decoded box corners.

All ops are fixed-capacity masked; assignment is closest-GT like the
reference's point-in-box target assigner (simplified: nearest center with
inside-box gating).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.boxes import corners_3d
from ...ops.sampling import ball_query, combined_fps, group_points
from ...registry import HEADS
from ..backbones.pointnet2 import PointSAModule
from ..layers import MLP, torch_conv_init
from ..losses import cross_entropy, smooth_l1_loss


@HEADS.register('SSD3DHead')
class SSD3DHead(nn.Module):
    num_classes: int = 1
    in_channels: int = 256
    num_candidates: int = 256
    num_dir_bins: int = 12
    aggregation_radius: float = 4.8
    aggregation_samples: int = 16
    train_cfg: Any = None
    test_cfg: Any = None

    @nn.compact
    def __call__(self, feat_dict: Dict[str, jax.Array],
                 train: bool = False):
        """feat_dict: fp_xyz [B, N, 3], fp_features [B, N, C], fp_valid."""
        xyz = feat_dict['fp_xyz']
        feats = feat_dict['fp_features']
        valid = feat_dict['fp_valid']
        b, n, c = feats.shape

        half = self.num_candidates // 2
        agg = PointSAModule(self.num_candidates, self.aggregation_radius,
                            self.aggregation_samples, (c, c, c),
                            name='candidate_aggregation')
        vote_mlp = MLP((c // 2,), final_act=True, name='vote_mlp')
        vote_out = nn.Dense(3, kernel_init=torch_conv_init, name='vote_out')

        cand_xyz, cand_feats, cand_valid, shifted = [], [], [], []
        for i in range(b):
            # F-FPS + D-FPS candidate split (3DSSD "FS" sampling)
            f_idx = combined_fps(xyz[i], feats[i], half, valid[i],
                                 feature_weight=1.0)
            d_idx = combined_fps(xyz[i], None, self.num_candidates - half,
                                 valid[i])
            idx = jnp.concatenate([f_idx, d_idx])
            cx = jnp.take(xyz[i], idx, axis=0)
            cf = jnp.take(feats[i], idx, axis=0)
            cv = jnp.take(valid[i], idx)
            # spatial shift (vote) toward object centers
            off = vote_out(vote_mlp(cf))
            sx = cx + jnp.where(cv[:, None], off, 0)
            # aggregate context around the shifted candidates
            ax, af, av = agg(xyz[i], feats[i], valid[i], train=train,
                             new_xyz=sx, new_valid=cv)
            cand_xyz.append(cx)
            cand_feats.append(af)
            cand_valid.append(cv)
            shifted.append(sx)
        cand_xyz = jnp.stack(cand_xyz)
        cand_feats = jnp.stack(cand_feats)
        cand_valid = jnp.stack(cand_valid)
        shifted = jnp.stack(shifted)

        h = MLP((c, c), final_act=True, name='pred_mlp')(cand_feats)
        out_dim = self.num_classes + 3 + 3 + self.num_dir_bins * 2
        raw = nn.Dense(out_dim, kernel_init=torch_conv_init,
                       name='pred_out')(h)
        i0 = 0
        res: Dict[str, jax.Array] = {
            'candidate_xyz': cand_xyz, 'shifted_xyz': shifted,
            'candidate_valid': cand_valid}
        res['cls_scores'] = raw[..., i0:i0 + self.num_classes]
        i0 += self.num_classes
        res['center'] = shifted + raw[..., i0:i0 + 3]
        i0 += 3
        res['log_size'] = raw[..., i0:i0 + 3]
        i0 += 3
        res['dir_class'] = raw[..., i0:i0 + self.num_dir_bins]
        i0 += self.num_dir_bins
        res['dir_res_norm'] = raw[..., i0:i0 + self.num_dir_bins]
        return res

    # ------------------------------------------------------------------
    def _decode_boxes(self, preds):
        sizes = jnp.exp(jnp.clip(preds['log_size'], -4.0, 4.0))
        bin_width = 2 * np.pi / self.num_dir_bins
        dir_bin = jnp.argmax(preds['dir_class'], axis=-1)
        dir_res = jnp.take_along_axis(preds['dir_res_norm'],
                                      dir_bin[..., None], axis=-1)[..., 0]
        yaw = (dir_bin.astype(jnp.float32) + 0.5) * bin_width + \
            dir_res * bin_width
        bottom = preds['center'].at[..., 2].add(-sizes[..., 2] / 2)
        return jnp.concatenate([bottom, sizes, yaw[..., None]], axis=-1)

    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        centers = preds['center']
        cand_valid = preds['candidate_valid']
        gt_centers = jnp.concatenate(
            [gt_bboxes[..., 0:2],
             gt_bboxes[..., 2:3] + gt_bboxes[..., 5:6] * 0.5], axis=-1)
        d = jnp.sum((centers[:, :, None, :] -
                     gt_centers[:, None, :, :]) ** 2, axis=-1)
        d = jnp.where(gt_valid[:, None, :], d, 1e10)
        nearest = jnp.argmin(d, axis=-1)                  # [B, P]
        gt_for = jnp.take_along_axis(gt_bboxes, nearest[..., None], axis=1)
        gt_lab = jnp.maximum(
            jnp.take_along_axis(gt_labels, nearest, axis=1), 0)
        gt_ctr = jnp.take_along_axis(gt_centers, nearest[..., None], axis=1)

        # positives: candidate's SHIFTED point inside the assigned box (the
        # reference gates targets by points_in_boxes)
        rel = preds['shifted_xyz'] - gt_ctr
        cs, sn = jnp.cos(-gt_for[..., 6]), jnp.sin(-gt_for[..., 6])
        local = jnp.stack([
            rel[..., 0] * cs - rel[..., 1] * sn,
            rel[..., 0] * sn + rel[..., 1] * cs, rel[..., 2]], axis=-1)
        half_wlh = gt_for[..., 3:6] / 2
        inside = jnp.all(jnp.abs(local) < half_wlh + 1e-4, axis=-1)
        pos = inside & cand_valid
        num_pos = jnp.maximum(jnp.sum(pos), 1)

        # centerness soft target (3DSSD): geometric mean over axes of
        # (1 - |offset|/half_extent)
        ratio = jnp.clip(1.0 - jnp.abs(local) / jnp.maximum(half_wlh, 1e-4),
                         1e-4, 1.0)
        centerness = jnp.power(jnp.prod(ratio, axis=-1), 1.0 / 3.0)
        cls_tgt = jax.nn.one_hot(gt_lab, self.num_classes) * \
            jnp.where(pos, centerness, 0.0)[..., None]
        p = jax.nn.sigmoid(preds['cls_scores'])
        cls_loss = -(cls_tgt * jnp.log(p + 1e-8) +
                     (1 - cls_tgt) * jnp.log(1 - p + 1e-8))
        cls_loss = jnp.where(cand_valid[..., None], cls_loss, 0).sum() / \
            jnp.maximum(cand_valid.sum(), 1)

        center_loss = smooth_l1_loss(centers, gt_ctr).sum(-1)
        center_loss = jnp.where(pos, center_loss, 0).sum() / num_pos
        size_loss = smooth_l1_loss(
            preds['log_size'],
            jnp.log(jnp.maximum(gt_for[..., 3:6], 1e-4))).sum(-1)
        size_loss = jnp.where(pos, size_loss, 0).sum() / num_pos

        yaw = gt_for[..., 6] % (2 * np.pi)
        bin_width = 2 * np.pi / self.num_dir_bins
        dir_bin = (yaw / bin_width).astype(jnp.int32) % self.num_dir_bins
        dir_res = yaw - (dir_bin.astype(jnp.float32) + 0.5) * bin_width
        dir_cls = cross_entropy(
            preds['dir_class'].reshape(-1, self.num_dir_bins),
            dir_bin.reshape(-1), self.num_dir_bins)
        dir_cls = jnp.where(pos.reshape(-1), dir_cls, 0).sum() / num_pos
        pred_res = jnp.take_along_axis(preds['dir_res_norm'],
                                       dir_bin[..., None], axis=-1)[..., 0]
        dir_res_loss = smooth_l1_loss(pred_res * bin_width, dir_res)
        dir_res_loss = jnp.where(pos, dir_res_loss, 0).sum() / num_pos

        # corner loss on decoded boxes (reference ssd3d corner_loss)
        boxes = self._decode_boxes(preds)
        pc = corners_3d(boxes.reshape(-1, 7)).reshape(*boxes.shape[:2], 8, 3)
        gc = corners_3d(gt_for[..., :7].reshape(-1, 7)).reshape(
            *boxes.shape[:2], 8, 3)
        corner_loss = smooth_l1_loss(pc, gc).sum((-1, -2))
        corner_loss = jnp.where(pos, corner_loss, 0).sum() / num_pos

        # vote (shift) loss toward assigned centers
        vote_loss = smooth_l1_loss(preds['shifted_xyz'], gt_ctr).sum(-1)
        vote_loss = jnp.where(pos, vote_loss, 0).sum() / num_pos

        return {'centerness_loss': cls_loss, 'center_loss': center_loss,
                'size_res_loss': size_loss, 'dir_class_loss': dir_cls,
                'dir_res_loss': dir_res_loss, 'corner_loss': corner_loss,
                'vote_loss': vote_loss}

    def get_bboxes(self, preds):
        boxes = self._decode_boxes(preds)
        scores = jax.nn.sigmoid(preds['cls_scores'])
        labels = jnp.argmax(scores, axis=-1)
        return {'bboxes': boxes, 'scores': jnp.max(scores, axis=-1),
                'labels': labels, 'valid': preds['candidate_valid']}
