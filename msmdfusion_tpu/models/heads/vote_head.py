"""VoteNet head (deep Hough voting for indoor detection).

TPU-native re-design of mmdet3d/models/dense_heads/vote_head.py:666: vote
generation MLP, vote aggregation via a set-abstraction module, proposal
branches (objectness / center / size class+residual / direction
class+residual / semantics), chamfer-style center losses with
closest-GT assignment — all over fixed-capacity masked point sets.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import HEADS
from ..backbones.pointnet2 import PointSAModule
from ..layers import MLP, MaskedBatchNorm, torch_conv_init
from ..losses import cross_entropy, smooth_l1_loss


@HEADS.register('VoteHead')
class VoteHead(nn.Module):
    num_classes: int = 18
    in_channels: int = 256
    num_proposals: int = 256
    vote_per_seed: int = 1
    gt_per_seed: int = 3
    mean_sizes: Any = None            # [num_classes, 3]
    num_dir_bins: int = 12
    aggregation_radius: float = 0.3
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

        # vote generation: offset + feature residual per seed
        vote_in = feats
        h = MLP((c, c), final_act=True, name='vote_mlp')(vote_in)
        offsets = nn.Dense(3 + c, kernel_init=torch_conv_init,
                           name='vote_out')(h)
        vote_xyz = xyz + jnp.where(valid[..., None], offsets[..., :3], 0)
        vote_feats = feats + jnp.where(valid[..., None], offsets[..., 3:], 0)

        agg = PointSAModule(self.num_proposals, self.aggregation_radius,
                            self.aggregation_samples, (c, c, c),
                            name='vote_aggregation')
        outs = []
        for i in range(b):
            ax, af, av = agg(vote_xyz[i], vote_feats[i], valid[i],
                             train=train)
            outs.append((ax, af, av))
        agg_xyz = jnp.stack([o[0] for o in outs])
        agg_feats = jnp.stack([o[1] for o in outs])
        agg_valid = jnp.stack([o[2] for o in outs])

        pred = MLP((c, c), final_act=True, name='pred_mlp')(agg_feats)
        out_dim = (2 + 3 + self.num_dir_bins * 2 + self.num_classes * 4 +
                   self.num_classes)
        raw = nn.Dense(out_dim, kernel_init=torch_conv_init,
                       name='pred_out')(pred)

        i0 = 0
        res: Dict[str, jax.Array] = {'aggregated_points': agg_xyz,
                                     'aggregated_valid': agg_valid,
                                     'vote_xyz': vote_xyz,
                                     'seed_xyz': xyz, 'seed_valid': valid}
        res['obj_scores'] = raw[..., i0:i0 + 2]
        i0 += 2
        res['center_offset'] = raw[..., i0:i0 + 3]
        res['center'] = agg_xyz + res['center_offset']
        i0 += 3
        res['dir_class'] = raw[..., i0:i0 + self.num_dir_bins]
        i0 += self.num_dir_bins
        res['dir_res_norm'] = raw[..., i0:i0 + self.num_dir_bins]
        i0 += self.num_dir_bins
        res['size_class'] = raw[..., i0:i0 + self.num_classes]
        i0 += self.num_classes
        res['size_res_norm'] = raw[
            ..., i0:i0 + self.num_classes * 3].reshape(
                b, self.num_proposals, self.num_classes, 3)
        i0 += self.num_classes * 3
        res['sem_scores'] = raw[..., i0:i0 + self.num_classes]
        return res

    # ------------------------------------------------------------------
    def loss(self, preds, gt_bboxes, gt_labels, gt_valid):
        """Closest-GT assignment + objectness/center/size/dir/sem losses."""
        centers = preds['center']                 # [B, P, 3]
        agg_valid = preds['aggregated_valid']
        gt_centers = jnp.concatenate(
            [gt_bboxes[..., 0:2],
             (gt_bboxes[..., 2:3] + gt_bboxes[..., 5:6] * 0.5)], axis=-1)
        d = jnp.sum((centers[:, :, None, :] - gt_centers[:, None, :, :]) ** 2,
                    axis=-1)
        d = jnp.where(gt_valid[:, None, :], d, 1e10)
        nearest = jnp.argmin(d, axis=-1)          # [B, P]
        nearest_d = jnp.sqrt(jnp.min(d, axis=-1))
        near_thr = (self.train_cfg or {}).get('pos_distance_thr', 0.3)
        far_thr = (self.train_cfg or {}).get('neg_distance_thr', 0.6)
        pos = (nearest_d < near_thr) & agg_valid
        neg = (nearest_d > far_thr) & agg_valid

        obj_tgt = pos.astype(jnp.int32)
        obj_w = (pos | neg).astype(jnp.float32)
        obj_loss = cross_entropy(
            preds['obj_scores'].reshape(-1, 2), obj_tgt.reshape(-1), 2)
        obj_loss = (obj_loss * obj_w.reshape(-1)).sum() / \
            jnp.maximum(obj_w.sum(), 1)

        gt_for = jnp.take_along_axis(gt_bboxes, nearest[..., None], axis=1)
        gt_lab = jnp.take_along_axis(gt_labels, nearest, axis=1)
        gt_ctr = jnp.take_along_axis(gt_centers, nearest[..., None], axis=1)
        num_pos = jnp.maximum(jnp.sum(pos), 1)

        center_loss = smooth_l1_loss(centers, gt_ctr).sum(-1)
        center_loss = jnp.where(pos, center_loss, 0).sum() / num_pos

        sem_loss = cross_entropy(
            preds['sem_scores'].reshape(-1, self.num_classes),
            jnp.maximum(gt_lab, 0).reshape(-1), self.num_classes)
        sem_loss = jnp.where(pos.reshape(-1), sem_loss, 0).sum() / num_pos

        size_cls_loss = cross_entropy(
            preds['size_class'].reshape(-1, self.num_classes),
            jnp.maximum(gt_lab, 0).reshape(-1), self.num_classes)
        size_cls_loss = jnp.where(pos.reshape(-1), size_cls_loss,
                                  0).sum() / num_pos

        mean_sizes = jnp.asarray(self.mean_sizes)
        gt_size_res = gt_for[..., 3:6] - mean_sizes[jnp.maximum(gt_lab, 0)]
        pred_res = jnp.take_along_axis(
            preds['size_res_norm'],
            jnp.maximum(gt_lab, 0)[..., None, None].repeat(3, -1),
            axis=2)[:, :, 0]
        size_res_loss = smooth_l1_loss(
            pred_res * mean_sizes[jnp.maximum(gt_lab, 0)],
            gt_size_res).sum(-1)
        size_res_loss = jnp.where(pos, size_res_loss, 0).sum() / num_pos

        # direction: bin class + residual
        yaw = gt_for[..., 6] % (2 * np.pi)
        bin_width = 2 * np.pi / self.num_dir_bins
        dir_bin = (yaw / bin_width).astype(jnp.int32) % self.num_dir_bins
        dir_res = yaw - (dir_bin.astype(jnp.float32) + 0.5) * bin_width
        dir_cls_loss = cross_entropy(
            preds['dir_class'].reshape(-1, self.num_dir_bins),
            dir_bin.reshape(-1), self.num_dir_bins)
        dir_cls_loss = jnp.where(pos.reshape(-1), dir_cls_loss,
                                 0).sum() / num_pos
        pred_dir_res = jnp.take_along_axis(
            preds['dir_res_norm'], dir_bin[..., None], axis=-1)[..., 0]
        dir_res_loss = smooth_l1_loss(pred_dir_res * bin_width, dir_res)
        dir_res_loss = jnp.where(pos, dir_res_loss, 0).sum() / num_pos

        # vote loss: seeds near a GT must vote to its center
        seed_xyz = preds['seed_xyz']
        sd = jnp.sum((seed_xyz[:, :, None, :] -
                      gt_centers[:, None, :, :]) ** 2, axis=-1)
        sd = jnp.where(gt_valid[:, None, :], sd, 1e10)
        seed_near = jnp.argmin(sd, axis=-1)
        seed_in = jnp.sqrt(jnp.min(sd, axis=-1)) < near_thr
        seed_gt_ctr = jnp.take_along_axis(gt_centers, seed_near[..., None],
                                          axis=1)
        vote_loss = smooth_l1_loss(preds['vote_xyz'], seed_gt_ctr).sum(-1)
        vote_loss = jnp.where(seed_in & preds['seed_valid'],
                              vote_loss, 0).sum() / \
            jnp.maximum(jnp.sum(seed_in & preds['seed_valid']), 1)

        return {'vote_loss': vote_loss, 'objectness_loss': obj_loss,
                'center_loss': center_loss, 'dir_class_loss': dir_cls_loss,
                'dir_res_loss': dir_res_loss,
                'size_class_loss': size_cls_loss,
                'size_res_loss': size_res_loss, 'semantic_loss': sem_loss}

    def get_bboxes(self, preds):
        """Decode proposals into boxes + scores (aligned NMS left to caller)."""
        obj = jax.nn.softmax(preds['obj_scores'], axis=-1)[..., 1]
        sem = jax.nn.softmax(preds['sem_scores'], axis=-1)
        labels = jnp.argmax(sem, axis=-1)
        scores = obj * jnp.max(sem, axis=-1)
        mean_sizes = jnp.asarray(self.mean_sizes)
        size_res = jnp.take_along_axis(
            preds['size_res_norm'],
            labels[..., None, None].repeat(3, -1), axis=2)[:, :, 0]
        sizes = jnp.maximum(
            mean_sizes[labels] * (1 + size_res), 0.05)
        bin_width = 2 * np.pi / self.num_dir_bins
        dir_bin = jnp.argmax(preds['dir_class'], axis=-1)
        dir_res = jnp.take_along_axis(preds['dir_res_norm'],
                                      dir_bin[..., None], axis=-1)[..., 0]
        yaw = (dir_bin.astype(jnp.float32) + 0.5) * bin_width + \
            dir_res * bin_width
        center = preds['center']
        bottom = center.at[..., 2].add(-sizes[..., 2] / 2)
        boxes = jnp.concatenate([bottom, sizes, yaw[..., None]], axis=-1)
        return {'bboxes': boxes, 'scores': scores, 'labels': labels,
                'valid': preds['aggregated_valid']}
