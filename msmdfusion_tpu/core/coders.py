"""Box coders (functional JAX).

TPU-native equivalents of:
- TransFusionBBoxCoder (mmdet3d/core/bbox/coders/transfusion_bbox_coder.py:7-126)
- DeltaXYZWLHRBBoxCoder (mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py)
- CenterPointBBoxCoder decode (mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py)

All decoders are batched and mask-based: ``filter`` semantics return a bool
mask rather than dynamically-sized gathers.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..registry import BBOX_CODERS


@BBOX_CODERS.register('TransFusionBBoxCoder')
class TransFusionBBoxCoder:
    """Grid-relative center / log-dim / sin-cos-yaw / gravity-z coder."""

    def __init__(self, pc_range, out_size_factor, voxel_size,
                 post_center_range=None, score_threshold=None, code_size=8):
        self.pc_range = pc_range
        self.out_size_factor = out_size_factor
        self.voxel_size = voxel_size
        self.post_center_range = post_center_range
        self.score_threshold = score_threshold
        self.code_size = code_size

    def encode(self, dst_boxes):
        """[N, 7 or 9] bottom-center boxes -> [N, code_size] targets."""
        tx = (dst_boxes[:, 0] - self.pc_range[0]) / (
            self.out_size_factor * self.voxel_size[0])
        ty = (dst_boxes[:, 1] - self.pc_range[1]) / (
            self.out_size_factor * self.voxel_size[1])
        tz = dst_boxes[:, 2] + dst_boxes[:, 5] * 0.5  # bottom -> gravity z
        tdims = jnp.log(jnp.maximum(dst_boxes[:, 3:6], 1e-12))
        tsin = jnp.sin(dst_boxes[:, 6])
        tcos = jnp.cos(dst_boxes[:, 6])
        parts = [tx[:, None], ty[:, None], tz[:, None], tdims,
                 tsin[:, None], tcos[:, None]]
        if self.code_size == 10:
            parts.append(dst_boxes[:, 7:9])
        return jnp.concatenate(parts, axis=-1)

    def decode(self, heatmap, rot, dim, center, height, vel=None,
               filter: bool = False):
        """Decode head channels into world-metric boxes.

        Args:
            heatmap: [B, C, P] class scores.
            rot: [B, 2, P] (sin, cos).
            dim: [B, 3, P] log dims.
            center: [B, 2, P] feature-map-metric xy.
            height: [B, 1, P] gravity-center z.
            vel: [B, 2, P] or None.
        Returns:
            dict of 'bboxes' [B, P, 7|9], 'scores' [B, P], 'labels' [B, P]
            and (if filter) 'valid' [B, P].
        """
        final_preds = jnp.argmax(heatmap, axis=1)   # [B, P]
        final_scores = jnp.max(heatmap, axis=1)

        cx = center[:, 0, :] * self.out_size_factor * self.voxel_size[0] + \
            self.pc_range[0]
        cy = center[:, 1, :] * self.out_size_factor * self.voxel_size[1] + \
            self.pc_range[1]
        dims = jnp.exp(dim)                         # [B, 3, P]
        z_bottom = height[:, 0, :] - dims[:, 2, :] * 0.5
        yaw = jnp.arctan2(rot[:, 0, :], rot[:, 1, :])

        parts = [cx[:, :, None], cy[:, :, None], z_bottom[:, :, None],
                 jnp.moveaxis(dims, 1, 2), yaw[:, :, None]]
        if vel is not None:
            parts.append(jnp.moveaxis(vel, 1, 2))
        boxes = jnp.concatenate(parts, axis=-1)     # [B, P, 7|9]

        out = {'bboxes': boxes, 'scores': final_scores, 'labels': final_preds}
        if filter:
            pcr = jnp.asarray(self.post_center_range)
            mask = jnp.all(boxes[..., :3] >= pcr[:3], axis=-1)
            mask &= jnp.all(boxes[..., :3] <= pcr[3:], axis=-1)
            if self.score_threshold is not None and self.score_threshold > 0:
                mask &= final_scores > self.score_threshold
            out['valid'] = mask
        return out


@BBOX_CODERS.register('DeltaXYZWLHRBBoxCoder')
class DeltaXYZWLHRBBoxCoder:
    """Residual coder vs anchors for SECOND/PointPillars anchor heads."""

    def __init__(self, code_size=7):
        self.code_size = code_size

    def encode(self, src_boxes, dst_boxes):
        """anchors src [..., 7+] -> targets of gt dst [..., 7+]."""
        xa, ya, za, wa, la, ha, ra = jnp.split(src_boxes[..., :7], 7, axis=-1)
        xg, yg, zg, wg, lg, hg, rg = jnp.split(dst_boxes[..., :7], 7, axis=-1)
        za = za + ha / 2
        zg = zg + hg / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / ha
        wt = jnp.log(wg / wa)
        lt = jnp.log(lg / la)
        ht = jnp.log(hg / ha)
        rt = rg - ra
        extras = []
        if src_boxes.shape[-1] > 7:
            extras = [dst_boxes[..., 7:] - src_boxes[..., 7:]]
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt] + extras, axis=-1)

    def decode(self, anchors, deltas):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors[..., :7], 7, axis=-1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas[..., :7], 7, axis=-1)
        za = za + ha / 2
        diag = jnp.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        wg = jnp.exp(wt) * wa
        lg = jnp.exp(lt) * la
        hg = jnp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        extras = []
        if anchors.shape[-1] > 7:
            extras = [deltas[..., 7:] + anchors[..., 7:]]
        return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg] + extras, axis=-1)


@BBOX_CODERS.register('CenterPointBBoxCoder')
class CenterPointBBoxCoder:
    """Top-K heatmap decoder for CenterHead."""

    def __init__(self, pc_range, out_size_factor, voxel_size,
                 post_center_range=None, max_num=100, score_threshold=None,
                 code_size=9):
        self.pc_range = pc_range
        self.out_size_factor = out_size_factor
        self.voxel_size = voxel_size
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.code_size = code_size

    def decode(self, heat, rot_sine, rot_cosine, hei, dim, vel, reg=None):
        """Decode top-K peaks.

        Args:
            heat: [B, C, H, W] sigmoided heatmap.
            rot_sine/rot_cosine: [B, 1, H, W].
            hei: [B, 1, H, W] gravity z.
            dim: [B, 3, H, W] log dims.
            vel: [B, 2, H, W] or None.
            reg: [B, 2, H, W] sub-cell offsets.
        Returns:
            dict 'bboxes' [B, K, 7|9], 'scores' [B, K], 'labels' [B, K],
            'valid' [B, K].
        """
        b, num_classes, h, w = heat.shape
        k = self.max_num
        flat = heat.reshape(b, num_classes * h * w)
        scores, inds = jax.lax.top_k(flat, k)              # [B, K]
        labels = inds // (h * w)
        spatial = inds % (h * w)
        ys = (spatial // w).astype(jnp.float32)
        xs = (spatial % w).astype(jnp.float32)

        def gather_channels(feat):                         # [B, C', H, W]
            f = feat.reshape(b, feat.shape[1], h * w)
            return jnp.take_along_axis(f, spatial[:, None, :], axis=2)

        if reg is not None:
            off = gather_channels(reg)                      # [B, 2, K]
            xs = xs + off[:, 0]
            ys = ys + off[:, 1]
        else:
            xs = xs + 0.5
            ys = ys + 0.5
        rs = gather_channels(rot_sine)[:, 0]
        rc = gather_channels(rot_cosine)[:, 0]
        yaw = jnp.arctan2(rs, rc)
        z = gather_channels(hei)[:, 0]
        dims = jnp.exp(gather_channels(dim))                # [B, 3, K]
        x_world = xs * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        y_world = ys * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        z_bottom = z - dims[:, 2] * 0.5
        parts = [x_world[..., None], y_world[..., None], z_bottom[..., None],
                 jnp.moveaxis(dims, 1, 2), yaw[..., None]]
        if vel is not None:
            parts.append(jnp.moveaxis(gather_channels(vel), 1, 2))
        boxes = jnp.concatenate(parts, axis=-1)

        valid = jnp.ones_like(scores, dtype=bool)
        if self.score_threshold is not None:
            valid &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            valid &= jnp.all(boxes[..., :3] >= pcr[:3], axis=-1)
            valid &= jnp.all(boxes[..., :3] <= pcr[3:], axis=-1)
        return {'bboxes': boxes, 'scores': scores, 'labels': labels,
                'valid': valid}


@BBOX_CODERS.register('PartialBinBasedBBoxCoder')
class PartialBinBasedBBoxCoder:
    """Bin-based coder for VoteNet/H3DNet-style heads.

    Reference: mmdet3d/core/bbox/coders/partial_bin_based_bbox_coder.py:9-240.
    Boxes are plain [.., 7] arrays; encode takes gravity-centered boxes and
    class labels, decode takes the split prediction dict.
    """

    def __init__(self, num_dir_bins, num_sizes, mean_sizes, with_rot=True):
        self.num_dir_bins = int(num_dir_bins)
        self.num_sizes = int(num_sizes)
        self.mean_sizes = jnp.asarray(mean_sizes, jnp.float32).reshape(
            -1, 3) if len(mean_sizes) else jnp.zeros((0, 3), jnp.float32)
        self.with_rot = with_rot

    # -- angle bins (reference :203-240) ------------------------------------
    def angle2class(self, angle):
        per = 2 * np.pi / self.num_dir_bins
        shifted = jnp.mod(angle + per / 2, 2 * np.pi)
        cls = (shifted / per).astype(jnp.int32)
        res = shifted - (cls.astype(jnp.float32) * per + per / 2)
        return cls, res

    def class2angle(self, angle_cls, angle_res, limit=True):
        per = 2 * np.pi / self.num_dir_bins
        angle = angle_cls.astype(jnp.float32) * per + angle_res
        if limit:
            angle = jnp.where(angle > np.pi, angle - 2 * np.pi, angle)
        return angle

    def encode(self, gt_bboxes_3d, gt_labels_3d):
        """[N, 7] bottom-center boxes + labels -> bin targets (:27-56)."""
        center = jnp.concatenate(
            [gt_bboxes_3d[..., :2],
             gt_bboxes_3d[..., 2:3] + gt_bboxes_3d[..., 5:6] * 0.5], -1)
        size_class = gt_labels_3d
        size_res = gt_bboxes_3d[..., 3:6] - self.mean_sizes[size_class]
        if self.with_rot:
            dir_class, dir_res = self.angle2class(gt_bboxes_3d[..., 6])
        else:
            dir_class = jnp.zeros_like(gt_labels_3d)
            dir_res = jnp.zeros(gt_labels_3d.shape, jnp.float32)
        return center, size_class, size_res, dir_class, dir_res

    def decode(self, bbox_out, suffix=''):
        """Split-pred dict -> [B, P, 7] gravity-center boxes (:58-99)."""
        center = bbox_out['center' + suffix]
        b, p = center.shape[:2]
        if self.with_rot:
            dir_class = jnp.argmax(bbox_out['dir_class' + suffix], -1)
            dir_res = jnp.take_along_axis(
                bbox_out['dir_res' + suffix], dir_class[..., None], -1)[..., 0]
            dir_angle = self.class2angle(dir_class, dir_res)[..., None]
        else:
            dir_angle = jnp.zeros((b, p, 1), center.dtype)
        size_class = jnp.argmax(bbox_out['size_class' + suffix], -1)
        size_res = jnp.take_along_axis(
            bbox_out['size_res' + suffix],
            size_class[..., None, None].repeat(3, -1), -2)[..., 0, :]
        size = self.mean_sizes[size_class] + size_res
        return jnp.concatenate([center, size, dir_angle], -1)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        """[B, C, P] conv outputs -> named dict (reference :139-201)."""
        res = {}
        cls_t = jnp.swapaxes(cls_preds, 1, 2)
        reg_t = jnp.swapaxes(reg_preds, 1, 2)
        i = 0
        res['center'] = base_xyz + reg_t[..., i:i + 3]
        i += 3
        res['dir_class'] = reg_t[..., i:i + self.num_dir_bins]
        i += self.num_dir_bins
        dir_res_norm = reg_t[..., i:i + self.num_dir_bins]
        i += self.num_dir_bins
        res['dir_res_norm'] = dir_res_norm
        res['dir_res'] = dir_res_norm * (np.pi / self.num_dir_bins)
        res['size_class'] = reg_t[..., i:i + self.num_sizes]
        i += self.num_sizes
        b, p = reg_t.shape[:2]
        size_res_norm = reg_t[..., i:i + self.num_sizes * 3].reshape(
            b, p, self.num_sizes, 3)
        res['size_res_norm'] = size_res_norm
        res['size_res'] = size_res_norm * self.mean_sizes[None, None]
        res['obj_scores'] = cls_t[..., :2]
        res['sem_scores'] = cls_t[..., 2:]
        return res


@BBOX_CODERS.register('AnchorFreeBBoxCoder')
class AnchorFreeBBoxCoder(PartialBinBasedBBoxCoder):
    """Anchor-free coder (3DSSD): half-size regression, no size bins.

    Reference: mmdet3d/core/bbox/coders/anchor_free_bbox_coder.py:9-129.
    """

    def __init__(self, num_dir_bins, with_rot=True):
        super().__init__(num_dir_bins, 0, [], with_rot=with_rot)

    def encode(self, gt_bboxes_3d, gt_labels_3d):
        center = jnp.concatenate(
            [gt_bboxes_3d[..., :2],
             gt_bboxes_3d[..., 2:3] + gt_bboxes_3d[..., 5:6] * 0.5], -1)
        size_res = gt_bboxes_3d[..., 3:6] / 2
        if self.with_rot:
            dir_class, dir_res = self.angle2class(gt_bboxes_3d[..., 6])
            dir_res = dir_res / (2 * np.pi / self.num_dir_bins)
        else:
            dir_class = jnp.zeros_like(gt_labels_3d)
            dir_res = jnp.zeros(gt_labels_3d.shape, jnp.float32)
        return center, size_res, dir_class, dir_res

    def decode(self, bbox_out):
        center = bbox_out['center']
        b, p = center.shape[:2]
        if self.with_rot:
            dir_class = jnp.argmax(bbox_out['dir_class'], -1)
            dir_res = jnp.take_along_axis(
                bbox_out['dir_res'], dir_class[..., None], -1)[..., 0]
            dir_angle = self.class2angle(dir_class, dir_res)[..., None]
        else:
            dir_angle = jnp.zeros((b, p, 1), center.dtype)
        size = jnp.clip(bbox_out['size'] * 2, 0.1, None)
        return jnp.concatenate([center, size, dir_angle], -1)

    def split_pred(self, cls_preds, reg_preds, base_xyz):
        res = {'obj_scores': cls_preds}
        reg_t = jnp.swapaxes(reg_preds, 1, 2)
        i = 0
        res['center_offset'] = reg_t[..., i:i + 3]
        res['center'] = jax.lax.stop_gradient(base_xyz) + reg_t[..., i:i + 3]
        i += 3
        res['size'] = reg_t[..., i:i + 3]
        i += 3
        res['dir_class'] = reg_t[..., i:i + self.num_dir_bins]
        i += self.num_dir_bins
        dir_res_norm = reg_t[..., i:i + self.num_dir_bins]
        res['dir_res_norm'] = dir_res_norm
        res['dir_res'] = dir_res_norm * (2 * np.pi / self.num_dir_bins)
        return res
