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
