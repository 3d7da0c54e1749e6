"""Point-cloud / annotation / image loading transforms (numpy, CPU side).

TPU-native re-design of mmdet3d/datasets/pipelines/loading.py:
- ``LoadPointsFromFile`` (:728): .bin float32 readers with use_dim select.
- ``LoadPointsFromMultiSweeps`` (:503): per-sweep sensor2lidar transform +
  timestamp channel + concat (loading.py:604-637 semantics).
- ``LoadAnnotations3D`` (:834): gt boxes/labels from the info dict.
- ``LoadMultiViewImageFromFiles`` (:429): 6-camera image stack.
- ``PadPoints`` (new): pads/crops to the fixed TPU capacity with a mask —
  the static-shape replacement for dynamic point counts.

The device boundary: every output is a fixed-shape numpy array; jit-compiled
code starts at voxelization.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ...registry import PIPELINES


@PIPELINES.register('LoadPointsFromFile')
class LoadPointsFromFile:
    def __init__(self, coord_type='LIDAR', load_dim=5, use_dim=(0, 1, 2, 3),
                 shift_height=False, file_client_args=None):
        self.coord_type = coord_type
        self.load_dim = load_dim
        self.use_dim = list(use_dim) if not isinstance(use_dim, int) \
            else list(range(use_dim))
        self.shift_height = shift_height

    def _load(self, path):
        if path.endswith('.npy'):
            points = np.load(path)
        else:
            points = np.fromfile(path, dtype=np.float32)
        return points.reshape(-1, self.load_dim)

    def __call__(self, results):
        points = self._load(results['pts_filename'])[:, self.use_dim]
        points = points.astype(np.float32)
        if self.shift_height:
            # indoor height channel: z minus the 0.99-percentile floor
            # (reference loading.py:810-814)
            floor = np.percentile(points[:, 2], 0.99)
            points = np.concatenate(
                [points, (points[:, 2] - floor)[:, None]], axis=1)
        results['points'] = points
        return results


@PIPELINES.register('LoadPointsFromMultiSweeps')
class LoadPointsFromMultiSweeps:
    def __init__(self, sweeps_num=10, load_dim=5, use_dim=(0, 1, 2, 3, 4),
                 pad_empty_sweeps=True, remove_close=True, test_mode=False,
                 file_client_args=None):
        self.sweeps_num = sweeps_num
        self.load_dim = load_dim
        self.use_dim = list(use_dim)
        self.pad_empty_sweeps = pad_empty_sweeps
        self.remove_close = remove_close
        self.test_mode = test_mode

    def _remove_close(self, points, radius=1.0):
        dist = np.linalg.norm(points[:, :2], axis=1)
        return points[dist > radius]

    def __call__(self, results):
        points = results['points']
        points[:, 4] = 0.0 if points.shape[1] > 4 else 0
        sweep_points = [points]
        ts = results.get('timestamp', 0) / 1e6
        sweeps = results.get('sweeps', [])
        if len(sweeps) == 0 and self.pad_empty_sweeps:
            for _ in range(self.sweeps_num):
                sweep_points.append(
                    self._remove_close(points) if self.remove_close
                    else points)
        else:
            if len(sweeps) <= self.sweeps_num:
                choices = np.arange(len(sweeps))
            elif self.test_mode:
                choices = np.arange(self.sweeps_num)
            else:
                choices = np.random.choice(len(sweeps), self.sweeps_num,
                                           replace=False)
            for idx in choices:
                sweep = sweeps[idx]
                pts = np.fromfile(sweep['data_path'],
                                  dtype=np.float32).reshape(-1, self.load_dim)
                if self.remove_close:
                    pts = self._remove_close(pts)
                rot = sweep['sensor2lidar_rotation']
                trans = sweep['sensor2lidar_translation']
                pts[:, :3] = pts[:, :3] @ rot.T + trans
                sweep_ts = sweep['timestamp'] / 1e6
                pts[:, 4] = ts - sweep_ts
                sweep_points.append(pts)
        points = np.concatenate(sweep_points, axis=0)[:, self.use_dim]
        results['points'] = points.astype(np.float32)
        return results


@PIPELINES.register('LoadAnnotations3D')
class LoadAnnotations3D:
    def __init__(self, with_bbox_3d=True, with_label_3d=True,
                 with_mask_3d=False, with_seg_3d=False,
                 seg_3d_dtype=np.int64, **kwargs):
        self.with_bbox_3d = with_bbox_3d
        self.with_label_3d = with_label_3d
        self.with_mask_3d = with_mask_3d
        self.with_seg_3d = with_seg_3d
        self.seg_3d_dtype = seg_3d_dtype

    def __call__(self, results):
        ann = results['ann_info']
        if self.with_bbox_3d:
            results['gt_bboxes_3d'] = ann['gt_bboxes_3d'].astype(np.float32)
        if self.with_label_3d:
            results['gt_labels_3d'] = ann['gt_labels_3d'].astype(np.int64)
        if self.with_mask_3d:
            # per-point instance ids (reference loading.py:916-939)
            path = ann['pts_instance_mask_path']
            results['pts_instance_mask'] = np.fromfile(path, dtype=np.int64)
        if self.with_seg_3d:
            path = ann['pts_semantic_mask_path']
            results['pts_semantic_mask'] = np.fromfile(
                path, dtype=self.seg_3d_dtype).astype(np.int64)
        return results


@PIPELINES.register('LoadMultiViewImageFromFiles')
class LoadMultiViewImageFromFiles:
    def __init__(self, to_float32=False, color_type='color'):
        self.to_float32 = to_float32

    def __call__(self, results):
        try:
            from PIL import Image
            imgs = [np.asarray(Image.open(p)) for p in
                    results['img_filename']]
        except ImportError:  # pragma: no cover
            imgs = [np.zeros((900, 1600, 3), np.uint8)
                    for _ in results['img_filename']]
        img = np.stack(imgs, axis=0)
        if self.to_float32:
            img = img.astype(np.float32)
        results['img'] = img
        results['img_shape'] = img.shape[1:]
        results['ori_shape'] = img.shape[1:]
        return results


@PIPELINES.register('MyResize')
@PIPELINES.register('ImageResize')
class ImageResize:
    """Resize the multi-view image stack, recording ``scale_factor``.

    Equivalent of the reference's ``MyResize`` (mmdet3d/datasets/pipelines/
    loading.py:11-312) in single-scale keep_ratio mode: the rescale factor is
    ``min(max(scale)/max(h,w), min(scale)/min(h,w))`` (mmcv imrescale), and
    ``scale_factor = [w_scale, h_scale, w_scale, h_scale]`` is stored for the
    foreground pixel replay (``ImgScaleCropFlipForeground2D``).
    """

    def __init__(self, img_scale=None, keep_ratio=True, multiscale_mode=None,
                 ratio_range=None, bbox_clip_border=True, backend=None):
        self.img_scale = tuple(img_scale)
        self.keep_ratio = keep_ratio

    def _target_hw(self, h, w):
        if self.keep_ratio:
            f = min(max(self.img_scale) / max(h, w),
                    min(self.img_scale) / min(h, w))
            return int(h * f + 0.5), int(w * f + 0.5)
        return min(self.img_scale), max(self.img_scale)

    @staticmethod
    def _resize(img, new_h, new_w):
        try:
            from PIL import Image
            out = np.stack([
                np.asarray(Image.fromarray(
                    im.astype(np.uint8) if im.dtype != np.uint8 else im
                ).resize((new_w, new_h), Image.BILINEAR)) for im in img])
            return out.astype(img.dtype) if img.dtype != np.uint8 else out
        except ImportError:  # pragma: no cover - PIL is available in CI
            ys = (np.arange(new_h) * img.shape[1] / new_h).astype(int)
            xs = (np.arange(new_w) * img.shape[2] / new_w).astype(int)
            return img[:, ys][:, :, xs]

    def __call__(self, results):
        img = results['img']                     # [V, H, W, 3]
        h, w = img.shape[1:3]
        new_h, new_w = self._target_hw(h, w)
        results['img'] = self._resize(img, new_h, new_w)
        w_scale, h_scale = new_w / w, new_h / h
        results['img_shape'] = results['img'].shape[1:]
        results['scale_factor'] = np.array(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        results['keep_ratio'] = self.keep_ratio
        return results


@PIPELINES.register('MyNormalize')
@PIPELINES.register('ImageNormalize')
class ImageNormalize:
    """Normalize the multi-view image stack (reference ``MyNormalize``,
    loading.py:313-354).

    ``to_rgb`` in the reference converts mmcv's BGR load order to RGB; our
    loader (PIL) already yields RGB, so the flag is a no-op kept for config
    parity — the mean/std below are RGB-order values either way.
    """

    def __init__(self, mean, std, to_rgb=True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results['img'].astype(np.float32)
        results['img'] = (img - self.mean) / self.std
        results['img_norm_cfg'] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register('MyPad')
@PIPELINES.register('ImagePad')
class ImagePad:
    """Zero-pad images to a size divisor / fixed size (reference ``MyPad``,
    loading.py:355-428)."""

    def __init__(self, size=None, size_divisor=None, pad_val=0):
        assert (size is None) != (size_divisor is None)
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        img = results['img']
        h, w = img.shape[1:3]
        if self.size_divisor is not None:
            d = self.size_divisor
            ph, pw = -(-h // d) * d, -(-w // d) * d
        else:
            ph, pw = self.size
        if (ph, pw) != (h, w):
            out = np.full((img.shape[0], ph, pw, img.shape[3]),
                          self.pad_val, img.dtype)
            out[:, :h, :w] = img
            results['img'] = out
        results['pad_shape'] = results['img'].shape[1:]
        results['pad_fixed_size'] = self.size
        results['pad_size_divisor'] = self.size_divisor
        return results


@PIPELINES.register('PadPoints')
class PadPoints:
    """Pad/crop the point cloud to a fixed capacity with a validity mask."""

    def __init__(self, max_points: int):
        self.max_points = max_points

    def __call__(self, results):
        points = results['points']
        n = points.shape[0]
        cap = self.max_points
        if n >= cap:
            if n > cap:
                from ...utils import overflow
                if overflow.enabled():
                    overflow._accumulate('pipeline.points_cap', n - cap)
            results['points'] = points[:cap]
            results['points_mask'] = np.ones(cap, bool)
        else:
            pad = np.zeros((cap - n, points.shape[1]), points.dtype)
            results['points'] = np.concatenate([points, pad])
            mask = np.zeros(cap, bool)
            mask[:n] = True
            results['points_mask'] = mask
        return results


@PIPELINES.register('PadGroundTruth')
class PadGroundTruth:
    """Pad GT boxes/labels to a fixed capacity with a validity mask."""

    def __init__(self, max_gt: int = 500, box_dim: int = 9):
        self.max_gt = max_gt
        self.box_dim = box_dim

    def __call__(self, results):
        boxes = results.get('gt_bboxes_3d',
                            np.zeros((0, self.box_dim), np.float32))
        labels = results.get('gt_labels_3d', np.zeros((0,), np.int64))
        g = min(boxes.shape[0], self.max_gt)
        out_boxes = np.zeros((self.max_gt, self.box_dim), np.float32)
        out_labels = np.zeros((self.max_gt,), np.int64)
        mask = np.zeros((self.max_gt,), bool)
        if boxes.shape[0]:
            d = min(boxes.shape[1], self.box_dim)
            out_boxes[:g, :d] = boxes[:g, :d]
            out_labels[:g] = labels[:g]
            mask[:g] = True
        results['gt_bboxes_3d'] = out_boxes
        results['gt_labels_3d'] = out_labels
        results['gt_valid'] = mask
        return results


@PIPELINES.register('FormatBundle3D')
class FormatBundle3D:
    """Collect the fixed-shape arrays for batching (DefaultFormatBundle3D +
    Collect3D equivalent, reference formating.py:262)."""

    KEYS = ('points', 'points_mask', 'gt_bboxes_3d', 'gt_labels_3d',
            'gt_valid', 'img', 'foreground')

    def __init__(self, class_names=None, with_label=True):
        self.class_names = class_names
        self.with_label = with_label

    def __call__(self, results):
        out = {k: results[k] for k in self.KEYS if k in results}
        out['metas'] = {
            k: results[k] for k in
            ('sample_idx', 'pts_filename', 'token', 'timestamp',
             'lidar2img', 'flip_state', 'aug_state', 'scale_factor',
             'img_shape', 'ori_shape', 'pad_shape', 'img_norm_cfg')
            if k in results}
        return out


class Compose:
    """Sequential pipeline composition (mmcv Compose equivalent)."""

    def __init__(self, transforms: Sequence[Any]):
        from ...registry import PIPELINES as REG
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(REG.build(dict(t)))
            else:
                self.transforms.append(t)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results
