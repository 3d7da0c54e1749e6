"""Indoor / segmentation pipeline transforms (numpy, CPU side).

TPU-native equivalents of the reference indoor pipeline
(mmdet3d/datasets/pipelines/transforms_3d.py: ``IndoorPointSample`` :578,
``BackgroundPointsFilter`` :656, ``VoxelBasedPointSampler`` :720;
loading.py: ``PointSegClassMapping`` :644, ``NormalizePointsColor`` :691).
Points are plain [N, F] numpy arrays; the per-point instance/semantic masks
ride along under ``pts_instance_mask`` / ``pts_semantic_mask``.
"""
from __future__ import annotations

import numpy as np

from ...registry import PIPELINES


@PIPELINES.register('IndoorPointSample')
class IndoorPointSample:
    """Random-sample points to a fixed count (with replacement when the
    cloud is smaller), keeping instance/semantic masks aligned
    (reference transforms_3d.py:578-651)."""

    def __init__(self, num_points: int):
        self.num_points = num_points

    def __call__(self, results):
        points = results['points']
        n = points.shape[0]
        replace = n < self.num_points
        choices = np.random.choice(n, self.num_points, replace=replace)
        results['points'] = points[choices]
        # fixed count -> the static-shape mask is all-true (device batching)
        results['points_mask'] = np.ones(self.num_points, bool)
        for key in ('pts_instance_mask', 'pts_semantic_mask'):
            if results.get(key) is not None:
                results[key] = results[key][choices]
        return results


@PIPELINES.register('PointSegClassMapping')
class PointSegClassMapping:
    """Map raw semantic ids to contiguous [0, n_valid) with n_valid for
    everything else (reference loading.py:644-687; vectorized lookup table
    instead of the reference's per-point python loop)."""

    def __init__(self, valid_cat_ids):
        self.valid_cat_ids = tuple(int(v) for v in valid_cat_ids)
        max_id = max(self.valid_cat_ids) + 1
        self.lut = np.full(max_id + 1, len(self.valid_cat_ids), np.int64)
        for i, cid in enumerate(self.valid_cat_ids):
            self.lut[cid] = i

    def __call__(self, results):
        mask = np.asarray(results['pts_semantic_mask'], np.int64)
        clipped = np.clip(mask, 0, len(self.lut) - 1)
        mapped = self.lut[clipped]
        # out-of-table ids (> max valid id) are background too
        mapped = np.where(mask >= len(self.lut), len(self.valid_cat_ids),
                          mapped)
        results['pts_semantic_mask'] = mapped
        return results


@PIPELINES.register('NormalizePointsColor')
class NormalizePointsColor:
    """Subtract the mean color / 256 from channels 3:6
    (reference loading.py:691-725)."""

    def __init__(self, color_mean):
        self.color_mean = np.asarray(color_mean, np.float32)

    def __call__(self, results):
        points = results['points']
        assert points.shape[1] >= 6, \
            f'NormalizePointsColor needs >=6 channels, got {points.shape[1]}'
        points[:, 3:6] = points[:, 3:6] - self.color_mean / 256.0
        results['points'] = points
        return results


@PIPELINES.register('BackgroundPointsFilter')
class BackgroundPointsFilter:
    """Drop points inside the enlarged-but-not-original GT boxes
    (reference transforms_3d.py:656-718). Boxes are [N, 7+] bottom-center;
    the in-box test runs on gravity centers like the reference."""

    def __init__(self, bbox_enlarge_range):
        if isinstance(bbox_enlarge_range, (int, float)):
            bbox_enlarge_range = [float(bbox_enlarge_range)] * 3
        self.bbox_enlarge_range = np.asarray(
            bbox_enlarge_range, np.float32)[None, :]

    def __call__(self, results):
        from ...core.box_np_ops import points_in_rbbox_np
        points = results['points']
        boxes = np.asarray(results['gt_bboxes_3d'], np.float32)
        if len(boxes) == 0:
            return results
        boxes = boxes[:, :7].copy()
        # bottom-center -> gravity-center (reference uses gravity_center)
        boxes[:, 2] += boxes[:, 5] / 2
        enlarged = boxes.copy()
        enlarged[:, 3:6] += self.bbox_enlarge_range
        # points_in_rbbox_np expects bottom-center boxes
        def bottom(b):
            b = b.copy()
            b[:, 2] -= b[:, 5] / 2
            return b
        fg = points_in_rbbox_np(points[:, :3], bottom(boxes)).max(1)
        fg_enl = points_in_rbbox_np(points[:, :3], bottom(enlarged)).max(1)
        valid = ~(~fg & fg_enl)
        results['points'] = points[valid]
        for key in ('pts_instance_mask', 'pts_semantic_mask'):
            if results.get(key) is not None:
                results[key] = results[key][valid]
        return results


@PIPELINES.register('VoxelBasedPointSampler')
class VoxelBasedPointSampler:
    """Voxel-downsample current/previous sweep points to fixed counts
    (reference transforms_3d.py:720-857) using the CPU VoxelGenerator.
    Seg/mask fields are carried as extra channels through the sampler."""

    def __init__(self, cur_sweep_cfg, prev_sweep_cfg=None, time_dim=3):
        from ...core.voxel_generator import VoxelGenerator
        self.cur = VoxelGenerator(**cur_sweep_cfg)
        self.time_dim = time_dim
        if prev_sweep_cfg is not None:
            assert (prev_sweep_cfg['max_num_points'] ==
                    cur_sweep_cfg['max_num_points'])
            self.prev = VoxelGenerator(**prev_sweep_cfg)
        else:
            self.prev = None

    def _sample(self, points, sampler, dim):
        voxels, coors, num_points = sampler.generate(points)
        if voxels.shape[0] < sampler.max_voxels:
            pad = np.zeros((sampler.max_voxels - voxels.shape[0],
                            sampler.max_num_points, dim), points.dtype)
            pad[:] = voxels[0] if len(voxels) else 0
            voxels = np.concatenate([voxels, pad], axis=0)
        return voxels

    def __call__(self, results):
        points = results['points']
        original_dim = points.shape[1]
        extra = [points]
        fields = []
        for key in ('pts_instance_mask', 'pts_semantic_mask'):
            if results.get(key) is not None:
                fields.append((key, original_dim + len(fields)))
                extra.append(np.asarray(results[key],
                                        np.float32)[:, None])
        pts = np.concatenate(extra, axis=-1).astype(np.float32)

        cur_flag = pts[:, self.time_dim] == 0
        cur_pts, prev_pts = pts[cur_flag], pts[~cur_flag]
        if prev_pts.shape[0] == 0:
            prev_pts = cur_pts
        np.random.shuffle(cur_pts)
        np.random.shuffle(prev_pts)

        cur_pts = self._sample(cur_pts, self.cur, pts.shape[1])
        if self.prev is not None:
            prev_pts = self._sample(prev_pts, self.prev, pts.shape[1])
            pts = np.concatenate([cur_pts, prev_pts], axis=0)
        else:
            pts = cur_pts
        if self.cur.max_num_points == 1:
            pts = pts.squeeze(1)
        results['points'] = pts[..., :original_dim]
        for key, dim in fields:
            results[key] = pts[..., dim]
        return results
