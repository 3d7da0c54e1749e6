"""CPU voxel generator (numpy, host-side).

TPU-native equivalent of the reference's numba VoxelGenerator
(mmdet3d/core/voxel/voxel_generator.py:5-279): first-come-first-serve hard
voxelization on the host, used by CPU-side tooling (data inspection,
dbsampler collision probes) and as the independent oracle for the jitted
``ops.voxelize`` path. Vectorized numpy — no numba needed.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class VoxelGenerator:
    """points -> (voxels, coords, num_points_per_voxel).

    Mirrors the reference constructor surface (voxel_size,
    point_cloud_range, max_num_points, max_voxels).
    """

    def __init__(self, voxel_size: Sequence[float],
                 point_cloud_range: Sequence[float],
                 max_num_points: int, max_voxels: int = 20000):
        self.voxel_size = np.asarray(voxel_size, np.float32)
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.max_num_points = int(max_num_points)
        self.max_voxels = int(max_voxels)
        grid = (self.point_cloud_range[3:] -
                self.point_cloud_range[:3]) / self.voxel_size
        self.grid_size = np.round(grid).astype(np.int64)

    def generate(self, points: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """[N, D] points -> (voxels [V, P, D], coords [V, 3] (z, y, x),
        num_points [V]) with first-come-first-serve semantics
        (reference points_to_voxel, voxel_generator.py:85-279)."""
        vs = self.voxel_size
        lo = self.point_cloud_range[:3]
        c = np.floor((points[:, :3] - lo) / vs).astype(np.int64)
        in_range = np.all((c >= 0) & (c < self.grid_size), axis=1)
        idx = np.nonzero(in_range)[0]
        c = c[idx]
        # linear key in (z, y, x)-major order; stable first-occurrence order
        key = (c[:, 2] * self.grid_size[1] + c[:, 1]) * self.grid_size[0] \
            + c[:, 0]
        uniq, first, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
        # voxels ordered by first appearance (reference FCFS semantics)
        order = np.argsort(first, kind='stable')
        slot_of_uniq = np.empty(len(uniq), np.int64)
        slot_of_uniq[order] = np.arange(len(uniq))
        slot = slot_of_uniq[inv]
        keep_voxel = slot < self.max_voxels
        n_vox = min(len(uniq), self.max_voxels)

        voxels = np.zeros((n_vox, self.max_num_points, points.shape[1]),
                          points.dtype)
        coords = np.zeros((n_vox, 3), np.int32)
        num_points = np.zeros((n_vox,), np.int32)
        # within-voxel arrival rank (stable): order points by (slot, index)
        arrival = np.argsort(slot, kind='stable')
        ranks = np.empty(len(slot), np.int64)
        counts = np.bincount(slot, minlength=len(uniq))   # slot-indexed
        starts = np.zeros(len(uniq) + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        ranks[arrival] = np.arange(len(slot)) - starts[slot[arrival]]
        keep_pt = keep_voxel & (ranks < self.max_num_points)
        voxels[slot[keep_pt], ranks[keep_pt]] = points[idx[keep_pt]]
        first_pt = keep_voxel & (ranks == 0)
        coords[slot[first_pt]] = np.stack(
            [c[:, 2][first_pt], c[:, 1][first_pt], c[:, 0][first_pt]], 1)
        num_points = np.minimum(counts[:n_vox],
                                self.max_num_points).astype(np.int32)
        return voxels, coords, num_points

    def __repr__(self):
        return (f'VoxelGenerator(voxel_size={self.voxel_size.tolist()}, '
                f'range={self.point_cloud_range.tolist()}, '
                f'max_num_points={self.max_num_points}, '
                f'max_voxels={self.max_voxels})')
