"""Numpy box math for the CPU data pipeline.

TPU-native counterpart of mmdet3d/core/bbox/box_np_ops.py:857 — only the
subset the pipeline/dbsampler/converters need, re-derived from the geometry
(not a port): corners, point-in-rotated-box, range masks.
"""
from __future__ import annotations

import numpy as np


def corners_bev_np(boxes):
    """[N, 5] (cx, cy, w, l, yaw) -> [N, 4, 2] ccw corners."""
    cx, cy, w, l, yaw = [boxes[:, i] for i in range(5)]
    dx = np.stack([w, w, -w, -w], axis=1) * 0.5
    dy = np.stack([-l, l, l, -l], axis=1) * 0.5
    c, s = np.cos(yaw)[:, None], np.sin(yaw)[:, None]
    rx = dx * c - dy * s + cx[:, None]
    ry = dx * s + dy * c + cy[:, None]
    return np.stack([rx, ry], axis=-1)


def corners_3d_np(boxes):
    """[N, 7] bottom-center boxes -> [N, 8, 3] corners."""
    dims = boxes[:, 3:6]
    unit = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 1, 0], [1, 1, 1], [1, 0, 1], [1, 0, 0]],
                    boxes.dtype) - [0.5, 0.5, 0.0]
    corners = unit[None] * dims[:, None, :]
    yaw = boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    out = np.stack([x, y, corners[..., 2]], axis=-1)
    return out + boxes[:, None, :3]


def points_in_rbbox_np(points, boxes):
    """points [P, 3], boxes [N, 7+] -> [P, N] bool."""
    if len(boxes) == 0:
        return np.zeros((len(points), 0), bool)
    local = points[:, None, :3] - boxes[None, :, :3]
    yaw = boxes[:, 6]
    c, s = np.cos(-yaw), np.sin(-yaw)
    lx = local[..., 0] * c[None] - local[..., 1] * s[None]
    ly = local[..., 0] * s[None] + local[..., 1] * c[None]
    lz = local[..., 2]
    return ((np.abs(lx) <= boxes[:, 3] * 0.5) &
            (np.abs(ly) <= boxes[:, 4] * 0.5) &
            (lz >= 0) & (lz <= boxes[:, 5]))


def limit_period_np(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period
