"""Rotated BEV / 3D IoU, fully vectorized JAX (no CUDA polygon clipping).

TPU-native equivalent of the reference iou3d CUDA kernels
(mmdet3d/ops/iou3d/src/iou3d_kernel.cu:253-283 ``boxes_overlap_kernel`` /
``boxes_iou_bev_kernel``) and ``BboxOverlaps3D``
(mmdet3d/core/bbox/iou_calculators/iou3d_calculator.py).

Instead of sequential Sutherland-Hodgman clipping, the intersection polygon of
two rotated rectangles is built from a fixed set of 24 candidate vertices
(4+4 contained corners + 16 edge-pair intersections), angle-sorted and reduced
with the shoelace formula — one fused, maskable computation that maps onto the
VPU with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import corners_bev

_EPS = 1e-8


def _point_in_quad(points, quad):
    """points [K, 2] inside convex quad [4, 2] (ccw) -> [K] bool (cross test)."""
    a = quad
    b = jnp.roll(quad, -1, axis=0)
    edge = b - a  # [4, 2]
    rel = points[:, None, :] - a[None, :, :]  # [K, 4, 2]
    cross = edge[None, :, 0] * rel[..., 1] - edge[None, :, 1] * rel[..., 0]
    return jnp.all(cross >= -1e-6, axis=-1)


def _segment_intersections(quad_a, quad_b):
    """All 16 intersection points between edges of two quads.

    Returns (points [16, 2], valid [16]).
    """
    a0 = quad_a                      # [4, 2]
    a1 = jnp.roll(quad_a, -1, axis=0)
    b0 = quad_b
    b1 = jnp.roll(quad_b, -1, axis=0)
    # broadcast to [4, 4, 2]: edge i of A against edge j of B
    p, r = a0[:, None, :], (a1 - a0)[:, None, :]
    q, s = b0[None, :, :], (b1 - b0)[None, :, :]
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]  # [4, 4]
    qmp = q - p
    t = (qmp[..., 0] * s[..., 1] - qmp[..., 1] * s[..., 0]) / (denom + _EPS)
    u = (qmp[..., 0] * r[..., 1] - qmp[..., 1] * r[..., 0]) / (denom + _EPS)
    valid = (jnp.abs(denom) > _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = p + t[..., None] * r
    return pts.reshape(16, 2), valid.reshape(16)


def _convex_area_from_candidates(points, valid):
    """Shoelace area of the convex hull of masked candidate points.

    points: [M, 2], valid: [M]. Valid points are vertices of a convex polygon
    (intersection of two convex sets); sort them by angle around the centroid
    and pad invalid slots with the first valid vertex (repeats contribute zero
    area to the shoelace sum).
    """
    num_valid = jnp.sum(valid)
    big = jnp.float32(1e10)
    w = valid.astype(points.dtype)
    centroid = jnp.sum(points * w[:, None], axis=0) / jnp.maximum(num_valid, 1)
    rel = points - centroid
    ang = jnp.where(valid, jnp.arctan2(rel[:, 1], rel[:, 0]), big)
    order = jnp.argsort(ang)
    sorted_pts = points[order]
    sorted_valid = valid[order]
    # pad invalid slots with the first valid vertex
    first = sorted_pts[0]
    sorted_pts = jnp.where(sorted_valid[:, None], sorted_pts, first[None, :])
    nxt = jnp.roll(sorted_pts, -1, axis=0)
    cross = sorted_pts[:, 0] * nxt[:, 1] - sorted_pts[:, 1] * nxt[:, 0]
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(num_valid >= 3, area, 0.0)


def _pair_overlap_bev(box_a, box_b):
    """Intersection area of two BEV boxes [5] (cx, cy, w, l, yaw)."""
    qa = corners_bev(box_a[None])[0]  # [4, 2]
    qb = corners_bev(box_b[None])[0]
    a_in_b = _point_in_quad(qa, qb)
    b_in_a = _point_in_quad(qb, qa)
    inter_pts, inter_valid = _segment_intersections(qa, qb)
    points = jnp.concatenate([qa, qb, inter_pts], axis=0)       # [24, 2]
    valid = jnp.concatenate([a_in_b, b_in_a, inter_valid], axis=0)
    return _convex_area_from_candidates(points, valid)


def boxes_overlap_bev(boxes_a, boxes_b):
    """Pairwise BEV intersection areas.

    Args:
        boxes_a: [N, 5] (cx, cy, w, l, yaw).
        boxes_b: [M, 5].
    Returns:
        [N, M] intersection areas.
    """
    fn = jax.vmap(jax.vmap(_pair_overlap_bev, in_axes=(None, 0)),
                  in_axes=(0, None))
    return fn(boxes_a, boxes_b)


def boxes_iou_bev(boxes_a, boxes_b):
    """Pairwise rotated BEV IoU (reference: ops/iou3d/iou3d_utils.py:6-24)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - overlap
    return overlap / jnp.maximum(union, _EPS)


def boxes_iou_3d(boxes_a, boxes_b, mode: str = 'iou'):
    """Pairwise 3D IoU of bottom-center boxes [*, 7].

    BEV polygon overlap x vertical overlap / union of volumes.
    Reference: iou3d_calculator.py BboxOverlaps3D (coordinate='lidar').
    """
    bev_a = jnp.concatenate([boxes_a[:, 0:2], boxes_a[:, 3:5], boxes_a[:, 6:7]], -1)
    bev_b = jnp.concatenate([boxes_b[:, 0:2], boxes_b[:, 3:5], boxes_b[:, 6:7]], -1)
    overlap_bev = boxes_overlap_bev(bev_a, bev_b)  # [N, M]
    za0, za1 = boxes_a[:, 2], boxes_a[:, 2] + boxes_a[:, 5]
    zb0, zb1 = boxes_b[:, 2], boxes_b[:, 2] + boxes_b[:, 5]
    z_overlap = jnp.maximum(
        jnp.minimum(za1[:, None], zb1[None, :]) -
        jnp.maximum(za0[:, None], zb0[None, :]), 0.0)
    inter = overlap_bev * z_overlap
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    if mode == 'iou':
        union = vol_a[:, None] + vol_b[None, :] - inter
    else:  # 'iof'
        union = vol_a[:, None]
    return inter / jnp.maximum(union, _EPS)
