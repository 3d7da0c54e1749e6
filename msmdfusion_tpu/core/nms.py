"""Rotated / circle / multiclass NMS as fixed-shape jittable JAX.

TPU-native equivalents of:
- bitmask rotated NMS CUDA kernels (reference
  mmdet3d/ops/iou3d/src/iou3d_kernel.cu:284 ``nms_kernel``, :345
  ``nms_normal_kernel`` exposed via ops/iou3d/iou3d_utils.py:27-71), and
- numba ``circle_nms`` (mmdet3d/core/post_processing/box3d_nms.py:141-181),
- ``box3d_multiclass_nms`` / ``aligned_3d_nms`` (box3d_nms.py:8-138).

The greedy sequential scan over score-sorted candidates becomes a
``lax.fori_loop`` over a precomputed [N, N] pairwise-suppression matrix; all
outputs are fixed-capacity with validity masks instead of dynamic gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .iou3d import boxes_iou_bev

NEG_INF = -1e9


def _greedy_suppress(suppress_matrix, valid):
    """Greedy NMS given a precomputed pairwise suppression matrix.

    Args:
        suppress_matrix: [N, N] bool; entry (i, j) True if box i (higher rank)
            suppresses box j. Rows/cols are assumed score-sorted descending.
        valid: [N] bool initial validity.
    Returns:
        keep: [N] bool.
    """
    n = suppress_matrix.shape[0]
    idx = jnp.arange(n)
    later = idx[None, :] > idx[:, None]
    suppress_matrix = suppress_matrix & later

    def body(i, keep):
        row = suppress_matrix[i] & keep[i]
        return keep & ~row

    return jax.lax.fori_loop(0, n, body, valid)


def nms_bev(boxes_bev, scores, thresh: float, valid=None,
            pre_max_size: int | None = None, post_max_size: int | None = None):
    """Rotated BEV NMS.

    Args:
        boxes_bev: [N, 5] (cx, cy, w, l, yaw) — note the reference nms_gpu
            takes (x1, y1, x2, y2, yaw) via xywhr2xyxyr; here we keep the
            center form and compute the same rotated overlap.
        scores: [N].
        thresh: IoU threshold.
        valid: optional [N] bool mask.
    Returns:
        (keep [N] bool aligned to the *sorted* order, order [N] indices into
        the input arrays).
    """
    n = boxes_bev.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    if pre_max_size is not None and pre_max_size < n:
        order = order[:pre_max_size]
    sorted_boxes = boxes_bev[order]
    sorted_valid = valid[order]
    iou = boxes_iou_bev(sorted_boxes, sorted_boxes)
    keep = _greedy_suppress(iou > thresh, sorted_valid)
    if post_max_size is not None:
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (rank < post_max_size)
    return keep, order


def circle_nms(centers_xy, scores, radius: float, valid=None,
               post_max_size: int | None = None):
    """Distance-based NMS (reference numba circle_nms, box3d_nms.py:141-181).

    Suppresses any lower-scored box whose center lies within ``radius`` of a
    kept higher-scored box (squared-distance test like the reference).
    """
    n = centers_xy.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    pts = centers_xy[order]
    sorted_valid = valid[order]
    diff = pts[:, None, :] - pts[None, :, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    keep = _greedy_suppress(dist2 < radius * radius, sorted_valid)
    if post_max_size is not None:
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (rank < post_max_size)
    return keep, order


def box3d_multiclass_nms(boxes_3d, boxes_bev, scores, score_thr: float,
                         nms_thr: float, max_num: int, valid=None):
    """Multi-class NMS over per-class score columns, fixed-capacity output.

    Args:
        boxes_3d: [N, 7+] decoded boxes.
        boxes_bev: [N, 5] rotated BEV boxes for overlap tests.
        scores: [N, C] per-class scores (no background column).
        score_thr: filter threshold.
        nms_thr: IoU threshold.
        max_num: output capacity.
    Returns:
        dict with 'boxes' [max_num, D], 'scores' [max_num], 'labels' [max_num],
        'valid' [max_num] — a masked fixed-size result set
        (reference box3d_multiclass_nms returns dynamic concatenations).
    """
    n, num_classes = scores.shape
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    all_scores, all_labels, all_keep = [], [], []
    for cls in range(num_classes):
        cls_scores = scores[:, cls]
        cls_valid = valid & (cls_scores > score_thr)
        keep, order = nms_bev(boxes_bev, cls_scores, nms_thr, valid=cls_valid)
        # un-sort keep back to input order
        keep_input_order = jnp.zeros((n,), bool).at[order].set(keep)
        all_keep.append(keep_input_order & cls_valid)
        all_scores.append(cls_scores)
        all_labels.append(jnp.full((n,), cls, dtype=jnp.int32))

    cat_scores = jnp.concatenate(all_scores)
    cat_labels = jnp.concatenate(all_labels)
    cat_keep = jnp.concatenate(all_keep)
    cat_boxes = jnp.tile(boxes_3d, (num_classes, 1))

    sel_scores = jnp.where(cat_keep, cat_scores, NEG_INF)
    top = jnp.argsort(-sel_scores)[:max_num]
    return {
        'boxes': cat_boxes[top],
        'scores': cat_scores[top],
        'labels': cat_labels[top],
        'valid': cat_keep[top],
    }


def aligned_3d_nms(boxes_xyzxyz, scores, classes, thresh: float, valid=None):
    """Axis-aligned 3D NMS (reference box3d_nms.py aligned_3d_nms:96-138).

    Args:
        boxes_xyzxyz: [N, 6] (x1, y1, z1, x2, y2, z2).
    Returns:
        (keep [N] bool over sorted order, order [N]).
    """
    n = boxes_xyzxyz.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    b = boxes_xyzxyz[order]
    cls = classes[order]
    sorted_valid = valid[order]
    lo = jnp.maximum(b[:, None, :3], b[None, :, :3])
    hi = jnp.minimum(b[:, None, 3:], b[None, :, 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol = jnp.prod(b[:, 3:] - b[:, :3], axis=-1)
    union = vol[:, None] + vol[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-8)
    same_class = cls[:, None] == cls[None, :]
    keep = _greedy_suppress((iou > thresh) & same_class, sorted_valid)
    return keep, order
