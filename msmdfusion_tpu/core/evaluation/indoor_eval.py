"""Indoor (ScanNet/SUNRGBD) detection evaluation.

Numpy re-implementation of the reference protocol
(mmdet3d/core/evaluation/indoor_eval.py:7-309): per-class greedy matching
by 3D IoU at multiple thresholds, VOC-style AP (area under the PR curve),
AR = max recall. Boxes are plain [N, 7] depth-frame arrays
(x, y, z_bottom, dx, dy, dz, yaw).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def average_precision(recalls, precisions, mode='area'):
    """VOC AP from PR points (reference indoor_eval.py:7-53)."""
    if recalls.ndim == 1:
        recalls = recalls[None]
        precisions = precisions[None]
    num_scales = recalls.shape[0]
    ap = np.zeros(num_scales, np.float32)
    if mode == 'area':
        zeros = np.zeros((num_scales, 1), recalls.dtype)
        ones = np.ones((num_scales, 1), recalls.dtype)
        mrec = np.hstack((zeros, recalls, ones))
        mpre = np.hstack((zeros, precisions, zeros))
        for i in range(mpre.shape[1] - 1, 0, -1):
            mpre[:, i - 1] = np.maximum(mpre[:, i - 1], mpre[:, i])
        for i in range(num_scales):
            ind = np.where(mrec[i, 1:] != mrec[i, :-1])[0]
            ap[i] = np.sum((mrec[i, ind + 1] - mrec[i, ind])
                           * mpre[i, ind + 1])
    elif mode == '11points':
        for i in range(num_scales):
            for thr in np.arange(0, 1 + 1e-3, 0.1):
                precs = precisions[i, recalls[i] >= thr]
                ap[i] += (precs.max() if precs.size else 0.0) / 11
    else:
        raise ValueError(mode)
    return ap


def _iou_3d(pred_boxes: np.ndarray, gt_boxes: np.ndarray) -> np.ndarray:
    """[P, G] rotated 3D IoU via the jax implementation (z-up frames)."""
    import jax.numpy as jnp
    from ..iou3d import boxes_iou_3d
    if len(pred_boxes) == 0 or len(gt_boxes) == 0:
        return np.zeros((len(pred_boxes), len(gt_boxes)), np.float32)
    return np.asarray(boxes_iou_3d(jnp.asarray(pred_boxes, jnp.float32),
                                   jnp.asarray(gt_boxes, jnp.float32)))


def eval_det_cls(pred: Dict, gt: Dict, iou_thr: Sequence[float]):
    """Single-class PR over all samples (reference :55-160).

    pred: {sample_id: [(box [7], score), ...]};  gt: {sample_id: [G, 7]}.
    Returns list of (recall, precision, ap) per threshold.
    """
    class_recs = {}
    npos = 0
    for sid, boxes in gt.items():
        boxes = np.asarray(boxes).reshape(-1, 7)
        class_recs[sid] = dict(
            bbox=boxes, det=[np.zeros(len(boxes), bool) for _ in iou_thr])
        npos += len(boxes)
    sample_ids, confidence, ious = [], [], []
    for sid, dets in pred.items():
        if not len(dets):
            continue
        boxes = np.stack([d[0] for d in dets]).reshape(-1, 7)
        scores = [d[1] for d in dets]
        gt_cur = class_recs.get(sid, dict(bbox=np.zeros((0, 7))))['bbox']
        iou_cur = _iou_3d(boxes, gt_cur)
        for i, s in enumerate(scores):
            sample_ids.append(sid)
            confidence.append(s)
            ious.append(iou_cur[i] if len(gt_cur) else np.zeros(1))
    order = np.argsort(-np.asarray(confidence)) if confidence else []
    nd = len(order)
    tp_thr = [np.zeros(nd) for _ in iou_thr]
    fp_thr = [np.zeros(nd) for _ in iou_thr]
    for d, oi in enumerate(order):
        sid = sample_ids[oi]
        rec = class_recs.get(sid)
        cur_iou = ious[oi]
        iou_max, jmax = -np.inf, -1
        if rec is not None and len(rec['bbox']):
            jmax = int(np.argmax(cur_iou))
            iou_max = cur_iou[jmax]
        for t, thr in enumerate(iou_thr):
            if iou_max > thr and not rec['det'][t][jmax]:
                tp_thr[t][d] = 1.0
                rec['det'][t][jmax] = True
            else:
                fp_thr[t][d] = 1.0
    out = []
    for t in range(len(iou_thr)):
        fp = np.cumsum(fp_thr[t])
        tp = np.cumsum(tp_thr[t])
        recall = tp / max(float(npos), 1e-12)
        precision = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
        out.append((recall, precision, float(average_precision(
            recall, precision)[0])))
    return out


def indoor_eval(gt_annos: List[Dict], dt_annos: List[Dict],
                iou_thr: Sequence[float],
                class_names: Sequence[str]) -> Dict[str, float]:
    """Multi-class indoor mAP/mAR (reference :203-309).

    gt_annos[i]: {'gt_bboxes_3d': [G, 7], 'gt_labels_3d': [G]};
    dt_annos[i]: {'bboxes': [D, 7(+)] , 'scores': [D], 'labels': [D]}.
    """
    pred: Dict[int, Dict] = {}
    gt: Dict[int, Dict] = {}
    for sid, (g, d) in enumerate(zip(gt_annos, dt_annos)):
        labels = np.asarray(d['labels'])
        boxes = np.asarray(d['bboxes'])[:, :7]
        scores = np.asarray(d['scores'])
        for ci in range(len(class_names)):
            m = labels == ci
            pred.setdefault(ci, {}).setdefault(sid, [])
            for b, s in zip(boxes[m], scores[m]):
                pred[ci][sid].append((b, float(s)))
        g_labels = np.asarray(g['gt_labels_3d'])
        g_boxes = np.asarray(g['gt_bboxes_3d'])[:, :7] \
            if len(g['gt_bboxes_3d']) else np.zeros((0, 7))
        for ci in range(len(class_names)):
            gt.setdefault(ci, {})[sid] = g_boxes[g_labels == ci] \
                if len(g_boxes) else np.zeros((0, 7))
    metrics: Dict[str, float] = {}
    for t, thr in enumerate(iou_thr):
        aps, ars = [], []
        for ci, name in enumerate(class_names):
            if not any(len(v) for v in gt[ci].values()):
                continue
            rec, prec, ap = eval_det_cls(pred[ci], gt[ci], iou_thr)[t]
            metrics[f'{name}_AP_{thr:.2f}'] = ap
            metrics[f'{name}_rec_{thr:.2f}'] = float(
                rec[-1] if len(rec) else 0.0)
            aps.append(ap)
            ars.append(rec[-1] if len(rec) else 0.0)
        metrics[f'mAP_{thr:.2f}'] = float(np.mean(aps)) if aps else 0.0
        metrics[f'mAR_{thr:.2f}'] = float(np.mean(ars)) if ars else 0.0
    return metrics
