"""Lyft detection mAP and semantic-segmentation metrics.

Numpy re-implementations of the reference protocols:
- lyft_eval (mmdet3d/core/evaluation/lyft_eval.py:89-283): per-class AP
  averaged over 3D-IoU thresholds 0.5:0.05:0.95, devkit-free.
- seg_eval (mmdet3d/core/evaluation/seg_eval.py:6-121): confusion-matrix
  mIoU / overall accuracy / per-class accuracy.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .indoor_eval import average_precision, _iou_3d

LYFT_IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)


def get_single_class_aps(gt: List[Dict], predictions: List[Dict],
                         iou_thresholds=LYFT_IOU_THRESHOLDS):
    """(recalls, precisions, aps) per threshold (reference :198-283).

    gt / predictions: dicts with 'sample_token', 'box' [7] (+ 'score').
    """
    num_gts = len(gt)
    image_gts: Dict[str, List] = {}
    for g in gt:
        image_gts.setdefault(g['sample_token'], []).append(g['box'])
    image_gts = {k: np.stack(v) for k, v in image_gts.items()}
    checked = {k: np.zeros((len(v), len(iou_thresholds)))
               for k, v in image_gts.items()}
    predictions = sorted(predictions, key=lambda x: -x['score'])
    nd = len(predictions)
    tps = np.zeros((nd, len(iou_thresholds)))
    fps = np.zeros((nd, len(iou_thresholds)))
    for di, pred in enumerate(predictions):
        token = pred['sample_token']
        gt_boxes = image_gts.get(token)
        max_overlap, jmax = -np.inf, -1
        if gt_boxes is not None and len(gt_boxes):
            overlaps = _iou_3d(np.asarray(pred['box'])[None], gt_boxes)[0]
            jmax = int(np.argmax(overlaps))
            max_overlap = overlaps[jmax]
        for t, thr in enumerate(iou_thresholds):
            if max_overlap > thr and checked[token][jmax, t] == 0:
                tps[di, t] = 1.0
                checked[token][jmax, t] = 1
            else:
                fps[di, t] = 1.0
    fps = np.cumsum(fps, 0)
    tps = np.cumsum(tps, 0)
    recalls = tps / max(float(num_gts), 1e-12)
    precisions = tps / np.maximum(tps + fps, np.finfo(np.float64).eps)
    aps = np.array([
        float(average_precision(recalls[:, t], precisions[:, t])[0])
        for t in range(len(iou_thresholds))])
    return recalls, precisions, aps


def lyft_eval_native(gts: List[Dict], dets: List[Dict],
                     class_names: Sequence[str]) -> Dict[str, float]:
    """Lyft-style mAP over IoU 0.5:0.05:0.95 (reference lyft_eval:89-196).

    gts[i]: {'gt_bboxes_3d': [G, 7+], 'gt_labels_3d': [G]};
    dets[i]: {'bboxes', 'scores', 'labels'} per sample.
    """
    metrics: Dict[str, float] = {}
    all_aps = []
    for ci, name in enumerate(class_names):
        gt_list, pred_list = [], []
        for sid, (g, d) in enumerate(zip(gts, dets)):
            gl = np.asarray(g['gt_labels_3d'])
            gb = np.asarray(g['gt_bboxes_3d'])
            for b in (gb[gl == ci] if len(gb) else []):
                gt_list.append(dict(sample_token=str(sid), box=b[:7]))
            dl = np.asarray(d['labels'])
            db = np.asarray(d['bboxes'])
            ds = np.asarray(d['scores'])
            m = dl == ci
            for b, s in zip(db[m], ds[m]):
                pred_list.append(dict(sample_token=str(sid), box=b[:7],
                                      score=float(s)))
        if not gt_list:
            continue
        _, _, aps = get_single_class_aps(gt_list, pred_list)
        metrics[f'{name}_AP'] = float(aps.mean())
        all_aps.append(aps.mean())
    metrics['mAP'] = float(np.mean(all_aps)) if all_aps else 0.0
    return metrics


def fast_hist(preds, labels, num_classes):
    """Confusion matrix [C, C] (reference seg_eval.py:6-25)."""
    k = (labels >= 0) & (labels < num_classes)
    return np.bincount(
        num_classes * labels[k].astype(int) + preds[k],
        minlength=num_classes ** 2).reshape(num_classes, num_classes)


def per_class_iou(hist):
    return np.diag(hist) / np.maximum(
        hist.sum(1) + hist.sum(0) - np.diag(hist), 1e-12)


def get_acc(hist):
    return np.diag(hist).sum() / max(hist.sum(), 1e-12)


def get_acc_cls(hist):
    return np.nanmean(np.diag(hist) / np.maximum(hist.sum(1), 1e-12))


def seg_eval(gt_labels: List[np.ndarray], seg_preds: List[np.ndarray],
             label2cat: Dict[int, str]) -> Dict[str, float]:
    """mIoU / acc / per-class IoU (reference seg_eval.py:69-121)."""
    num_classes = len(label2cat)
    hist = np.zeros((num_classes, num_classes), np.int64)
    for gt, pred in zip(gt_labels, seg_preds):
        hist += fast_hist(np.asarray(pred).ravel(),
                          np.asarray(gt).ravel(), num_classes)
    iou = per_class_iou(hist)
    metrics = {f'{label2cat[i]}_iou': float(iou[i])
               for i in range(num_classes)}
    metrics['miou'] = float(np.nanmean(iou))
    metrics['acc'] = float(get_acc(hist))
    metrics['acc_cls'] = float(get_acc_cls(hist))
    return metrics
