"""Native nuScenes metric protocol sanity tests."""
import numpy as np

from msmdfusion_tpu.core.evaluation.nuscenes_metrics import (
    accumulate_class, evaluate_detections)

CLASSES = ['car', 'pedestrian']


def make_sample(boxes, labels, scores=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 9)
    out = dict(bboxes=boxes, labels=np.asarray(labels, np.int64))
    if scores is not None:
        out['scores'] = np.asarray(scores, np.float32)
    return out


def test_perfect_detections_give_ap1_nds1():
    gt = [make_sample([[0, 0, 0, 2, 4, 1.5, 0.3, 1, 0],
                       [10, 5, 0, 0.5, 0.5, 1.7, 0.0, 0, 0]], [0, 1])]
    pred = [make_sample([[0, 0, 0, 2, 4, 1.5, 0.3, 1, 0],
                         [10, 5, 0, 0.5, 0.5, 1.7, 0.0, 0, 0]], [0, 1],
                        [0.9, 0.8])]
    m = evaluate_detections(pred, gt, CLASSES)
    assert m['mAP'] > 0.98
    assert m['NDS'] > 0.98
    assert m['mean_trans_err'] < 0.01


def test_all_false_positives():
    gt = [make_sample([[0, 0, 0, 2, 4, 1.5, 0, 0, 0]], [0])]
    pred = [make_sample([[30, 30, 0, 2, 4, 1.5, 0, 0, 0]], [0], [0.9])]
    m = evaluate_detections(pred, gt, CLASSES)
    assert m['mAP'] == 0.0


def test_distance_thresholds_grade_ap():
    gt = [make_sample([[0, 0, 0, 2, 4, 1.5, 0, 0, 0]], [0])]
    # detection offset 1.5m: matches at 2 and 4 m thresholds only
    pred = [make_sample([[1.5, 0, 0, 2, 4, 1.5, 0, 0, 0]], [0], [0.9])]
    r05 = accumulate_class(pred, gt, 0, 0.5)
    r4 = accumulate_class(pred, gt, 0, 4.0)
    assert r05['ap'] == 0.0
    assert r4['ap'] > 0.9


def test_score_ranking_matters():
    gt = [make_sample([[0, 0, 0, 2, 4, 1.5, 0, 0, 0]], [0])]
    # high-scored FP before the TP hurts precision
    pred_good = [make_sample([[0, 0, 0, 2, 4, 1.5, 0, 0, 0],
                              [30, 30, 0, 2, 4, 1.5, 0, 0, 0]], [0, 0],
                             [0.9, 0.1])]
    pred_bad = [make_sample([[0, 0, 0, 2, 4, 1.5, 0, 0, 0],
                             [30, 30, 0, 2, 4, 1.5, 0, 0, 0]], [0, 0],
                            [0.1, 0.9])]
    ap_good = accumulate_class(pred_good, gt, 0, 2.0)['ap']
    ap_bad = accumulate_class(pred_bad, gt, 0, 2.0)['ap']
    assert ap_good > ap_bad
