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


def test_velocity_based_attributes():
    """Attribute selection replicates reference nuscenes_dataset.py:305-323:
    speed > 0.2 m/s -> moving/with_rider, slow pedestrian -> standing,
    slow bus -> stopped, else the per-class default."""
    from msmdfusion_tpu.datasets.nuscenes import attribute_for

    fast, slow = (3.0, 4.0), (0.1, 0.1)
    for name in ('car', 'construction_vehicle', 'bus', 'truck', 'trailer'):
        assert attribute_for(name, fast) == 'vehicle.moving'
    for name in ('bicycle', 'motorcycle'):
        assert attribute_for(name, fast) == 'cycle.with_rider'
    assert attribute_for('pedestrian', fast) == 'pedestrian.moving'
    assert attribute_for('pedestrian', slow) == 'pedestrian.standing'
    assert attribute_for('bus', slow) == 'vehicle.stopped'
    assert attribute_for('car', slow) == 'vehicle.parked'
    assert attribute_for('motorcycle', slow) == 'cycle.without_rider'
    assert attribute_for('barrier', fast) == ''
    assert attribute_for('traffic_cone', slow) == ''
    # exactly at the threshold counts as static (strict >)
    assert attribute_for('car', (0.2, 0.0)) == 'vehicle.parked'


def test_submission_attributes_follow_velocity(tmp_path):
    """format_results emits velocity-selected attribute names."""
    import json
    from msmdfusion_tpu.datasets.nuscenes import NuScenesDataset

    infos = [dict(token='tok0', lidar_path='x.bin', gt_boxes=np.zeros((0, 7)),
                  gt_names=[], timestamp=0)]
    import pickle
    pkl = tmp_path / 'infos.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(dict(infos=infos, metadata=dict(version='v1.0-mini')), f)
    ds = NuScenesDataset(data_root=str(tmp_path), ann_file=str(pkl),
                         pipeline=[], test_mode=True)
    det = dict(
        bboxes=np.array([[0, 0, 0, 2, 4, 1.5, 0, 5.0, 0.0],
                         [1, 1, 0, 2, 4, 1.5, 0, 0.0, 0.0]], np.float32),
        scores=np.array([0.9, 0.8], np.float32),
        labels=np.array([0, 8], np.int64))  # fast car, slow pedestrian
    out = ds.format_results([det], jsonfile_prefix=str(tmp_path / 'res'))
    sub = json.load(open(out))
    attrs = [a['attribute_name'] for a in sub['results']['tok0']]
    assert attrs == ['vehicle.moving', 'pedestrian.standing']
