"""Indoor / Lyft / segmentation evaluation protocol tests.

Reference: mmdet3d/core/evaluation/{indoor_eval.py, lyft_eval.py,
seg_eval.py}.
"""
import numpy as np
import pytest

from msmdfusion_tpu.core.evaluation.indoor_eval import (average_precision,
                                                        indoor_eval)
from msmdfusion_tpu.core.evaluation.lyft_seg_eval import (fast_hist,
                                                          lyft_eval_native,
                                                          per_class_iou,
                                                          seg_eval)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_average_precision_area_golden():
    # single det matching the single gt: P=1 at R=1 -> AP=1
    ap = average_precision(np.array([1.0]), np.array([1.0]))
    np.testing.assert_allclose(ap, [1.0], atol=1e-6)
    # half the dets are FP at the end: area = 1.0 * 0.5 ... step curve
    rec = np.array([0.5, 0.5])
    prec = np.array([1.0, 0.5])
    ap = average_precision(rec, prec)
    np.testing.assert_allclose(ap, [0.5], atol=1e-6)
    # 11-point mode on a perfect detector
    ap11 = average_precision(np.linspace(0.05, 1, 20), np.ones(20),
                             mode='11points')
    assert ap11[0] > 0.99


def _scene(rng, n, label=0):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
    boxes[:, 2] = 0.0
    boxes[:, 3:6] = rng.uniform(0.8, 2.5, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.slow
def test_indoor_eval_perfect_and_missed(rng):
    gts, dets = [], []
    for s in range(4):
        b = _scene(rng, 6)
        labels = rng.randint(0, 3, 6)
        gts.append(dict(gt_bboxes_3d=b, gt_labels_3d=labels))
        dets.append(dict(bboxes=b, labels=labels,
                         scores=np.linspace(0.9, 0.4, 6)))
    m = indoor_eval(gts, dets, (0.25, 0.5), ['chair', 'table', 'sofa'])
    assert m['mAP_0.25'] > 0.99 and m['mAP_0.50'] > 0.99
    assert m['mAR_0.25'] > 0.99
    # drop half the detections -> recall falls, AP falls
    dets2 = [dict(bboxes=d['bboxes'][:3], labels=d['labels'][:3],
                  scores=d['scores'][:3]) for d in dets]
    m2 = indoor_eval(gts, dets2, (0.25,), ['chair', 'table', 'sofa'])
    assert m2['mAP_0.25'] < m['mAP_0.25']
    assert m2['mAR_0.25'] < 0.8


@pytest.mark.slow
def test_indoor_eval_duplicate_detection_is_fp(rng):
    b = _scene(rng, 1)
    gts = [dict(gt_bboxes_3d=b, gt_labels_3d=np.zeros(1, np.int64))]
    # same box detected twice: second must count as FP
    dets = [dict(bboxes=np.concatenate([b, b]),
                 labels=np.zeros(2, np.int64),
                 scores=np.array([0.9, 0.8]))]
    m = indoor_eval(gts, dets, (0.25,), ['chair'])
    assert 0.9 < m['chair_AP_0.25'] <= 1.0   # AP area still ~1 (P=1 @ R=1)
    m_rec = m['chair_rec_0.25']
    assert m_rec == 1.0


@pytest.mark.slow
def test_lyft_eval_native_threshold_sweep(rng):
    gts, dets = [], []
    for s in range(3):
        b = _scene(rng, 8)
        labels = rng.randint(0, 2, 8)
        gts.append(dict(gt_bboxes_3d=b, gt_labels_3d=labels))
        # slightly perturbed detections: high AP at 0.5, lower at 0.95
        bp = b.copy()
        bp[:, :2] += rng.uniform(-0.15, 0.15, (8, 2))
        dets.append(dict(bboxes=bp, labels=labels,
                         scores=np.linspace(0.95, 0.4, 8)))
    m = lyft_eval_native(gts, dets, ['car', 'truck'])
    assert 0.3 < m['mAP'] <= 1.0
    perfect = lyft_eval_native(gts, [
        dict(bboxes=g['gt_bboxes_3d'], labels=g['gt_labels_3d'],
             scores=np.linspace(0.95, 0.4, 8)) for g in gts],
        ['car', 'truck'])
    assert perfect['mAP'] > 0.99 and perfect['mAP'] >= m['mAP']


def test_seg_eval_golden():
    gt = [np.array([0, 0, 1, 1, 2, 2])]
    pred = [np.array([0, 0, 1, 0, 2, 2])]   # one class-1 point missed
    m = seg_eval(gt, pred, {0: 'road', 1: 'car', 2: 'ped'})
    np.testing.assert_allclose(m['road_iou'], 2 / 3, atol=1e-6)
    np.testing.assert_allclose(m['car_iou'], 0.5, atol=1e-6)
    np.testing.assert_allclose(m['ped_iou'], 1.0, atol=1e-6)
    np.testing.assert_allclose(m['acc'], 5 / 6, atol=1e-6)
    hist = fast_hist(pred[0], gt[0], 3)
    assert hist.sum() == 6 and np.diag(hist).sum() == 5
    iou = per_class_iou(hist)
    np.testing.assert_allclose(iou, [2 / 3, 0.5, 1.0], atol=1e-6)


@pytest.mark.slow
def test_fpnc_and_scconv_necks(rng):
    """Registered extra necks produce the documented shapes
    (reference fpnc.py:97-119, scconv.py:179-197)."""
    import jax
    import jax.numpy as jnp
    from msmdfusion_tpu.models.necks.extra_necks import FPNC, SCConv
    feats = [jnp.asarray(rng.randn(1, 32 // s, 48 // s, c).astype(np.float32))
             for s, c in ((1, 8), (2, 16), (4, 32), (8, 64))]
    neck = FPNC(in_channels=(8, 16, 32, 64), out_channels=8, num_outs=5,
                final_dim=(64, 96), downsample=4, outC=8)
    vars_ = neck.init(jax.random.PRNGKey(0), feats)
    out = neck.apply(vars_, feats)
    assert len(out) == 1 and out[0].shape == (1, 16, 24, 8)
    sc = SCConv(num_input_features=8, num_proj_features=4,
                chn_per_segment=(8, 8), blocks_per_segment=(1, 1),
                ds_rates=(1, 2), us_rates=(1, 2), ds_paddings=(0, 0))
    x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    vars_ = sc.init(jax.random.PRNGKey(0), x)
    out = sc.apply(vars_, x)
    assert out.shape == (1, 16, 16, 8)   # 2 segments x 4 proj channels
    assert np.isfinite(np.asarray(out)).all()


def test_lyft_format_results_and_json2csv(tmp_path):
    """Lyft submission dict + Kaggle CSV (reference lyft_dataset.py:236-263
    format, :426-463 json2csv): per-box sample-result WITHOUT the
    nuScenes-only velocity/attribute fields, quaternion rotation that
    round-trips back to the box yaw in the CSV PredictionString."""
    import csv
    import json
    import pickle

    import numpy as np

    from msmdfusion_tpu.datasets.other_datasets import LyftDataset

    infos = [dict(token='tokA', lidar_path='x.bin',
                  gt_boxes=np.zeros((0, 7)), gt_names=[], timestamp=0)]
    pkl = tmp_path / 'infos.pkl'
    with open(pkl, 'wb') as f:
        pickle.dump(dict(infos=infos,
                         metadata=dict(version='v1.01-train')), f)
    ds = LyftDataset(data_root=str(tmp_path), ann_file=str(pkl),
                     pipeline=[], test_mode=True)
    det = dict(bboxes=np.array([[1, 2, 0.5, 2, 4, 1.5, 0.7]], np.float32),
               scores=np.array([0.9], np.float32),
               labels=np.array([0], np.int64))
    out = ds.format_results([det], jsonfile_prefix=str(tmp_path / 'lyft'))
    sub = json.load(open(out))
    anno = sub['results']['tokA'][0]
    assert anno['name'] == 'car' and abs(anno['score'] - 0.9) < 1e-6
    assert 'velocity' not in anno and 'attribute_name' not in anno
    assert len(anno['rotation']) == 4            # [w, x, y, z] quaternion
    # gravity-center lift under identity poses
    np.testing.assert_allclose(anno['translation'], [1, 2, 0.5 + 0.75],
                               atol=1e-6)

    csvp = ds.json2csv(out, str(tmp_path / 'sub.csv'))
    rows = list(csv.DictReader(open(csvp)))
    assert rows[0]['Id'] == 'tokA'
    parts = rows[0]['PredictionString'].split(' ')
    assert len(parts) == 9 and parts[-1] == 'car'
    assert abs(float(parts[7]) - 0.7) < 1e-5     # yaw round-trips
