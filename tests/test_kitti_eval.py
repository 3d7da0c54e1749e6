"""Full KITTI protocol tests (core/evaluation/kitti_eval.py).

Oracles: hand-computed IoUs/APs and the jax rotated-IoU implementation.
Reference protocol: mmdet3d/core/evaluation/kitti_utils/eval.py.
"""
import numpy as np
import pytest

from msmdfusion_tpu.core.evaluation import kitti_eval as ke


def make_anno(names, bboxes, locs, dims, rys, alphas=None, scores=None,
              occluded=None, truncated=None):
    n = len(names)
    anno = dict(
        name=np.asarray(names),
        truncated=np.asarray(truncated if truncated is not None
                             else np.zeros(n)),
        occluded=np.asarray(occluded if occluded is not None
                            else np.zeros(n, np.int64)),
        alpha=np.asarray(alphas if alphas is not None else np.zeros(n)),
        bbox=np.asarray(bboxes, np.float64).reshape(n, 4),
        dimensions=np.asarray(dims, np.float64).reshape(n, 3),
        location=np.asarray(locs, np.float64).reshape(n, 3),
        rotation_y=np.asarray(rys, np.float64))
    if scores is not None:
        anno['score'] = np.asarray(scores, np.float64)
    return anno


BIG_BOX = [100, 100, 300, 300]     # 200px tall: visible at every difficulty


def test_image_box_overlap_golden():
    a = np.array([[0, 0, 2, 2]], np.float64)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float64)
    iou = ke.image_box_overlap(a, b)
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)
    # criterion=0: intersection / area(box a)
    ov = ke.image_box_overlap(a, b, criterion=0)
    np.testing.assert_allclose(ov[0], [0.25, 1.0, 0.0], atol=1e-6)


def test_bev_box_overlap_matches_jax_iou(rng):
    import jax.numpy as jnp
    from msmdfusion_tpu.core.iou3d import boxes_iou_bev
    a = np.stack([rng.uniform(-5, 5, 8), rng.uniform(-5, 5, 8),
                  rng.uniform(1, 4, 8), rng.uniform(1, 4, 8),
                  rng.uniform(-np.pi, np.pi, 8)], 1)
    b = np.stack([rng.uniform(-5, 5, 6), rng.uniform(-5, 5, 6),
                  rng.uniform(1, 4, 6), rng.uniform(1, 4, 6),
                  rng.uniform(-np.pi, np.pi, 6)], 1)
    ours = ke.bev_box_overlap(a, b)
    ref = np.asarray(boxes_iou_bev(jnp.asarray(a, jnp.float32),
                                   jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_d3_box_overlap_axis_aligned_golden():
    # camera frame (x, y, z, l, h, w, ry=0); y is down, box spans [y-h, y]
    a = np.array([[0, 0, 0, 2, 2, 2, 0]], np.float64)
    b = np.array([[0, 0, 0, 2, 2, 2, 0],       # identical -> 1
                  [1, 0, 0, 2, 2, 2, 0],       # half x overlap -> 4/12
                  [0, -1, 0, 2, 2, 2, 0]], np.float64)  # half y overlap
    iou = ke.d3_box_overlap(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 1 / 3, 1 / 3], atol=1e-6)


def test_get_thresholds_golden():
    # 4 gt, 4 detections all TP: recall steps 0.25 -> keep each score
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    th = ke.get_thresholds(scores.copy(), 4)
    assert th == [0.9, 0.8, 0.7, 0.6]
    # dense scores: subsampled at 1/40 recall steps
    th = ke.get_thresholds(np.linspace(1, 0.5, 200), 200)
    assert len(th) <= 41 and th[0] == 1.0


def test_clean_data_difficulty_and_neighbor_class():
    gt = make_anno(['Car', 'Van', 'Pedestrian', 'DontCare'],
                   [BIG_BOX, BIG_BOX, BIG_BOX, [0, 0, 10, 10]],
                   np.zeros((4, 3)), np.ones((4, 3)), np.zeros(4),
                   occluded=[0, 0, 3, 0])
    dt = make_anno(['Car'], [BIG_BOX], np.zeros((1, 3)), np.ones((1, 3)),
                   np.zeros(1), scores=[0.9])
    n_valid, ig_gt, ig_dt, dc = ke.clean_data(gt, dt, 0, 0)   # class Car
    assert n_valid == 1
    assert ig_gt.tolist() == [0, 1, -1, -1]   # Van ignored, Ped other-class
    assert ig_dt.tolist() == [0]
    assert dc.shape == (1, 4)
    # heavily occluded pedestrian ignored at easy, counted at hard
    n_easy, ig_easy, _, _ = ke.clean_data(gt, dt, 1, 0)
    assert n_easy == 0 and ig_easy.tolist()[2] == 1  # occ 3 > all buckets? no
    # occlusion 3 exceeds even hard (max 2) -> still ignored
    n_hard, ig_hard, _, _ = ke.clean_data(gt, dt, 1, 2)
    assert n_hard == 0 and ig_hard[2] == 1


def _perfect_scene(n=60, seed=0):
    rng = np.random.RandomState(seed)
    locs = np.stack([rng.uniform(-10, 10, n), rng.uniform(0, 2, n),
                     rng.uniform(5, 40, n)], 1)
    dims = rng.uniform(1.5, 4.0, (n, 3))
    rys = rng.uniform(-np.pi, np.pi, n)
    bboxes = np.stack([rng.uniform(0, 500, n), rng.uniform(0, 150, n),
                       np.zeros(n), np.zeros(n)], 1)
    bboxes[:, 2] = bboxes[:, 0] + rng.uniform(60, 120, n)
    bboxes[:, 3] = bboxes[:, 1] + rng.uniform(50, 120, n)
    alphas = rng.uniform(-np.pi, np.pi, n)
    return locs, dims, rys, bboxes, alphas


def test_perfect_detections_ap_100():
    locs, dims, rys, bboxes, alphas = _perfect_scene()
    n = len(locs)
    names = ['Car'] * n
    gt = make_anno(names, bboxes, locs, dims, rys, alphas)
    dt = make_anno(names, bboxes, locs, dims, rys, alphas,
                   scores=np.linspace(0.9, 0.4, n))
    report, metrics = ke.kitti_eval([gt], [dt], ['Car'])
    for key in ('KITTI/Car_3D_moderate_strict', 'KITTI/Car_BEV_easy_strict',
                'KITTI/Car_2D_hard_strict'):
        assert metrics[key] > 99.0, (key, metrics[key])
    assert 'Car AP@0.70, 0.70, 0.70' in report


def test_false_positive_reduces_precision():
    locs, dims, rys, bboxes, alphas = _perfect_scene()
    n = len(locs)
    names = ['Car'] * n
    gt = make_anno(names, bboxes, locs, dims, rys, alphas)
    # an extra far-away, high-scoring FP
    dt = make_anno(names + ['Car'],
                   np.concatenate([bboxes, [[600, 10, 700, 80]]]),
                   np.concatenate([locs, [[50, 1, 70]]]),
                   np.concatenate([dims, [[2, 2, 2]]]),
                   np.concatenate([rys, [0.0]]),
                   np.concatenate([alphas, [0.0]]),
                   scores=np.concatenate([np.linspace(0.9, 0.4, n), [0.95]]))
    _, perfect = ke.kitti_eval(
        [make_anno(names, bboxes, locs, dims, rys, alphas)],
        [make_anno(names, bboxes, locs, dims, rys, alphas,
                   scores=np.linspace(0.9, 0.4, n))], ['Car'])
    _, metrics = ke.kitti_eval([gt], [dt], ['Car'])
    assert metrics['KITTI/Car_3D_moderate_strict'] < \
        perfect['KITTI/Car_3D_moderate_strict']


def test_dontcare_suppresses_bbox_fp():
    locs, dims, rys, bboxes, alphas = _perfect_scene(n=50)
    names = ['Car'] * 50
    dc_box = [600.0, 100.0, 700.0, 200.0]
    gt = make_anno(names + ['DontCare'],
                   np.concatenate([bboxes, [dc_box]]),
                   np.concatenate([locs, [[0, 0, 0]]]),
                   np.concatenate([dims, [[1, 1, 1]]]),
                   np.concatenate([rys, [0]]),
                   np.concatenate([alphas, [0]]))
    # detection entirely inside the DontCare region
    dt = make_anno(names + ['Car'],
                   np.concatenate([bboxes, [[610, 110, 690, 190]]]),
                   np.concatenate([locs, [[50, 1, 70]]]),
                   np.concatenate([dims, [[2, 2, 2]]]),
                   np.concatenate([rys, [0]]),
                   np.concatenate([alphas, [0]]),
                   scores=np.concatenate([np.linspace(0.9, 0.5, 50), [0.95]]))
    _, metrics = ke.kitti_eval([gt], [dt], ['Car'], eval_types=['bbox'])
    # the in-DontCare FP must not hurt 2D AP
    assert metrics['KITTI/Car_2D_moderate_strict'] > 99.0


def test_aos_penalizes_flipped_orientation():
    locs, dims, rys, bboxes, alphas = _perfect_scene()
    n = len(locs)
    names = ['Car'] * n
    gt = make_anno(names, bboxes, locs, dims, rys, alphas)
    good = make_anno(names, bboxes, locs, dims, rys, alphas,
                     scores=np.linspace(0.9, 0.4, n))
    flipped = make_anno(names, bboxes, locs, dims, rys, alphas + np.pi,
                        scores=np.linspace(0.9, 0.4, n))
    _, m_good = ke.kitti_eval([gt], [good], ['Car'],
                              eval_types=['bbox', 'aos'])
    _, m_flip = ke.kitti_eval([gt], [flipped], ['Car'],
                              eval_types=['bbox', 'aos'])
    assert m_good['KITTI/Car_2D_moderate_strict'] > 99.0
    assert m_flip['KITTI/Car_2D_moderate_strict'] > 99.0  # bbox unaffected


def test_dataset_round_trip_full_protocol(tmp_path, rng):
    """Synthetic KITTI infos -> detections == gt -> near-100 AP through
    KittiDataset.evaluate (full protocol incl. bbox2result_kitti)."""
    import pickle
    from msmdfusion_tpu.datasets.kitti import KittiDataset

    n = 20
    # gt in camera frame with identity calib; P2 focal 700 centered 600x200
    p2 = np.array([[700, 0, 600, 0], [0, 700, 200, 0],
                   [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    infos = []
    for s in range(3):
        locs = np.stack([rng.uniform(-8, 8, n), rng.uniform(1.4, 1.8, n),
                         rng.uniform(15, 40, n)], 1)
        dims = np.stack([rng.uniform(3.5, 4.5, n), rng.uniform(1.4, 1.8, n),
                         rng.uniform(1.6, 2.0, n)], 1)     # (l, h, w)
        rys = rng.uniform(-np.pi, np.pi, n)
        # project gt to 2D the same way bbox2result_kitti does
        from msmdfusion_tpu.core import box_modes
        cam = np.concatenate([locs, dims, rys[:, None]], 1).astype(np.float32)
        corners = np.asarray(box_modes.cam_corners_3d(cam))
        hom = np.concatenate([corners, np.ones((n, 8, 1))], -1)
        pix = (hom @ p2.T)[..., :2] / (hom @ p2.T)[..., 2:3]
        bbox2d = np.concatenate([pix.min(1), pix.max(1)], 1)
        bbox2d = np.clip(bbox2d, 0, [1242, 375, 1242, 375])
        infos.append(dict(
            image=dict(image_idx=s, image_shape=np.array([375, 1242])),
            point_cloud=dict(velodyne_path=f'velodyne/{s:06d}.bin'),
            calib=dict(R0_rect=np.eye(4, dtype=np.float32),
                       Tr_velo_to_cam=np.eye(4, dtype=np.float32), P2=p2),
            annos=dict(name=np.array(['Car'] * n),
                       truncated=np.zeros(n), occluded=np.zeros(n, np.int64),
                       alpha=np.array([-np.arctan2(-l[0], l[2]) + r
                                       for l, r in zip(locs, rys)]),
                       bbox=bbox2d, dimensions=dims, location=locs,
                       rotation_y=rys)))
    info_path = tmp_path / 'infos.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    ds = KittiDataset(data_root=str(tmp_path), ann_file=str(info_path),
                      pipeline=[], test_mode=True)
    # detections = gt converted to LiDAR with identity extrinsics
    results = []
    for s in range(3):
        a = infos[s]['annos']
        lidar = np.zeros((n, 7), np.float32)
        # inverse of the reader: cam -> velo (identity) and yaw inverse
        lidar[:, :3] = a['location']
        lidar[:, 3] = a['dimensions'][:, 2]
        lidar[:, 4] = a['dimensions'][:, 0]
        lidar[:, 5] = a['dimensions'][:, 1]
        lidar[:, 6] = -a['rotation_y'] - np.pi / 2
        results.append(dict(bboxes=lidar,
                            scores=np.linspace(0.95, 0.5, n),
                            labels=np.full(n, 2, np.int64)))   # Car id 2
    metrics = ds.evaluate(results, metric='kitti')
    assert metrics['KITTI/Car_3D_moderate_strict'] > 99.0, metrics
    assert metrics['KITTI/Car_BEV_easy_strict'] > 99.0


@pytest.fixture
def rng():
    return np.random.RandomState(0)
