"""GT-database copy-paste (stage-1 recipe): paste, collision, fade.

Reference: dbsampler.py:12-316 + ObjectSample (transforms_3d.py:122) +
the "fade" schedule (configs/nuscenes.md:7).
"""
import os
import pickle

import numpy as np
import pytest

from msmdfusion_tpu.datasets.pipelines.transforms_3d import ObjectSample
from msmdfusion_tpu.datasets.pipelines.dbsampler import _bev_overlap_any


@pytest.fixture
def db(tmp_path, rng):
    db_dir = tmp_path / 'gt_database'
    db_dir.mkdir()
    infos = {'car': [], 'pedestrian': []}
    # cars parked on a grid far from origin so collisions are controllable
    locs = [(-8, -8), (-8, 8), (8, -8), (8, 8), (0, 8), (8, 0)]
    for i, (x, y) in enumerate(locs):
        pts = rng.randn(50, 5).astype(np.float32) * 0.3  # box-local points
        fname = f'car_{i}.bin'
        pts.tofile(str(db_dir / fname))
        infos['car'].append(dict(
            name='car', path=os.path.join('gt_database', fname),
            box3d_lidar=np.array([x, y, -1.0, 1.9, 4.5, 1.6, 0.3],
                                 np.float32),
            num_points_in_gt=50, difficulty=0))
    info_path = tmp_path / 'dbinfos.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    return dict(
        data_root=str(tmp_path), info_path=str(info_path), rate=1.0,
        prepare=dict(filter_by_min_points=dict(car=5)),
        classes=['car', 'pedestrian'],
        sample_groups=dict(car=4))


def _sample(rng, n=500):
    return dict(
        points=rng.uniform(-10, 10, (n, 5)).astype(np.float32),
        gt_bboxes_3d=np.array([[0, 0, -1.0, 2, 4, 1.5, 0, 0, 0]],
                              np.float32),
        gt_labels_3d=np.array([0], np.int64))


def test_object_sample_pastes_boxes_and_points(db, rng):
    np.random.seed(0)
    op = ObjectSample(db_sampler=dict(db))
    results = op(_sample(rng))
    n_boxes = len(results['gt_bboxes_3d'])
    assert n_boxes > 1, 'no boxes pasted'
    assert len(results['gt_labels_3d']) == n_boxes
    # pasted points present, shifted to their box centers
    assert len(results['points']) > 0
    # no pairwise BEV collisions in the final box set
    boxes = results['gt_bboxes_3d']
    for i in range(n_boxes):
        others = np.delete(boxes, i, axis=0)
        assert not _bev_overlap_any(boxes[i:i + 1], others).any(), i


def test_object_sample_respects_existing_boxes(db, rng):
    np.random.seed(0)
    op = ObjectSample(db_sampler=dict(db))
    s = _sample(rng)
    # a GT box sitting exactly on one db location blocks that candidate
    s['gt_bboxes_3d'] = np.array([[8, 8, -1.0, 3, 5, 1.5, 0.3, 0, 0]],
                                 np.float32)
    out = op(s)
    for b in out['gt_bboxes_3d'][1:]:
        assert not (abs(b[0] - 8) < 1 and abs(b[1] - 8) < 1)


def test_object_sample_fade(db, rng):
    np.random.seed(0)
    op = ObjectSample(db_sampler=dict(db), stop_epoch=15)
    op.set_epoch(14)
    assert len(op(_sample(rng))['gt_bboxes_3d']) > 1
    op.set_epoch(15)  # fade: GT-paste disabled for the last epochs
    assert len(op(_sample(rng))['gt_bboxes_3d']) == 1


def test_set_epoch_propagates_through_wrappers(tmp_path, rng, db):
    """loader.set_epoch -> CBGS -> dataset -> pipeline transform."""
    from msmdfusion_tpu.datasets.loader import DataLoader

    class _DS:
        def __init__(self):
            self.pipeline = type('P', (), {'transforms': [
                ObjectSample(db_sampler=dict(db), stop_epoch=3)]})()

        def set_epoch(self, epoch):
            for t in self.pipeline.transforms:
                t.set_epoch(epoch)

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {'x': np.zeros(1)}

    ds = _DS()
    loader = DataLoader(ds, batch_size=2, num_workers=1)
    loader.set_epoch(3)
    assert ds.pipeline.transforms[0].epoch == 3


def test_shard_indices_and_merge():
    """Rank-sharded eval indices + result re-interleaving (multi-host
    collect_results analog, reference tools/test.py:194-195)."""
    from msmdfusion_tpu.parallel import merge_sharded_results, shard_indices
    n, world = 11, 3
    shards = [shard_indices(n, rank=r, world=world) for r in range(world)]
    assert sorted(np.concatenate(shards).tolist()) == list(range(n))
    collected = [(r, [f'det{i}' for i in shards[r]]) for r in range(world)]
    merged = merge_sharded_results(collected, n)
    assert merged == [f'det{i}' for i in range(n)]
