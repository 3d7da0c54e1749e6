"""Runtime overflow observability (utils/overflow.py).

Every fixed-capacity site must report dropped rows when
MSMD_OVERFLOW_CHECK=1 (VERDICT r2 item 4: silent caps are an invisible
mAP leak on real-density clouds)."""
import numpy as np
import pytest

from msmdfusion_tpu.utils import overflow


@pytest.fixture
def overflow_on(monkeypatch):
    monkeypatch.setenv('MSMD_OVERFLOW_CHECK', '1')
    overflow.reset()
    yield
    overflow.reset()


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv('MSMD_OVERFLOW_CHECK', raising=False)
    overflow.reset()
    overflow.record('x', 5)
    assert overflow.counters() == {}


def test_hard_voxelize_counters(overflow_on):
    import jax
    from msmdfusion_tpu.ops.voxelize import hard_voxelize

    # 12 points in 3 distinct voxels, caps force drops: max_voxels=2 drops
    # one whole voxel; max_points=2 truncates within kept voxels
    pts = np.zeros((12, 4), np.float32)
    pts[:4, 0] = 0.05   # voxel A: 4 points
    pts[4:8, 0] = 1.05  # voxel B: 4 points
    pts[8:, 0] = 2.05   # voxel C: 4 points (dropped by voxel cap)
    pts[:, 1] = 0.05
    pts[:, 2] = 0.05
    mask = np.ones(12, bool)
    res = hard_voxelize(pts, mask, [1.0, 1.0, 1.0],
                        [0, 0, 0, 4, 4, 4], max_points=2, max_voxels=2)
    jax.block_until_ready(res.voxels)
    c = overflow.counters()
    assert c.get('voxelize.hard.voxel_cap') == 1
    # 2 truncated in each of the 2 kept voxels
    assert c.get('voxelize.hard.point_truncation') == 4


def test_sparse_add_union_cap(overflow_on):
    import jax
    from msmdfusion_tpu.ops.sparse.tensor import (make_sparse_tensor,
                                                  sparse_add)

    def tensor(xs):
        coords = np.zeros((len(xs), 4), np.int32)
        coords[:, 3] = xs
        feats = np.ones((len(xs), 4), np.float32)
        return make_sparse_tensor(feats, coords, np.ones(len(xs), bool),
                                  (4, 4, 8), 1)

    a = tensor([0, 1, 2])
    b = tensor([5, 6, 7])
    out = sparse_add(a, b, capacity=4)  # union of 6 keys -> 2 dropped
    jax.block_until_ready(out.features)
    assert overflow.counters().get('sparse.sparse_add.union_cap') == 2


def test_downsample_out_cap(overflow_on):
    import jax
    from msmdfusion_tpu.ops.sparse.conv import downsample_out_coords
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor

    n = 16
    coords = np.zeros((n, 4), np.int32)
    coords[:, 1] = np.arange(n) % 4
    coords[:, 2] = (np.arange(n) // 4) * 2
    coords[:, 3] = np.arange(n)
    feats = np.ones((n, 4), np.float32)
    st = make_sparse_tensor(feats, coords, np.ones(n, bool), (8, 16, 32), 1)
    keys, oc, ov, _ = downsample_out_coords(st, 3, 2, 1, capacity=4)
    jax.block_until_ready(keys)
    assert overflow.counters().get('sparse.downsample.out_cap', 0) > 0


def test_pad_points_cap(overflow_on):
    from msmdfusion_tpu.datasets.pipelines.loading import PadPoints

    res = PadPoints(max_points=8)(
        dict(points=np.zeros((11, 5), np.float32)))
    assert res['points'].shape == (8, 5)
    assert overflow.counters().get('pipeline.points_cap') == 3


def test_matchconv_slab_overflow_counter(overflow_on):
    """Rows beyond the slab bracket are counted (framework-only cap)."""
    import jax
    from msmdfusion_tpu.ops.sparse.matchconv import (_record_slab_overflow,
                                                     build_subm_plan)
    from msmdfusion_tpu.ops.sparse.tensor import make_sparse_tensor

    # a dense x-line of 300 voxels: with tile=256 the first tile's bracket
    # spans ~257 input rows -> slab=128 drops rows
    n = 300
    coords = np.zeros((n, 4), np.int32)
    coords[:, 3] = np.arange(n)
    feats = np.ones((n, 4), np.float32)
    st = make_sparse_tensor(feats, coords, np.ones(n, bool), (4, 4, 512), 1)
    plan = build_subm_plan(st, 3, tile=256)
    _record_slab_overflow(plan, 128, 'matchconv.test_site')
    jax.block_until_ready(plan.starts)
    assert overflow.counters().get('matchconv.test_site', 0) > 0
    overflow.reset()
    _record_slab_overflow(plan, 4096, 'matchconv.test_site2')
    assert overflow.counters().get('matchconv.test_site2', 0) == 0
