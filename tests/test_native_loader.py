"""Native C++ sweep loader vs numpy fallback on synthetic .bin files."""
import os

import numpy as np
import pytest

from msmdfusion_tpu.utils import native_loader


@pytest.fixture
def bin_files(tmp_path, rng):
    paths, raws = [], []
    for i in range(3):
        pts = rng.uniform(-20, 20, (50 + 10 * i, 5)).astype(np.float32)
        p = tmp_path / f'sweep_{i}.bin'
        pts.tofile(str(p))
        paths.append(str(p))
        raws.append(pts)
    return paths, raws


def make_transforms(n):
    t = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        t[i, :, :3] = np.eye(3)
        t[i, :, 3] = [0.1 * i, 0, 0]
    return t


def test_native_matches_numpy(bin_files):
    paths, raws = bin_files
    transforms = make_transforms(3)
    deltas = [0.0, 0.05, 0.1]
    kwargs = dict(capacity=500, load_dim=5, out_dim=5,
                  remove_close=False)
    native_pts, native_mask = native_loader.load_sweeps(
        paths, transforms, deltas, **kwargs)
    # force the numpy fallback
    orig = native_loader._lib
    try:
        native_loader._lib = None
        os_path_exists = os.path.exists
        import msmdfusion_tpu.utils.native_loader as nl
        real_load = nl._load_lib
        nl._load_lib = lambda: None
        np_pts, np_mask = native_loader.load_sweeps(
            paths, transforms, deltas, **kwargs)
    finally:
        native_loader._lib = orig
        nl._load_lib = real_load
    if not native_loader.native_available():
        pytest.skip('native library not built')
    np.testing.assert_array_equal(native_mask, np_mask)
    np.testing.assert_allclose(native_pts, np_pts, rtol=1e-6)
    assert int(native_mask.sum()) == sum(len(r) for r in raws)


def test_native_remove_close_and_range(bin_files):
    paths, raws = bin_files
    if not native_loader.native_available():
        pytest.skip('native library not built')
    transforms = make_transforms(3)
    pts, mask = native_loader.load_sweeps(
        paths, transforms, [0, 0, 0], capacity=500,
        point_range=[-10, -10, -10, 10, 10, 10], remove_close=True)
    valid = pts[mask]
    assert np.all(np.abs(valid[:, :3]) <= 10 + 0.11)
    # sweeps (not keyframe) drop close points
    assert mask.sum() < sum(len(r) for r in raws)


def test_capacity_truncation(bin_files):
    paths, raws = bin_files
    transforms = make_transforms(3)
    pts, mask = native_loader.load_sweeps(
        paths, transforms, [0, 0, 0], capacity=30, remove_close=False)
    assert pts.shape == (30, 5)
    assert mask.all()
