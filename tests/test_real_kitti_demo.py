"""Real-data e2e: the reference demo's KITTI scan through BASELINE config 1.

VERDICT r2 item 1: run demo/pcd_demo.py's path end-to-end on
/root/reference/demo/kitti_000008.bin via configs/second_kitti.py, asserting
detections are produced, numerics are finite, and zero framework-capacity
overflows occur (reference demo/pcd_demo.py:1-28)."""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KITTI_BIN = '/root/reference/demo/kitti_000008.bin'

# caps the reference shares (identical drop semantics) — excluded from the
# zero-overflow assertion; everything else is framework-only and must be 0
PARITY_SITES = ('voxelize.hard.point_truncation', 'voxelize.hard.voxel_cap')


@pytest.mark.slow
def test_demo_kitti_scan_end_to_end():
    from msmdfusion_tpu.apis import inference_detector, init_detector
    from msmdfusion_tpu.utils import overflow

    os.environ['MSMD_OVERFLOW_CHECK'] = '1'
    overflow.reset()
    try:
        cfg_path = os.path.join(REPO, 'configs', 'second_kitti.py')
        model, variables, cfg = init_detector(cfg_path)
        result = inference_detector(model, variables, cfg, KITTI_BIN)
        boxes = result['boxes_3d']
        scores = result['scores_3d']
        assert np.isfinite(boxes).all()
        assert np.isfinite(scores).all()
        assert boxes.shape[1] >= 7
        # real scan: 17238 points, in-range subset voxelizes well under the
        # 40000-voxel test cap; zero drops allowed on framework-only caps
        counts = overflow.counters()
        framework = {k: v for k, v in counts.items()
                     if k not in PARITY_SITES}
        assert sum(framework.values()) == 0, framework
        # BEV PNG + OBJ export exercise the demo tail
        from msmdfusion_tpu.core.visualizer import export_obj, show_bev
        pts = np.fromfile(KITTI_BIN, np.float32).reshape(-1, 4)
        pcr = cfg.model.pts_voxel_layer.point_cloud_range
        out_dir = os.path.join('/tmp', 'demo_out_test')
        png = show_bev(pts, boxes, None, os.path.join(out_dir, 'bev.png'),
                       pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
        obj = export_obj(boxes, os.path.join(out_dir, 'boxes.obj'))
        assert os.path.exists(png) and os.path.exists(obj)
    finally:
        os.environ.pop('MSMD_OVERFLOW_CHECK', None)
        overflow.reset()


@pytest.mark.slow
def test_real_scan_voxelization_matches_cpu_oracle():
    """hard_voxelize on the real KITTI density profile agrees with the
    numpy VoxelGenerator oracle (reference test_voxelize.py:15-70 runs the
    same cross-check on a real scan — uniform-random clouds miss the
    near-field density skew that stresses first-come bucket semantics)."""
    import jax
    from msmdfusion_tpu.core.voxel_generator import VoxelGenerator
    from msmdfusion_tpu.ops.voxelize import hard_voxelize

    pts = np.fromfile(KITTI_BIN, np.float32).reshape(-1, 4)
    vs = [0.05, 0.05, 0.1]
    pcr = [0, -40, -3, 70.4, 40, 1]
    gen = VoxelGenerator(voxel_size=vs, point_cloud_range=pcr,
                         max_num_points=5, max_voxels=40000)
    ref_voxels, ref_coors, ref_num = gen.generate(pts)

    res = hard_voxelize(pts, np.ones(len(pts), bool), vs, pcr,
                        max_points=5, max_voxels=40000)
    n = int(np.asarray(res.valid).sum())
    assert n == len(ref_coors), (n, len(ref_coors))
    # same voxel set and same per-voxel counts (order-independent compare)
    def keyed(coors, nums):
        key = (coors[:, 0] * 1600 + coors[:, 1]) * 1408 + coors[:, 2]
        order = np.argsort(key)
        return key[order], nums[order]
    k_ref, n_ref = keyed(ref_coors, ref_num)
    got_coors = np.asarray(res.coors)[np.asarray(res.valid)]
    got_num = np.asarray(res.num_points)[np.asarray(res.valid)]
    k_got, n_got = keyed(got_coors, got_num)
    np.testing.assert_array_equal(k_ref, k_got)
    np.testing.assert_array_equal(n_ref, n_got)
    # identical point buffers voxel-by-voxel (first-come order)
    ref_sum = ref_voxels.sum(axis=(1, 2))
    got_sum = np.asarray(res.voxels)[np.asarray(res.valid)].sum(axis=(1, 2))
    key_ref_order = np.argsort((ref_coors[:, 0] * 1600 +
                                ref_coors[:, 1]) * 1408 + ref_coors[:, 2])
    key_got_order = np.argsort((got_coors[:, 0] * 1600 +
                                got_coors[:, 1]) * 1408 + got_coors[:, 2])
    np.testing.assert_allclose(ref_sum[key_ref_order],
                               got_sum[key_got_order], rtol=1e-5)
