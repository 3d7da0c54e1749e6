#!/usr/bin/env python
"""Single point-cloud inference demo.

TPU-native equivalent of the reference demo/pcd_demo.py:1-28: load a config,
run inference on one .bin file, write a BEV visualization + OBJ wireframes.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('pcd', help='point cloud .bin file')
    p.add_argument('config', nargs='?', default='configs/second_kitti.py')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--out-dir', default='demo_out')
    args = p.parse_args()

    import numpy as np
    from msmdfusion_tpu.apis import inference_detector, init_detector
    from msmdfusion_tpu.core.visualizer import export_obj, show_bev

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    result = inference_detector(model, variables, cfg, args.pcd)
    print(f"{len(result['boxes_3d'])} detections")
    from msmdfusion_tpu.utils import overflow
    if overflow.enabled():
        print(f'overflow counters: {overflow.counters()}')
    pcr = cfg.model.pts_voxel_layer.point_cloud_range
    pts = np.fromfile(args.pcd, np.float32).reshape(-1, 4)
    png = show_bev(pts, result['boxes_3d'], None,
                   os.path.join(args.out_dir, 'bev.png'),
                   pc_range=(pcr[0], pcr[1], pcr[3], pcr[4]))
    obj = export_obj(result['boxes_3d'],
                     os.path.join(args.out_dir, 'boxes.obj'))
    print(f'wrote {png} and {obj}')


if __name__ == '__main__':
    main()
