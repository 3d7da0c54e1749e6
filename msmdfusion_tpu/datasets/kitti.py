"""KITTI dataset (info-pkl reader + simplified 3D AP evaluation).

TPU-native equivalent of mmdet3d/datasets/kitti_dataset.py:698: info-pkl
parsing (velodyne paths, calib, annos in camera frame -> LiDAR boxes) and a
numpy KITTI-style AP-R40 evaluation (matched by BEV rotated IoU per
difficulty; re-derived, not a port of the 851-line numba evaluator).
"""
from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..registry import DATASETS
from .custom_3d import Custom3DDataset


@DATASETS.register('KittiDataset')
class KittiDataset(Custom3DDataset):
    CLASSES = ('Pedestrian', 'Cyclist', 'Car')

    def __init__(self, *args, split='training', pts_prefix='velodyne',
                 **kwargs):
        self.split = split
        self.pts_prefix = pts_prefix
        super().__init__(*args, **kwargs)

    def get_data_info(self, index):
        info = self.data_infos[index]
        sample_idx = info['image']['image_idx'] if 'image' in info else index
        pts_path = info.get('point_cloud', {}).get(
            'velodyne_path',
            os.path.join(self.split, self.pts_prefix, f'{sample_idx:06d}.bin'))
        return dict(
            sample_idx=sample_idx,
            pts_filename=os.path.join(self.data_root, pts_path),
            sweeps=[], timestamp=0,
            calib=info.get('calib', {}))

    def get_ann_info(self, index):
        info = self.data_infos[index]
        annos = info.get('annos', {})
        if not annos:
            return dict(gt_bboxes_3d=np.zeros((0, 7), np.float32),
                        gt_labels_3d=np.zeros((0,), np.int64))
        names = annos['name']
        keep = names != 'DontCare'
        loc = annos['location'][keep]      # camera-frame bottom centers
        dims = annos['dimensions'][keep]   # camera (l, h, w)
        rots = annos['rotation_y'][keep]
        calib = info.get('calib', {})
        rect = np.eye(4)
        rect[:3, :3] = np.asarray(calib.get('R0_rect', np.eye(4)))[:3, :3]
        trv2c = np.eye(4)
        tr = np.asarray(calib.get('Tr_velo_to_cam', np.eye(4)))
        trv2c[:tr.shape[0], :tr.shape[1]] = tr
        # x_cam = rect @ trv2c @ x_velo  =>  x_velo = (rect @ trv2c)^-1 x_cam
        cam2velo = np.linalg.inv(rect @ trv2c)
        hom = np.concatenate([loc, np.ones((len(loc), 1))], axis=1)
        xyz_lidar = (hom @ cam2velo.T)[:, :3]
        # boxes: (x, y, z_bottom, w, l, h, yaw)
        boxes = np.zeros((loc.shape[0], 7), np.float32)
        boxes[:, :3] = xyz_lidar
        boxes[:, 3] = dims[:, 2]  # w
        boxes[:, 4] = dims[:, 0]  # l
        boxes[:, 5] = dims[:, 1]  # h
        boxes[:, 6] = -rots - np.pi / 2
        labels = np.asarray([
            self.cat2id.get(n, -1) for n in names[keep]], np.int64)
        valid = labels >= 0
        return dict(gt_bboxes_3d=boxes[valid], gt_labels_3d=labels[valid])

    def evaluate(self, results, metric='bev', iou_thr=(0.7, 0.5, 0.5),
                 **kwargs):
        """Simplified AP-R40 by BEV rotated IoU per class."""
        from ..core.evaluation.kitti_metrics import kitti_eval_simplified
        gts = [self.get_ann_info(i) for i in range(len(results))]
        return kitti_eval_simplified(results, gts, self.CLASSES, iou_thr)
