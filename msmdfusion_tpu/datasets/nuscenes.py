"""nuScenes dataset (info-pkl reader + submission formatting + eval glue).

TPU-native re-design of mmdet3d/datasets/nuscenes_dataset.py:14-576:
timestamp-sorted info loading (:164-176), camera order + lidar2img
construction (:203-230), CBGS get_cat_ids hook (:142-162), submission
formatting (:281-348) and devkit evaluation (:350-400, gated on the
optional nuscenes-devkit).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..core.box_np_ops import limit_period_np
from ..registry import DATASETS
from .custom_3d import Custom3DDataset

# Reference view order (nuscenes_dataset.py:203). The order is load-bearing:
# the LC head has per-view decoder weights (decoder[2+idx_view]) and the MDU
# foreground artifacts are indexed per camera, so checkpoints/artifacts built
# against the reference silently misassign views under any other order.
CAM_ORDER = ('CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
             'CAM_BACK_RIGHT', 'CAM_BACK', 'CAM_BACK_LEFT')

DEFAULT_ATTRIBUTES = {
    'car': 'vehicle.parked', 'pedestrian': 'pedestrian.moving',
    'trailer': 'vehicle.parked', 'truck': 'vehicle.parked',
    'bus': 'vehicle.moving', 'motorcycle': 'cycle.without_rider',
    'construction_vehicle': 'vehicle.parked', 'bicycle':
    'cycle.without_rider', 'barrier': '', 'traffic_cone': '',
}


def attribute_for(name: str, velocity_xy) -> str:
    """Velocity-based attribute selection (reference
    nuscenes_dataset.py:305-323). Speed is rotation-invariant, so the
    LiDAR-frame velocity magnitude equals the global-frame one the
    reference thresholds."""
    speed = float(np.sqrt(velocity_xy[0] ** 2 + velocity_xy[1] ** 2))
    if speed > 0.2:
        if name in ('car', 'construction_vehicle', 'bus', 'truck',
                    'trailer'):
            return 'vehicle.moving'
        if name in ('bicycle', 'motorcycle'):
            return 'cycle.with_rider'
        return DEFAULT_ATTRIBUTES.get(name, '')
    if name == 'pedestrian':
        return 'pedestrian.standing'
    if name == 'bus':
        return 'vehicle.stopped'
    return DEFAULT_ATTRIBUTES.get(name, '')


@DATASETS.register('NuScenesDataset')
class NuScenesDataset(Custom3DDataset):
    CLASSES = ('car', 'truck', 'construction_vehicle', 'bus', 'trailer',
               'barrier', 'motorcycle', 'bicycle', 'pedestrian',
               'traffic_cone')

    def __init__(self, *args, num_views=6, load_interval=1,
                 with_velocity=True, eval_version='detection_cvpr_2019',
                 **kwargs):
        self.num_views = num_views
        self.load_interval = load_interval
        self.with_velocity = with_velocity
        self.eval_version = eval_version
        super().__init__(*args, **kwargs)
        if load_interval > 1:
            self.data_infos = self.data_infos[::load_interval]

    def get_data_info(self, index):
        info = self.data_infos[index]
        results = dict(
            sample_idx=index,
            token=info.get('token'),
            pts_filename=info['lidar_path'],
            sweeps=info.get('sweeps', []),
            timestamp=info.get('timestamp', 0),
        )
        if self.modality.get('use_camera') and 'cams' in info:
            img_files, lidar2img = [], []
            for cam in CAM_ORDER:
                cam_info = info['cams'][cam]
                img_files.append(cam_info['data_path'])
                # lidar -> cam -> image projection matrix
                l2c_r = np.linalg.inv(
                    np.asarray(cam_info['sensor2lidar_rotation']))
                l2c_t = -l2c_r @ np.asarray(
                    cam_info['sensor2lidar_translation'])
                viewpad = np.eye(4)
                intrinsic = np.asarray(cam_info['cam_intrinsic'])
                viewpad[:3, :3] = intrinsic
                l2c = np.eye(4)
                l2c[:3, :3] = l2c_r
                l2c[:3, 3] = l2c_t
                lidar2img.append((viewpad @ l2c).astype(np.float32))
            results['img_filename'] = img_files
            results['lidar2img'] = np.stack(lidar2img)
        return results

    def get_ann_info(self, index):
        info = self.data_infos[index]
        boxes = np.asarray(info['gt_boxes'], np.float32).reshape(-1, 7)
        names = info['gt_names']
        if self.with_velocity:
            vel = np.asarray(info.get('gt_velocity',
                                      np.zeros((len(boxes), 2))), np.float32)
            vel = np.nan_to_num(vel).reshape(-1, 2)
            boxes = np.concatenate([boxes, vel], axis=-1)
        labels = np.asarray(
            [self.cat2id.get(n, -1) for n in names], np.int64)
        valid = info.get('valid_flag',
                         np.ones(len(boxes), bool))
        valid = np.asarray(valid, bool)
        return dict(gt_bboxes_3d=boxes[valid], gt_labels_3d=labels[valid])

    # ------------------------------------------------------------------
    # submission / evaluation
    # ------------------------------------------------------------------
    def format_results(self, results: List[Dict[str, np.ndarray]],
                       jsonfile_prefix='results_nusc'):
        """Convert per-sample detections into a nuScenes submission dict.

        Each result dict holds 'bboxes' [N, 9], 'scores' [N], 'labels' [N]
        (already mask-filtered). Boxes are transformed LiDAR -> global
        (reference nuscenes_dataset.py:300-304, lidar_nusc_box_to_global).
        """
        import json
        nusc_annos = {}
        for idx, det in enumerate(results):
            info = self.data_infos[idx]
            token = info['token']
            boxes = np.asarray(det['bboxes'])
            scores = np.asarray(det['scores'])
            labels = np.asarray(det['labels'])
            # identity poses when infos carry no calibration (synthetic /
            # minimal infos, e.g. the in-training EvalHook smoke path)
            ident_q = np.array([1.0, 0.0, 0.0, 0.0])
            l2e_r = np.asarray(info.get('lidar2ego_rotation', ident_q))
            l2e_t = np.asarray(info.get('lidar2ego_translation', np.zeros(3)))
            e2g_r = np.asarray(info.get('ego2global_rotation', ident_q))
            e2g_t = np.asarray(info.get('ego2global_translation',
                                        np.zeros(3)))
            annos = []
            for box, score, label in zip(boxes, scores, labels):
                name = self.CLASSES[int(label)]
                center = box[:3].copy()
                center[2] += box[5] / 2  # bottom -> gravity for submission
                # full-quaternion LiDAR -> ego -> global composition
                # (reference lidar_nusc_box_to_global composes Quaternions;
                # summing yaws would drop the roll/pitch of lidar2ego)
                center = _quat_to_matrix(l2e_r) @ center + l2e_t
                center = _quat_to_matrix(e2g_r) @ center + e2g_t
                rot = _quat_mul(e2g_r,
                                _quat_mul(l2e_r, _yaw_to_quat(float(box[6]))))
                vel = np.zeros(3)
                if box.shape[0] > 8:
                    vel[:2] = box[7:9]
                    vel = _quat_to_matrix(e2g_r) @ (
                        _quat_to_matrix(l2e_r) @ vel)
                annos.append(dict(
                    sample_token=token,
                    translation=center.tolist(),
                    size=[float(box[3]), float(box[4]), float(box[5])],
                    rotation=np.asarray(rot, float).tolist(),
                    velocity=vel[:2].tolist(),
                    detection_name=name,
                    detection_score=float(score),
                    attribute_name=attribute_for(name, vel[:2])))
            nusc_annos[token] = annos
        submission = dict(
            meta=dict(use_lidar=True, use_camera=bool(
                self.modality.get('use_camera')), use_radar=False,
                use_map=False, use_external=False),
            results=nusc_annos)
        out = f'{jsonfile_prefix}.json'
        os.makedirs(os.path.dirname(out) or '.', exist_ok=True)
        with open(out, 'w') as f:
            json.dump(submission, f)
        return out

    def evaluate(self, results, jsonfile_prefix='results_nusc', **kwargs):
        res_path = self.format_results(results, jsonfile_prefix)
        try:
            from nuscenes import NuScenes
            from nuscenes.eval.detection.config import config_factory
            from nuscenes.eval.detection.evaluate import NuScenesEval
        except ImportError:
            # devkit absent: run the native mAP/NDS implementation against
            # the dataset's own GT (core/evaluation/nuscenes_metrics.py)
            return self._evaluate_native(results)
        # devkit evaluation path (reference nuscenes_dataset.py:368-385;
        # NuScenesEval requires a DetectionConfig, built via config_factory)
        nusc = NuScenes(version=self.metadata.get('version', 'v1.0-trainval'),
                        dataroot=self.data_root, verbose=False)
        eval_set = 'val'
        nusc_eval = NuScenesEval(
            nusc, config=config_factory(self.eval_version),
            result_path=res_path, eval_set=eval_set,
            output_dir=os.path.dirname(res_path) or '.', verbose=False)
        metrics = nusc_eval.main(render_curves=False)
        return metrics

    def _evaluate_native(self, results):
        """Native (devkit-free) nuScenes detection metrics on LiDAR-frame
        boxes: mAP over the 4 distance thresholds + TP errors + NDS."""
        from ..core.evaluation.nuscenes_metrics import evaluate_detections
        gts, dets = [], []
        for idx, det in enumerate(results):
            ann = self.get_ann_info(idx)
            gts.append(dict(bboxes=ann['gt_bboxes_3d'],
                            labels=ann['gt_labels_3d']))
            dets.append(dict(bboxes=np.asarray(det['bboxes']),
                             scores=np.asarray(det['scores']),
                             labels=np.asarray(det['labels'])))
        return evaluate_detections(dets, gts, class_names=list(self.CLASSES))


def _quat_to_matrix(q):
    """[w, x, y, z] quaternion -> 3x3 rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _quat_from_matrix(m):
    w = np.sqrt(max(0, 1 + m[0, 0] + m[1, 1] + m[2, 2])) / 2
    if w < 1e-8:
        return np.array([1.0, 0, 0, 0])
    x = (m[2, 1] - m[1, 2]) / (4 * w)
    y = (m[0, 2] - m[2, 0]) / (4 * w)
    z = (m[1, 0] - m[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


def _yaw_of_quat(q):
    m = _quat_to_matrix(q)
    return float(np.arctan2(m[1, 0], m[0, 0]))


def _yaw_to_quat(yaw):
    return np.array([np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)])


def _quat_mul(a, b):
    """Hamilton product of [w, x, y, z] quaternions (a then b applied)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])
