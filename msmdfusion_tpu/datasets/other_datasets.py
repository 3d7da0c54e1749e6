"""Waymo / Lyft / ScanNet / SUNRGBD dataset readers.

TPU-native equivalents of the remaining mmdet3d dataset zoo
(waymo_dataset.py:574, lyft_dataset.py:517, scannet_dataset.py,
sunrgbd_dataset.py): info-pkl backed readers sharing the Custom3DDataset
machinery. Waymo reuses the KITTI-format info layout the reference
converter emits; Lyft mirrors the nuScenes layout; the indoor sets read
axis-aligned/depth-frame boxes.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..registry import DATASETS
from .custom_3d import Custom3DDataset
from .kitti import KittiDataset
from .nuscenes import NuScenesDataset


@DATASETS.register('WaymoDataset')
class WaymoDataset(KittiDataset):
    """Waymo in KITTI-format infos (reference waymo converter layout)."""
    CLASSES = ('Car', 'Pedestrian', 'Cyclist')

    def __init__(self, *args, load_interval=1, **kwargs):
        super().__init__(*args, **kwargs)
        if load_interval > 1:
            self.data_infos = self.data_infos[::load_interval]

    def format_results(self, results, jsonfile_prefix=None):
        """Write the combined waymo ``Objects`` .bin submission file.

        Mirrors the reference's ``waymo_results_final_path`` output
        (prediction_kitti_to_waymo.py:261 ``convert``/``combine``,
        waymo_dataset.py:279-350) so the native-proxy metrics can be
        cross-checked against the official WOD evaluator externally.
        """
        from ..core.evaluation.waymo_serialize import serialize_waymo_objects
        contexts = []
        for info in self.data_infos[:len(results)]:
            pc = info.get('point_cloud', {})
            contexts.append(dict(
                context_name=str(info.get('context_name',
                                          pc.get('lidar_idx', ''))),
                timestamp_micros=int(info.get('timestamp',
                                              info.get('timestamp_micros',
                                                       0)))))
        buf = serialize_waymo_objects(results, contexts, list(self.CLASSES))
        out = (jsonfile_prefix or os.path.join(
            self.data_root or '.', 'results_waymo')) + '.bin'
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        with open(out, 'wb') as f:
            f.write(buf)
        return out

    def evaluate(self, results, metric='waymo', iou_thr=(0.7, 0.5, 0.5),
                 **kwargs):
        """metric='waymo': native L1/L2 3D mAP/mAPH protocol
        (core/evaluation/waymo_eval.py) — the reference has no in-tree
        equivalent (waymo_utils/prediction_kitti_to_waymo.py:261 converts
        to protos and shells out to the waymo-open-dataset binary).
        metric='kitti'/'bev': the KITTI-format protocols of the base class.
        """
        if metric != 'waymo':
            return super().evaluate(results, metric=metric, iou_thr=iou_thr)
        from ..core.evaluation.waymo_eval import waymo_eval
        gts = []
        for i in range(len(results)):
            ann = self.get_ann_info(i)
            gt = dict(boxes=ann['gt_bboxes_3d'], labels=ann['gt_labels_3d'])
            annos = self.data_infos[i].get('annos', {})
            if 'num_points_in_gt' in annos:
                keep = annos['name'] != 'DontCare'
                gt['num_points'] = np.asarray(
                    annos['num_points_in_gt'])[keep]
            gts.append(gt)
        dts = [dict(boxes=r['bboxes'], labels=r['labels'],
                    scores=r['scores']) for r in results]
        report, metrics = waymo_eval(gts, dts, list(self.CLASSES))
        print(report)
        return metrics


@DATASETS.register('LyftDataset')
class LyftDataset(NuScenesDataset):
    """Lyft L5 (nuScenes-format infos; no velocity, 9 classes)."""
    CLASSES = ('car', 'truck', 'bus', 'emergency_vehicle', 'other_vehicle',
               'motorcycle', 'bicycle', 'pedestrian', 'animal')

    def __init__(self, *args, **kwargs):
        kwargs.setdefault('with_velocity', False)
        super().__init__(*args, **kwargs)

    def format_results(self, results, jsonfile_prefix='results_lyft'):
        """Lyft sample-result dicts (reference lyft_dataset.py:236-263):
        per-box ``{sample_token, translation, size, rotation, name,
        score}`` — NO velocity/attribute fields (that long tail is
        nuScenes-only) — under ``{'meta': modality, 'results': ...}``.
        """
        import json

        from .nuscenes import (_quat_mul, _quat_to_matrix, _yaw_to_quat)
        lyft_annos = {}
        for idx, det in enumerate(results):
            info = self.data_infos[idx]
            token = info['token']
            ident_q = np.array([1.0, 0.0, 0.0, 0.0])
            l2e_r = np.asarray(info.get('lidar2ego_rotation', ident_q))
            l2e_t = np.asarray(info.get('lidar2ego_translation',
                                        np.zeros(3)))
            e2g_r = np.asarray(info.get('ego2global_rotation', ident_q))
            e2g_t = np.asarray(info.get('ego2global_translation',
                                        np.zeros(3)))
            annos = []
            for box, score, label in zip(np.asarray(det['bboxes']),
                                         np.asarray(det['scores']),
                                         np.asarray(det['labels'])):
                center = box[:3].copy()
                center[2] += box[5] / 2     # bottom -> gravity center
                center = _quat_to_matrix(l2e_r) @ center + l2e_t
                center = _quat_to_matrix(e2g_r) @ center + e2g_t
                rot = _quat_mul(
                    e2g_r, _quat_mul(l2e_r, _yaw_to_quat(float(box[6]))))
                annos.append(dict(
                    sample_token=token,
                    translation=center.tolist(),
                    size=[float(box[3]), float(box[4]), float(box[5])],
                    rotation=np.asarray(rot, float).tolist(),
                    name=self.CLASSES[int(label)],
                    score=float(score)))
            lyft_annos[token] = annos
        submission = dict(meta=dict(self.modality), results=lyft_annos)
        out = f'{jsonfile_prefix}.json'
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        with open(out, 'w') as f:
            json.dump(submission, f)
        return out

    def json2csv(self, json_path, csv_savepath):
        """Kaggle submission CSV (reference lyft_dataset.py:426-463):
        ``Id,PredictionString`` rows, one ``score x y z w l h yaw name``
        group per box (quaternion converted back to yaw). Tokens missing
        from the results get an empty prediction string; a
        ``sample_submission.csv`` next to data_root seeds the Id order
        when present, otherwise the results' own token order is used.
        """
        import csv
        import json

        with open(json_path) as f:
            results = json.load(f)['results']
        ids, preds = [], {}
        sample_csv = os.path.join(self.data_root or '.',
                                  'sample_submission.csv')
        if os.path.exists(sample_csv):
            with open(sample_csv) as f:
                ids = [row['Id'] for row in csv.DictReader(f)]
        if not ids:
            ids = list(results.keys())
        for token, annos in results.items():
            parts = []
            for p in annos:
                w, x, y, z = p['rotation']
                # quaternion -> yaw (reference uses
                # Quaternion.yaw_pitch_roll[0])
                yaw = np.arctan2(2 * (w * z + x * y),
                                 1 - 2 * (y * y + z * z))
                parts.append(' '.join(
                    [str(p['score'])] + [str(v) for v in p['translation']]
                    + [str(v) for v in p['size']] + [str(yaw), p['name']]))
            preds[token] = ' '.join(parts)
        os.makedirs(os.path.dirname(os.path.abspath(csv_savepath)),
                    exist_ok=True)
        with open(csv_savepath, 'w', newline='') as f:
            wr = csv.writer(f)
            wr.writerow(['Id', 'PredictionString'])
            for t in ids:
                wr.writerow([t, preds.get(t, '')])
        return csv_savepath


class _IndoorDataset(Custom3DDataset):
    """Shared reader for depth-frame indoor infos (ScanNet/SUNRGBD).

    Info layout matches the reference converters (scannet_dataset.py:66-106,
    sunrgbd_dataset.py:69-140): ``pts_path`` point file,
    ``annos.gt_boxes_upright_depth`` gravity-center depth-frame boxes
    ([k, 6] axis-aligned for ScanNet, [k, 7] yawed for SUNRGBD),
    ``annos.class`` labels, optional per-point instance/semantic mask
    paths. Boxes are converted to this framework's bottom-center
    (x, y, z, dx, dy, dz, yaw) arrays (the reference wraps them in
    DepthInstance3DBoxes with origin=(0.5, 0.5, 0.5), i.e. the same shift).
    """

    def get_data_info(self, index):
        info = self.data_infos[index]
        pts_path = info.get('pts_path', info.get('lidar_path', ''))
        results = dict(
            sample_idx=info.get('point_cloud', {}).get('lidar_idx', index),
            pts_filename=os.path.join(self.data_root, pts_path),
            sweeps=[], timestamp=0)
        if self.modality.get('use_camera') and 'image' in info:
            results['img_filename'] = [os.path.join(
                self.data_root, 'sunrgbd_trainval',
                info['image'].get('image_path', ''))]
            if 'calib' in info:
                results['calib'] = info['calib']
        return results

    def get_ann_info(self, index):
        info = self.data_infos[index]
        annos = info.get('annos', {})
        if annos.get('gt_num', len(annos.get('class', []))) == 0:
            boxes = np.zeros((0, 7), np.float32)
            labels = np.zeros((0,), np.int64)
        else:
            boxes = np.asarray(annos['gt_boxes_upright_depth'],
                               np.float32).reshape(
                                   len(annos['class']), -1)
            if boxes.shape[1] == 6:  # axis-aligned: add zero yaw
                boxes = np.concatenate(
                    [boxes, np.zeros((len(boxes), 1), np.float32)], axis=1)
            boxes = boxes.copy()
            boxes[:, 2] -= boxes[:, 5] / 2  # gravity -> bottom center
            labels = np.asarray(annos['class'], np.int64)
        ann = dict(gt_bboxes_3d=boxes, gt_labels_3d=labels)
        if 'pts_instance_mask_path' in info:
            ann['pts_instance_mask_path'] = os.path.join(
                self.data_root, info['pts_instance_mask_path'])
        if 'pts_semantic_mask_path' in info:
            ann['pts_semantic_mask_path'] = os.path.join(
                self.data_root, info['pts_semantic_mask_path'])
        if self.modality.get('use_camera') and 'bbox' in annos:
            # image-plane gt boxes for the 2D eval path (reference
            # sunrgbd_dataset.py:140-150 attaches them under use_camera)
            ann['bboxes'] = (np.asarray(annos['bbox'], np.float32)
                             if annos.get('gt_num',
                                          len(annos.get('class', [])))
                             else np.zeros((0, 4), np.float32))
            ann['labels'] = labels
        return ann

    def show(self, results, out_dir, show=True):
        """Per-sample artifacts: BEV PNG + OBJ wireframes + the
        interactive WebGL viewer (reference scannet/sunrgbd ``show``,
        scannet_dataset.py:109-128, which opens an open3d window; here
        the _viewer.html IS the rotatable window, headless-friendly).
        """
        from ..core.visualizer import show_result
        outputs = []
        for i, result in enumerate(results):
            info = self.data_infos[i]
            pts_path = info.get('pts_path', '')
            name = os.path.split(pts_path)[-1].split('.')[0] or f's{i}'
            full = os.path.join(self.data_root, pts_path)
            points = (np.fromfile(full, np.float32).reshape(-1, 6)
                      if os.path.exists(full) else None)
            gt = self.get_ann_info(i)['gt_bboxes_3d']
            pred = np.asarray(result.get('bboxes',
                                         result.get('boxes_3d', [])))
            outputs += show_result(points, gt, pred, out_dir, name)
        return outputs


@DATASETS.register('ScanNetDataset')
class ScanNetDataset(_IndoorDataset):
    CLASSES = ('cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtrain', 'toilet', 'sink',
               'bathtub', 'garbagebin')


@DATASETS.register('SUNRGBDDataset')
class SUNRGBDDataset(_IndoorDataset):
    CLASSES = ('bed', 'table', 'sofa', 'chair', 'toilet', 'desk', 'dresser',
               'night_stand', 'bookshelf', 'bathtub')


# wire the indoor protocol into both indoor readers (reference
# scannet/sunrgbd datasets call indoor_eval with iou_thr (0.25, 0.5))
def _indoor_evaluate(self, results, iou_thr=(0.25, 0.5), **kwargs):
    from ..core.evaluation.indoor_eval import indoor_eval
    gts = [self.get_ann_info(i) for i in range(len(results))]
    return indoor_eval(gts, results, iou_thr, list(self.CLASSES))


_IndoorDataset.evaluate = _indoor_evaluate


def _lyft_evaluate(self, results, **kwargs):
    """Lyft-protocol mAP over IoU 0.5:0.05:0.95 (reference lyft_eval)."""
    from ..core.evaluation.lyft_seg_eval import lyft_eval_native
    gts = []
    for i in range(len(results)):
        ann = self.get_ann_info(i)
        gts.append(dict(gt_bboxes_3d=ann['gt_bboxes_3d'],
                        gt_labels_3d=ann['gt_labels_3d']))
    return lyft_eval_native(gts, results, list(self.CLASSES))


LyftDataset.evaluate = _lyft_evaluate


@DATASETS.register('SemanticKittiDataset')
class SemanticKittiDataset(Custom3DDataset):
    """Semantic segmentation shell (reference semantickitti_dataset.py);
    evaluates with the confusion-matrix seg protocol."""
    CLASSES = ('unlabeled', 'car', 'bicycle', 'motorcycle', 'truck', 'bus',
               'person', 'bicyclist', 'motorcyclist', 'road', 'parking',
               'sidewalk', 'other-ground', 'building', 'fence', 'vegetation',
               'trunck', 'terrian', 'pole', 'traffic-sign')

    def get_data_info(self, index):
        info = self.data_infos[index]
        return dict(sample_idx=index,
                    pts_filename=os.path.join(
                        self.data_root, info.get('pts_path', '')),
                    pts_semantic_mask_path=os.path.join(
                        self.data_root, info.get('pts_semantic_mask_path',
                                                 '')),
                    sweeps=[], timestamp=0)

    def evaluate(self, results, **kwargs):
        """results[i]: {'semantic_mask': [N] predicted labels}."""
        from ..core.evaluation.lyft_seg_eval import seg_eval
        gts, preds = [], []
        for i, res in enumerate(results):
            info = self.data_infos[i]
            mask_path = os.path.join(self.data_root,
                                     info.get('pts_semantic_mask_path', ''))
            gts.append(np.fromfile(mask_path, dtype=np.int32)
                       if os.path.exists(mask_path)
                       else np.asarray(res.get('gt_semantic_mask', [])))
            preds.append(np.asarray(res['semantic_mask']))
        label2cat = dict(enumerate(self.CLASSES))
        return seg_eval(gts, preds, label2cat)
