"""Detection visualization (BEV matplotlib, mesh export).

TPU-native replacement for mmdet3d/core/visualizer/ (open3d_vis.py:510,
show_result.py:112): headless-friendly matplotlib BEV renders plus .obj
wireframe export (no open3d in this image).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .box_np_ops import corners_bev_np, corners_3d_np


def show_bev(points: Optional[np.ndarray], det_boxes: Optional[np.ndarray],
             gt_boxes: Optional[np.ndarray], out_file: str,
             pc_range=(-54, -54, 54, 54), dpi: int = 120):
    """Render points + boxes in BEV to a PNG."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 10), dpi=dpi)
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c='#888888',
                   linewidths=0)

    def draw(boxes, color):
        if boxes is None or not len(boxes):
            return
        bev = np.concatenate(
            [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=1)
        corners = corners_bev_np(bev)
        for quad in corners:
            loop = np.concatenate([quad, quad[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=0.8)

    draw(gt_boxes, '#2ca02c')
    draw(det_boxes, '#d62728')
    ax.set_xlim(pc_range[0], pc_range[2])
    ax.set_ylim(pc_range[1], pc_range[3])
    ax.set_aspect('equal')
    ax.set_title(os.path.basename(out_file))
    os.makedirs(os.path.dirname(out_file) or '.', exist_ok=True)
    fig.savefig(out_file, bbox_inches='tight')
    plt.close(fig)
    return out_file


def export_obj(boxes: np.ndarray, out_file: str):
    """Write 3D box wireframes as a Wavefront .obj (meshlab-compatible,
    mirroring show_result_meshlab's artifact style)."""
    corners = corners_3d_np(boxes[:, :7])
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 7), (1, 6), (2, 5), (3, 4)]
    os.makedirs(os.path.dirname(out_file) or '.', exist_ok=True)
    with open(out_file, 'w') as f:
        for box in corners:
            for v in box:
                f.write(f'v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n')
        for bi in range(len(corners)):
            base = bi * 8 + 1
            for a, b in edges:
                f.write(f'l {base + a} {base + b}\n')
    return out_file


def show_result(points, gt_bboxes, pred_bboxes, out_dir: str,
                filename: str):
    """Write BEV PNG + OBJ meshes for one sample.

    Reference: mmdet3d/core/visualizer/show_result.py:1-112 (which writes
    .obj files for points/gt/pred); the BEV PNG replaces the open3d window.
    """
    import os
    os.makedirs(out_dir, exist_ok=True)
    png = os.path.join(out_dir, f'{filename}_bev.png')
    show_bev(points, pred_bboxes, gt_bboxes, png)
    outputs = [png]
    if pred_bboxes is not None and len(pred_bboxes):
        obj = os.path.join(out_dir, f'{filename}_pred.obj')
        export_obj(np.asarray(pred_bboxes), obj)
        outputs.append(obj)
    if gt_bboxes is not None and len(gt_bboxes):
        obj = os.path.join(out_dir, f'{filename}_gt.obj')
        export_obj(np.asarray(gt_bboxes), obj)
        outputs.append(obj)
    return outputs
