"""Interactive WebGL viewer export: data integrity of the embedded scene.

The reference ships an interactive open3d window
(mmdet3d/core/visualizer/open3d_vis.py:510); this stack replaces it with a
dependency-free single-file WebGL viewer that opens anywhere. The test
round-trips the embedded base64 buffers — the exact arrays the JS decodes.
"""
import base64
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msmdfusion_tpu.core.box_np_ops import corners_3d_np
from msmdfusion_tpu.core.visualizer import export_html, show_result


def _embedded(path):
    src = open(path).read()
    m = re.search(r'const DATA = (\{.*?\});</script>', src, re.S)
    assert m, 'DATA blob missing'
    return json.loads(m.group(1)), src


def test_export_html_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(5000, 4).astype(np.float32) * 10
    det = np.array([[0, 0, 0, 4, 2, 1.5, 0.3],
                    [5, 5, 0, 3, 1.5, 1.4, -0.5]], np.float32)
    gt = np.array([[0.2, 0, 0, 4, 2, 1.5, 0.25]], np.float32)
    out = export_html(pts, det, gt, str(tmp_path / 'scene_viewer.html'))
    data, src = _embedded(out)

    dec = np.frombuffer(base64.b64decode(data['points']), np.float32)
    np.testing.assert_array_equal(dec.reshape(-1, 3), pts[:, :3])

    pred_lines = np.frombuffer(base64.b64decode(data['pred_lines']),
                               np.float32).reshape(-1, 3)
    assert pred_lines.shape[0] == len(det) * 24          # 12 edges x 2 ends
    # every line endpoint must be one of the true box corners
    corners = corners_3d_np(det).reshape(-1, 3)
    d = np.abs(pred_lines[:, None, :] - corners[None, :, :]).sum(-1).min(1)
    assert d.max() < 1e-5

    gt_lines = np.frombuffer(base64.b64decode(data['gt_lines']), np.float32)
    assert gt_lines.size == len(gt) * 24 * 3
    assert data['hmin'] < data['hmax']
    # the interactive controls are actually wired in the shipped JS
    for frag in ('mousedown', 'wheel', 'drawArrays', 'gl.POINTS',
                 'gl.LINES'):
        assert frag in src, frag


def test_export_html_subsamples_and_handles_empty(tmp_path):
    pts = np.zeros((1000, 3), np.float32)
    pts[:, 2] = np.linspace(0, 5, 1000)
    out = export_html(pts, None, None, str(tmp_path / 'v.html'),
                      max_points=100)
    data, _ = _embedded(out)
    dec = np.frombuffer(base64.b64decode(data['points']), np.float32)
    assert dec.size == 100 * 3
    assert data['pred_lines'] == '' and data['gt_lines'] == ''


def test_show_result_emits_viewer(tmp_path):
    pts = np.random.RandomState(1).randn(100, 4).astype(np.float32)
    det = np.array([[0, 0, 0, 2, 1, 1, 0]], np.float32)
    outs = show_result(pts, None, det, str(tmp_path), 'sample')
    html = [o for o in outs if o.endswith('_viewer.html')]
    assert html and os.path.getsize(html[0]) > 1000
