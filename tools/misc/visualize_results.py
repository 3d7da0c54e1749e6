#!/usr/bin/env python
"""Visualize saved detection results (BEV PNG + OBJ per sample).

TPU-native equivalent of tools/misc/visualize_results.py:1-40: load a
results pickle (tools/test.py --out), rebuild the dataset from the config,
and write per-sample visualizations through the dataset-agnostic
core/visualizer.
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

from msmdfusion_tpu.config import load_config
from msmdfusion_tpu.registry import DATASETS
import msmdfusion_tpu.models  # noqa: F401


def parse_args():
    p = argparse.ArgumentParser(description='visualize results')
    p.add_argument('config')
    p.add_argument('--result', required=True, help='results .pkl')
    p.add_argument('--show-dir', required=True)
    p.add_argument('--max-samples', type=int, default=20)
    return p.parse_args()


def main():
    args = parse_args()
    assert args.result.endswith(('.pkl', '.pickle')), \
        'unsupported result format'
    cfg = load_config(args.config)
    dataset = DATASETS.build(dict(cfg.data.test))
    with open(args.result, 'rb') as f:
        results = pickle.load(f)
    os.makedirs(args.show_dir, exist_ok=True)
    from msmdfusion_tpu.core.visualizer import show_result
    for i, det in enumerate(results[:args.max_samples]):
        info = dataset.get_data_info(i)
        pts_file = info.get('pts_filename')
        points = np.fromfile(pts_file, np.float32).reshape(-1, 5)[:, :3] \
            if pts_file and os.path.exists(pts_file) else np.zeros((0, 3))
        ann = dataset.get_ann_info(i) if hasattr(dataset, 'get_ann_info') \
            else {}
        show_result(points, ann.get('gt_bboxes_3d'),
                    np.asarray(det['bboxes']), args.show_dir,
                    f'sample_{i}')
    print(f'wrote {min(len(results), args.max_samples)} visualizations '
          f'to {args.show_dir}')


if __name__ == '__main__':
    main()
