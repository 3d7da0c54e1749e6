"""Inference API: init_detector / inference_detector.

TPU-native equivalent of mmdet3d/apis/inference.py:30-135: build model from
config, load an orbax checkpoint, run the test pipeline on a single point
cloud, return masked detections.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..config import load_config
from ..models.builder import build_detector
from ..registry import PIPELINES
from ..utils.checkpoint import load_checkpoint


def init_detector(config, checkpoint: Optional[str] = None):
    """Build a detector + variables from a config path or dict."""
    import jax
    import msmdfusion_tpu.models  # noqa: F401

    if isinstance(config, str):
        config = load_config(config)
    model = build_detector(config.model)
    variables = None
    if checkpoint:
        state = load_checkpoint(checkpoint)
        variables = {'params': state['params'],
                     'batch_stats': state.get('batch_stats', {})}
    return model, variables, config


def inference_detector(model, variables, cfg, pcd_path: str):
    """Run single-sample LiDAR inference on a point cloud file."""
    import jax
    import jax.numpy as jnp
    from ..datasets.pipelines.loading import Compose

    pipeline = Compose([t for t in cfg.data.test.pipeline
                        if t['type'] not in
                        ('LoadMultiViewImageFromFiles',)])
    results = pipeline({'pts_filename': pcd_path, 'sweeps': [],
                        'timestamp': 0})
    points = jnp.asarray(results['points'])[None]
    mask = jnp.asarray(results['points_mask'])[None]
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), points, mask)
    preds = model.apply(variables, points, mask, train=False)
    res = model.apply(variables, preds, method=type(model).get_bboxes)
    res = jax.device_get(res)
    valid = np.asarray(res['valid'][0]) if 'valid' in res else \
        np.ones(res['scores'].shape[1], bool)
    return dict(boxes_3d=np.asarray(res['bboxes'][0])[valid],
                scores_3d=np.asarray(res['scores'][0])[valid],
                labels_3d=np.asarray(res['labels'][0])[valid])
