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


def unpack_detections(res) -> list:
    """Device detection dict -> per-sample masked numpy dicts.

    The reference returns variable-length box lists from ``simple_test``;
    here validity masks carry that (shared by tools/test.py and the
    in-training EvalHook).
    """
    boxes = res['bboxes'] if 'bboxes' in res else res['boxes']
    out = []
    b = boxes.shape[0]
    for i in range(b):
        valid = np.asarray(res['valid'][i]) if 'valid' in res else \
            np.ones(boxes.shape[1], bool)
        out.append(dict(bboxes=np.asarray(boxes[i])[valid],
                        scores=np.asarray(res['scores'][i])[valid],
                        labels=np.asarray(res['labels'][i])[valid]))
    return out


def batch_model_inputs(model_type: str, batch) -> tuple:
    """Positional model inputs from a collated batch (multimodal-aware)."""
    import jax
    import jax.numpy as jnp
    if model_type == 'MSMDFusionDetector':
        return (jnp.asarray(batch['points']),
                jnp.asarray(batch['points_mask']),
                jnp.asarray(batch['img']),
                jax.tree_util.tree_map(jnp.asarray, batch['foreground']))
    return (jnp.asarray(batch['points']), jnp.asarray(batch['points_mask']))


def make_batch_infer(model, model_type: str):
    """Jitted batch inference closure: (variables, batch) -> detections.

    Variables are a jit argument (not a closure constant), so one compile
    serves every EvalHook epoch.
    """
    import jax

    @jax.jit
    def infer(variables, *inputs):
        preds = model.apply(variables, *inputs, train=False)
        return model.apply(variables, preds, method=type(model).get_bboxes)

    def fn(variables, batch):
        res = infer(variables, *batch_model_inputs(model_type, batch))
        return unpack_detections(jax.device_get(res))

    return fn


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


def inference_detector(model, variables, cfg, pcd_path: str,
                       img_paths: Optional[list] = None,
                       lidar2img: Optional[np.ndarray] = None):
    """Run single-sample inference on a point cloud file.

    For multimodal models (MSMDFusionDetector) pass the 6 camera image
    paths + lidar2img [V, 4, 4]; the full test pipeline (images, foreground
    artifacts, padding) then runs — the reference inference_detector builds
    the same pipeline from cfg.data.test (apis/inference.py:64-107).
    """
    import jax
    import jax.numpy as jnp
    from ..datasets.pipelines.loading import Compose

    multimodal = img_paths is not None
    skip = () if multimodal else (
        'LoadMultiViewImageFromFiles', 'LoadForeground2D',
        'LoadForeground2DFromMultiSweeps', 'GlobalRotTransFilterForeground2D',
        'MyResize', 'ImageResize', 'MyNormalize', 'ImageNormalize', 'MyPad',
        'ImagePad', 'ImgScaleCropFlipForeground2D', 'PadForeground2D')
    pipeline = Compose([t for t in cfg.data.test.pipeline
                        if t['type'] not in skip])
    sample = {'pts_filename': pcd_path, 'sweeps': [], 'timestamp': 0}
    if multimodal:
        sample['img_filename'] = list(img_paths)
        sample['lidar2img'] = (np.asarray(lidar2img, np.float32)
                               if lidar2img is not None else
                               np.tile(np.eye(4, dtype=np.float32),
                                       (len(img_paths), 1, 1)))
    results = pipeline(sample)
    points = jnp.asarray(results['points'])[None]
    mask = jnp.asarray(results['points_mask'])[None]
    if multimodal:
        img = jnp.asarray(results['img'])[None]
        fg = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None],
                                    results['foreground'])
        inputs = (points, mask, img, fg)
    else:
        inputs = (points, mask)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), *inputs)
    preds = model.apply(variables, *inputs, train=False)
    res = model.apply(variables, preds, method=type(model).get_bboxes)
    res = jax.device_get(res)
    boxes = res['bboxes'] if 'bboxes' in res else res['boxes']
    valid = np.asarray(res['valid'][0]) if 'valid' in res else \
        np.ones(res['scores'].shape[1], bool)
    return dict(boxes_3d=np.asarray(boxes[0])[valid],
                scores_3d=np.asarray(res['scores'][0])[valid],
                labels_3d=np.asarray(res['labels'][0])[valid])
