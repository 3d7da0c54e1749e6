"""Generic MVX two-stage detector assembly + TTA (aug_test) routing.

TPU-native equivalents of the reference's detector base machinery:
- ``MVXTwoStageDetector`` (mmdet3d/models/detectors/mvx_two_stage.py:18-541):
  build every component from config (voxel layer/encoder, middle encoder,
  pts backbone/neck/head, optional image branch + fusion layer) and expose
  the standard forward/loss/decode surface. Concrete detectors
  (TransFusion/MSMDFusion/CenterPoint/...) specialize the data flow; this
  generic class covers the plain "voxelize -> encode -> BEV -> head"
  assembly directly from configs, like the reference base does.
- ``Base3DDetector.forward`` dispatch + ``aug_test`` routing
  (mmdet3d/models/detectors/base.py:11-107): ``aug_test_detector`` runs any
  detector's simple_test per augmented view, inverts each view's aug on the
  decoded boxes and merges with NMS (merge_aug_bboxes_3d).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ...registry import DETECTORS
from .transfusion import TransFusionDetector


@DETECTORS.register('MVXTwoStageDetector')
class MVXTwoStageDetector(TransFusionDetector):
    """Config-driven generic assembly (reference mvx_two_stage.py:18-541).

    The reference base already implements the full single-modality flow the
    TransFusion detector uses; registering the generic name makes plain
    mvx-style configs (pts-only, or pts + image branch with a head-side
    fusion) buildable without a family-specific subclass.
    """


def aug_test_detector(model, variables, aug_inputs: List[Dict],
                      max_boxes: Optional[int] = None) -> Dict:
    """Run simple_test per augmented view and merge (Base3DDetector.aug_test,
    reference base.py:14-43 + test_time_aug merge).

    Args:
        model / variables: a detector + its params.
        aug_inputs: one dict per view:
            {'points': [B, N, D], 'points_mask': [B, N],
             'aug': {'flip_horizontal': bool, 'flip_vertical': bool,
                     'scale': float}}  (the MultiScaleFlipAug3D record).
    Returns:
        merged per-sample detection dict (numpy, batch size 1 semantics
        mirror the reference's aug_test contract).
    """
    import jax

    from ...datasets.pipelines.test_time_aug import merge_aug_bboxes_3d
    aug_results = []
    aug_metas = []
    for view in aug_inputs:
        res = model.apply(variables, view['points'], view['points_mask'],
                          method=type(model).simple_test)
        res = jax.device_get(res)
        valid = np.asarray(res.get('valid'))
        out = dict(
            bboxes=np.asarray(res.get('bboxes', res.get('boxes')))[0],
            scores=np.asarray(res['scores'])[0],
            labels=np.asarray(res['labels'])[0])
        if valid is not None and valid.size:
            m = valid[0].astype(bool)
            out = {k: v[m] for k, v in out.items()}
        aug_results.append(out)
        aug_metas.append(dict(view.get('aug', {})))
    merged = merge_aug_bboxes_3d(aug_results, aug_metas,
                                 max_num=max_boxes or 500)
    return merged
