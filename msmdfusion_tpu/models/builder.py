"""Model builders (reference mmdet3d/models/builder.py:1-63).

``build_detector(cfg.model)`` instantiates the registered flax detector
module; parameters are created separately via ``model.init`` (functional
style) — see apis/train.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from ..registry import (BACKBONES, DETECTORS, HEADS, MIDDLE_ENCODERS, NECKS,
                        VOXEL_ENCODERS)


def _plain(cfg):
    """Recursively convert ConfigDict trees to plain dict/list for flax."""
    if isinstance(cfg, dict):
        return {k: _plain(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(_plain(v) for v in cfg)
    return cfg


def build_detector(cfg: Dict[str, Any], train_cfg=None, test_cfg=None):
    cfg = _plain(dict(cfg))
    if train_cfg is not None:
        cfg['train_cfg'] = _plain(train_cfg)
    if test_cfg is not None:
        cfg['test_cfg'] = _plain(test_cfg)
    return DETECTORS.build(cfg)


def build_backbone(cfg):
    return BACKBONES.build(_plain(dict(cfg)))


def build_neck(cfg):
    return NECKS.build(_plain(dict(cfg)))


def build_head(cfg):
    return HEADS.build(_plain(dict(cfg)))


def build_voxel_encoder(cfg):
    return VOXEL_ENCODERS.build(_plain(dict(cfg)))


def build_middle_encoder(cfg):
    return MIDDLE_ENCODERS.build(_plain(dict(cfg)))
