"""Config smoke test: every config under configs/ must build a detector.

Mirrors the reference's de-facto registry regression net
(tests/test_runtime/test_config.py:19-60).
"""
import glob
import os

import pytest

import msmdfusion_tpu.models  # noqa: F401
from msmdfusion_tpu.config import load_config
from msmdfusion_tpu.models.builder import build_detector

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')
CONFIGS = [p for p in sorted(glob.glob(os.path.join(CONFIG_DIR, '*.py')))
           if '_base_' not in p]


@pytest.mark.parametrize('config_path', CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_detector(config_path):
    cfg = load_config(config_path)
    assert 'model' in cfg
    model = build_detector(cfg.model)
    assert model is not None
    # flax modules are dataclasses; type name must match the config type
    assert type(model).__name__ in cfg.model.type


def test_config_override_roundtrip():
    cfg = load_config(CONFIGS[0], {'model.pts_voxel_layer.max_num_points': 7})
    assert cfg.model.pts_voxel_layer.max_num_points == 7
