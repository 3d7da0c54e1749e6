"""End-to-end eval CLI smoke: tools/test.py on a synthetic dataset.

The reference's most-used entry point (tools/test.py:101-219): infer ->
--out pickle / --eval metrics / --format-only submission. VERDICT r2
item 8: the eval CLI was never executed as a whole."""
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from tests.test_train_cli import (CONFIG_TEMPLATE,  # noqa: F401
                                  synthetic_dataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_eval_cli_out_eval_and_format_only(synthetic_dataset):  # noqa: F811
    tmp_path, cfg_path = synthetic_dataset
    # the shared template has train/val; the eval CLI reads data.test
    with open(cfg_path, 'a') as f:
        f.write("\ndata['test'] = dict(data['val'])\n")
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out_pkl = tmp_path / 'results.pkl'
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'test.py'), cfg_path,
         '--out', str(out_pkl), '--eval', 'bbox',
         '--max-samples', '3'],
        capture_output=True, text=True, env=env, timeout=3000,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    # --out: per-sample masked detection dicts
    with open(out_pkl, 'rb') as f:
        results = pickle.load(f)
    assert len(results) == 3
    for det in results:
        assert set(det) >= {'bboxes', 'scores', 'labels'}
        assert np.isfinite(det['bboxes']).all()
    # --eval: the native nuScenes metrics dict printed (mAP/NDS keys)
    assert 'mAP' in proc.stdout and 'NDS' in proc.stdout

    # --format-only: submission JSON with the nuScenes schema
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'test.py'), cfg_path,
         '--format-only', '--max-samples', '3'],
        capture_output=True, text=True, env=env, timeout=3000,
        cwd=str(tmp_path))
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    sub_path = [l.split()[-1] for l in proc2.stdout.splitlines()
                if 'submission written to' in l][0]
    if not os.path.isabs(sub_path):
        sub_path = os.path.join(str(tmp_path), sub_path)
    sub = json.load(open(sub_path))
    assert set(sub) == {'meta', 'results'}
    for token, annos in sub['results'].items():
        for a in annos:
            assert set(a) >= {'sample_token', 'translation', 'size',
                              'rotation', 'velocity', 'detection_name',
                              'detection_score', 'attribute_name'}
