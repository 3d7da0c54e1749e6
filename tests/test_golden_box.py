"""Golden-box regression: the trained tiny-flagship fixture must decode to
bit-stable boxes across refactors (VERDICT r4 item 5).

The fixture (tests/data/golden_flagship.npz) holds a 40-step-trained
checkpoint (non-image params only — the frozen image branch is regenerated
from its seeded init) plus the decoded boxes on a held-out realistic
scene. Any conv-engine / op refactor that shifts decode numerics beyond
float-noise fails here first. Regenerate after INTENTIONAL numeric
changes: ``JAX_PLATFORMS=cpu python tests/golden_flagship.py generate``.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import golden_flagship as gf  # noqa: E402


@pytest.mark.slow
def test_golden_flagship_decode_is_stable():
    if not os.path.exists(gf.FIXTURE):
        pytest.skip('fixture not generated (tests/golden_flagship.py)')
    data = dict(np.load(gf.FIXTURE, allow_pickle=False))
    model = gf.build_model()
    batch = gf.eval_batch()
    variables = gf.load_variables(model, batch)
    got = gf.decode(model, variables, batch)
    want = {k.split('|', 1)[1]: v for k, v in data.items()
            if k.startswith('golden|')}
    assert set(got) == set(want), (set(got), set(want))
    # selection indices (labels / validity) must match exactly; the trained
    # model separates scores well enough that float noise cannot flip them
    np.testing.assert_array_equal(got['labels'], want['labels'])
    np.testing.assert_array_equal(got['valid'], want['valid'])
    np.testing.assert_allclose(got['scores'], want['scores'],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got['bboxes'], want['bboxes'],
                               atol=1e-4, rtol=1e-4)
