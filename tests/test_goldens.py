"""Golden-image regression tests (SURVEY §4 item 2): bit-exact on the CPU
backend. Regenerate intentionally with tests/regen_goldens.py.

The fast tier covers the milestone scenes plus a 480x270 structure render
(same loader + engine path as the flagship); the full-1080p structure golden
runs in the slow tier.
"""

import os

import numpy as np
import pytest

from tests.regen_goldens import GOLDEN_DIR, render_fast, render_structure
from tpu_renderer.present import load_png


def _check(name, img):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    golden = load_png(path)
    np.testing.assert_array_equal(img, golden, err_msg=f"golden {name} drifted")


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="no goldens checked in")
def test_goldens_bit_exact():
    for name, img in render_fast():
        _check(name, img)


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="no goldens checked in")
def test_golden_structure_1080p():
    _check("structure_1080p", render_structure(1920, 1080))
