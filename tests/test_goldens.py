"""Golden-image regression tests (SURVEY §4 item 2): bit-exact on the CPU
backend. Regenerate intentionally with tests/regen_goldens.py.
"""

import os

import numpy as np
import pytest

from tests.regen_goldens import GOLDEN_DIR, render_all
from tpu_renderer.present import load_png


@pytest.mark.skipif(not os.path.isdir(GOLDEN_DIR), reason="no goldens checked in")
def test_goldens_bit_exact():
    for name, img in render_all():
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        golden = load_png(path)
        np.testing.assert_array_equal(img, golden, err_msg=f"golden {name} drifted")
