"""CLI command smoke tests (main.cpp analog entry points)."""

import numpy as np
import pytest

from tpu_renderer import cli
from tpu_renderer.present import load_png


@pytest.mark.slow
def test_demo_command(tmp_path):
    out = str(tmp_path / "demo.png")
    rc = cli.main(["demo", "--grid", "2", "--width", "256", "--height", "64",
                   "--out", out])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (64, 256, 4)
    assert len(np.unique(img.reshape(-1, 4), axis=0)) > 10


@pytest.mark.slow
def test_milestone_command(tmp_path):
    out = str(tmp_path / "tri.png")
    rc = cli.main(["milestone", "colored_triangle", "--width", "128",
                   "--height", "64", "--out", out])
    assert rc == 0
    img = load_png(out)
    assert img.shape == (64, 128, 4)
    # red corner from the hardcoded NDC triangle
    assert img[62, 125, 0] > 150


def test_render_command(tmp_path):
    from tpu_renderer.utils.demo import build_demo_glb

    glb = str(tmp_path / "s.glb")
    build_demo_glb(glb, grid=2)
    out = str(tmp_path / "frame.png")
    rc = cli.main(["render", glb, "--width", "256", "--height", "64",
                   "--camera", "0", "2", "12", "--out", out])
    assert rc == 0
    assert load_png(out).shape == (64, 256, 4)
