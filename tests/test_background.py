"""Background kernels vs direct GLSL formula transcriptions.

The shader formulas (gradient_color.comp:14-27, sky.comp:17-91) are pure
math, so the jnp references are exact oracles for the Pallas kernels.
"""

import jax.numpy as jnp
import numpy as np

from tpu_renderer.kernels import background
from tpu_renderer.kernels.common import pad_extent


def test_gradient_matches_formula():
    w, h = 200, 100
    wp, hp = pad_extent(w, h, 32, 128)
    d1 = jnp.array([1.0, 0.0, 0.0, 1.0])
    d2 = jnp.array([0.0, 0.0, 1.0, 1.0])
    out = background.gradient(d1, d2, height=h, width_pad=wp, height_pad=hp)
    ref = background.gradient_reference(d1, d2, height=h, width=w)
    np.testing.assert_allclose(np.asarray(out[:, :h, :w]), np.asarray(ref), atol=1e-6)


def test_gradient_default_is_solid_white():
    # Reference defaults: data1 = data2 = (1,1,1,1) (vk_engine.cpp:977-978)
    wp, hp = pad_extent(128, 32, 32, 128)
    out = background.gradient(
        jnp.ones(4), jnp.ones(4), height=32, width_pad=wp, height_pad=hp
    )
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-7)


def test_sky_matches_formula():
    w, h = 256, 64
    wp, hp = pad_extent(w, h, 32, 128)
    d1 = jnp.array([0.1, 0.2, 0.4, 0.97])
    out = background.sky(d1, height=h, width_pad=wp, height_pad=hp)
    ref = background.sky_reference(d1, height=h, width=w)
    np.testing.assert_allclose(np.asarray(out[:, :h, :w]), np.asarray(ref), atol=1e-5)


def test_sky_has_stars_and_gradient():
    w, h = 256, 128
    wp, hp = pad_extent(w, h, 32, 128)
    d1 = jnp.array([0.1, 0.2, 0.4, 0.97])
    out = np.asarray(background.sky(d1, height=h, width_pad=wp, height_pad=hp))[:, :h, :w]
    # vertical gradient: top rows darker than bottom rows in blue channel
    assert out[2, : h // 4].mean() < out[2, -h // 4 :].mean()
    # some stars exist: pixels well above the pure gradient value
    grad_only = 0.4 * np.arange(h, dtype=np.float32)[:, None] / h
    assert ((out[2] - grad_only) > 0.5).sum() > 0
    # alpha plane is 1
    np.testing.assert_allclose(out[3], 1.0)


def test_grid_gradient_matches_formula():
    # gradient.comp (compiled but not engine-loaded in the reference)
    w, h = 256, 64
    wp, hp = pad_extent(w, h, 32, 128)
    out = background.grid_gradient(height=h, width=w, width_pad=wp, height_pad=hp)
    ref = background.grid_gradient_reference(height=h, width=w)
    np.testing.assert_allclose(np.asarray(out[:, :h, :w]), np.asarray(ref), atol=1e-6)
    # gridlines at multiples of 16 are black
    assert (np.asarray(out)[0, :h, 16] == 0).all()
    assert (np.asarray(out)[1, 32, :w] == 0).all()
