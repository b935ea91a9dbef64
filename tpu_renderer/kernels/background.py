"""Background compute passes — Pallas re-implementations of the reference's
full-screen compute shaders.

* ``gradient``: vertical mix(top, bottom, y/height) (gradient_color.comp:14-27).
* ``sky``: star-field noise + vertical color gradient (sky.comp:17-91).

The reference dispatches 16x16 workgroups over the rgba16f draw image
(vk_engine.cpp:1341-1355); here the grid is (H/tile_h, W/tile_w) Pallas
programs, each writing a planar (4, tile_h, tile_w) framebuffer block.
The framebuffer is planar (channel, row, col) so the 128-wide lane dimension
runs along screen x — the natural TPU layout.

Both kernels have pure-jnp twins (``*_reference``) used as unit-test oracles;
the formulas are transcribed from the GLSL and are exact in f32 up to
transcendental ULP differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_renderer.kernels.common import use_interpret


def _pixel_coords(i, j, tile_h: int, tile_w: int):
    """Global (x, y) f32 coords of this program's tile, shape (tile_h, tile_w)."""
    y0 = i * tile_h
    x0 = j * tile_w
    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + x0
    return xx.astype(jnp.float32), yy.astype(jnp.float32)


# ---------------------------------------------------------------------------
# gradient_color.comp — mix(data1, data2, y/height)
# ---------------------------------------------------------------------------


def _gradient_kernel(params_ref, out_ref, *, height: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    _, yy = _pixel_coords(i, j, tile_h, tile_w)
    # gradient_color.comp:23 — blend = float(y) / size.y
    blend = yy / jnp.float32(height)
    for c in range(4):
        top = params_ref[0, c]
        bottom = params_ref[1, c]
        # GLSL mix(x, y, a) = x*(1-a) + y*a
        out_ref[c, :, :] = top * (jnp.float32(1.0) - blend) + bottom * blend


@functools.partial(jax.jit, static_argnames=("height", "width_pad", "height_pad", "tile_h", "tile_w"))
def gradient(data1, data2, *, height: int, width_pad: int, height_pad: int,
             tile_h: int = 32, tile_w: int = 128):
    """Returns the (4, height_pad, width_pad) f32 planar background."""
    params = jnp.stack([data1, data2]).astype(jnp.float32)
    grid = (height_pad // tile_h, width_pad // tile_w)
    return pl.pallas_call(
        functools.partial(_gradient_kernel, height=height, tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((4, height_pad, width_pad), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((2, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(params)


def gradient_reference(data1, data2, *, height: int, width: int):
    """jnp transcription of gradient_color.comp:14-27 (unit-test oracle)."""
    data1 = jnp.asarray(data1, jnp.float32)
    data2 = jnp.asarray(data2, jnp.float32)
    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    blend = jnp.broadcast_to(yy / jnp.float32(height), (height, width))
    return data1[:, None, None] * (1.0 - blend)[None] + data2[:, None, None] * blend[None]


# ---------------------------------------------------------------------------
# sky.comp — star field + vertical gradient
# ---------------------------------------------------------------------------


def _fract(x):
    return x - jnp.floor(x)


def _noise2d(x, y):
    # sky.comp:18-23 — fract(415.92653 * (cos(x*37) + cos(y*57)))
    return _fract(jnp.float32(415.92653) * (jnp.cos(x * jnp.float32(37.0)) + jnp.cos(y * jnp.float32(57.0))))


def _star(v, threshold):
    # sky.comp:26-33 — threshold + pow6 shaping
    shaped = ((v - threshold) / (jnp.float32(1.0) - threshold)) ** 6
    return jnp.where(v >= threshold, shaped, jnp.float32(0.0))


def _star_field(sample_x, sample_y, threshold):
    # sky.comp:36-54 — bilinear blend of 4 integer-lattice star samples
    fx = _fract(sample_x)
    fy = _fract(sample_y)
    x0 = jnp.floor(sample_x)
    y0 = jnp.floor(sample_y)
    v1 = _star(_noise2d(x0, y0), threshold)
    v2 = _star(_noise2d(x0, y0 + 1.0), threshold)
    v3 = _star(_noise2d(x0 + 1.0, y0), threshold)
    v4 = _star(_noise2d(x0 + 1.0, y0 + 1.0), threshold)
    return (v1 * (1.0 - fx) * (1.0 - fy)
            + v2 * (1.0 - fx) * fy
            + v3 * fx * (1.0 - fy)
            + v4 * fx * fy)


def _sky_math(xx, yy, data1, height: int):
    """Shared sky formula: xx/yy are pixel coord arrays, data1 is (4,) tuple-like."""
    r, g, b, threshold = data1
    grad = yy / jnp.float32(height)  # sky.comp:60 — data1.rgb * fragCoord.y / res.y
    # sky.comp:67-69 — crawl offset (0.2, -0.06) * frame 1
    star = _star_field(xx + jnp.float32(0.2), yy + jnp.float32(-0.06), threshold)
    return (r * grad + star, g * grad + star, b * grad + star)


def _sky_kernel(params_ref, out_ref, *, height: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xx, yy = _pixel_coords(i, j, tile_h, tile_w)
    data1 = (params_ref[0], params_ref[1], params_ref[2], params_ref[3])
    cr, cg, cb = _sky_math(xx, yy, data1, height)
    out_ref[0, :, :] = cr
    out_ref[1, :, :] = cg
    out_ref[2, :, :] = cb
    out_ref[3, :, :] = jnp.full((tile_h, tile_w), 1.0, jnp.float32)


@functools.partial(jax.jit, static_argnames=("height", "width_pad", "height_pad", "tile_h", "tile_w"))
def sky(data1, *, height: int, width_pad: int, height_pad: int,
        tile_h: int = 32, tile_w: int = 128):
    """Returns the (4, height_pad, width_pad) f32 planar background."""
    params = jnp.asarray(data1, jnp.float32)
    grid = (height_pad // tile_h, width_pad // tile_w)
    return pl.pallas_call(
        functools.partial(_sky_kernel, height=height, tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((4, height_pad, width_pad), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((4,), lambda i, j: (0,), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(params)


def sky_reference(data1, *, height: int, width: int):
    """jnp transcription of sky.comp:57-91 (unit-test oracle)."""
    yy = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None], (height, width))
    xx = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :], (height, width))
    d = jnp.asarray(data1, jnp.float32)
    cr, cg, cb = _sky_math(xx, yy, (d[0], d[1], d[2], d[3]), height)
    return jnp.stack([cr, cg, cb, jnp.ones_like(cr)])


# ---------------------------------------------------------------------------
# gradient.comp — UV gradient with 16px workgroup gridlines (compiled by the
# reference build but never loaded by the engine, vk_engine.cpp:935; kept for
# completeness)
# ---------------------------------------------------------------------------


def _grid_kernel(out_ref, *, width: int, height: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xx, yy = _pixel_coords(i, j, tile_h, tile_w)
    # gradient.comp:20 — black where the 16x16 workgroup-local id is 0
    lx = xx - jnp.floor(xx / 16.0) * 16.0
    ly = yy - jnp.floor(yy / 16.0) * 16.0
    on = (lx != 0.0) & (ly != 0.0)
    out_ref[0, :, :] = jnp.where(on, xx / jnp.float32(width), 0.0)
    out_ref[1, :, :] = jnp.where(on, yy / jnp.float32(height), 0.0)
    out_ref[2, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)
    out_ref[3, :, :] = jnp.ones((tile_h, tile_w), jnp.float32)


@functools.partial(jax.jit, static_argnames=("height", "width", "width_pad", "height_pad", "tile_h", "tile_w"))
def grid_gradient(*, height: int, width: int, width_pad: int, height_pad: int,
                  tile_h: int = 32, tile_w: int = 128):
    """Returns the (4, height_pad, width_pad) f32 planar background."""
    grid = (height_pad // tile_h, width_pad // tile_w)
    return pl.pallas_call(
        functools.partial(_grid_kernel, width=width, height=height,
                          tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((4, height_pad, width_pad), jnp.float32),
        grid=grid,
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )()


def grid_gradient_reference(*, height: int, width: int):
    """jnp transcription of gradient.comp:11-28 (unit-test oracle)."""
    yy = jnp.broadcast_to(jnp.arange(height, dtype=jnp.float32)[:, None], (height, width))
    xx = jnp.broadcast_to(jnp.arange(width, dtype=jnp.float32)[None, :], (height, width))
    on = (jnp.mod(xx, 16.0) != 0.0) & (jnp.mod(yy, 16.0) != 0.0)
    r = jnp.where(on, xx / jnp.float32(width), 0.0)
    g = jnp.where(on, yy / jnp.float32(height), 0.0)
    return jnp.stack([r, g, jnp.zeros_like(r), jnp.ones_like(r)])
