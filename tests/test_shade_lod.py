"""Analytic mip-LOD gradients (shade.uv_gradients / C_GRAD fat-row columns).

The per-triangle uv screen gradients carried through the fused raster must
match the true derivative of the perspective-correct interpolated uv — at
INTERIOR pixels and, critically, at SILHOUETTE pixels, where the previous
quad-roll finite differences mixed neighboring primitives/background (the
divergence the reference never has: texture()'s implicit derivatives come
from same-primitive helper invocations, /root/reference/shaders/mesh.frag:15).
"""

import jax.numpy as jnp
import numpy as np

from tpu_renderer import math3d
from tpu_renderer.kernels import raster, shade, vertex

W, H = 128, 64
KW = dict(tiles_x=1, tiles_y=2, tile_w=128, tile_h=32)


def _perspective_tri_setup():
    """One textured triangle, oblique in depth => genuinely rational uv."""
    positions = np.asarray(
        [[-0.8, -0.6, -2.0], [0.9, -0.4, -6.0], [0.0, 0.8, -3.5]], np.float32)
    uvs = np.asarray([[0.0, 0.0], [4.0, 0.0], [0.0, 4.0]], np.float32)
    proj = math3d.vulkan_perspective(math3d.radians(70.0), W / H, 0.1, 100.0)
    setup = vertex.triangle_setup(
        jnp.asarray(positions),
        jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (3, 1)),
        jnp.ones((3, 4), jnp.float32),
        jnp.asarray(uvs),
        jnp.asarray([[0, 1, 2]], jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), bool),
        jnp.eye(4, dtype=jnp.float32)[None],
        jnp.ones((1,), bool),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1, 4), jnp.float32),
        jnp.asarray(proj),
        W, H,
        sun_dir=jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
    )
    return setup, np.asarray(uvs)


def _uv_exact(packed_row, uvs, X, Y):
    """Reference perspective-correct uv at (X, Y) from the setup planes."""
    c = [packed_row[3 * e] * X + packed_row[3 * e + 1] * Y
         + packed_row[3 * e + 2] for e in range(3)]
    den = c[0] + c[1] + c[2]
    u = (c[0] * uvs[0, 0] + c[1] * uvs[1, 0] + c[2] * uvs[2, 0]) / den
    v = (c[0] * uvs[0, 1] + c[1] * uvs[1, 1] + c[2] * uvs[2, 1]) / den
    return u, v


def test_uv_gradients_match_numeric_derivative_incl_silhouette():
    setup, uvs = _perspective_tri_setup()
    packed, aabb, valid = raster.pad_for_raster(setup.packed, setup.aabb,
                                                setup.valid)
    rows = shade.build_shade_rows(packed, jnp.pad(setup.attrs,
                                                  ((0, packed.shape[0] - 1),
                                                   (0, 0), (0, 0))),
                                  jnp.zeros((1, 8), jnp.float32))
    bins, counts = raster.full_bins(packed.shape[0] // raster.CHUNK,
                                    KW["tiles_x"] * KW["tiles_y"],
                                    packed.shape[0] // raster.CHUNK)
    z, tid, attrs, meta, inv = raster.rasterize_fused_chunks(
        rows, bins, counts, **KW)
    tid = np.asarray(tid)
    covered = tid == 0
    assert covered.sum() > 200

    grads = shade.uv_gradients(attrs[4], attrs[5],
                               tuple(meta[6 + m] for m in range(6)), inv)
    grads = [np.asarray(g) for g in grads]

    # pick an interior pixel and a silhouette pixel (covered, with an
    # uncovered 4-neighbor) — the old quad-roll derivatives were wrong at
    # exactly the latter class
    interior = covered & np.roll(covered, 1, 0) & np.roll(covered, -1, 0) \
        & np.roll(covered, 1, 1) & np.roll(covered, -1, 1)
    edge = covered & ~interior
    row0 = np.asarray(packed[0], np.float64)
    for (yy, xx) in (tuple(np.argwhere(interior)[50]),
                     tuple(np.argwhere(edge)[3]),
                     tuple(np.argwhere(edge)[-2])):
        X, Y = xx + 0.5, yy + 0.5
        h = 1e-3
        up, _ = _uv_exact(row0, uvs, X + h, Y)
        um, _ = _uv_exact(row0, uvs, X - h, Y)
        _, vp = _uv_exact(row0, uvs, X, Y + h)
        _, vm = _uv_exact(row0, uvs, X, Y - h)
        dudx_ref = (up - um) / (2 * h)
        dvdy_ref = (vp - vm) / (2 * h)
        np.testing.assert_allclose(grads[0][yy, xx], dudx_ref,
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(grads[3][yy, xx], dvdy_ref,
                                   rtol=2e-3, atol=1e-6)
