"""Parity: the T-minor fused setup (vertex.triangle_setup_rows) against the
reference composition shade.build_shade_rows(vertex.triangle_setup_c(...)).

The fast path reorders NO per-element arithmetic (same FMA/add chains, same
select order), but XLA contracts mul+add into FMAs differently for the two
program layouts, so exact bit equality is not achievable: coefficients built
from cancelling subtractions (edge/z planes of near-degenerate triangles)
carry a few-ulp absolute noise that cancellation amplifies in relative
terms. The assertion here is tight allclose on the row block (plus EXACT
equality on valid/select-driven columns); pixel-level equivalence on real
scenes is pinned by the golden tests, which render the fused pipeline
through this path.
"""

import numpy as np
import jax.numpy as jnp

from tpu_renderer.kernels import shade, vertex


def _random_inputs(T=97, D=7, V=64, seed=0):
    rng = np.random.default_rng(seed)
    positions = rng.normal(size=(V, 3)).astype(np.float32)
    normals = rng.normal(size=(V, 3)).astype(np.float32)
    colors = rng.uniform(size=(V, 4)).astype(np.float32)
    uvs = rng.uniform(-1, 2, size=(V, 2)).astype(np.float32)
    tri_vidx = rng.integers(0, V, size=(T, 3)).astype(np.int32)
    tri_draw = rng.integers(-1, D, size=(T,)).astype(np.int32)
    tri_valid = rng.uniform(size=T) > 0.15
    draw_model = np.tile(np.eye(4, dtype=np.float32), (D, 1, 1))
    draw_model[:, :3, 3] = rng.normal(scale=2.0, size=(D, 3))
    draw_model[:, :3, :3] += rng.normal(scale=0.2, size=(D, 3, 3))
    draw_visible = rng.uniform(size=D) > 0.2
    draw_mat = rng.integers(0, 3, size=(D,)).astype(np.int32)
    factors = rng.uniform(size=(3, 4)).astype(np.float32)
    mat_meta = rng.integers(0, 64, size=(3, 8)).astype(np.float32)
    # a perspective-ish viewproj with some behind-the-eye geometry
    viewproj = np.eye(4, dtype=np.float32)
    viewproj[3, 2] = -1.0
    viewproj[3, 3] = 0.5
    return (positions, normals, colors, uvs, tri_vidx, tri_draw,
            tri_valid, draw_model, draw_visible, draw_mat, factors,
            mat_meta, viewproj)


def test_setup_rows_bit_parity():
    (positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
     draw_model, draw_visible, draw_mat, factors, mat_meta,
     viewproj) = _random_inputs()
    W, H = 160, 96
    sun = np.asarray([0.3, 0.8, -0.5], np.float32)

    corners = vertex.expand_corners(
        positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
        draw_mat, factors, mat_meta=mat_meta)

    ref_setup = vertex.triangle_setup_c(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), W, H, sun_dir=sun)
    ref_rows = shade.build_shade_rows(ref_setup.packed, ref_setup.attrs,
                                      aabb=ref_setup.aabb,
                                      meta6=corners.meta6)

    rows, aabb, valid = vertex.triangle_setup_rows(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), W, H, sun_dir=sun)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref_setup.valid))
    np.testing.assert_allclose(np.asarray(aabb), np.asarray(ref_setup.aabb),
                               rtol=1e-4, atol=1e-4)
    r0 = np.asarray(ref_rows)
    r1 = np.asarray(rows)
    assert r0.shape == r1.shape
    # select-driven / integer-valued columns must be EXACT: material id
    # (12), texture metas (31-36), and the dead-row sentinel aabb values
    exact_cols = [12, 31, 32, 33, 34, 35, 36]
    np.testing.assert_array_equal(r0[:, exact_cols], r1[:, exact_cols])
    np.testing.assert_allclose(r1, r0, rtol=1e-3, atol=1e-5)
    # the bulk must be far tighter than the worst cancellation outlier:
    # median relative error over nonzero entries ~ float32 ulp scale
    nz = np.abs(r0) > 1e-20
    rel = np.abs(r1[nz] - r0[nz]) / np.abs(r0[nz])
    assert np.median(rel) < 1e-6
    assert np.mean(rel < 1e-5) > 0.99


def test_setup_rows_no_sun_defaults():
    (positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
     draw_model, draw_visible, draw_mat, factors, mat_meta,
     viewproj) = _random_inputs(seed=3)
    corners = vertex.expand_corners(
        positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
        draw_mat, factors, mat_meta=None)
    ref_setup = vertex.triangle_setup_c(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), 64, 32, sun_dir=None)
    ref_rows = shade.build_shade_rows(ref_setup.packed, ref_setup.attrs,
                                      aabb=ref_setup.aabb,
                                      meta6=corners.meta6)
    rows, aabb, valid = vertex.triangle_setup_rows(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), 64, 32, sun_dir=None)
    v0 = np.asarray(ref_setup.valid)
    v1 = np.asarray(valid)
    # validity may flip ONLY at the det==0 knife edge (FMA contraction can
    # round a degenerate triangle's determinant to exactly 0 in one layout
    # and a subnormal-tiny value in the other; the reference GPU pipeline
    # is equally arbitrary there). Such rows must be rare and degenerate:
    # the kept side's normalized edge coefficients blow up past ~1e5.
    flip = v0 != v1
    assert flip.mean() < 0.05  # adversarial random soup; real scenes ~0
    if flip.any():
        mags = np.abs(np.asarray(ref_setup.packed)[flip, :9]).max(axis=1)
        dead = mags == 0.0  # the ref side culled it too (dead row)
        assert np.all(dead | (mags > 1e4)), mags
    # compare where both paths agree AND the triangle is well-conditioned:
    # near-degenerate rows normalize by a vanishing determinant, where the
    # FMA-contraction noise amplifies to O(1) relative (harmless: their
    # edge planes reject ~every pixel identically in practice)
    r0 = np.asarray(ref_rows)
    r1 = np.asarray(rows)
    cond = np.abs(r0[:, :9]).max(axis=1) < 1e4
    keep = ~flip & cond
    assert keep.mean() > 0.8
    np.testing.assert_allclose(r1[keep], r0[keep], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aabb)[keep],
                               np.asarray(ref_setup.aabb)[keep],
                               rtol=1e-4, atol=1e-4)


def test_setup_rows_y0_band_rebase():
    """Multichip band rebase: triangle_setup_rows(y0) must match the old
    composition _shift_rows_y(packed) -> build_shade_rows (the gathered
    path's post-hoc shift), same tolerance regime as the main parity test;
    pixel-level exactness under the mesh is pinned by test_multichip."""
    from tpu_renderer.parallel.multichip import _shift_aabb_y, _shift_rows_y

    (positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
     draw_model, draw_visible, draw_mat, factors, mat_meta,
     viewproj) = _random_inputs()  # seed 0: no det==0 knife-edge flips
    W, H = 160, 96
    y0 = jnp.float32(32.0)
    sun = np.asarray([0.2, -0.6, 0.9], np.float32)

    corners = vertex.expand_corners(
        positions, normals, colors, uvs, tri_vidx, tri_draw, tri_valid,
        draw_mat, factors, mat_meta=mat_meta)

    ref_setup = vertex.triangle_setup_c(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), W, H, sun_dir=sun)
    packed_l = _shift_rows_y(ref_setup.packed, y0)
    aabb_l = _shift_aabb_y(ref_setup.aabb, y0)
    ref_rows = shade.build_shade_rows(packed_l, ref_setup.attrs,
                                      aabb=aabb_l, meta6=corners.meta6)

    rows, aabb, valid = vertex.triangle_setup_rows(
        corners, jnp.asarray(tri_draw), jnp.asarray(tri_valid),
        jnp.asarray(draw_model), jnp.asarray(draw_visible),
        jnp.asarray(viewproj), W, H, sun_dir=sun, y0=y0)

    np.testing.assert_array_equal(np.asarray(valid),
                                  np.asarray(ref_setup.valid))
    np.testing.assert_allclose(np.asarray(aabb), np.asarray(aabb_l),
                               rtol=1e-4, atol=1e-4)
    r0 = np.asarray(ref_rows)
    r1 = np.asarray(rows)
    exact_cols = [12, 31, 32, 33, 34, 35, 36]
    np.testing.assert_array_equal(r0[:, exact_cols], r1[:, exact_cols])
    np.testing.assert_allclose(r1, r0, rtol=1e-3, atol=1e-4)
    nz = np.abs(r0) > 1e-20
    rel = np.abs(r1[nz] - r0[nz]) / np.abs(r0[nz])
    assert np.median(rel) < 1e-6
