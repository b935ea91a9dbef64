"""The chunk-streaming (HBM-DMA) kernels must match the gathered-row
reference kernels exactly — the latter stay as correctness oracles."""

import jax.numpy as jnp
import numpy as np

from tpu_renderer import milestones
from tpu_renderer.kernels import raster, shade, vertex
from tpu_renderer.scene import flatten_scene

I4 = jnp.eye(4, dtype=jnp.float32)
TX, TY = 2, 2
KW = dict(tiles_x=TX, tiles_y=TY, tile_w=128, tile_h=32)


def _setup(scene):
    flat = flatten_scene(scene)
    b = flat.buffers
    vis = vertex.draw_visibility(I4, b.draw_model, b.draw_bounds_origin,
                                 b.draw_bounds_extents)
    s = vertex.triangle_setup(
        b.positions, b.normals, b.colors, b.uvs,
        b.opaque_tri_vidx, b.opaque_tri_draw, b.opaque_tri_valid,
        b.draw_model, vis, b.draw_mat, b.mat_color_factors, I4, 256, 64)
    rows = shade.build_shade_rows(s.packed, s.attrs, b.mat_meta)
    caabb, cvalid = raster.chunk_aabbs(s.aabb, s.valid)
    cbins, ccounts, _ = raster.bin_triangles(
        caabb, cvalid, bin_cap=max(caabb.shape[0], 8), **KW)
    return s, rows, cbins, ccounts


def _multi_quad_scene(n=7):
    import tpu_renderer.scene as sm

    scene = milestones.colored_quad_scene(z0=0.3, z1=0.9)
    rng = np.random.default_rng(5)
    scene.colors = rng.uniform(0, 1, scene.colors.shape).astype(np.float32)
    for k in range(n):
        node = sm.MeshNode(0, f"q{k}")
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = rng.uniform(-0.5, 0.5)
        m[2, 3] = rng.uniform(-0.2, 0.2)
        node.refresh_transform(m)
        node.local_transform = m
        scene.nodes.append(node)
        scene.top_nodes.append(node)
    return scene


def test_chunk_raster_matches_gathered_reference():
    s, rows, cbins, ccounts = _setup(_multi_quad_scene())
    bins, counts, _ = raster.refine_bins(cbins, s.aabb, tri_cap=256, **KW)
    z1, t1, a1, m1 = raster.rasterize_fused(rows, bins, counts, **KW)
    z2, t2, a2, m2 = raster.rasterize_fused_chunks(rows, cbins, ccounts, **KW)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_chunk_accum_matches_gathered_reference():
    s, rows, cbins, ccounts = _setup(_multi_quad_scene())
    light = jnp.asarray([0.2, 0.8, 0.5, 1.0, 0.1, 0.1, 0.1, 0.0], jnp.float32)
    z = jnp.full((TY * 32, TX * 128), raster.DEPTH_CLEAR, jnp.float32)
    bins_t, counts_t = raster.expand_bins(cbins, ccounts)
    a1, c1 = raster.rasterize_accum_fused(rows, bins_t, counts_t, z, light, **KW)
    a2, c2 = raster.rasterize_accum_chunks(rows, cbins, ccounts, z, light, **KW)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
