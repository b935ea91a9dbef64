"""A/B: per-frame screen-space Hilbert sort vs a once-per-scene WORLD-space
3D Morton sort of the triangle arrays (no per-frame sort at all).

World-space locality projects to screen locality under any reasonable
camera, so chunk AABBs should stay comparably tight while the per-frame
argsort + (T, 48) fat-row permute leaves the frame entirely (it runs once
at scene flatten).

Times the isolated full raster pass (bin + rasterize_fused_slabs) under
both orders, plus the bin-entry counts that explain the delta.
"""
import os
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_renderer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_renderer.utils.demo import build_demo_glb
from tpu_renderer.engine import Engine
from tpu_renderer.config import RendererConfig
from tpu_renderer.kernels import raster, vertex

W, H = 1920, 1080
TILE_W, TILE_H = 128, 32
TX, TY = W // TILE_W, (H + TILE_H - 1) // TILE_H
KW = dict(tiles_x=TX, tiles_y=TY, tile_w=TILE_W, tile_h=TILE_H)


def morton3(x, y, z, bits=10):
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v
    return spread(x) | (spread(y) << np.uint64(1)) | (spread(z) << np.uint64(2))


def world_order(b):
    """Once-per-scene 3D Morton order of opaque triangles (world centroids)."""
    vidx = np.asarray(b.opaque_tri_vidx)
    draw = np.asarray(b.opaque_tri_draw)
    valid = np.asarray(b.opaque_tri_valid)
    pos = np.asarray(b.positions)
    model = np.asarray(b.draw_model)
    c_mesh = pos[vidx].mean(axis=1)                      # (T, 3) mesh space
    m = model[np.clip(draw, 0, None)]                    # (T, 4, 4)
    c = np.einsum("tij,tj->ti", m[:, :3, :3], c_mesh) + m[:, :3, 3]
    lo = c[valid].min(0)
    hi = c[valid].max(0)
    q = np.clip(((c - lo) / np.maximum(hi - lo, 1e-6) * 1023), 0, 1023)
    key = morton3(q[:, 0].astype(np.int64), q[:, 1].astype(np.int64),
                  q[:, 2].astype(np.int64))
    key[~valid] = np.uint64(2**63)
    return np.argsort(key, kind="stable")


def setup_rows(eng, order=None):
    b = eng.flat.buffers
    params = eng.update_scene()
    viewproj = params.proj @ params.view
    vis = vertex.draw_visibility(viewproj, b.draw_model,
                                 b.draw_bounds_origin, b.draw_bounds_extents)
    vidx = np.asarray(b.opaque_tri_vidx)
    draw = np.asarray(b.opaque_tri_draw)
    valid = np.asarray(b.opaque_tri_valid)
    if order is not None:
        vidx, draw, valid = vidx[order], draw[order], valid[order]
    corners = vertex.expand_corners(
        b.positions, b.normals, b.colors, b.uvs, vidx, draw, valid,
        b.draw_mat, b.mat_color_factors, mat_meta=b.mat_meta)
    rows, aabb, good = vertex.triangle_setup_rows(
        corners, jnp.asarray(draw), jnp.asarray(valid), b.draw_model, vis,
        viewproj, W, H, sun_dir=params.sun_dir[:3])
    return rows, aabb, good


def bench(rows, aabb, good, screen_sort):
    if screen_sort:
        aabb, good, rows = raster.spatial_sort(aabb, good, rows)
    caabb, cvalid = raster.chunk_aabbs(aabb, good)
    bins, counts = raster.bin_triangles_full(caabb, cvalid, **KW)
    entries = int(jnp.sum(counts))

    fn = jax.jit(lambda r, b, c: raster.rasterize_fused_slabs(r, b, c, **KW)[:2])
    r = fn(rows, bins, counts)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(rows, bins, counts)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 30 * 1e3
    return ms, entries


def main():
    for grid, label in [(64, "demo"), (128, "stress")]:
        path = os.path.join(tempfile.gettempdir(), f"ab_scene_{grid}.glb")
        if not os.path.exists(path):
            build_demo_glb(path, grid=grid, seed=0)
        eng = Engine(RendererConfig(width=W, height=H,
                                    camera_position=(0.0, 6.0, grid * 2.0)))
        eng.camera.pitch = np.float32(-0.18)
        eng.init(scene_path=path)

        rows, aabb, good = setup_rows(eng)
        ms, entries = bench(rows, aabb, good, screen_sort=True)
        print(f"[{label}] screen-hilbert: {ms:.2f} ms, {entries} entries",
              flush=True)

        order = world_order(eng.flat.buffers)
        rows_w, aabb_w, good_w = setup_rows(eng, order)
        ms, entries = bench(rows_w, aabb_w, good_w, screen_sort=False)
        print(f"[{label}] world-morton (no frame sort): {ms:.2f} ms, "
              f"{entries} entries", flush=True)

        # and rotate the camera far off the flatten-time view: does the
        # static order hold up?
        eng.camera.yaw = np.float32(1.2)
        rows_r, aabb_r, good_r = setup_rows(eng, order)
        ms, entries = bench(rows_r, aabb_r, good_r, screen_sort=False)
        print(f"[{label}] world-morton, yaw=1.2: {ms:.2f} ms, "
              f"{entries} entries", flush=True)


if __name__ == "__main__":
    main()
