"""Time rasterize_fused_slabs on the demo/stress scenes, both sort orders.

Signature-agnostic (works on both the windowed and pre-window kernel), so
it can A/B the working tree against HEAD via git stash.
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
from tpu_renderer.kernels import raster, shade, vertex

W, H = 1920, 1080
TILE_W, TILE_H = 128, int(os.environ.get("AB_TILE_H", "32"))
TX, TY = W // TILE_W, (H + TILE_H - 1) // TILE_H
KW = dict(tiles_x=TX, tiles_y=TY, tile_w=TILE_W, tile_h=TILE_H)


def setup_scene(grid, seed=0):
    path = os.path.join(tempfile.gettempdir(), f"ab_scene_{grid}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=grid, seed=seed)
    eng = Engine(RendererConfig(width=W, height=H))
    eng.init(scene_path=path)
    params = eng.update_scene()
    b = eng.flat.buffers
    viewproj = params.proj @ params.view
    vis = vertex.draw_visibility(viewproj, b.draw_model,
                                 b.draw_bounds_origin, b.draw_bounds_extents)
    s = vertex.triangle_setup(
        b.positions, b.normals, b.colors, b.uvs,
        b.opaque_tri_vidx, b.opaque_tri_draw, b.opaque_tri_valid,
        b.draw_model, vis, b.draw_mat, b.mat_color_factors, viewproj,
        W, H, sun_dir=params.sun_dir[:3])
    rows = shade.build_shade_rows(s.packed, s.attrs, b.mat_meta, aabb=s.aabb)
    return s.aabb, s.valid, rows


def bin_set(aabb, valid, rows, sort):
    if sort and hasattr(raster, "spatial_sort"):
        aabb, valid, rows = raster.spatial_sort(aabb, valid, rows)
    caabb, cvalid = raster.chunk_aabbs(aabb, valid)
    kw = {}
    if int(os.environ.get("AB_GMASK", "1")) and hasattr(raster, "group_aabbs"):
        kw["gaabb"], kw["gvalid"] = raster.group_aabbs(aabb, valid)
    out = raster.bin_triangles_full(caabb, cvalid, **KW, **kw)
    bins, counts = out[0], out[1]
    return rows, bins, counts


def live_eval_stats(aabb, valid, bins):
    """Dead-eval instrumentation (docs/PERF.md 'live fraction'): of the
    per-triangle visibility evals the stream kernel actually runs (GROUP
    triangles per set gmask bit per bin entry), what fraction land on
    triangles whose OWN AABB overlaps the tile? The complement is the
    dead-eval headroom the finer-GROUP / second-level-skip levers chase."""
    gm = jnp.where(bins >= 0, bins & raster.ENTRY_GMASK_ALL, 0)
    pop = jnp.zeros_like(gm)
    for g in range(raster.N_GROUPS):
        pop = pop + ((gm >> g) & 1)
    evals = int((pop * raster.GROUP).sum())
    packed = raster._pack_tile_aabb(aabb, TX, TY, TILE_W, TILE_H)
    hit = valid[None, :] & raster._tile_overlap(packed, TX, TY)
    live = int(hit.sum())
    return live, evals


def time_variant(fn, iters=30):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    variants = {"fused": raster.rasterize_fused_slabs}
    jits = {name: jax.jit(lambda r, b, c, _f=fn: (_f(r, b, c, **KW)[0],
                                                  _f(r, b, c, **KW)[2]))
            for name, fn in variants.items()}
    tag = os.environ.get("AB_TAG", "?")
    for grid, label in [(64, "demo"), (128, "stress")]:
        aabb, valid, rows0 = setup_scene(grid)
        if hasattr(raster, "spatial_sort"):
            aabb_s, valid_s, _ = raster.spatial_sort(aabb, valid, rows0)
        else:
            aabb_s, valid_s = aabb, valid
        rows, bins, counts = bin_set(aabb, valid, rows0, True)
        live, evals = live_eval_stats(aabb_s, valid_s, bins)
        print(f"[{tag}][{label}] GROUP={raster.GROUP} "
              f"evals={evals} live={live} "
              f"live_frac={live / max(evals, 1):.3f}", flush=True)
        for name, jit in jits.items():
            t = time_variant(lambda: jit(rows, bins, counts))
            print(f"[{tag}][{label} sorted] {name}={t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
