"""Sweep raster tile_h on the bench scene (real TPU).

Smaller tiles evaluate fewer wasted pixels per (chunk, tile) pair — the
demo scene's triangles average ~45 px, so a 32x128 tile evaluates ~90x more
pixels than a triangle covers — but cost more binning (the dense hit matrix
and its row-wise sort scale with n_tiles) and more chunk DMA issues.

Times, per tile_h: bin_triangles alone, and bin + rasterize_fused_chunks,
each as a chained scan (forced execution, docs/PERF.md measurement rules).
"""

import argparse
import os
import tempfile
import time

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for tpu_renderer

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tile_hs", type=str, default="8,16,32")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_renderer_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from tpu_renderer.config import RendererConfig
    from tpu_renderer.engine import Engine
    from tpu_renderer.kernels import raster, shade, vertex
    from tpu_renderer.kernels.common import pad_extent
    from tpu_renderer.utils.demo import build_demo_glb

    path = os.path.join(tempfile.gettempdir(), f"bench_scene_{args.grid}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=args.grid, seed=0)
    cfg = RendererConfig(width=1920, height=1080,
                         camera_position=(0.0, 6.0, args.grid * 2.0))
    eng = Engine(cfg)
    eng.camera.pitch = np.float32(-0.18)
    eng.init(scene_path=path)
    eng.draw()
    eng.draw()
    caps = dict(eng._caps)
    print("caps:", caps, flush=True)

    buffers = eng.flat.buffers
    params = eng.update_scene()
    viewproj = (params.proj @ params.view).astype(jnp.float32)
    vis = vertex.draw_visibility(viewproj, buffers.draw_model,
                                 buffers.draw_bounds_origin,
                                 buffers.draw_bounds_extents)
    setup = vertex.triangle_setup(
        buffers.positions, buffers.normals, buffers.colors, buffers.uvs,
        buffers.opaque_tri_vidx, buffers.opaque_tri_draw,
        buffers.opaque_tri_valid, buffers.draw_model, vis,
        buffers.draw_mat, buffers.mat_color_factors, viewproj, 1920, 1080)
    rows0 = shade.build_shade_rows(setup.packed, setup.attrs, buffers.mat_meta)
    aabb_s, valid_s, rows48 = raster.spatial_sort(
        setup.aabb, setup.valid, rows0)
    caabb, cvalid = raster.chunk_aabbs(aabb_s, valid_s)
    caabb, cvalid, rows48 = jax.block_until_ready((caabb, cvalid, rows48))

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        float(jnp.asarray(r).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
            float(jnp.asarray(r).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:<40} {dt:8.2f} ms", flush=True)
        return dt

    for th in [int(x) for x in args.tile_hs.split(",")]:
        tw = 128
        wp, hp = pad_extent(1920, 1080, th, tw)
        tiles_x, tiles_y = wp // tw, hp // th
        bin_cap = caps.get("bin_cap", 1024)

        def bin_only(caabb, cvalid, _th=th, _tx=tiles_x, _ty=tiles_y,
                     _cap=bin_cap):
            cbins, ccounts, ov = raster.bin_triangles(
                caabb, cvalid, tiles_x=_tx, tiles_y=_ty,
                tile_w=128, tile_h=_th, bin_cap=_cap)
            return jnp.sum(ccounts) + ov

        def bin_and_raster(caabb, cvalid, rows48, _th=th, _tx=tiles_x,
                           _ty=tiles_y, _cap=bin_cap):
            # the real hot path: uncapped dense bins + slab raster
            cbins, ccounts = raster.bin_triangles_full(
                caabb, cvalid, tiles_x=_tx, tiles_y=_ty,
                tile_w=128, tile_h=_th)
            z, tid, a, m, _i = raster.rasterize_fused_slabs(
                rows48, cbins, ccounts, tiles_x=_tx, tiles_y=_ty,
                tile_w=128, tile_h=_th)
            return jnp.sum(z) + jnp.sum(a[0]) + jnp.sum(m[0])

        # stats: entries in bins at this tile size
        cbins, ccounts, ov = jax.jit(
            raster.bin_triangles,
            static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h",
                             "bin_cap"))(
            caabb, cvalid, tiles_x=tiles_x, tiles_y=tiles_y, tile_w=128,
            tile_h=th, bin_cap=bin_cap)
        print(f"tile {th}x{tw}: tiles={tiles_x * tiles_y} "
              f"entries={int(ccounts.sum())} max/tile={int(ccounts.max())} "
              f"overflow={int(ov)}", flush=True)
        timeit(f"  bin_triangles       th={th}", bin_only, caabb, cvalid)
        timeit(f"  bin+fused_chunks    th={th}", bin_and_raster, caabb,
               cvalid, rows48)


if __name__ == "__main__":
    main()
