"""Isolate raster cost vs bin width and walker structure (real TPU).

Times rasterize_fused_chunks (capped bins at several widths) and
rasterize_fused_slabs (uncapped) on the bench scene.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for tpu_renderer

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
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

    buffers = eng.flat.buffers
    wp, hp = pad_extent(1920, 1080, 32, 128)
    kw = dict(tiles_x=wp // 128, tiles_y=hp // 32, tile_w=128, tile_h=32)
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
    caabb, cvalid = raster.chunk_aabbs(setup.aabb, setup.valid)
    bins_full, counts_full = raster.bin_triangles_full(caabb, cvalid, **kw)
    rows48 = shade.build_shade_rows(setup.packed, setup.attrs, buffers.mat_meta)
    jax.block_until_ready((bins_full, counts_full, rows48))
    print("max count/tile:", int(counts_full.max()), flush=True)

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        float(jnp.asarray(r[0] if isinstance(r, tuple) else r).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
            s = (r[0] if isinstance(r, tuple) else r)
            float(jnp.asarray(s).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:<40} {dt:8.2f} ms", flush=True)
        return dt

    for cap in (512, 1024, 5808):
        cap8 = -(-cap // 8) * 8
        cbins = bins_full[:, :cap8]
        ccounts = jnp.minimum(counts_full, cap8)

        def capped(rows48, cbins=cbins, ccounts=ccounts):
            z, tid, a, m, _i = raster.rasterize_fused_chunks(rows48, cbins,
                                                         ccounts, **kw)
            return jnp.sum(z) + jnp.sum(a[0]) + jnp.sum(m[0])

        timeit(f"fused_chunks capped {cap8}", capped, rows48)

    def slabs(rows48):
        z, tid, a, m, _i = raster.rasterize_fused_slabs(rows48, bins_full,
                                                    counts_full, **kw)
        return jnp.sum(z) + jnp.sum(a[0]) + jnp.sum(m[0])

    timeit("fused_slabs uncapped", slabs, rows48)


if __name__ == "__main__":
    main()
