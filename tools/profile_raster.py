"""Fine-grained raster/shade cost split on the bench scene (real TPU).

Times, each as its own scan-forced program:
  A. the XLA fat-row gather feeding the raster (rows = fat_rows[bins])
  B. visibility-only Pallas raster (rasterize)
  C. fused raster (rasterize_fused)
  D. shade_fused over synthetic attr planes (texture taps included)
  E. shade_fused untextured
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
    wp, hp = pad_extent(1920, 1080, 32, 128)
    tiles_x, tiles_y = wp // 128, hp // 32
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
    cbins, _, _ = raster.bin_triangles(
        caabb, cvalid, tiles_x=tiles_x, tiles_y=tiles_y, tile_w=128,
        tile_h=32, bin_cap=caps["bin_cap"])
    bins, counts, _ = raster.refine_bins(
        cbins, setup.aabb, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=128, tile_h=32, tri_cap=caps["tri_cap"])
    rows48 = shade.build_shade_rows(setup.packed, setup.attrs, buffers.mat_meta)
    packed16 = setup.packed
    bins, counts, rows48, packed16 = jax.block_until_ready(
        (bins, counts, rows48, packed16))
    print("counts: total", int(counts.sum()), "max", int(counts.max()),
          flush=True)

    def timeit(name, fn, *xs):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        float(jnp.asarray(r[0] if isinstance(r, tuple) else r).reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*xs)
            s = (r[0] if isinstance(r, tuple) else r)
            float(jnp.asarray(s).reshape(-1)[0])  # force each iter
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:<30} {dt:8.2f} ms", flush=True)
        return dt

    T = rows48.shape[0]

    def gather_only(rows48, bins):
        safe = jnp.clip(bins, 0, T - 1)
        g = rows48[safe]
        return jnp.sum(g[:, :, 0])

    timeit("A rows gather (tri_cap wide)", gather_only, rows48, bins)

    def vis_raster(packed16, bins, counts):
        z, tid = raster.rasterize(packed16, bins, counts, tiles_x=tiles_x,
                                  tiles_y=tiles_y, tile_w=128, tile_h=32)
        return jnp.sum(z) + jnp.sum(tid)

    timeit("B visibility raster", vis_raster, packed16, bins, counts)

    def fused_raster(rows48, bins, counts):
        z, tid, a, m, _i = raster.rasterize_fused(
            rows48, bins, counts, tiles_x=tiles_x, tiles_y=tiles_y,
            tile_w=128, tile_h=32)
        return jnp.sum(z) + jnp.sum(a[0]) + jnp.sum(m[0])

    timeit("C fused raster", fused_raster, rows48, bins, counts)

    key = jax.random.PRNGKey(0)
    attrs = jax.random.uniform(key, (8, hp, wp), jnp.float32)
    meta = jnp.zeros((6, hp, wp), jnp.float32)
    meta = meta.at[2].set(64.0).at[3].set(64.0).at[4].set(7.0).at[5].set(7.0)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)
    sd = jnp.asarray([0.0, 1.0, 0.5], jnp.float32)
    attrs, meta = jax.block_until_ready((attrs, meta))

    def shade_tex(attrs, meta):
        s = shade.shade_fused(attrs, meta, buffers.atlas, amb, sd,
                              jnp.float32(1.0), textured=True)
        return jnp.sum(s)

    def shade_untex(attrs, meta):
        s = shade.shade_fused(attrs, meta, buffers.atlas, amb, sd,
                              jnp.float32(1.0), textured=False)
        return jnp.sum(s)

    timeit("D shade_fused textured", shade_tex, attrs, meta)
    timeit("E shade_fused untextured", shade_untex, attrs, meta)


if __name__ == "__main__":
    main()
