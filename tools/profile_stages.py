"""Stage-by-stage frame profiler on the bench scene (real TPU).

Builds the exact bench scene, then times cumulative stage prefixes of
render_frame with the scan+checksum technique (forced execution, no per-
frame host round trips). Prints per-stage deltas.

Usage: python tools/profile_stages.py [--grid 64] [--frames 10]
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
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
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
    from tpu_renderer.present import to_packed_u32
    from tpu_renderer.utils.demo import build_demo_glb

    path = os.path.join(tempfile.gettempdir(), f"bench_scene_{args.grid}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=args.grid, seed=0)

    cfg = RendererConfig(width=args.width, height=args.height,
                         camera_position=(0.0, 6.0, args.grid * 2.0))
    eng = Engine(cfg)
    eng.camera.pitch = np.float32(-0.18)
    eng.init(scene_path=path)
    eng.draw()  # warmup + cap escalation
    eng.draw()
    caps = dict(eng._caps)
    print("caps:", caps, flush=True)

    buffers = eng.flat.buffers
    width, height = args.width, args.height
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    wp, hp = pad_extent(width, height, tile_h, tile_w)
    tiles_x, tiles_y = wp // tile_w, hp // tile_h
    bin_cap = caps.get("bin_cap", 512)
    tri_cap = caps.get("tri_cap", 1024)

    param_list = []
    for i in range(args.frames):
        eng.camera.yaw = np.float32(0.002 * i)
        param_list.append(eng.update_scene())
    jax.block_until_ready(param_list)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)

    from tpu_renderer.pipeline import _bg_sky

    def checksum(x):
        return jnp.sum(x.reshape(-1)[:: 4097].astype(jnp.float32))

    def stage_fn(upto):
        def frame(params):
            outs = []
            viewproj = (params.proj @ params.view).astype(jnp.float32)
            fb = _bg_sky(params.bg_data1, hp, wp, height)
            fb = fb.astype(jnp.float16).astype(jnp.float32)
            outs.append(fb)
            if upto == 0:
                return checksum(outs[-1])

            vis = vertex.draw_visibility(viewproj, buffers.draw_model,
                                         buffers.draw_bounds_origin,
                                         buffers.draw_bounds_extents)
            # the production T-minor fused setup (pipeline.py render_frame)
            rows0, o_aabb, o_valid = vertex.triangle_setup_rows(
                buffers.opaque_corners, buffers.opaque_tri_draw,
                buffers.opaque_tri_valid, buffers.draw_model, vis, viewproj,
                width, height, sun_dir=params.sun_dir[:3])
            if upto == 1:
                return checksum(rows0)

            aabb_s, valid_s, rows_s = raster.spatial_sort(
                o_aabb, o_valid, rows0)
            caabb, cvalid = raster.chunk_aabbs(aabb_s, valid_s)
            cbins, ccounts = raster.bin_triangles_full(
                caabb, cvalid, tiles_x=tiles_x, tiles_y=tiles_y,
                tile_w=tile_w, tile_h=tile_h)
            if upto == 2:
                return checksum(cbins.astype(jnp.float32))

            if upto == 3:  # (refine no longer on the fused path)
                return checksum(cbins.astype(jnp.float32))

            z, tid, attrs_px, meta_px, inv_px = raster.rasterize_fused_slabs(
                rows_s, cbins, ccounts,
                tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w, tile_h=tile_h)
            if upto == 4:
                return checksum(z) + checksum(tid.astype(jnp.float32))

            valid = tid >= 0
            shaded = shade.shade_fused(
                attrs_px, meta_px, inv_px, buffers.atlas, params.ambient[:3],
                params.sun_dir[:3], params.sun_color[3],
                trilinear=eng._trilinear, pot=eng._pot)
            rgb = jnp.where(valid[None], shaded, fb[:3])
            alpha = jnp.where(valid, jnp.float32(1.0), fb[3])
            fb = jnp.concatenate([rgb, alpha[None]], axis=0)
            fb = fb.astype(jnp.float16).astype(jnp.float32)
            if upto == 5:
                return checksum(fb)

            rows_t0, t_aabb, t_valid = vertex.triangle_setup_rows(
                buffers.transp_corners, buffers.transp_tri_draw,
                buffers.transp_tri_valid, buffers.draw_model,
                jnp.ones_like(vis), viewproj,
                width, height, sun_dir=params.sun_dir[:3])
            aabb_ta, valid_ta, rows_t = raster.spatial_sort(
                t_aabb, t_valid, rows_t0)
            caabb_t, cvalid_t = raster.chunk_aabbs(aabb_ta, valid_ta)
            cbins_t, ccounts_t = raster.bin_triangles_full(
                caabb_t, cvalid_t, tiles_x=tiles_x, tiles_y=tiles_y,
                tile_w=tile_w, tile_h=tile_h)
            if upto == 6:
                return checksum(cbins_t.astype(jnp.float32))

            light = jnp.concatenate([
                params.sun_dir[:3], params.sun_color[3:4],
                params.ambient[:3], jnp.zeros(1, jnp.float32)])
            acc, cnt = raster.rasterize_accum_slabs(
                rows_t, cbins_t, ccounts_t, z, light,
                tiles_x=tiles_x, tiles_y=tiles_y,
                tile_w=tile_w, tile_h=tile_h)
            covered = cnt > 0
            rgb = jnp.where(covered[None], acc + fb[:3] * fb[3][None], fb[:3])
            alpha = jnp.where(covered, jnp.float32(1.0), fb[3])
            fb = jnp.concatenate([rgb, alpha[None]], axis=0)
            fb = fb.astype(jnp.float16).astype(jnp.float32)
            if upto == 7:
                return checksum(fb)

            image = to_packed_u32(fb, width=width, height=height)
            return checksum(image.astype(jnp.float32))

        @jax.jit
        def run(params_batch):
            def step(c, p):
                s = frame(p)
                return c + s, s
            tot, sums = jax.lax.scan(step, jnp.float32(0.0), params_batch)
            return tot, sums

        return run

    names = ["background", "+cull/setup", "+chunk bin", "+(n/a)",
             "+raster_fused", "+shade_fused", "+transp setup/bin",
             "+transp accum", "+present"]
    times = []
    for k in range(len(names)):
        run = stage_fn(k)
        tot, _ = run(stacked)
        float(tot)  # force compile+run
        t0 = time.perf_counter()
        tot, _ = run(stacked)
        float(tot)
        dt = (time.perf_counter() - t0) / args.frames * 1000
        times.append(dt)
        delta = dt - (times[-2] if len(times) > 1 else 0.0)
        print(f"{names[k]:<22} cum {dt:8.2f} ms   delta {delta:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
