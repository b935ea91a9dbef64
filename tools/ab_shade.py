"""A/B the deferred shade stage's internals on the real TPU.

Times the full frame with shade_fused's sampler swapped per variant:
  full        — production stage (tap gather + filtering + lighting)
  no-gather   — the quad-row gather replaced by elementwise-computed fake
                texels (everything else identical: isolates the TAP cost)
  gather-only — the gather kept, filtering math dropped (isolates the
                filtering/lighting elementwise cost)
  trilinear   — both mip taps (the reference-default sampler config)

Forced execution via scan+checksum (docs/PERF.md measurement pitfalls).
Usage: python tools/ab_shade.py [--grid 64] [--frames 20]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/tpu_renderer_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from tpu_renderer.config import RendererConfig
    from tpu_renderer.engine import Engine
    from tpu_renderer.kernels import raster, shade, vertex
    from tpu_renderer.kernels.common import pad_extent
    from tpu_renderer.utils.demo import build_demo_glb

    trilinear_scene = bool(int(os.environ.get("AB_TRILINEAR", "0")))
    suffix = "_tri" if trilinear_scene else ""
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_scene_{args.grid}{suffix}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=args.grid, seed=0,
                       trilinear=trilinear_scene)
    cfg = RendererConfig(width=args.width, height=args.height,
                         camera_position=(0.0, 6.0, args.grid * 2.0))
    eng = Engine(cfg)
    eng.camera.pitch = np.float32(-0.18)
    eng.init(scene_path=path)
    params = eng.update_scene()
    buffers = eng.flat.buffers
    width, height = args.width, args.height
    wp, hp = pad_extent(width, height, cfg.tile_h, cfg.tile_w)
    tiles_x, tiles_y = wp // cfg.tile_w, hp // cfg.tile_h

    # one fixed raster pass -> the shade stage inputs (materialized once)
    viewproj = (params.proj @ params.view).astype(jnp.float32)
    vis = vertex.draw_visibility(viewproj, buffers.draw_model,
                                 buffers.draw_bounds_origin,
                                 buffers.draw_bounds_extents)
    rows, o_aabb, o_valid = vertex.triangle_setup_rows(
        buffers.opaque_corners, buffers.opaque_tri_draw,
        buffers.opaque_tri_valid, buffers.draw_model, vis, viewproj,
        width, height, sun_dir=params.sun_dir[:3])
    aabb_s, valid_s, rows_s = raster.spatial_sort(o_aabb, o_valid, rows)
    caabb, cvalid = raster.chunk_aabbs(aabb_s, valid_s)
    cbins, ccounts = raster.bin_triangles_full(
        caabb, cvalid, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    z, tid, attrs_px, meta_px, inv_px = raster.rasterize_fused_slabs(
        rows_s, cbins, ccounts, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    inputs = jax.block_until_ready((attrs_px, meta_px, inv_px))
    attrs_px, meta_px, inv_px = inputs
    print(f"scene: {args.grid}x{args.grid}, atlas "
          f"{buffers.atlas.quads.shape[0] * 16 / 1e6:.2f} MB", flush=True)

    orig_sample_level = shade._sample_level

    def fake_sample_level(atlas, base_x, base_y, w0, h0, level, u, v, linear,
                          active=None, pot=False):
        # identical addressing + filtering math, NO gather: fake texels
        # computed elementwise from the flat index
        li = level.astype(jnp.int32)
        wl, hl, x0w, y0w, fu, fv = shade._level_coords(w0, h0, li, u, v)
        w2 = jnp.maximum(w0.astype(jnp.int32), h0.astype(jnp.int32)) << 1
        ex = base_x.astype(jnp.int32) + w2 - (w2 >> li)
        ey = base_y.astype(jnp.int32)
        flat = (ey + y0w) * atlas.width + (ex + x0w)
        if active is not None:
            flat = jnp.where(active, flat, 0)
        f = flat.astype(jnp.uint32)
        t00 = f * jnp.uint32(2654435761)
        t10 = f * jnp.uint32(40503)
        t01 = f * jnp.uint32(2246822519)
        t11 = f * jnp.uint32(3266489917)
        nx = fu >= 0.5
        ny = fv >= 0.5
        near = jnp.where(nx, jnp.where(ny, t11, t10), jnp.where(ny, t01, t00))
        w11 = fu * fv
        w10 = fu - w11
        w01 = fv - w11
        w00 = 1.0 - fu - w01
        out = []
        for s in (0, 8, 16):
            bilin = (w00 * shade._chan(t00, s) + w10 * shade._chan(t10, s)
                     + w01 * shade._chan(t01, s) + w11 * shade._chan(t11, s))
            out.append(jnp.where(linear, bilin, shade._chan(near, s)))
        return tuple(out)

    def gather_only_sample_level(atlas, base_x, base_y, w0, h0, level, u, v,
                                 linear, active=None, pot=False):
        # the real gather, trivial combine (drops the 3-channel bilinear)
        li = level.astype(jnp.int32)
        wl, hl, x0w, y0w, fu, fv = shade._level_coords(w0, h0, li, u, v)
        w2 = jnp.maximum(w0.astype(jnp.int32), h0.astype(jnp.int32)) << 1
        ex = base_x.astype(jnp.int32) + w2 - (w2 >> li)
        ey = base_y.astype(jnp.int32)
        flat = (ey + y0w) * atlas.width + (ex + x0w)
        if active is not None:
            flat = jnp.where(active, flat, 0)
        quad = atlas.quads[flat]
        return tuple(shade._chan(quad[..., i], 0) for i in range(3))

    def run_variant(name, sampler, trilinear):
        shade._sample_level = sampler

        @jax.jit
        def go(c0):
            def step(c, _):
                # the perturbation must feed the SAMPLER inputs (not just
                # the lighting): a loop-invariant sampler gets hoisted out
                # of the scan entirely (measured 7x under-read)
                eps = c * jnp.float32(1e-20)
                a = attrs_px + eps
                iv = inv_px + eps
                out = shade.shade_fused(a, meta_px, iv,
                                        buffers.atlas, params.ambient[:3],
                                        params.sun_dir[:3],
                                        params.sun_color[3],
                                        trilinear=trilinear)
                # FULL reduce: a strided-slice checksum lets XLA shade only
                # the sampled pixels (measured 6x under-read on this stack)
                s = jnp.sum(out)
                return c + s, None
            c, _ = jax.lax.scan(step, c0, None, length=args.frames)
            return c

        try:
            float(go(jnp.float32(0.0)))  # compile + warm
            t0 = time.perf_counter()
            float(go(jnp.float32(1.0)))
            dt = (time.perf_counter() - t0) / args.frames * 1000
        finally:
            shade._sample_level = orig_sample_level
        print(f"{name:<12} {dt:7.2f} ms/frame", flush=True)
        return dt

    orig_level_coords = shade._level_coords

    def pot_level_coords(w0, h0, li, u, v, pot=False):
        # power-of-two wrap: x0 & (wl-1) == mod(x0, wl) exactly (incl.
        # negative x0 in two's complement) — drops the int-div mod planes
        wl = jnp.maximum(w0.astype(jnp.int32) >> li, 1)
        hl = jnp.maximum(h0.astype(jnp.int32) >> li, 1)
        su = u * wl.astype(jnp.float32) - 0.5
        sv = v * hl.astype(jnp.float32) - 0.5
        x0 = jnp.floor(su).astype(jnp.int32)
        y0 = jnp.floor(sv).astype(jnp.int32)
        return wl, hl, x0 & (wl - 1), y0 & (hl - 1), su - x0, sv - y0

    def pot_variant(name, trilinear):
        shade._level_coords = pot_level_coords
        try:
            run_variant(name, orig_sample_level, trilinear)
        finally:
            shade._level_coords = orig_level_coords

    tri = eng._trilinear
    run_variant("full", orig_sample_level, tri)
    run_variant("no-gather", fake_sample_level, tri)
    run_variant("gather-only", gather_only_sample_level, tri)
    pot_variant("pot-wrap", tri)


if __name__ == "__main__":
    main()
