"""A/B: per-frame spatial sort vs a hoisted frame-0 permutation.

The spatial sort's argsort is per-frame work a temporally-coherent caller
could amortize: any permutation renders correctly (binning re-derives tile
overlap from the permuted AABBs each frame), so a scan could compute the
Hilbert order once at its first camera and reuse it
(pipeline.frame_sort_orders + render_frame(sort_orders=...)).

MEASURED RESULT (real TPU, bench scene, 60-frame scan sweeping yaw
0 -> 0.118 rad): the hoist LOSES ~0.2 ms/frame — fresh 17.06 ms/frame
best-of-4 vs hoisted 17.28. The per-frame argsort is cheaper than the
chunk-locality decay of a stale permutation across a ~7 degree camera
sweep, so the product paths keep the per-frame sort (docs/PERF.md).
"""
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_renderer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from tpu_renderer.config import RendererConfig
from tpu_renderer.engine import Engine
from tpu_renderer import pipeline
from tpu_renderer.utils.demo import build_demo_glb


def main():
    width, height, grid, frames = 1920, 1080, 64, 60
    path = os.path.join(tempfile.gettempdir(), f"bench_scene_{grid}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=grid, seed=0)
    cfg = RendererConfig(width=width, height=height,
                         camera_position=(0.0, 6.0, grid * 2.0))
    eng = Engine(cfg)
    eng.camera.pitch = np.float32(-0.18)
    eng.init(scene_path=path)

    kw = dict(width=width, height=height, tile_h=cfg.tile_h,
              tile_w=cfg.tile_w, fp16=cfg.framebuffer_fp16,
              transp_textured=eng._transp_textured(),
              trilinear=eng._trilinear, pot=eng._pot, **eng._caps)
    param_list = []
    for i in range(frames):
        eng.camera.yaw = np.float32(0.002 * i)
        param_list.append(eng.update_scene())
    jax.block_until_ready(param_list)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *param_list)
    buffers = eng.flat.buffers
    first = jax.tree.map(lambda x: x[0], stacked)

    def make_scan(orders):
        @jax.jit
        def run():
            wp, hp = pipeline.pad_extent(kw["width"], kw["height"],
                                         kw["tile_h"], kw["tile_w"])
            bg_fb = pipeline._background(first, hp, wp, kw["height"])

            def step(_, p):
                img, _aux = pipeline.render_frame(
                    buffers, p, bg_fb=bg_fb, sort_orders=orders, **kw)
                checksum = (img[::191, ::127] & 0xFF).astype(jnp.int32).sum()
                return img, checksum

            init = jnp.zeros((kw["height"], kw["width"]), jnp.uint32)
            return jax.lax.scan(step, init, stacked)

        return run

    orders = pipeline.frame_sort_orders(
        buffers, first, width=width, height=height,
        transp_textured=eng._transp_textured())

    for tag, run in (("fresh-sort", make_scan(None)),
                     ("hoisted", make_scan(orders))):
        _, sums = run()
        _ = np.asarray(sums)
        best = 1e9
        for rep in range(4):
            t0 = time.perf_counter()
            _, sums = run()
            _ = np.asarray(sums)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"[{tag}] rep{rep}: {frames / dt:.2f} FPS "
                  f"({1000 * dt / frames:.2f} ms/frame)", flush=True)
        print(f"[{tag}] best: {frames / best:.2f} FPS "
              f"({1000 * best / frames:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
