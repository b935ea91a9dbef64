"""Benchmark driver: steady-state FPS at 1080p on a glTF scene (the
BASELINE.json metric), printed as ONE JSON line.

vs_baseline is FPS / 60 — the build target is >= 60 FPS at 1080p on one
TPU v5e chip (BASELINE.md).
"""

import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> int:
    from tpu_renderer.config import RendererConfig
    from tpu_renderer.engine import Engine
    from tpu_renderer.utils.demo import build_demo_glb

    width, height = 1920, 1080
    grid = int(os.environ.get("BENCH_GRID", "64"))  # 64x64 cubes ~ 49k tris
    frames = int(os.environ.get("BENCH_FRAMES", "30"))

    path = os.path.join(tempfile.gettempdir(), f"bench_scene_{grid}.glb")
    if not os.path.exists(path):
        build_demo_glb(path, grid=grid, seed=0)

    cfg = RendererConfig(width=width, height=height,
                         camera_position=(0.0, 6.0, grid * 2.0))
    eng = Engine(cfg)
    eng.camera.pitch = np.float32(-0.18)
    eng.init(scene_path=path)

    import jax.numpy as jnp

    # warmup: compile + one steady frame (the only host image transfer)
    eng.draw()

    # Steady-state loop, fully on device: each frame's params carry a
    # zero-valued dependency on the previous frame's image so the runtime
    # cannot elide or reorder frames; only the last frame is fetched.
    # (Presentation in the reference also never copies to host.)
    t0 = time.perf_counter()
    fence = jnp.float32(0.0)
    for i in range(frames):
        eng.camera.yaw = np.float32(0.002 * i)  # orbit: frames differ
        params = eng.update_scene()
        params = params._replace(
            bg_data1=params.bg_data1 + fence)
        image, aux = eng.draw_device(params)
        fence = image[0, 0, 0].astype(jnp.float32) * 0.0
    final = np.asarray(image)  # forces the chained sequence
    dt = time.perf_counter() - t0
    eng._update_stats(aux)

    fps = frames / dt
    result = {
        "metric": "fps_1080p_gltf_scene",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
        "detail": {
            "frame_ms": round(1000 * dt / frames, 2),
            "triangles": eng.stats.triangle_count,
            "mtris_per_sec": round(eng.stats.triangle_count * fps / 1e6, 2),
            "drawcalls": eng.stats.drawcall_count,
            "resolution": f"{width}x{height}",
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
