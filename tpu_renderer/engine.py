"""Engine façade — init/run/draw/cleanup API in the shape of the reference's
VulkanEngine (vk_engine.h:223-226), minus the windowing: frames are rendered
headless and presented as numpy images / PNG files.

Filled in as the pipeline stages land; see tpu_renderer.pipeline for the
jit-compiled frame function.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class EngineStats:
    """Mirror of EngineStats (vk_engine.h:16-22)."""

    frame_time: float = 0.0  # ms
    triangle_count: int = 0
    drawcall_count: int = 0
    scene_update_time: float = 0.0  # ms
    mesh_draw_time: float = 0.0  # ms


class Engine:  # placeholder until pipeline lands
    pass
