"""Shared kernel helpers: tiling, padding, interpret-mode switching."""

from __future__ import annotations

import functools

import jax


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@functools.cache
def use_interpret() -> bool:
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def pad_extent(width: int, height: int, tile_h: int, tile_w: int) -> tuple[int, int]:
    """Padded framebuffer extent (the visible extent is cropped at present).

    The last dim pads to a multiple of the 128-lane tile width; rows pad to
    the raster tile height. This replaces nothing in the reference — Vulkan
    images have opaque hardware tiling; on TPU we make it explicit.
    """
    return round_up(width, tile_w), round_up(height, tile_h)
