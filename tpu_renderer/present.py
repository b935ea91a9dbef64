"""Present path — replaces the swapchain blit + present
(vk_images.cpp:33-64 blit, vk_engine.cpp:1268-1336).

The reference blits the rgba16f draw image to a B8G8R8A8_UNORM swapchain
image (no color-space conversion: the surface is UNORM + SRGB_NONLINEAR,
so values are interpreted as already-encoded). The TPU equivalent: crop the
padded planar framebuffer, convert float -> unorm8 (clamp, round to
nearest), and hand the (H, W, 4) uint8 image to the host (PNG/numpy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("width", "height"))
def to_u8_image(fb, *, width: int, height: int):
    """(4, Hp, Wp) float framebuffer -> (H, W, 4) uint8 RGBA.

    The planar->interleaved conversion is done by packing the four channels
    into one u32 plane (pure elementwise shifts) and bitcasting — a real
    transpose of the 8 MB image costs ~10 ms on TPU, this costs ~0.
    """
    crop = fb[:, :height, :width].astype(jnp.float32)
    q = jnp.clip(jnp.round(crop * 255.0), 0.0, 255.0).astype(jnp.uint32)
    packed = q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)
    return jax.lax.bitcast_convert_type(packed, jnp.uint8)  # (H, W, 4) LE


def save_png(image_u8: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image_u8), mode="RGBA").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))
