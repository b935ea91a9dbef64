"""Present path — replaces the swapchain blit + present
(vk_images.cpp:33-64 blit, vk_engine.cpp:1268-1336).

The reference blits the rgba16f draw image to a B8G8R8A8_UNORM swapchain
image (no color-space conversion: the surface is UNORM + SRGB_NONLINEAR,
so values are interpreted as already-encoded). The TPU equivalent: crop the
padded planar framebuffer, convert float -> unorm8 (clamp, round to
nearest) packed into one u32 plane on device, and view the bytes as
(H, W, 4) uint8 RGBA on the host.

The device side never materializes a (H, W, 4) u8 array: a 4-wide minor
dimension lane-pads to 128 on TPU (32x storage blowup — measured ~3 ms per
frame at 1080p just for the final bitcast). The packed u32 plane is dense;
the channel split is a free numpy view after the transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("width", "height"))
def to_packed_u32(fb, *, width: int, height: int):
    """(4, Hp, Wp) float framebuffer -> (H, W) uint32, RGBA packed LE
    (r | g<<8 | b<<16 | a<<24 — byte order matches an RGBA8 image)."""
    crop = fb[:, :height, :width].astype(jnp.float32)
    q = jnp.clip(jnp.round(crop * 255.0), 0.0, 255.0).astype(jnp.uint32)
    return q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)


def unpack_u8(packed: np.ndarray) -> np.ndarray:
    """Host: (H, W) uint32 packed plane -> (H, W, 4) uint8 RGBA (a view —
    zero copy; little-endian byte order matches the device packing)."""
    a = np.ascontiguousarray(np.asarray(packed))
    assert a.dtype == np.uint32
    return a.view(np.uint8).reshape(*a.shape, 4)


def save_png(image_u8: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(image_u8), mode="RGBA").save(path)


def load_png(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGBA"))
