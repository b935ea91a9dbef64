"""Device resources — the TPU equivalent of the reference's VMA allocations,
texture uploads and mip generation (vk_engine.cpp:308-338, 1537-1617,
vk_images.cpp:66-133) plus upload_mesh (vk_engine.cpp:340-390).

Instead of per-resource VkImage/VkBuffer objects, everything a scene needs
on device is packed into a few large arrays (HBM-friendly, gather-friendly):

* one RGBA8 **texture atlas** (packed uint32 texels) holding every texture's
  full mip chain, with an entry table (x, y, w, h) per (texture, level);
* flat vertex attribute arrays (SoA);
* flat triangle index arrays.

Texture defaults mirror init_default_data (vk_engine.cpp:226-306): 1px
white/grey/black, a 32x32 magenta/black checkerboard used as the error
placeholder (vk_loader.cpp:224-229).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

# Filter flag bits (per material): Vulkan sampler state flattened.
FILTER_MAG_LINEAR = 1
FILTER_MIN_LINEAR = 2
FILTER_MIP_LINEAR = 4


def make_white(size: int = 1) -> np.ndarray:
    return np.full((size, size, 4), 255, np.uint8)


def make_grey() -> np.ndarray:
    # vk_engine.cpp:234 — 0xAAAAAAFF byte-swapped => RGBA (0xAA,0xAA,0xAA,0xFF)
    return np.tile(np.array([0xAA, 0xAA, 0xAA, 0xFF], np.uint8), (1, 1, 1))


def make_black() -> np.ndarray:
    return np.tile(np.array([0, 0, 0, 0xFF], np.uint8), (1, 1, 1))


def make_error_checkerboard() -> np.ndarray:
    """32x32 magenta/black checkerboard (vk_engine.cpp:241-250)."""
    magenta = np.array([0xFF, 0x00, 0xFF, 0xFF], np.uint8)
    black = np.array([0, 0, 0, 0xFF], np.uint8)
    img = np.empty((32, 32, 4), np.uint8)
    for y in range(32):
        for x in range(32):
            img[y, x] = magenta if ((x % 2) ^ (y % 2)) else black
    return img


def downsample_blit(img: np.ndarray) -> np.ndarray:
    """One mip level via the semantics of a linear-filtered vkCmdBlitImage
    half-size blit (vk_images.cpp:66-133): each destination pixel center maps
    to src coords (x+0.5)*scale - 0.5 and samples bilinearly. For even sizes
    this is an exact 2x2 box average.
    """
    h, w = img.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    src = img.astype(np.float32)
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    out = (
        src[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + src[np.ix_(y0, x1)] * (1 - fy) * fx
        + src[np.ix_(y1, x0)] * fy * (1 - fx)
        + src[np.ix_(y1, x1)] * fy * fx
    )
    # UNORM8 round-to-nearest per blit
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def mip_chain(img: np.ndarray, enabled: bool = True) -> List[np.ndarray]:
    """Full chain down to 1x1 (vk_engine.cpp:1603-1605 mipmap path)."""
    levels = [img]
    if not enabled:
        return levels
    while max(levels[-1].shape[0], levels[-1].shape[1]) > 1:
        levels.append(downsample_blit(levels[-1]))
    return levels


def _pack_rgba8(img: np.ndarray) -> np.ndarray:
    """(h, w, 4) u8 -> (h, w) uint32 little-endian R | G<<8 | B<<16 | A<<24."""
    i = img.astype(np.uint32)
    return i[..., 0] | (i[..., 1] << 8) | (i[..., 2] << 16) | (i[..., 3] << 24)


class TextureAtlas(NamedTuple):
    data: jnp.ndarray        # (HA, WA) uint32 packed RGBA8
    entries: jnp.ndarray     # (E, 4) i32 — x, y, w, h per (texture, level)
    tex_base: jnp.ndarray    # (n_tex,) i32 — first entry index per texture
    tex_levels: jnp.ndarray  # (n_tex,) i32 — mip level count per texture


def build_atlas(images: List[np.ndarray], mipmapped: bool = True,
                atlas_width: int = 2048) -> TextureAtlas:
    """Shelf-pack every texture's mip chain into one big atlas.

    images: list of (h, w, 4) uint8 arrays. Keeps insertion order: texture i
    in the scene refers to atlas texture i.
    """
    assert images, "atlas needs at least one image"
    rects = []     # (tex, level) -> np image
    tex_base = []
    tex_levels = []
    for img in images:
        assert img.ndim == 3 and img.shape[2] == 4 and img.dtype == np.uint8
        chain = mip_chain(img, enabled=mipmapped)
        tex_base.append(len(rects))
        tex_levels.append(len(chain))
        rects.extend(chain)

    widest = max(r.shape[1] for r in rects)
    aw = max(atlas_width, 1 << int(np.ceil(np.log2(widest))))

    # shelf packing in insertion order (mip chains shrink, so short shelves)
    entries = np.zeros((len(rects), 4), np.int32)
    shelf_y = 0
    shelf_h = 0
    cursor_x = 0
    for idx, r in enumerate(rects):
        h, w = r.shape[:2]
        if cursor_x + w > aw:
            shelf_y += shelf_h
            cursor_x = 0
            shelf_h = 0
        entries[idx] = (cursor_x, shelf_y, w, h)
        cursor_x += w
        shelf_h = max(shelf_h, h)
    ah = shelf_y + shelf_h
    # pad height to a lane-friendly multiple
    ah = ((ah + 7) // 8) * 8

    data = np.zeros((ah, aw), np.uint32)
    for idx, r in enumerate(rects):
        x, y, w, h = entries[idx]
        data[y:y + h, x:x + w] = _pack_rgba8(r)

    return TextureAtlas(
        data=jnp.asarray(data),
        entries=jnp.asarray(entries),
        tex_base=jnp.asarray(np.asarray(tex_base, np.int32)),
        tex_levels=jnp.asarray(np.asarray(tex_levels, np.int32)),
    )
