"""Tile rasterizer — the TPU-native replacement for the GPU fixed-function
rasterizer + reversed-Z depth test the reference gets inside vkCmdDrawIndexed
(vk_engine.cpp:1453, depth state GREATER_OR_EQUAL at vk_engine.cpp:1659,
depth clear 0.0 at vk_initializers.cpp:144).

Architecture (blockwise over pixels — the TPU answer to SIMT scanline HW):

1. Triangles are grouped into *chunks* of 64 consecutive triangles
   (submission order, so depth-tie semantics survive). glTF index buffers are
   spatially coherent, so chunk AABBs stay tight.
2. ``bin_triangles`` (XLA) bins chunk AABBs to framebuffer tiles — a
   cumsum/searchsorted expansion + one small ``lax.sort`` (a few thousand
   entries instead of per-triangle millions).
3. ``rasterize`` (Pallas): one grid step per (tile_h, tile_w) framebuffer
   tile. The whole packed setup table lives in VMEM; the kernel walks its
   chunk list with a dynamic fori_loop, and for each of the 64 triangles does
   a *scalar* AABB-vs-tile pretest before spending VPU work on the three edge
   functions + depth plane over the tile. Everything stays in registers —
   no gather, no scatter, no HBM traffic beyond the one setup table fetch.

The output is a *visibility buffer*: per-pixel (tri_id, z). Shading is
deferred (kernels/shade.py) so the raster loop carries only 2 registers of
state per pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_renderer.kernels.common import cdiv, use_interpret
from tpu_renderer.kernels import vertex as vx

DEPTH_CLEAR = 0.0  # vk_initializers.cpp:144 (reversed-Z)
NO_TRI = -1
CHUNK = 64  # triangles per binning chunk

_EMPTY_AABB = (-1.0, -1.0, -2.0, -2.0)


def pad_tris(n: int) -> int:
    return cdiv(n, CHUNK) * CHUNK


def pad_for_raster(packed, aabb, valid):
    """Zero-pad triangle arrays to a CHUNK multiple.

    Zero rows are inert: their edge functions evaluate to 0 with a false
    top-left flag (never covered) and their (0,0,0,0) AABB misses every tile's
    pixel-center bounds.
    """
    T = packed.shape[0]
    Tp = pad_tris(T)
    if Tp != T:
        packed = jnp.pad(packed, ((0, Tp - T), (0, 0)))
        aabb = jnp.pad(aabb, ((0, Tp - T), (0, 0)))
        valid = jnp.pad(valid, (0, Tp - T))
    return packed, aabb, valid


def chunk_aabbs(aabb, valid):
    """(T,4) per-tri AABBs -> (T/CHUNK, 4) chunk AABBs (+ chunk validity)."""
    T = aabb.shape[0]
    assert T % CHUNK == 0, "pad triangle arrays to CHUNK first"
    a = aabb.reshape(-1, CHUNK, 4)
    v = valid.reshape(-1, CHUNK)
    big = jnp.float32(1e30)
    xmin = jnp.where(v, a[..., 0], big).min(-1)
    ymin = jnp.where(v, a[..., 1], big).min(-1)
    xmax = jnp.where(v, a[..., 2], -big).max(-1)
    ymax = jnp.where(v, a[..., 3], -big).max(-1)
    any_valid = v.any(-1)
    empty = jnp.asarray(_EMPTY_AABB, jnp.float32)
    out = jnp.stack([xmin, ymin, xmax, ymax], -1)
    return jnp.where(any_valid[:, None], out, empty[None]), any_valid


# ---------------------------------------------------------------------------
# Binning (operates on chunk AABBs)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "entry_cap", "bin_cap"),
)
def bin_triangles(aabb, valid, *, tiles_x: int, tiles_y: int, tile_w: int,
                  tile_h: int, entry_cap: int, bin_cap: int):
    """Build per-tile bins from AABBs (normally *chunk* AABBs).

    Returns (bins (n_tiles, bin_cap) i32 item ids padded with -1,
             counts (n_tiles,) i32 — clamped to bin_cap,
             overflow () i32 — total entries dropped beyond caps).
    """
    T = aabb.shape[0]
    n_tiles = tiles_x * tiles_y

    tx0 = jnp.maximum(jnp.floor(aabb[:, 0] / tile_w).astype(jnp.int32), 0)
    ty0 = jnp.maximum(jnp.floor(aabb[:, 1] / tile_h).astype(jnp.int32), 0)
    tx1 = jnp.minimum(jnp.floor(aabb[:, 2] / tile_w).astype(jnp.int32), tiles_x - 1)
    ty1 = jnp.minimum(jnp.floor(aabb[:, 3] / tile_h).astype(jnp.int32), tiles_y - 1)
    nx = jnp.maximum(tx1 - tx0 + 1, 0)
    ny = jnp.maximum(ty1 - ty0 + 1, 0)
    count = jnp.where(valid, nx * ny, 0)

    cum = jnp.cumsum(count)                      # inclusive
    total = cum[-1]
    offs = cum - count                           # exclusive

    e = jnp.arange(entry_cap, dtype=jnp.int32)
    item_of_e = jnp.searchsorted(cum, e, side="right").astype(jnp.int32)
    live = (e < total) & (item_of_e < T)
    item_of_e = jnp.clip(item_of_e, 0, T - 1)
    local = e - offs[item_of_e]
    nx_t = jnp.maximum(nx[item_of_e], 1)
    lx = local % nx_t
    ly = local // nx_t
    tile_of_e = (ty0[item_of_e] + ly) * tiles_x + (tx0[item_of_e] + lx)
    tile_of_e = jnp.where(live, tile_of_e, n_tiles)  # dead entries sort last

    tile_sorted, item_sorted = jax.lax.sort(
        (tile_of_e, item_of_e), dimension=0, num_keys=2
    )

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)
    full_counts = ends - starts
    counts = jnp.minimum(full_counts, bin_cap)

    slot = jnp.arange(bin_cap, dtype=jnp.int32)
    idx = starts[:, None] + slot[None, :]
    in_bin = slot[None, :] < counts[:, None]
    gathered = item_sorted[jnp.clip(idx, 0, entry_cap - 1)]
    bins = jnp.where(in_bin, gathered, NO_TRI)

    overflow = jnp.sum(full_counts - counts) + jnp.maximum(total - entry_cap, 0)
    return bins, counts, overflow


def full_bins(n_chunks: int, n_tiles: int, bin_cap: int):
    """Trivial binning: every tile tests every chunk (small scenes/tests)."""
    assert bin_cap >= n_chunks
    slot = np.arange(bin_cap, dtype=np.int32)
    row = np.where(slot < n_chunks, slot, NO_TRI)
    bins = jnp.asarray(np.broadcast_to(row, (n_tiles, bin_cap)).copy())
    counts = jnp.full((n_tiles,), n_chunks, jnp.int32)
    return bins, counts


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "tri_cap"),
)
def refine_bins(chunk_bins, aabb, *, tiles_x: int, tiles_y: int,
                tile_w: int, tile_h: int, tri_cap: int):
    """Chunk bins -> tight per-TRIANGLE bins, entirely in XLA (no sort).

    For every (tile, binned chunk) pair, test the 64 member triangles'
    AABBs against the tile's pixel-center bounds, then compact each tile's
    hits with a cumsum + searchsorted gather. Dead/culled triangles have
    empty AABBs and drop out here, so the raster loop sees only real work.

    Returns (tri_bins (n_tiles, tri_cap) i32, tri_counts (n_tiles,) i32,
             overflow () i32).
    """
    n_tiles, bcap = chunk_bins.shape
    T = aabb.shape[0]

    tri = jnp.where(chunk_bins >= 0, chunk_bins, 0)[:, :, None] * CHUNK \
        + jnp.arange(CHUNK, dtype=jnp.int32)[None, None, :]
    tri = tri.reshape(n_tiles, bcap * CHUNK)
    slot_ok = jnp.repeat(chunk_bins >= 0, CHUNK, axis=1)

    a = aabb[jnp.clip(tri, 0, T - 1)]                      # (n_tiles, bcap*64, 4)
    tile_id = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tile_id % tiles_x).astype(jnp.float32)
    ty = (tile_id // tiles_x).astype(jnp.float32)
    x0c = (tx * tile_w + 0.5)[:, None]
    y0c = (ty * tile_h + 0.5)[:, None]
    x1c = x0c + (tile_w - 1)
    y1c = y0c + (tile_h - 1)
    hit = (slot_ok
           & (a[..., 0] <= x1c) & (a[..., 2] >= x0c)
           & (a[..., 1] <= y1c) & (a[..., 3] >= y0c))

    csum = jnp.cumsum(hit.astype(jnp.int32), axis=1)       # (n_tiles, bcap*64)
    full_counts = csum[:, -1]
    counts = jnp.minimum(full_counts, tri_cap)

    want = jnp.arange(1, tri_cap + 1, dtype=jnp.int32)
    pos = jax.vmap(lambda c: jnp.searchsorted(c, want, side="left"))(csum)
    pos = jnp.clip(pos, 0, bcap * CHUNK - 1).astype(jnp.int32)
    ids = jnp.take_along_axis(tri, pos, axis=1)
    in_bin = jnp.arange(tri_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    tri_bins = jnp.where(in_bin, ids, NO_TRI)
    overflow = jnp.sum(full_counts - counts)
    return tri_bins, counts, overflow


# ---------------------------------------------------------------------------
# Pallas visibility raster
# ---------------------------------------------------------------------------


def _tile_coords(i, j, tile_h: int, tile_w: int):
    """Pixel centers (Vulkan: +0.5) in global screen coordinates."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) + i * tile_h
    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) + j * tile_w
    X = xx.astype(jnp.float32) + jnp.float32(0.5)
    Y = yy.astype(jnp.float32) + jnp.float32(0.5)
    return X, Y


def _edge_cov(a, b, c, X, Y):
    val = a * X + b * Y + c
    # Top-left fill rule: a zero edge value counts as covered iff the
    # interior lies in +x (left edge) or, for horizontal edges, below
    # (top edge). Adjacent triangles compute exactly negated coefficients
    # on a shared edge, so every boundary pixel is covered exactly once.
    tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
    return (val > 0.0) | ((val == 0.0) & tl)


def _fetch_bins(bins_ref, bin_smem, bin_sem, tile):
    """This tile's triangle list: HBM -> SMEM (scalar reads need SMEM; a
    VMEM row would need dynamic lane indexing, which Mosaic does not
    lower). bins are flattened 1D so every tile's slice is 1024-aligned."""
    bin_cap = bin_smem.shape[0]
    copy = pltpu.make_async_copy(
        bins_ref.at[pl.ds(pl.multiple_of(tile * bin_cap, 1024), bin_cap)],
        bin_smem, bin_sem)
    copy.start()
    copy.wait()


def _raster_kernel(counts_ref, bins_ref, packed_ref, z_ref, tid_ref,
                   bin_smem, bin_sem, *, tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    _fetch_bins(bins_ref, bin_smem, bin_sem, tile)
    X, Y = _tile_coords(i, j, tile_h, tile_w)

    def tri_body(k, carry):
        z, tid = carry
        idx = bin_smem[k]
        r = lambda col: packed_ref[idx, col]  # noqa: E731
        cov = (_edge_cov(r(0), r(1), r(2), X, Y)
               & _edge_cov(r(3), r(4), r(5), X, Y)
               & _edge_cov(r(6), r(7), r(8), X, Y))
        zv = r(9) * X + r(10) * Y + r(11)
        # Near/far "clip": z outside [0,1] rejected per pixel (exact
        # equivalent of clip z in [0, w] for the w>0 half-space).
        cov &= (zv >= 0.0) & (zv <= 1.0)
        # Reversed-Z GREATER_OR_EQUAL (vk_engine.cpp:1659); ties resolve to
        # the later triangle (bins are in submission order).
        take = cov & (zv >= z)
        return jnp.where(take, zv, z), jnp.where(take, idx, tid)

    z0 = jnp.full((tile_h, tile_w), DEPTH_CLEAR, jnp.float32)
    tid0 = jnp.full((tile_h, tile_w), NO_TRI, jnp.int32)
    z1, tid1 = jax.lax.fori_loop(0, n, tri_body, (z0, tid0))
    z_ref[:, :] = z1
    tid_ref[:, :] = tid1


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize(packed, bins, counts, *, tiles_x: int, tiles_y: int,
              tile_w: int, tile_h: int):
    """Visibility raster over the padded framebuffer.

    packed: (T, 16) f32 setup rows (kernels/vertex.py layout), T % 64 == 0
    bins:   (n_tiles, bin_cap) i32 per-TRIANGLE ids (refine_bins output),
            counts: (n_tiles,) i32
    Returns (z (Hp, Wp) f32, tri_id (Hp, Wp) i32).

    The setup table is held in VMEM for the whole pass: T is limited to
    ~190k triangles per raster call (12 MB); larger scenes raster in slabs.
    """
    T = packed.shape[0]
    assert T % CHUNK == 0
    n_tiles, bin_cap = bins.shape
    assert n_tiles == tiles_x * tiles_y
    # The per-tile bin-row DMA slices a 1D HBM array tiled at 1024 elements.
    bin_cap_pad = cdiv(bin_cap, 1024) * 1024
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w
    grid = (tiles_y, tiles_x)

    z, tid = pl.pallas_call(
        functools.partial(_raster_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # bins stay in HBM; DMA'd per tile
            pl.BlockSpec((T, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((bin_cap,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), bins.reshape(-1), packed)
    return z, tid


# ---------------------------------------------------------------------------
# Transparent pass: depth-peel raster (depth test vs opaque z, no write)
# ---------------------------------------------------------------------------

ID_INF = 0x7FFFFFF  # "no fragment" marker (> any triangle id)


def _peel_kernel(counts_ref, bins_ref, packed_ref, zbase_ref,
                 last_ref, out_ref, bin_smem, bin_sem, *,
                 tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    _fetch_bins(bins_ref, bin_smem, bin_sem, tile)
    X, Y = _tile_coords(i, j, tile_h, tile_w)

    zbase = zbase_ref[:, :]
    last = last_ref[:, :]

    def tri_body(k, best):
        idx = bin_smem[k]
        r = lambda col: packed_ref[idx, col]  # noqa: E731
        cov = (_edge_cov(r(0), r(1), r(2), X, Y)
               & _edge_cov(r(3), r(4), r(5), X, Y)
               & _edge_cov(r(6), r(7), r(8), X, Y))
        zv = r(9) * X + r(10) * Y + r(11)
        cov &= (zv >= 0.0) & (zv <= 1.0)
        # depth test GREATER_OR_EQUAL vs the opaque z buffer, depth write
        # OFF (vk_engine.cpp:1673-1676); peel: smallest id greater than the
        # last emitted layer.
        take = cov & (zv >= zbase) & (idx > last) & (idx < best)
        return jnp.where(take, idx, best)

    best0 = jnp.full((tile_h, tile_w), ID_INF, jnp.int32)
    out_ref[:, :] = jax.lax.fori_loop(0, n, tri_body, best0)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_peel(packed, bins, counts, z_base, last_id, *,
                   tiles_x: int, tiles_y: int, tile_w: int, tile_h: int):
    """One transparency peel: per pixel, the smallest triangle id > last_id
    that covers the pixel and passes the depth test against z_base.

    bins: per-TRIANGLE ids (refine_bins output).
    Returns (Hp, Wp) i32 with ID_INF where no fragment was found.
    """
    T = packed.shape[0]
    assert T % CHUNK == 0
    n_tiles, bin_cap = bins.shape
    bin_cap_pad = cdiv(bin_cap, 1024) * 1024
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    return pl.pallas_call(
        functools.partial(_peel_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((T, 16), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((bin_cap,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), bins.reshape(-1), packed, z_base, last_id)


# ---------------------------------------------------------------------------
# Reference rasterizer (numpy, per-pixel loop) — the unit-test oracle
# ---------------------------------------------------------------------------


def rasterize_reference(packed, width: int, height: int):
    """Direct per-pixel evaluation of the same math. Tiny inputs only."""
    packed = np.asarray(packed)
    T = packed.shape[0]
    z = np.full((height, width), DEPTH_CLEAR, np.float32)
    tid = np.full((height, width), NO_TRI, np.int32)
    for t in range(T):
        row = packed[t]
        if row[vx.COL_VALID] == 0.0:
            continue
        for y in range(height):
            for x in range(width):
                X, Y = np.float32(x + 0.5), np.float32(y + 0.5)
                cov = True
                for e in range(3):
                    a, b, c = row[3 * e], row[3 * e + 1], row[3 * e + 2]
                    val = a * X + b * Y + c
                    tl = (a > 0) or (a == 0 and b > 0)
                    cov &= (val > 0) or (val == 0 and tl)
                if not cov:
                    continue
                zv = row[9] * X + row[10] * Y + row[11]
                if zv < 0.0 or zv > 1.0:
                    continue
                if zv >= z[y, x]:
                    z[y, x] = zv
                    tid[y, x] = t
    return z, tid
