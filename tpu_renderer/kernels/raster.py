"""Tile rasterizer — the TPU-native replacement for the GPU fixed-function
rasterizer + reversed-Z depth test the reference gets inside vkCmdDrawIndexed
(vk_engine.cpp:1453, depth state GREATER_OR_EQUAL at vk_engine.cpp:1659,
depth clear 0.0 at vk_initializers.cpp:144).

Architecture (blockwise over pixels — the TPU answer to SIMT scanline HW):

1. Triangles are grouped into *chunks* of CHUNK consecutive triangles
   (submission order, so depth-tie semantics survive). glTF index buffers
   are spatially coherent, so chunk AABBs stay tight.
2. ``bin_triangles`` (XLA) bins chunk AABBs to framebuffer tiles — a dense
   broadcast overlap test + row-wise sort compaction (gather-free; a few
   thousand chunk columns instead of per-triangle millions).
3. ``refine_bins`` (XLA) tightens chunk bins to per-TRIANGLE per-tile lists:
   packed tile-coordinate AABB tests (one u32 row gather per candidate) and
   row-wise-sort compaction — both chosen for TPU's per-index gather cost.
4. The Pallas kernels: one grid step per (tile_h, tile_w) framebuffer tile;
   a dynamic fori_loop walks the tile's triangle list, reading per-triangle
   scalars from the tile's gathered row block (dynamic-sublane loads) and
   evaluating edge/depth planes over the whole tile on the VPU.

Two kernel families:
* ``rasterize``/``rasterize_peel`` — visibility only (per-pixel tri_id + z);
  shading then gathers one fat row per pixel (kernels/shade.shade).
* ``rasterize_fused``/``rasterize_peel_fused`` — visibility + perspective-
  correct attribute interpolation fused into the loop, so shading needs no
  per-pixel row gather at all (the default production path).
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
# the PUBLIC outputs keep shade.py's (attrs N_ATTR=6, metas N_META=13)
# contract; the kernels carry the reduced N_NUMS/N_SMETA/N_GMETA planes
# below and the epilogues reconstruct the public layout bit-exactly.

DEPTH_CLEAR = 0.0  # vk_initializers.cpp:144 (reversed-Z)
NO_TRI = -1
import os as _os_mod
# Triangles per binning chunk (the coarse-bin granularity and the DMA/SMEM
# block size). Swept on the TPU with SMEM-staged rows (tools/ab_kernel.py,
# demo/stress full pass, ms): 4: 22.6/46.3, 8: 15.0/31.2, 16: 12.7/25.4,
# 32: 11.3/24.8, 64: 12.5/28.8 — per-entry walk+DMA overhead dominates the
# looser chunk AABBs up to 32. The env override exists for A/B measurement
# and for the CPU test tier (tests/conftest.py pins 8: interpret-mode cost
# scales with the unroll).
CHUNK = int(_os_mod.environ.get("RASTER_CHUNK", "32"))
ROW_PAD = 128  # stream-row lane width: Mosaic requires HBM slice shapes
#                128-aligned on the minor dimension
ROW_TRIS = 2   # triangles packed per 128-lane stream row: the 44 used fat-
#                row columns fit a 64-lane half, so tri t of a chunk lives
#                at sublane t//2, lane half (t%2)*64 — the chunk block is a
#                2 KiB (4, 128) slice instead of a 48-of-128-lane 4 KiB one
#                (the raster is ~half DMA-bound; bytes halve, sublanes too)
STREAM_ROWS = CHUNK // ROW_TRIS  # sublane rows per chunk block
_HALF = ROW_PAD // ROW_TRIS
_CHUNK_SHIFT = CHUNK.bit_length() - 1
assert (1 << _CHUNK_SHIFT) == CHUNK  # tid >> shift == chunk id
# screen-space triangle sort key (see spatial_sort); RASTER_SORT env wins
SORT_MODE = "hilbert"

# gmask skip groups: dense-bin entries carry a per-(tile, chunk) bitmask of
# which GROUP-triangle sub-blocks' AABB unions actually overlap the tile
# (entry = cid << ENTRY_SHIFT | gmask, built by bin_triangles_full). The
# opaque stream kernel skips whole dead groups on a SCALAR bit test — the
# predicate is free (no vector->scalar reduce, no coefficient loads), which
# is what every earlier per-entry skip mechanism paid for (per-tri lax.cond,
# hierarchical-z: see docs/PERF.md). Entries whose gmask is 0 (the chunk
# union box overlaps the tile but no member group does) are dropped at bin
# time for free.
GROUP = int(_os_mod.environ.get("RASTER_GROUP", str(min(8, CHUNK))))
N_GROUPS = CHUNK // GROUP  # 4 at the production CHUNK=32 / GROUP=8
assert N_GROUPS * GROUP == CHUNK and N_GROUPS <= 8
# bins entries: cid << ENTRY_SHIFT | gmask. 4 bits hold the default 4-group
# mask; finer GROUP granularities (N_GROUPS up to 8) widen to 8 — which
# pushes the bin sort keys past i16 beyond 127 chunks (_dense_sorted_entries)
ENTRY_SHIFT = 4 if N_GROUPS <= 4 else 8
ENTRY_GMASK_ALL = (1 << N_GROUPS) - 1  # "every group live" (unpacked bins)


def configure(*, chunk=None, group=None, nbuf=None, sort=None):
    """Apply kernel knobs from RendererConfig (config.py is the single
    source of truth for production values; the RASTER_* env vars WIN over
    config for A/B measurement and the CPU test tier — tests/conftest.py
    pins RASTER_CHUNK=8 there).

    Must run before the first render trace: the knobs are compiled into
    kernel unrolls and HBM chunk-block shapes, so mixing two values of the
    same knob in one process is unsupported.
    """
    global CHUNK, STREAM_ROWS, _CHUNK_SHIFT, GROUP, N_GROUPS
    global ENTRY_SHIFT, ENTRY_GMASK_ALL, NBUF, SORT_MODE
    env = _os_mod.environ
    if chunk is not None and "RASTER_CHUNK" not in env:
        CHUNK = int(chunk)
        STREAM_ROWS = CHUNK // ROW_TRIS
        _CHUNK_SHIFT = CHUNK.bit_length() - 1
        assert (1 << _CHUNK_SHIFT) == CHUNK
    if group is not None and "RASTER_GROUP" not in env:
        GROUP = min(int(group), CHUNK)
    else:
        GROUP = min(GROUP, CHUNK)  # keep GROUP <= a reconfigured CHUNK
    N_GROUPS = CHUNK // GROUP
    assert N_GROUPS * GROUP == CHUNK and N_GROUPS <= 8
    ENTRY_SHIFT = 4 if N_GROUPS <= 4 else 8
    ENTRY_GMASK_ALL = (1 << N_GROUPS) - 1
    if nbuf is not None and "RASTER_NBUF" not in env:
        NBUF = int(nbuf)
        assert NBUF & (NBUF - 1) == 0
    if sort is not None and "RASTER_SORT" not in env:
        SORT_MODE = str(sort)

_FLT_MIN = 1.17549435e-38  # smallest NORMAL f32 (Python float: Pallas
#                            kernels may not capture array constants)

# ---------------------------------------------------------------------------
# Fused-kernel carried-plane layout (the attr-block cut).
#
# The fused kernels select per-winner planes with one jnp.where per plane per
# triangle, so every carried plane costs ~1 vector op per candidate. Two
# reductions against the naive 6-attr + 13-meta carry (31 ops/tri -> 24):
#
# * u/v move from interpolated ATTRS (a plane eval + select each) to carried
#   CONSTANTS: their plane coefficients are already in the meta block
#   (nu_a/nu_b/nv_a/nv_b at C_GRAD; nu_c/nv_c appended below), and the XLA
#   epilogue re-evaluates u = (nu_a*X + nu_b*Y + nu_c) * inv with the exact
#   op order the kernel used — bit-identical, two fewer carried planes and
#   two fewer in-loop plane evals.
# * the 6 C_TEX metas (small exact ints) bit-pack into 3 u32 words, carried
#   as BITCAST f32 planes (selects are bitwise moves). Bit 30 is set as a
#   bias so every pattern is a normal f32 (magnitude in [2, 4)): no
#   flush-to-zero or NaN-canonicalization hazard can touch the payload.
#   The epilogue unpacks them back to exact small-int f32 planes.
#
# The gathered (oracle) kernels read (T, 48) fat rows that have no packed
# columns, so they carry the 6 tex metas raw plus the same 9 gradient/
# denominator planes; both variants feed one shared reconstruction epilogue,
# keeping the public (attrs 6, metas 13, inv) contract bit-identical across
# stream/gathered (the equivalence tests compare them with
# assert_array_equal).
N_NUMS = 4  # kernel-interpolated attribute planes: light_num, r, g, b
# gathered kernels: meta columns read straight off the 48-col fat row
#   [C_TEX x6, C_GRAD x6, den_c, nu_c (col 29 = pc[4]), nv_c (col 30)]
GMETA_COLS = tuple(range(31, 44)) + (29, 30)
N_GMETA = len(GMETA_COLS)  # 15
# stream kernels: 3 packed tex words (stream-row cols 48-50, built by
# _prep_stream_rows) + the 9 gradient/denominator planes + nu_c/nv_c copies
# at cols 51-52
SMETA_COLS = (48, 49, 50, 37, 38, 39, 40, 41, 42, 43, 51, 52)
N_SMETA = len(SMETA_COLS)  # 12
_PACK_BIAS = 1 << 30  # keeps packed bit patterns in normal-f32 range


def _unpack2(plane):
    """One packed-word f32 plane -> (hi, lo) exact small-int f32 planes."""
    w = jax.lax.bitcast_convert_type(plane, jnp.int32)
    hi = ((w >> 16) & 0x3FFF).astype(jnp.float32)  # mask strips _PACK_BIAS
    lo = (w & 0xFFFF).astype(jnp.float32)
    return hi, lo


def _edge_bound(a, b):
    """Scalar coverage bound for one edge plane (top-left fill rule).

    cov = (c > 0) | ((c == 0) & top_left)  collapses to ONE vector compare
    c >= bound with bound = 0 for top-left edges and FLT_MIN otherwise:
    c >= FLT_MIN <=> c > 0 exactly on TPU, because its float math flushes
    subnormals to zero, so no edge value lands strictly inside
    (0, FLT_MIN). (In interpret mode on CPU, subnormal edge values exist
    in principle and would diverge; they require degenerate ~1e-38-scale
    edge coefficients no real scene produces.) The streaming kernels use
    this; the gathered oracle kernels keep the explicit 3-op form, and the
    equivalence tests pin the two bit-for-bit against each other.
    """
    tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
    return jnp.where(tl, jnp.float32(0.0), jnp.float32(_FLT_MIN))


_EMPTY_AABB = (-1.0, -1.0, -2.0, -2.0)
_UNROLL = 4  # raster inner-loop unroll (hides scalar-load latency)


def pad_tris(n: int) -> int:
    return cdiv(n, CHUNK) * CHUNK


def pad_for_raster(packed, aabb, valid):
    """Pad triangle arrays to a CHUNK multiple with inert rows.

    Padding rows get zero edge planes (never covered: zero edge value with a
    false top-left flag) and the canonical empty AABB (binned nowhere).
    """
    T = packed.shape[0]
    Tp = pad_tris(T)
    if Tp != T:
        packed = jnp.pad(packed, ((0, Tp - T), (0, 0)))
        empty = jnp.broadcast_to(jnp.asarray(_EMPTY_AABB, aabb.dtype), (Tp - T, 4))
        aabb = jnp.concatenate([aabb, empty], axis=0)
        valid = jnp.pad(valid, (0, Tp - T))
    return packed, aabb, valid


def spatial_sort(aabb, valid, *payloads, order=None):
    """Reorder triangles along a Hilbert curve over 8-px screen cells so
    CHUNK groups get TIGHT, roughly-square chunk AABBs.

    order: an optional precomputed permutation (from sort_order) — the
    key build + argsort are skipped and only the cheap payload permute
    runs. ANY permutation renders correctly (binning re-derives overlap
    from the permuted AABBs each frame); a stale one only loosens chunk
    locality. Reusing a frame-0 permutation across the bench scan
    measured a net LOSS (~0.2 ms/frame over a 6.8 deg yaw sweep — the
    locality decay outweighs the argsort saving, tools/ab_sorthoist.py),
    so the product paths keep the per-frame sort; this hook serves the
    A/B and any future caller with a truly static camera.

    Submission order groups triangles by mesh (a cube = 12 tris), so CHUNK=8
    chunks straddle primitives and their AABBs span whole tiles — measured
    9+ tile hits per chunk on the demo scene. A band-major key
    (floor(ymin)>>3, floor(xmin)>>5) was the round-3 first cut (bin entries
    -35%, raster 35.1 -> 24.0 ms demo); space-filling curves beat it again
    because chunks become 2D-local blobs instead of 180-px-wide bands:
    entries drop another ~13% and live (truly tile-overlapping) triangles
    per bin entry rise 54% -> 62/66%. Isolated full pass (tools/
    ab_kernel.py, demo/stress ms): band 11.31/24.92, morton 10.02/21.33,
    **hilbert 9.85/20.97** (no diagonal jumps — the best and the default),
    morton2 (4-px cells) 11.03/30.69. RASTER_SORT=band|morton|hilbert
    selects for A/B; the key build itself is ~0.1 ms of XLA elementwise.
    Safe for depth-tested opaque geometry: the
    result is order-independent except exact z-ties (the GPU's raster has
    no submission-order guarantee between overlapping equal-z fragments
    either). The sort is stable, so same-cell triangles keep submission
    order. Invalid triangles sort to the end (their chunks bin nowhere).

    Returns (aabb, valid, *payloads) all reordered by the same permutation.
    """
    if order is None:
        order = sort_order(aabb, valid)
    return (aabb[order], valid[order]) + tuple(p[order] for p in payloads)


def sort_order(aabb, valid):
    """The spatial-sort permutation alone (see spatial_sort)."""
    y0 = jnp.floor(aabb[:, 1]).astype(jnp.int32)
    x0 = jnp.floor(aabb[:, 0]).astype(jnp.int32)
    _mode = _os_mod.environ.get("RASTER_SORT", SORT_MODE)
    if _mode.startswith("morton"):
        shift = int(_mode[6:] or 3)  # morton / morton2 / morton4 ...
        def _spread(v):  # 12 -> 24 bit spread (x|y cells up to 4096)
            v = (v | (v << 8)) & 0x00F00F
            v = (v | (v << 4)) & 0x0C30C3
            return (v | (v << 2)) & 0x249249
        cx = jnp.clip(x0 >> shift, 0, 4095)
        cy = jnp.clip(y0 >> shift, 0, 4095)
        key = _spread(cx) | (_spread(cy) << 1)
    elif _mode == "hilbert":
        n = 12  # 4096 cells
        x = jnp.clip(x0 >> 3, 0, 4095)
        y = jnp.clip(y0 >> 3, 0, 4095)
        key = jnp.zeros_like(x)
        for i in range(n - 1, -1, -1):
            s = jnp.int32(1 << i)
            rx = ((x & s) > 0).astype(jnp.int32)
            ry = ((y & s) > 0).astype(jnp.int32)
            key = key + s * s * ((3 * rx) ^ ry)
            # rotate quadrant
            swap = ry == 0
            fx = jnp.where(swap & (rx == 1), s - 1 - x, x)
            fy = jnp.where(swap & (rx == 1), s - 1 - y, y)
            x = jnp.where(swap, fy, fx)
            y = jnp.where(swap, fx, fy)
    elif _mode == "bandserp":
        # tile-row-aligned serpentine: 32-px band major (the raster tile
        # height), x-cell minor with a snaked 8-px y inside the band, so
        # chunks rarely straddle tile rows (A/B candidate vs hilbert)
        band = jnp.clip(y0 >> 5, 0, (1 << 15) - 1)
        xc = jnp.clip(x0 >> 3, 0, 4095)
        yl = jnp.clip((y0 >> 3) & 3, 0, 3)
        ys = jnp.where((xc & 1) == 1, 3 - yl, yl)
        key = (band << 14) | (xc << 2) | ys
    else:  # band-major round-3 key, kept for A/B comparison
        key = (jnp.clip(y0 >> 3, 0, (1 << 20) - 1) * 1024
               + jnp.clip(x0 >> 5, 0, 1023))
    key = jnp.where(valid, key, jnp.int32(2 ** 31 - 1))
    return jnp.argsort(key)  # stable: same-band keeps submission order


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


def group_aabbs(aabb, valid):
    """(T,4) per-tri AABBs -> (T/GROUP, 4) skip-group AABBs (+ validity).

    Group i of chunk c covers triangles [c*CHUNK + i*GROUP, ... + GROUP);
    feeding these to bin_triangles_full produces per-entry gmask bits the
    stream raster uses to skip dead sub-blocks (see GROUP above)."""
    T = aabb.shape[0]
    assert T % GROUP == 0
    a = aabb.reshape(-1, GROUP, 4)
    v = valid.reshape(-1, GROUP)
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


def _dense_sorted_hits(aabb, valid, *, tiles_x: int, tiles_y: int,
                       tile_w: int, tile_h: int):
    """Dense (n_tiles, T) AABB-overlap matrix compacted by a row-wise sort.

    Hits keep their slot id (submission order); misses sort behind as
    T + slot. Returns (key_sorted (n_tiles, T) i32, counts (n_tiles,) i32
    exact per-tile hit counts). Shared by bin_triangles (capped) and
    bin_triangles_full (uncapped).

    (A per-entry row-window payload — each entry's 8-row-aligned tile
    sub-band, letting the raster evaluate only that band — was built and
    measured a net LOSS: even after spatial_sort, 95%+ of chunk AABBs span
    the full 32-row tile on both bench scenes, and the per-entry
    lax.switch cost ~4%. Tightening bin entries via spatial_sort is the
    lever that works; see tools/ab_kernel.py.)
    """
    T = aabb.shape[0]
    n_tiles = tiles_x * tiles_y
    packed = _pack_tile_aabb(aabb, tiles_x, tiles_y, tile_w, tile_h)
    hit = valid[None, :] & _tile_overlap(packed, tiles_x, tiles_y)
    counts = jnp.sum(hit.astype(jnp.int32), axis=1)
    if T < 32767:
        # the row-wise sort dominates binning cost and scales with key
        # bytes: chunk ids fit i16 for scenes under ~262k triangles, so
        # sort half-width keys (misses all collapse to 32767 — their order
        # is irrelevant, every consumer masks slots beyond counts)
        slot = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int16)[None, :],
                                (n_tiles, T))
        key = jnp.where(hit, slot, jnp.int16(32767))
        return jax.lax.sort(key, dimension=1).astype(jnp.int32), counts
    slot = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                            (n_tiles, T))
    key = jnp.where(hit, slot, slot + T)
    return jax.lax.sort(key, dimension=1), counts


def _tile_overlap(packed, tiles_x: int, tiles_y: int):
    """(n,) packed tile-coord AABBs -> (n_tiles, n) bool overlap matrix."""
    n_tiles = tiles_x * tiles_y
    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = (tiles % tiles_x)[:, None]
    ty = (tiles // tiles_x)[:, None]
    x0 = (packed & 0xFF)[None, :]
    y0 = ((packed >> 8) & 0xFF)[None, :]
    x1 = ((packed >> 16) & 0xFF)[None, :]
    y1 = ((packed >> 24) & 0xFF)[None, :]
    return ((x0 <= x1)
            & (x0 <= tx) & (x1 >= tx) & (y0 <= ty) & (y1 >= ty))


def _dense_sorted_entries(aabb, valid, gaabb, gvalid, *, tiles_x: int,
                          tiles_y: int, tile_w: int, tile_h: int):
    """Packed-entry variant of _dense_sorted_hits for the stream kernels.

    Returns (entry_sorted (n_tiles, T) i32, counts) where a live entry is
    cid << ENTRY_SHIFT | gmask. With gaabb/gvalid (GROUP-granular boxes from
    group_aabbs), gmask marks which sub-groups overlap the tile and entries
    whose gmask would be 0 are dropped entirely — a strictly tighter bin
    than the chunk-union test (the union box can overlap tiles that sit in
    a gap between the member groups). Without them, every binned entry
    carries ENTRY_GMASK_ALL (no skips, identical raster behavior).

    The i16 sort fast path needs T * 16 + 15 < 32767, i.e. <= 2047 chunks
    (~65k triangles at CHUNK=32); larger scenes pay an i32 row sort.
    """
    T = aabb.shape[0]
    n_tiles = tiles_x * tiles_y
    if gaabb is None:
        packed = _pack_tile_aabb(aabb, tiles_x, tiles_y, tile_w, tile_h)
        hit = valid[None, :] & _tile_overlap(packed, tiles_x, tiles_y)
        gm = jnp.where(hit, jnp.int32(ENTRY_GMASK_ALL), 0)
    else:
        assert gaabb.shape[0] == T * N_GROUPS
        pg = _pack_tile_aabb(gaabb, tiles_x, tiles_y, tile_w, tile_h)
        pg = pg.reshape(T, N_GROUPS)
        gv = gvalid.reshape(T, N_GROUPS)
        gm = jnp.zeros((n_tiles, T), jnp.int32)
        for g in range(N_GROUPS):
            hg = gv[None, :, g] & _tile_overlap(pg[:, g], tiles_x, tiles_y)
            gm = gm | (hg.astype(jnp.int32) << g)
    hit = gm > 0
    counts = jnp.sum(hit.astype(jnp.int32), axis=1)
    if (T << ENTRY_SHIFT) + ENTRY_GMASK_ALL < 32767:
        slot = jnp.arange(T, dtype=jnp.int16)[None, :] << ENTRY_SHIFT
        key = jnp.where(hit, slot + gm.astype(jnp.int16), jnp.int16(32767))
        return jax.lax.sort(key, dimension=1).astype(jnp.int32), counts
    slot = jnp.arange(T, dtype=jnp.int32)[None, :] << ENTRY_SHIFT
    key = jnp.where(hit, slot + gm, jnp.int32(1) << 30)
    return jax.lax.sort(key, dimension=1), counts


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "bin_cap"),
)
def bin_triangles(aabb, valid, *, tiles_x: int, tiles_y: int, tile_w: int,
                  tile_h: int, bin_cap: int):
    """Build per-tile bins from AABBs (normally *chunk* AABBs).

    DENSE formulation: a broadcast (n_tiles, T) AABB-overlap test followed by
    a row-wise single-array sort for compaction. No gathers, no global sort,
    no entry budget — the old cumsum/searchsorted expansion needed a 1D sort
    over an entry_cap-sized array (slow on TPU: a global sort vectorizes ~
    100x worse than row-wise) plus escalation when entries overflowed. The
    hit matrix is bound by n_tiles * n_chunks which stays small because items
    are CHUNK-triangle groups.

    Returns (bins (n_tiles, bin_cap) i32 item ids padded with -1,
             counts (n_tiles,) i32 — clamped to bin_cap,
             overflow () i32 — total entries dropped beyond bin_cap).
    """
    T = aabb.shape[0]
    key_sorted, full_counts = _dense_sorted_hits(
        aabb, valid, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tile_w, tile_h=tile_h)
    eff_cap = min(bin_cap, T)
    counts = jnp.minimum(full_counts, eff_cap)
    in_bin = jnp.arange(eff_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    bins = jnp.where(in_bin, key_sorted[:, :eff_cap], NO_TRI)
    if eff_cap < bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap - eff_cap)),
                       constant_values=NO_TRI)
    overflow = jnp.sum(full_counts - counts)
    return bins, counts, overflow


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def bin_triangles_full(aabb, valid, *, tiles_x: int, tiles_y: int,
                       tile_w: int, tile_h: int, gaabb=None, gvalid=None):
    """Dense binning with NO capacity: every (tile, item) overlap is kept.

    Same dense broadcast-overlap + row-wise-sort as bin_triangles, but the
    output keeps the full sorted width (padded to a multiple of 8): nothing
    can ever overflow or drop. The capacity bound moves into the raster's
    slab loop (rasterize_fused_slabs), which walks the wide bins in
    fixed-width slabs — so the escalate-and-redraw dance is gone
    structurally. The reference's pipeline has no capacity cliff either
    (vkCmdDrawIndexed, vk_engine.cpp:1453).

    Memory envelope: the dense bins are n_tiles x n_chunks i32 (+ the same
    in sort keys, i16 under 2047 chunks / ~65k tris since the gmask pack
    took 4 key bits; i32 beyond) — ~24 MB per million triangles at
    1080p/32x128 tiles, HBM-resident through the slab walk. A 50M-triangle
    frame would reach ~1.2 GB; scenes of that class should raster through
    the capped bin_triangles + engine cap-escalation path instead
    (config.fused = False).

    gaabb/gvalid: optional group_aabbs output; adds real per-entry gmask
    bits (and drops entries no group touches). Without them every entry
    packs ENTRY_GMASK_ALL.

    Returns (bins (n_tiles, Wp) i32 PACKED entries cid << 4 | gmask,
             padded with -1; counts (n_tiles,) i32 — exact, never clamped).
    """
    T = aabb.shape[0]
    key_sorted, counts = _dense_sorted_entries(
        aabb, valid, gaabb, gvalid, tiles_x=tiles_x, tiles_y=tiles_y,
        tile_w=tile_w, tile_h=tile_h)
    in_bin = jnp.arange(T, dtype=jnp.int32)[None, :] < counts[:, None]
    bins = jnp.where(in_bin, key_sorted, NO_TRI)
    Tp = cdiv(T, 8) * 8
    if Tp != T:
        bins = jnp.pad(bins, ((0, 0), (0, Tp - T)), constant_values=NO_TRI)
    return bins, counts


def full_bins(n_chunks: int, n_tiles: int, bin_cap: int):
    """Trivial binning: every tile tests every chunk (small scenes/tests)."""
    assert bin_cap >= n_chunks
    slot = np.arange(bin_cap, dtype=np.int32)
    row = np.where(slot < n_chunks, slot, NO_TRI)
    bins = jnp.asarray(np.broadcast_to(row, (n_tiles, bin_cap)).copy())
    counts = jnp.full((n_tiles,), n_chunks, jnp.int32)
    return bins, counts


def _pack_tile_aabb(aabb, tiles_x: int, tiles_y: int, tile_w: int, tile_h: int):
    """Per-triangle tile-coordinate AABB packed into one u32
    (tx0 | ty0<<8 | tx1<<16 | ty1<<24). Empty AABBs pack to tx0 > tx1.
    Requires tiles_x, tiles_y <= 255 (true for any <32k-wide framebuffer).
    """
    tx0 = jnp.clip(jnp.floor(aabb[:, 0] / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(aabb[:, 1] / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    tx1 = jnp.floor(aabb[:, 2] / tile_w).astype(jnp.int32)
    ty1 = jnp.floor(aabb[:, 3] / tile_h).astype(jnp.int32)
    empty = (aabb[:, 2] < aabb[:, 0]) | (aabb[:, 3] < aabb[:, 1]) | (tx1 < 0) | (ty1 < 0)
    tx1 = jnp.clip(tx1, 0, tiles_x - 1)
    ty1 = jnp.clip(ty1, 0, tiles_y - 1)
    # empty: force tx0 > tx1 so no tile matches
    tx0 = jnp.where(empty, 1, tx0)
    tx1 = jnp.where(empty, 0, tx1)
    return tx0 | (ty0 << 8) | (tx1 << 16) | (ty1 << 24)


def expand_bins(chunk_bins, chunk_counts):
    """Chunk bins -> per-triangle bins WITHOUT the tightening pass.

    For small triangle sets the refine stage costs more than letting the
    raster loop evaluate the few extra misses; this just expands each binned
    chunk to its CHUNK member ids (order preserved).
    """
    n_tiles, bcap = chunk_bins.shape
    tri = jnp.where(chunk_bins >= 0, chunk_bins, 0)[:, :, None] * CHUNK \
        + jnp.arange(CHUNK, dtype=jnp.int32)[None, None, :]
    tri = tri.reshape(n_tiles, bcap * CHUNK)
    slot_ok = jnp.repeat(chunk_bins >= 0, CHUNK, axis=1)
    return jnp.where(slot_ok, tri, NO_TRI), chunk_counts * CHUNK


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "tri_cap"),
)
def refine_bins(chunk_bins, aabb, *, tiles_x: int, tiles_y: int,
                tile_w: int, tile_h: int, tri_cap: int):
    """Chunk bins -> tight per-TRIANGLE bins, entirely in XLA (no sort).

    For every (tile, binned chunk) pair, test the CHUNK member triangles'
    AABBs against the tile's pixel-center bounds, then compact each tile's
    hits with a cumsum + searchsorted gather. Dead/culled triangles have
    empty AABBs and drop out here, so the raster loop sees only real work.

    Returns (tri_bins (n_tiles, tri_cap) i32, tri_counts (n_tiles,) i32,
             overflow () i32).
    """
    n_tiles, bcap = chunk_bins.shape
    T = aabb.shape[0]
    ncand = bcap * CHUNK

    tri = jnp.where(chunk_bins >= 0, chunk_bins, 0)[:, :, None] * CHUNK \
        + jnp.arange(CHUNK, dtype=jnp.int32)[None, None, :]
    tri = tri.reshape(n_tiles, ncand)
    slot_ok = jnp.repeat(chunk_bins >= 0, CHUNK, axis=1)

    # One ROW gather per chunk slot (gathers cost ~tens of ns per index
    # regardless of width, so fetching all CHUNK packed tile-AABB words of a
    # chunk in one row beats per-candidate element gathers CHUNKx).
    packed_tc = _pack_tile_aabb(aabb, tiles_x, tiles_y, tile_w, tile_h)
    chunk_rows = packed_tc.reshape(-1, CHUNK)          # (T/CHUNK, CHUNK)
    safe_chunks = jnp.clip(chunk_bins, 0, chunk_rows.shape[0] - 1)
    cand = chunk_rows[safe_chunks].reshape(n_tiles, ncand)

    tile_id = jnp.arange(n_tiles, dtype=jnp.int32)
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    ctx0 = cand & 0xFF
    cty0 = (cand >> 8) & 0xFF
    ctx1 = (cand >> 16) & 0xFF
    cty1 = (cand >> 24) & 0xFF
    hit = (slot_ok
           & (ctx0 <= tx[:, None]) & (ctx1 >= tx[:, None])
           & (cty0 <= ty[:, None]) & (cty1 >= ty[:, None])
           & (ctx0 <= ctx1))

    full_counts = jnp.sum(hit.astype(jnp.int32), axis=1)
    eff_cap = min(tri_cap, ncand)  # can't hold more than the candidate set
    counts = jnp.minimum(full_counts, eff_cap)

    # Compaction by ROW-WISE sort (vectorizes across tiles — unlike a global
    # 1D sort, and unlike per-(tile,slot) gather chains, this is pure vector
    # work). Candidate tri ids are ascending within a tile (bin_triangles
    # emits chunk ids in ascending = submission order), so sorting the tri
    # id itself keeps submission order AND needs only ONE sorted array
    # (half the sort bandwidth of a (key, value) pair): misses sort behind
    # every real id via a large offset.
    slot = jnp.broadcast_to(jnp.arange(ncand, dtype=jnp.int32)[None, :], tri.shape)
    key = jnp.where(hit, tri, jnp.int32(1 << 29) + slot)
    key_sorted = jax.lax.sort(key, dimension=1)

    in_bin = jnp.arange(eff_cap, dtype=jnp.int32)[None, :] < counts[:, None]
    tri_bins = jnp.where(in_bin, key_sorted[:, :eff_cap], NO_TRI)
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


def _raster_kernel(counts_ref, rows_ref, ids_ref, z_ref, tid_ref, *,
                   tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    X, Y = _tile_coords(i, j, tile_h, tile_w)

    def tri_body(k4, carry):
        z, tid = carry
        # unrolled x4 so the dependent scalar loads of later triangles
        # overlap the vector work of earlier ones
        for u in range(_UNROLL):
            k = k4 * _UNROLL + u
            # dynamic *sublane* scalar reads (static lane index) — the only
            # dynamic-index form Mosaic lowers from VMEM
            r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
            cov = (_edge_cov(r(0), r(1), r(2), X, Y)
                   & _edge_cov(r(3), r(4), r(5), X, Y)
                   & _edge_cov(r(6), r(7), r(8), X, Y))
            zv = r(9) * X + r(10) * Y + r(11)
            # Near/far "clip": z outside [0,1] rejected per pixel (exact
            # equivalent of clip z in [0, w] for the w>0 half-space).
            cov &= (zv >= 0.0) & (zv <= 1.0)
            # Reversed-Z GREATER_OR_EQUAL (vk_engine.cpp:1659); ties resolve
            # to the later triangle (bins are in submission order).
            take = cov & (zv >= z) & (k < n)
            z = jnp.where(take, zv, z)
            tid = jnp.where(take, ids_ref[0, k, 0], tid)
        return z, tid

    z0 = jnp.full((tile_h, tile_w), DEPTH_CLEAR, jnp.float32)
    tid0 = jnp.full((tile_h, tile_w), NO_TRI, jnp.int32)
    n4 = (n + _UNROLL - 1) // _UNROLL
    z1, tid1 = jax.lax.fori_loop(0, n4, tri_body, (z0, tid0))
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
    bin_cap_pad = cdiv(bin_cap, 8) * 8  # sublane alignment
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    # Per-tile setup rows, gathered in XLA: each tile's Pallas block is a
    # dense (bin_cap, 16) VMEM slab read with dynamic-sublane scalar loads.
    # (A (T,16) table in VMEM would lane-pad 16 -> 128 and blow VMEM.)
    safe = jnp.clip(bins, 0, T - 1)
    rows = packed[safe]                               # (n_tiles, bin_cap, 16)
    ids = bins[:, :, None]                            # (n_tiles, bin_cap, 1)

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
            pl.BlockSpec((1, bin_cap, 16),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bin_cap, 1),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), rows, ids)
    return z, tid


# ---------------------------------------------------------------------------
# Transparent pass: depth-peel raster (depth test vs opaque z, no write)
# ---------------------------------------------------------------------------

ID_INF = 0x7FFFFFF  # "no fragment" marker (> any triangle id)


def _peel_kernel(counts_ref, rows_ref, ids_ref, zbase_ref,
                 last_ref, out_ref, *, tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    X, Y = _tile_coords(i, j, tile_h, tile_w)

    zbase = zbase_ref[:, :]
    last = last_ref[:, :]

    def tri_body(k, best):
        idx = ids_ref[0, k, 0]
        r = lambda col: rows_ref[0, k, col]  # noqa: E731
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
    bin_cap_pad = cdiv(bin_cap, 8) * 8
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    safe = jnp.clip(bins, 0, T - 1)
    rows = packed[safe]
    ids = bins[:, :, None]

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    return pl.pallas_call(
        functools.partial(_peel_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bin_cap, 16),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bin_cap, 1),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), rows, ids, z_base, last_id)


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


# ---------------------------------------------------------------------------
# Fused raster: visibility + attribute interpolation in one pass.
# Eliminates the per-pixel fat-row gather of the deferred path: per-triangle
# scalars are read once per (triangle, tile) instead of once per pixel.
# Consumes the 48-col fat rows built by kernels/shade.build_shade_rows.
# ---------------------------------------------------------------------------


def _raster_fused_kernel(counts_ref, rows_ref, z_ref, tid_ref, num_ref,
                         meta_ref, *,
                         tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    X, Y = _tile_coords(i, j, tile_h, tile_w)

    # ids are implicit: the caller stores the global tri id in column 47
    def rows_ids_global(k):
        return rows_ref[0, k, 47].astype(jnp.int32)

    def tri_body(k4, carry):
        z, tid, nums, metas = carry
        takes = []
        for u in range(_UNROLL):
            k = k4 * _UNROLL + u
            r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
            c0v = r(0) * X + r(1) * Y + r(2)
            c1v = r(3) * X + r(4) * Y + r(5)
            c2v = r(6) * X + r(7) * Y + r(8)
            tl0 = (r(0) > 0.0) | ((r(0) == 0.0) & (r(1) > 0.0))
            tl1 = (r(3) > 0.0) | ((r(3) == 0.0) & (r(4) > 0.0))
            tl2 = (r(6) > 0.0) | ((r(6) == 0.0) & (r(7) > 0.0))
            cov = (((c0v > 0.0) | ((c0v == 0.0) & tl0))
                   & ((c1v > 0.0) | ((c1v == 0.0) & tl1))
                   & ((c2v > 0.0) | ((c2v == 0.0) & tl2)))
            zv = r(9) * X + r(10) * Y + r(11)
            cov &= (zv >= 0.0) & (zv <= 1.0)
            take = cov & (zv >= z) & (k < n)
            z = jnp.where(take, zv, z)
            tid = jnp.where(take, rows_ids_global(k), tid)
            takes.append(take)

        # The attribute block (4 numerator-plane evals + 15 meta selects)
        # only runs when at least one of the _UNROLL triangles won a pixel.
        # One any() reduce + branch per GROUP keeps the skip overhead small
        # on winner-dense tiles while overdraw-heavy tiles (most candidates
        # lose the depth test) pay per WINNER-GROUP instead of per candidate.
        group_any = takes[0]
        for t in takes[1:]:
            group_any = group_any | t

        def attr_taken(args):
            nums, metas = args
            for u in range(_UNROLL):
                k = k4 * _UNROLL + u
                r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
                take = takes[u]
                new_nums = []
                for a in range(N_NUMS):
                    num = r(13 + a) * X + r(19 + a) * Y + r(25 + a)
                    new_nums.append(jnp.where(take, num, nums[a]))
                nums = tuple(new_nums)
                metas = tuple(
                    jnp.where(take, r(col), metas[m])
                    for m, col in enumerate(GMETA_COLS))
            return nums, metas

        nums, metas = jax.lax.cond(
            jnp.any(group_any), attr_taken, lambda args: args,
            (nums, metas))
        return z, tid, nums, metas

    z0 = jnp.full((tile_h, tile_w), DEPTH_CLEAR, jnp.float32)
    tid0 = jnp.full((tile_h, tile_w), NO_TRI, jnp.int32)
    nums0 = tuple(jnp.zeros((tile_h, tile_w), jnp.float32)
                  for _ in range(N_NUMS))
    metas0 = tuple(jnp.zeros((tile_h, tile_w), jnp.float32)
                   for _ in range(N_GMETA))
    n4 = (n + _UNROLL - 1) // _UNROLL
    z1, tid1, nums1, metas1 = jax.lax.fori_loop(
        0, n4, tri_body, (z0, tid0, nums0, metas0))
    z_ref[:, :] = z1
    tid_ref[:, :] = tid1
    for a in range(N_NUMS):
        num_ref[a, :, :] = nums1[a]
    for m in range(N_GMETA):
        meta_ref[m, :, :] = metas1[m]


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_fused(fat_rows, bins, counts, *, tiles_x: int, tiles_y: int,
                    tile_w: int, tile_h: int):
    """Fused visibility + attribute raster.

    fat_rows: (T, 48) f32 (kernels/shade fat-row layout; column 47 is free
    and gets the global triangle id here).
    Returns (z, tid, attrs (N_ATTR,Hp,Wp) interpolated, meta (N_META,Hp,Wp),
    inv (Hp,Wp) = 1/den for the analytic uv gradients).
    """
    T = fat_rows.shape[0]
    n_tiles, bin_cap = bins.shape
    bin_cap_pad = cdiv(bin_cap, 8) * 8
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    fat_rows = fat_rows.at[:, 47].set(
        jnp.arange(T, dtype=jnp.int32).astype(jnp.float32))
    safe = jnp.clip(bins, 0, T - 1)
    rows = fat_rows[safe]
    # dead slots: make ids harmless (they are masked by counts anyway)

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    state = pl.pallas_call(
        functools.partial(_raster_fused_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((N_NUMS, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((N_GMETA, hp, wp), jnp.float32),
        ),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bin_cap, 48),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_NUMS, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GMETA, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ),
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), rows)
    return _gathered_to_outputs(state)


BIN_LANES = 8  # lanes per bins-block sublane row (see _pack_bins_cols)


def _pack_bins_cols(bins):
    """(n_tiles, W) bin lists -> (n_tiles, G, BIN_LANES), COLUMN-major.

    Entry e of a tile's list lives at [e % G... precisely: lane column l
    holds entries [l*G, (l+1)*G), so element [g, l] is entry l*G + g. Two
    reasons for this shape:

    * a (1, W, 1) VMEM/SMEM block pads its trailing dim 1 -> 128 lanes
      (measured: a 5608-entry block became a 5.7 MB window — 2 ms/frame
      of pure block fill); (G, BIN_LANES) keeps the padding 16x smaller.
    * Mosaic scalar reads need a STATIC lane index ("cannot statically
      prove index is a multiple of 128"), so the kernel walks one lane
      COLUMN at a time (static l, dynamic sublane g) — column-major makes
      each column a contiguous span of the sorted entry order.
    """
    n_tiles, W = bins.shape
    G = cdiv(cdiv(W, BIN_LANES), 8) * 8
    pad = G * BIN_LANES - W
    if pad:
        bins = jnp.pad(bins, ((0, 0), (0, pad)))
    return bins.reshape(n_tiles, BIN_LANES, G).transpose(0, 2, 1)


NBUF = int(_os_mod.environ.get("RASTER_NBUF", "4"))
assert NBUF & (NBUF - 1) == 0  # power of 2: slot index is a bitwise AND
# chunk-stream scratch slots: NBUF - 1 copies in flight hide the HBM
#           latency that a 2-slot double buffer only covers while a chunk's
#           compute exceeds the copy latency (it barely does at CHUNK=8)


def _walk_bins_cols(counts_ref, bins_ref, rows_hbm, scratch_ref, sem_ref,
                    tile, eval_entry, state, stride=STREAM_ROWS, pred=None):
    """Walk a tile's column-major chunk bins, streaming the per-chunk
    fat-row DMA (HBM -> VMEM scratch) through an NBUF-slot rotating window
    (NBUF - 1 copies in flight ahead of the chunk being rasterized).
    eval_entry(entry, base, carry) -> carry rasterizes one chunk staged at
    scratch rows [base, base+stride) (stride = sublane rows per chunk
    block: CHUNK for full fat rows, 1 for the compact visibility rows).
    Entries are PACKED (cid << ENTRY_SHIFT | gmask, see bin_triangles_full);
    the walk decodes the cid for the DMA source and hands eval_entry/pred
    the raw entry.

    pred(entry) -> bool, if given, gates BOTH the copy start and the
    wait+eval of an entry on the same deterministic predicate (it must
    depend only on kernel state that the walk never mutates — phase B's
    winner test reads phase A's tid input), so an entry whose copy was
    skipped is never waited on. Gated eval_entry must write refs (its
    carry is passed through unchanged).

    The walk order is the sorted entry order; entry e lives at lane column
    e // G, sublane e % G (see _pack_bins_cols), and only the LAST nonempty
    column is partial, so column l covers entries [l*G, l*G + cnt_l) with
    cnt_l = clip(n - l*G, 0, G). Entry e uses scratch slot e % NBUF; the
    body for entry e prefetches entry e + NBUF - 1, which sits at most one
    lane column ahead (NBUF - 1 < G always), so the dynamic-column reach is
    a single static l+1 — the same reach the old double buffer needed.
    Slot reuse is safe: entry e's copy starts at body e - NBUF + 1, after
    body e - NBUF (the slot's previous user) finished evaluating.
    """
    n = counts_ref[tile, 0]
    G = bins_ref.shape[1]
    assert NBUF - 1 < G

    def copy(g, l, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[bins_ref[0, g, l] >> ENTRY_SHIFT],
            scratch_ref.at[pl.ds(slot * stride, stride)],
            sem_ref.at[slot])

    def gate(cond, g, l):
        # clamped read: the g index may exceed the guard range; cond is
        # False there, so the garbage cid only feeds a dead predicate
        if pred is None:
            return cond
        return cond & pred(bins_ref[0, jnp.clip(g, 0, G - 1), l])

    # prologue: fill the pipeline with the first NBUF - 1 entries (all in
    # column 0: NBUF - 1 < G)
    for k in range(NBUF - 1):
        @pl.when(gate(k < n, k, 0))
        def _(k=k):
            copy(k, 0, k % NBUF).start()

    for l in range(BIN_LANES):
        cnt = jnp.clip(n - l * G, 0, G)

        def body(g, carry, l=l):
            e = l * G + g
            pf = g + NBUF - 1          # prefetch target, local to column l
            # bitwise AND, not lax.rem: the scalar integer divide sits on
            # the walk's per-entry critical path
            slot_t = (e + NBUF - 1) & (NBUF - 1)

            @pl.when(gate((pf < G) & (l * G + pf < n), pf, l))
            def _():
                copy(pf, l, slot_t).start()

            if l + 1 < BIN_LANES:
                @pl.when(gate((pf >= G) & (l * G + pf < n),
                              pf - G, l + 1))
                def _():
                    copy(pf - G, l + 1, slot_t).start()

            slot = e & (NBUF - 1)
            if pred is None:
                copy(g, l, slot).wait()
                return eval_entry(bins_ref[0, g, l], slot * stride, carry)
            entry = bins_ref[0, g, l]

            @pl.when(pred(entry))
            def _():
                copy(g, l, slot).wait()
                eval_entry(entry, slot * stride, carry)
            return carry

        state = jax.lax.fori_loop(0, cnt, body, state)
    return state


def _chunks_stream_loop(counts_ref, bins_ref, rows_hbm,
                        scratch_ref, sem_ref, refs, *, tiles_x: int,
                        tile_h: int, tile_w: int):
    """Shared chunk-streaming raster loop (fused visibility + attributes).

    Instead of an XLA-side (n_tiles, tri_cap) row gather (pays per dead slot
    and caps per-tile capacity), each tile walks its chunk-bin list and DMAs
    the chunk's CHUNK x 128-f32 row block HBM -> VMEM, double-buffered so the
    copy of chunk k+1 overlaps the raster of chunk k. The loop bound is the
    tile's REAL chunk count — empty tiles cost nothing.

    The framebuffer state (z, tid, nums x4, metas x12; nums PRE-divide —
    the perspective divide happens in XLA after the last slab, see
    rasterize_fused_slabs) lives directly in the VMEM out refs and is
    read-modify-written per chunk — measured ~6% faster than carrying the
    planes as fori_loop state through the bin walk.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    z_ref, tid_ref, nums_ref, metas_ref = refs

    # pixel-center coordinate planes, hoisted out of the walk
    yy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    X = (xx + j * tile_w).astype(jnp.float32) + jnp.float32(0.5)
    Y = (yy + i * tile_h).astype(jnp.float32) + jnp.float32(0.5)

    import os as _os
    _ABL = _os.environ.get("RASTER_ABLATION", "")

    def vis_group(base, tid_base, grp):
        """Visibility planes for skip group grp: RMW z/tid through the
        refs so groups compose sequentially (depth ties and later-wins
        semantics identical to the old whole-chunk register chain)."""
        z = z_ref[:, :]
        tid = tid_ref[:, :]
        for t in range(grp * GROUP, (grp + 1) * GROUP):
            if _ABL == "consts":
                # same vector work, zero scalar loads: isolates the cost
                # of the per-coefficient scalar VMEM reads
                r = lambda col, _t=t: jnp.float32(0.001 * (col + _t + 1))  # noqa: E731
            else:
                r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
            e0a, e0b = r(0), r(1)
            e1a, e1b = r(3), r(4)
            e2a, e2b = r(6), r(7)
            c0v = e0a * X + e0b * Y + r(2)
            c1v = e1a * X + e1b * Y + r(5)
            c2v = e2a * X + e2b * Y + r(8)
            zv = r(9) * X + r(10) * Y + r(11)
            cov = ((c0v >= _edge_bound(e0a, e0b))
                   & (c1v >= _edge_bound(e1a, e1b))
                   & (c2v >= _edge_bound(e2a, e2b))
                   & (zv <= 1.0))
            # padding rows inside a partially-valid chunk have zero edge
            # planes (never covered), so no (k < n)-style mask per tri;
            # zv >= 0 is subsumed by zv >= z (z starts at DEPTH_CLEAR=0
            # and only ever takes values that passed that test)
            take = cov & (zv >= z)
            z = jnp.where(take, zv, z)
            tid = jnp.where(take, tid_base + t, tid)
        z_ref[:, :] = z
        tid_ref[:, :] = tid

    def attr_group(base, tid_base, tid, grp):
        """Attribute planes for skip group grp. The winner test is
        tid-equality against the post-chunk tid plane — bit-identical to
        the old carried per-triangle takes (selects become disjoint; the
        final value is the chunk's last winner either way) and it lets
        each group's block RMW the refs independently."""
        nums = [nums_ref[a, :, :] for a in range(N_NUMS)]
        metas = [metas_ref[m, :, :] for m in range(N_SMETA)]
        for t in range(grp * GROUP, (grp + 1) * GROUP):
            if _ABL == "consts":
                r = lambda col, _t=t: jnp.float32(0.001 * (col + _t + 1))  # noqa: E731
            else:
                r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
            take = tid == (tid_base + t)
            for a in range(N_NUMS):
                num = r(13 + a) * X + r(19 + a) * Y + r(25 + a)
                nums[a] = jnp.where(take, num, nums[a])
            for m, col in enumerate(SMETA_COLS):
                metas[m] = jnp.where(take, r(col), metas[m])
        for a in range(N_NUMS):
            nums_ref[a, :, :] = nums[a]
        for m in range(N_SMETA):
            metas_ref[m, :, :] = metas[m]

    def eval_chunk(base, tid_base, gmask):
        if _ABL == "walk":
            z_ref[0:1, :] = jnp.full((1, z_ref.shape[1]),
                                     scratch_ref[base, 0], jnp.float32)
            return  # consume the DMA, no raster
        # per-group visibility, skipped on the entry's gmask bit: the
        # predicate is a SCALAR bit test (no vector->scalar reduce, no
        # loads) — the first skip mechanism whose gate costs ~nothing
        # (per-tri lax.cond and hierarchical-z paid for their predicates,
        # docs/PERF.md).
        if N_GROUPS == 1:
            vis_group(base, tid_base, 0)
        else:
            for grp in range(N_GROUPS):
                @pl.when(((gmask >> grp) & 1) != 0)
                def _(grp=grp):
                    vis_group(base, tid_base, grp)

        if _ABL == "vis":
            return
        # per-chunk attr skip measured: 12.5 FPS with vs 9.9 without
        # on the demo bench (whole chunks often miss a tile's pixels).
        # Chunk coverage == any pixel whose winner id is in this chunk:
        # bins walk in ascending cid order, so tid >= tid_base is exact.
        # Attributes interpolate as numerator PLANES (2 FMA each; folded
        # at setup, see shade.C_ATTR) — no dependence on the edge values,
        # so the visibility block's c planes are dead here (less VMEM
        # register pressure than the old c-weighted barycentric sums).
        tid = tid_ref[:, :]

        @pl.when(jnp.any(tid >= tid_base))
        def _():
            if N_GROUPS == 1:
                attr_group(base, tid_base, tid, 0)
            else:
                for grp in range(N_GROUPS):
                    @pl.when(((gmask >> grp) & 1) != 0)
                    def _(grp=grp):
                        attr_group(base, tid_base, tid, grp)

    def eval_entry(entry, base, carry):
        # global triangle ids are sequential within the chunk: compute
        # cid*CHUNK + t instead of loading+casting row column 47 (scalar
        # loads are not CSE'd — every column is loaded exactly once below)
        #
        # (A hierarchical-z chunk skip — conservative chunk zmax vs a
        # per-chunk jnp.min(z) reduce — was measured a net LOSS on both the
        # demo and stress scenes: the reduce + branch overhead exceeds the
        # savings under this draw order. Eval unconditionally.)
        cid = entry >> ENTRY_SHIFT
        eval_chunk(base, cid * CHUNK, entry & ENTRY_GMASK_ALL)
        return carry

    _walk_bins_cols(counts_ref, bins_ref, rows_hbm, scratch_ref,
                    sem_ref, tile, eval_entry, 0)


def _clear_state(refs, tile_h: int, tile_w: int):
    z_ref, tid_ref, nums_ref, metas_ref = refs
    z_ref[:, :] = jnp.full((tile_h, tile_w), DEPTH_CLEAR, jnp.float32)
    tid_ref[:, :] = jnp.full((tile_h, tile_w), NO_TRI, jnp.int32)
    for a in range(N_NUMS):
        nums_ref[a, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)
    for m in range(N_SMETA):
        metas_ref[m, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)


def _raster_chunks_fresh_kernel(counts_ref, bins_ref, rows_hbm,
                                z_ref, tid_ref, nums_ref, metas_ref,
                                scratch_ref, sem_ref, *,
                                tiles_x: int, tile_h: int, tile_w: int):
    """First slab: fresh framebuffer state (cleared z/tid)."""
    refs = (z_ref, tid_ref, nums_ref, metas_ref)
    _clear_state(refs, tile_h, tile_w)
    _chunks_stream_loop(counts_ref, bins_ref, rows_hbm,
                        scratch_ref, sem_ref, refs, tiles_x=tiles_x,
                        tile_h=tile_h, tile_w=tile_w)


def _raster_chunks_state_kernel(counts_ref, bins_ref, rows_hbm,
                                z_in, tid_in, nums_in, metas_in,
                                z_ref, tid_ref, nums_ref, metas_ref,
                                scratch_ref, sem_ref, *,
                                tiles_x: int, tile_h: int, tile_w: int):
    """Continuation slab: carries the previous slab's framebuffer state."""
    z_ref[:, :] = z_in[:, :]
    tid_ref[:, :] = tid_in[:, :]
    for a in range(N_NUMS):
        nums_ref[a, :, :] = nums_in[a, :, :]
    for m in range(N_SMETA):
        metas_ref[m, :, :] = metas_in[m, :, :]
    refs = (z_ref, tid_ref, nums_ref, metas_ref)
    _chunks_stream_loop(counts_ref, bins_ref, rows_hbm,
                        scratch_ref, sem_ref, refs, tiles_x=tiles_x,
                        tile_h=tile_h, tile_w=tile_w)


def _prep_stream_rows(fat_rows):
    """(T, 48) fat rows -> (C, STREAM_ROWS, ROW_PAD) HBM chunk blocks.

    The streaming kernels compute triangle ids as cid*CHUNK + t (ids are
    sequential within a chunk), so no id column is materialized here; only
    the gathered oracle kernels stamp column 47, and they do it themselves.

    Appends the stream-only carried-meta columns (see SMETA_COLS):
    cols 48-50 the 3 bias-bitcast packed C_TEX words, cols 51-52 copies of
    nu_c/nv_c (fat-row cols 29-30) so the 9-plane gradient block the kernel
    selects is one contiguous loop. The 44 used fat-row columns + 5 extras
    still fit the 64-lane half (ROW_TRIS=2 packing).
    """
    T = fat_rows.shape[0]
    ints = fat_rows[:, 31:37].astype(jnp.int32)  # bx, by, w0, h0, nl, fl
    bias = jnp.int32(_PACK_BIAS)
    packed = jax.lax.bitcast_convert_type(
        bias | (ints[:, 0::2] << 16) | ints[:, 1::2], jnp.float32)  # (T, 3)
    extra = jnp.concatenate([packed, fat_rows[:, 29:31]], axis=1)  # (T, 5)
    half = jnp.concatenate([fat_rows, extra], axis=1)
    half = jnp.pad(half, ((0, 0), (0, _HALF - half.shape[1])))
    return half.reshape(T // CHUNK, STREAM_ROWS, ROW_PAD)


def _state_shapes(hp: int, wp: int):
    return (
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),    # z
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),      # tid
        jax.ShapeDtypeStruct((N_NUMS, hp, wp), jnp.float32),  # attr nums
        jax.ShapeDtypeStruct((N_SMETA, hp, wp), jnp.float32),  # meta
    )


def _state_specs(tile_h: int, tile_w: int):
    return (
        pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((N_NUMS, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((N_SMETA, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
    )


def _stream_slab_call(ccounts, bins3, rows64, state, *, tiles_x: int,
                      tiles_y: int, tile_w: int, tile_h: int):
    """One chunk-streaming raster pass. state=None -> fresh framebuffer."""
    n_tiles, bcap = bins3.shape[:2]
    hp = tiles_y * tile_h
    wp = tiles_x * tile_w
    base_specs = [
        pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        # column-major (G, BIN_LANES) packing — see _pack_bins_cols
        pl.BlockSpec((1, bcap, BIN_LANES),
                     lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # fat rows stay in HBM
    ]
    common = dict(
        out_shape=_state_shapes(hp, wp),
        grid=(tiles_y, tiles_x),
        out_specs=_state_specs(tile_h, tile_w),
        scratch_shapes=[
            # SMEM, not VMEM: every coefficient is consumed as a SCALAR
            # broadcast (r(col) in the loops) — staging the chunk rows in
            # scalar memory makes those ~168 loads/chunk scalar-core
            # loads instead of VMEM->sreg reads (measured 20.2 -> ? ms)
            pltpu.SMEM((NBUF * STREAM_ROWS, ROW_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=use_interpret(),
    )
    if state is None:
        return pl.pallas_call(
            functools.partial(_raster_chunks_fresh_kernel, tiles_x=tiles_x,
                              tile_h=tile_h, tile_w=tile_w),
            in_specs=base_specs,
            **common,
        )(ccounts.reshape(n_tiles, 1), bins3, rows64)
    return pl.pallas_call(
        functools.partial(_raster_chunks_state_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        in_specs=base_specs + list(_state_specs(tile_h, tile_w)),
        # carry the 18 framebuffer-state planes in place
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
        **common,
    )(ccounts.reshape(n_tiles, 1), bins3, rows64, *state)


def _pixel_planes(hp: int, wp: int):
    """Full-frame pixel-center coordinate planes (f32)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(jnp.float32) \
        + jnp.float32(0.5)
    Y = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(jnp.float32) \
        + jnp.float32(0.5)
    return X, Y


def _reconstruct_outputs(nums, tex6, g9):
    """Shared fused-raster reconstruction epilogue (see the attr-block-cut
    note at N_NUMS).

    nums: (N_NUMS, Hp, Wp) pre-divide [light_num, r, g, b] numerators;
    tex6: 6 planes [base_x, base_y, w0, h0, n_levels, filter_flags];
    g9: 9 planes [nu_a, nu_b, nv_a, nv_b, den_a, den_b, den_c, nu_c, nv_c].

    Re-evaluates the winner's u/v numerator planes and the denominator at
    the pixel centers (the exact per-pixel values the kernel used to select
    with) and reassembles the public contract:
    (attrs (6,Hp,Wp) interpolated, metas (13,Hp,Wp) tex6+grad6+den_c, inv).
    Winnerless pixels have zero metas -> den 0 -> inv 0 -> attrs 0 (masked
    by tid downstream).
    """
    hp, wp = nums.shape[-2:]
    X, Y = _pixel_planes(hp, wp)
    den = g9[4] * X + g9[5] * Y + g9[6]
    inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
    u_num = g9[0] * X + g9[1] * Y + g9[7]
    v_num = g9[2] * X + g9[3] * Y + g9[8]
    attrs = jnp.concatenate([nums, u_num[None], v_num[None]]) * inv[None]
    metas = jnp.stack(list(tex6) + list(g9[:7]))
    return attrs, metas, inv


def _state_to_outputs(state):
    """Epilogue for the STREAM kernels' carried state (N_SMETA layout)."""
    z, tid, nums, metas = state
    tex6 = _unpack2(metas[0]) + _unpack2(metas[1]) + _unpack2(metas[2])
    attrs, metas_pub, inv = _reconstruct_outputs(
        nums, tex6, tuple(metas[3 + k] for k in range(9)))
    return z, tid, attrs, metas_pub, inv


def _gathered_to_outputs(state):
    """Epilogue for the GATHERED kernels' carried state (N_GMETA layout)."""
    z, tid, nums, metas = state
    attrs, metas_pub, inv = _reconstruct_outputs(
        nums, tuple(metas[k] for k in range(6)),
        tuple(metas[6 + k] for k in range(9)))
    return z, tid, attrs, metas_pub, inv


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_fused_chunks(fat_rows, cbins, ccounts, *,
                           tiles_x: int, tiles_y: int, tile_w: int,
                           tile_h: int):
    """Fused raster from CHUNK bins (no refine pass, no XLA row gather).

    fat_rows: (T, 48) f32, T % CHUNK == 0.
    cbins/ccounts: bin_triangles output over chunk AABBs (any width —
    _pack_bins_cols pads as needed).
    Returns (z, tid, attrs (N_ATTR,Hp,Wp), meta (N_META,Hp,Wp), inv).
    """
    T = fat_rows.shape[0]
    C = T // CHUNK
    rows64 = _prep_stream_rows(fat_rows)
    # capped bins carry raw chunk ids: pack with an all-live gmask
    bins3 = _pack_bins_cols(
        (jnp.clip(cbins, 0, C - 1) << ENTRY_SHIFT) | ENTRY_GMASK_ALL)
    state = _stream_slab_call(ccounts, bins3, rows64, None,
                              tiles_x=tiles_x, tiles_y=tiles_y,
                              tile_w=tile_w, tile_h=tile_h)
    return _state_to_outputs(state)


SLAB_CAP = 16384  # chunk-bin slab width (128k tris/tile/slab; the
#                   packed (G, BIN_LANES) bins block stays ~1 MB VMEM)


def _for_each_slab(bins_full, counts, C, slab_cap, run_first, run_next):
    """Shared slab walk over uncapped dense bins.

    Slices slab_cap columns at a time, packs each slice column-major, runs
    the first slab unguarded and every later slab behind one whole-frame
    lax.cond (skipped when no tile has entries there). slab_cap=None (the
    pipeline default) picks a single full-width pass for widths up to
    2*SLAB_CAP — no slicing, no guarded calls (the slicing + cond overhead
    measured ~2 ms/frame on the demo scene); pass an explicit slab_cap to
    force slab splitting (the equivalence tests exercise the carried-state
    path that way).
    """
    n_tiles, width = bins_full.shape
    assert width % 8 == 0
    if slab_cap is None:
        slab_cap = width if width <= 2 * SLAB_CAP else SLAB_CAP
    assert slab_cap % 8 == 0
    state = None
    for s in range(0, width, slab_cap):
        sbins = bins_full if slab_cap == width else bins_full[:, s:s + slab_cap]
        scounts = counts if slab_cap == width \
            else jnp.clip(counts - s, 0, sbins.shape[1])
        # entries are packed cid << ENTRY_SHIFT | gmask; clip keeps the
        # decoded DMA index in [0, C) for padding/sentinel slots
        bins3 = _pack_bins_cols(
            jnp.clip(sbins, 0, (C << ENTRY_SHIFT) - 1))
        if state is None:
            state = run_first(scounts, bins3)
        else:
            state = jax.lax.cond(
                jnp.any(scounts > 0),
                lambda st, sc=scounts, b3=bins3: run_next(sc, b3, st),
                lambda st: st,
                state)
    return state


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "slab_cap"),
)
def rasterize_fused_slabs(fat_rows, bins_full, counts, *,
                          tiles_x: int, tiles_y: int, tile_w: int,
                          tile_h: int, slab_cap: int = None):
    """Fused raster over UNCAPPED dense bins, in slabs — never drops.

    bins_full/counts: bin_triangles_full output over chunk AABBs. The wide
    sorted bins are walked slab_cap columns at a time; each slab's kernel
    carries the framebuffer state (z, tid, pre-divide attribute numerators)
    from the previous slab, and slabs past a tile's count are skipped by a
    whole-frame lax.cond (in the common case everything fits in slab 0 and
    later slabs cost one predicate). The perspective divide runs once in XLA
    after the last slab. This is the structural replacement for the old
    escalate-and-redraw overflow handling (the reference's hardware pipeline
    has no capacity cliff either, vk_engine.cpp:1453).
    """
    C = fat_rows.shape[0] // CHUNK
    rows64 = _prep_stream_rows(fat_rows)
    kw = dict(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w, tile_h=tile_h)
    state = _for_each_slab(
        bins_full, counts, C, slab_cap,
        lambda sc, b3: _stream_slab_call(sc, b3, rows64, None, **kw),
        lambda sc, b3, st: _stream_slab_call(sc, b3, rows64, st, **kw))
    return _state_to_outputs(state)



def _accum_fused_kernel(counts_ref, light_ref, rows_ref, zbase_ref,
                        acc_ref, cnt_ref, *,
                        tiles_x: int, tile_h: int, tile_w: int):
    """Order-independent transparent accumulation (untextured materials).

    The reference's transparent pass is additive blending with
    dstAlpha-scaling (vk_pipelines.cpp:157-167) — but mesh.frag always
    writes alpha = 1.0 (shaders/mesh.frag:18), so after the first blended
    fragment dst.a == 1 and the pass reduces to an order-independent SUM of
    every transparent fragment that passes the depth-test-only
    GREATER_OR_EQUAL vs the opaque z buffer (vk_engine.cpp:1673-1676).
    One raster pass shades (mesh.frag, tex factor == 1 for the white
    texture) and accumulates all layers — no peel cap, nothing dropped.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    # light_ref cols 0-2 (sun_dir) are unused in-kernel: the light dot is
    # baked into the per-corner light-numerator attribute at vertex setup
    power = light_ref[0, 3]
    amb_r = light_ref[0, 4]
    amb_g = light_ref[0, 5]
    amb_b = light_ref[0, 6]
    X, Y = _tile_coords(i, j, tile_h, tile_w)
    zbase = zbase_ref[:, :]

    def tri_body(k4, carry):
        ar, ag, ab, cnt = carry
        takes = []
        for u in range(_UNROLL):
            k = k4 * _UNROLL + u
            r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
            c0v = r(0) * X + r(1) * Y + r(2)
            c1v = r(3) * X + r(4) * Y + r(5)
            c2v = r(6) * X + r(7) * Y + r(8)
            tl0 = (r(0) > 0.0) | ((r(0) == 0.0) & (r(1) > 0.0))
            tl1 = (r(3) > 0.0) | ((r(3) == 0.0) & (r(4) > 0.0))
            tl2 = (r(6) > 0.0) | ((r(6) == 0.0) & (r(7) > 0.0))
            cov = (((c0v > 0.0) | ((c0v == 0.0) & tl0))
                   & ((c1v > 0.0) | ((c1v == 0.0) & tl1))
                   & ((c2v > 0.0) | ((c2v == 0.0) & tl2)))
            zv = r(9) * X + r(10) * Y + r(11)
            cov &= (zv >= 0.0) & (zv <= 1.0)
            takes.append(cov & (zv >= zbase) & (k < n))

        group_any = takes[0]
        for t in takes[1:]:
            group_any = group_any | t

        def shade_taken(args):
            ar, ag, ab, cnt = args
            for u in range(_UNROLL):
                k = k4 * _UNROLL + u
                r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
                take = takes[u]
                # perspective-correct light-numerator + color (uv unused:
                # the white texture's tex factor is 1.0); numerators and
                # the denominator are PLANES folded at setup (shade.C_ATTR)
                den = r(41) * X + r(42) * Y + r(43)
                inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
                ln = (r(13) * X + r(19) * Y + r(25)) * inv
                cr = (r(14) * X + r(20) * Y + r(26)) * inv
                cg = (r(15) * X + r(21) * Y + r(27)) * inv
                cb = (r(16) * X + r(22) * Y + r(28)) * inv
                # mesh.frag:12-18 — light floor 0.1, sun power, ambient add
                light = jnp.maximum(ln, jnp.float32(0.1))
                scale = light * power
                ar = jnp.where(take, ar + cr * (scale + amb_r), ar)
                ag = jnp.where(take, ag + cg * (scale + amb_g), ag)
                ab = jnp.where(take, ab + cb * (scale + amb_b), ab)
                cnt = jnp.where(take, cnt + 1, cnt)
            return ar, ag, ab, cnt

        return jax.lax.cond(jnp.any(group_any), shade_taken,
                            lambda args: args, (ar, ag, ab, cnt))

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    cnt0 = jnp.zeros((tile_h, tile_w), jnp.int32)
    n4 = (n + _UNROLL - 1) // _UNROLL
    ar1, ag1, ab1, cnt1 = jax.lax.fori_loop(
        0, n4, tri_body, (zero, zero, zero, cnt0))
    acc_ref[0, :, :] = ar1
    acc_ref[1, :, :] = ag1
    acc_ref[2, :, :] = ab1
    cnt_ref[:, :] = cnt1


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_accum_fused(fat_rows, bins, counts, z_base, light, *,
                          tiles_x: int, tiles_y: int, tile_w: int,
                          tile_h: int):
    """Sum-shade ALL transparent fragments in one pass (untextured path).

    light: (8,) f32 [sun_dir xyz, sun_power, ambient rgb, 0].
    Returns (acc (3, Hp, Wp) f32 summed src colors,
             cnt (Hp, Wp) i32 fragments blended per pixel).
    """
    T = fat_rows.shape[0]
    n_tiles, bin_cap = bins.shape
    bin_cap_pad = cdiv(bin_cap, 8) * 8
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    safe = jnp.clip(bins, 0, T - 1)
    rows = fat_rows[safe]
    # dead slots beyond counts are masked by (k < n) in-kernel

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    return pl.pallas_call(
        functools.partial(_accum_fused_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        out_shape=(
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bin_cap, 48),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), light.reshape(1, 8), rows, z_base)


def _accum_chunks_kernel(counts_ref, light_ref, bins_ref, rows_hbm,
                         zbase_ref, acc_ref, cnt_ref, scratch_ref, sem_ref, *,
                         tiles_x: int, tile_h: int, tile_w: int):
    """Chunk-streaming variant of _accum_fused_kernel: fat rows DMA from HBM
    per binned chunk (see _raster_chunks_kernel).

    Accumulation state (acc rgb, cnt) lives in the VMEM out refs and is
    read-modify-written per GROUP-triangle skip group, gated on the entry's
    gmask bit — the same free scalar-bit skip the opaque stream kernel uses
    (groups whose AABB misses the tile never run their visibility ALU).
    Per-pixel additions keep ascending-triangle order, so results stay
    bit-identical to the old whole-chunk carried chain."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    # light_ref cols 0-2 (sun_dir) are unused in-kernel: the light dot is
    # baked into the per-corner light-numerator attribute at vertex setup
    power = light_ref[0, 3]
    amb_r = light_ref[0, 4]
    amb_g = light_ref[0, 5]
    amb_b = light_ref[0, 6]
    X, Y = _tile_coords(i, j, tile_h, tile_w)
    zbase = zbase_ref[:, :]

    for c in range(3):
        acc_ref[c, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)
    cnt_ref[:, :] = jnp.zeros((tile_h, tile_w), jnp.int32)

    def accum_group(base, grp):
        takes = []
        for t in range(grp * GROUP, (grp + 1) * GROUP):
            r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
            e0a, e0b = r(0), r(1)
            e1a, e1b = r(3), r(4)
            e2a, e2b = r(6), r(7)
            c0v = e0a * X + e0b * Y + r(2)
            c1v = e1a * X + e1b * Y + r(5)
            c2v = e2a * X + e2b * Y + r(8)
            zv = r(9) * X + r(10) * Y + r(11)
            cov = ((c0v >= _edge_bound(e0a, e0b))
                   & (c1v >= _edge_bound(e1a, e1b))
                   & (c2v >= _edge_bound(e2a, e2b))
                   & (zv <= 1.0))
            # zv >= 0 is subsumed by zv >= zbase (opaque depth, >= 0)
            takes.append(cov & (zv >= zbase))

        group_any = takes[0]
        for tk in takes[1:]:
            group_any = group_any | tk

        @pl.when(jnp.any(group_any))
        def _():
            ar = acc_ref[0, :, :]
            ag = acc_ref[1, :, :]
            ab = acc_ref[2, :, :]
            cnt = cnt_ref[:, :]
            for k, t in enumerate(range(grp * GROUP, (grp + 1) * GROUP)):
                r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
                take = takes[k]
                den = r(41) * X + r(42) * Y + r(43)
                inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
                ln = (r(13) * X + r(19) * Y + r(25)) * inv
                cr = (r(14) * X + r(20) * Y + r(26)) * inv
                cg = (r(15) * X + r(21) * Y + r(27)) * inv
                cb = (r(16) * X + r(22) * Y + r(28)) * inv
                light = jnp.maximum(ln, jnp.float32(0.1))
                scale = light * power
                ar = jnp.where(take, ar + cr * (scale + amb_r), ar)
                ag = jnp.where(take, ag + cg * (scale + amb_g), ag)
                ab = jnp.where(take, ab + cb * (scale + amb_b), ab)
                cnt = jnp.where(take, cnt + 1, cnt)
            acc_ref[0, :, :] = ar
            acc_ref[1, :, :] = ag
            acc_ref[2, :, :] = ab
            cnt_ref[:, :] = cnt

    def eval_entry(entry, base, carry):
        if N_GROUPS == 1:
            accum_group(base, 0)
        else:
            gmask = entry & ENTRY_GMASK_ALL
            for grp in range(N_GROUPS):
                @pl.when(((gmask >> grp) & 1) != 0)
                def _(grp=grp):
                    accum_group(base, grp)
        return carry

    _walk_bins_cols(counts_ref, bins_ref, rows_hbm, scratch_ref, sem_ref,
                    tile, eval_entry, 0)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_accum_chunks(fat_rows, cbins, ccounts, z_base, light, *,
                           tiles_x: int, tiles_y: int, tile_w: int,
                           tile_h: int):
    """Chunk-streaming transparent accumulation (untextured path).

    Same contract as rasterize_accum_fused but consuming CHUNK bins directly
    (no expand_bins/refine, no XLA row gather).
    """
    C = fat_rows.shape[0] // CHUNK
    rows64 = _prep_stream_rows(fat_rows)
    bins3 = _pack_bins_cols(
        (jnp.clip(cbins, 0, C - 1) << ENTRY_SHIFT) | ENTRY_GMASK_ALL)
    return _accum_slab_call(ccounts, light, bins3, rows64, z_base,
                            tiles_x=tiles_x, tiles_y=tiles_y,
                            tile_w=tile_w, tile_h=tile_h)


def _accum_slab_call(ccounts, light, bins3, rows64, z_base, *, tiles_x: int,
                     tiles_y: int, tile_w: int, tile_h: int):
    n_tiles, bcap = bins3.shape[:2]
    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    return pl.pallas_call(
        functools.partial(_accum_chunks_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        out_shape=(
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            # column-major (G, BIN_LANES) packing — see _pack_bins_cols
            pl.BlockSpec((1, bcap, BIN_LANES),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # fat rows stay in HBM
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((NBUF * STREAM_ROWS, ROW_PAD), jnp.float32),  # scalar-consumed coeffs: see _stream_slab_call
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=use_interpret(),
    )(ccounts.reshape(n_tiles, 1), light.reshape(1, 8), bins3, rows64, z_base)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "slab_cap"),
)
def rasterize_accum_slabs(fat_rows, bins_full, counts, z_base, light, *,
                          tiles_x: int, tiles_y: int, tile_w: int,
                          tile_h: int, slab_cap: int = None):
    """Transparent accumulation over UNCAPPED dense bins, in slabs.

    The accumulation is an order-independent SUM (see rasterize_accum_fused),
    so slabbing needs no carried state: each slab's (acc, cnt) simply adds,
    and slabs past every tile's count are skipped by one lax.cond. Nothing
    is ever dropped — the structural analog of the reference blending every
    transparent fragment (vk_engine.cpp:1459-1465).
    """
    C = fat_rows.shape[0] // CHUNK
    rows64 = _prep_stream_rows(fat_rows)
    kw = dict(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w, tile_h=tile_h)
    # the per-slab combine is ADDITION (order-independent sum): no carried
    # kernel state, each slab's (acc, cnt) simply adds
    return _for_each_slab(
        bins_full, counts, C, slab_cap,
        lambda sc, b3: _accum_slab_call(sc, light, b3, rows64, z_base, **kw),
        lambda sc, b3, st: tuple(x + y for x, y in zip(
            st, _accum_slab_call(sc, light, b3, rows64, z_base, **kw))))


def _peel_fused_kernel(counts_ref, rows_ref, zbase_ref, last_ref,
                       tid_ref, num_ref, meta_ref, *,
                       tiles_x: int, tile_h: int, tile_w: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    n = counts_ref[tile, 0]
    X, Y = _tile_coords(i, j, tile_h, tile_w)
    zbase = zbase_ref[:, :]
    last = last_ref[:, :]

    def tri_body(k4, carry):
        best, nums, metas = carry
        takes = []
        for u in range(_UNROLL):
            k = k4 * _UNROLL + u
            r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
            idx = r(47).astype(jnp.int32)
            c0v = r(0) * X + r(1) * Y + r(2)
            c1v = r(3) * X + r(4) * Y + r(5)
            c2v = r(6) * X + r(7) * Y + r(8)
            tl0 = (r(0) > 0.0) | ((r(0) == 0.0) & (r(1) > 0.0))
            tl1 = (r(3) > 0.0) | ((r(3) == 0.0) & (r(4) > 0.0))
            tl2 = (r(6) > 0.0) | ((r(6) == 0.0) & (r(7) > 0.0))
            cov = (((c0v > 0.0) | ((c0v == 0.0) & tl0))
                   & ((c1v > 0.0) | ((c1v == 0.0) & tl1))
                   & ((c2v > 0.0) | ((c2v == 0.0) & tl2)))
            zv = r(9) * X + r(10) * Y + r(11)
            cov &= (zv >= 0.0) & (zv <= 1.0)
            take = cov & (zv >= zbase) & (idx > last) & (idx < best) & (k < n)
            best = jnp.where(take, idx, best)
            takes.append(take)

        group_any = takes[0]
        for t in takes[1:]:
            group_any = group_any | t

        def attr_taken(args):
            nums, metas = args
            for u in range(_UNROLL):
                k = k4 * _UNROLL + u
                r = lambda col, _k=k: rows_ref[0, _k, col]  # noqa: E731
                take = takes[u]
                new_nums = []
                for a in range(N_NUMS):
                    num = r(13 + a) * X + r(19 + a) * Y + r(25 + a)
                    new_nums.append(jnp.where(take, num, nums[a]))
                nums = tuple(new_nums)
                metas = tuple(
                    jnp.where(take, r(col), metas[m])
                    for m, col in enumerate(GMETA_COLS))
            return nums, metas

        nums, metas = jax.lax.cond(
            jnp.any(group_any), attr_taken, lambda args: args,
            (nums, metas))
        return best, nums, metas

    best0 = jnp.full((tile_h, tile_w), ID_INF, jnp.int32)
    nums0 = tuple(jnp.zeros((tile_h, tile_w), jnp.float32)
                  for _ in range(N_NUMS))
    metas0 = tuple(jnp.zeros((tile_h, tile_w), jnp.float32)
                   for _ in range(N_GMETA))
    n4 = (n + _UNROLL - 1) // _UNROLL
    best1, nums1, metas1 = jax.lax.fori_loop(
        0, n4, tri_body, (best0, nums0, metas0))
    tid_ref[:, :] = best1
    for a in range(N_NUMS):
        num_ref[a, :, :] = nums1[a]
    for m in range(N_GMETA):
        meta_ref[m, :, :] = metas1[m]


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h"),
)
def rasterize_peel_fused(fat_rows, bins, counts, z_base, last_id, *,
                         tiles_x: int, tiles_y: int, tile_w: int, tile_h: int):
    """Fused transparency peel: layer selection + its interpolated attrs."""
    T = fat_rows.shape[0]
    n_tiles, bin_cap = bins.shape
    bin_cap_pad = cdiv(bin_cap, 8) * 8
    if bin_cap_pad != bin_cap:
        bins = jnp.pad(bins, ((0, 0), (0, bin_cap_pad - bin_cap)), constant_values=NO_TRI)
        bin_cap = bin_cap_pad

    fat_rows = fat_rows.at[:, 47].set(
        jnp.arange(T, dtype=jnp.int32).astype(jnp.float32))
    safe = jnp.clip(bins, 0, T - 1)
    rows = fat_rows[safe]

    hp = tiles_y * tile_h
    wp = tiles_x * tile_w

    best, nums, metas = pl.pallas_call(
        functools.partial(_peel_fused_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        out_shape=(
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((N_NUMS, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((N_GMETA, hp, wp), jnp.float32),
        ),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bin_cap, 48),
                         lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_NUMS, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_GMETA, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        ),
        interpret=use_interpret(),
    )(counts.reshape(n_tiles, 1), rows, z_base, last_id)
    return _peel_outputs_gathered(best, nums, metas)


def _peel_stream_loop(counts_ref, bins_ref, rows_hbm, scratch_ref, sem_ref,
                      zbase, last, refs, *, tiles_x: int, tile_h: int,
                      tile_w: int):
    """Chunk-streaming transparency peel loop (fused attrs, refs-RMW state).

    Same HBM->VMEM double-buffered chunk walk as _chunks_stream_loop, but
    the per-pixel reduction is the PEEL rule: among fragments that pass the
    opaque depth test (zv >= zbase) with id > last, keep the SMALLEST id —
    submission-order peeling, one layer per call (the reference submits
    transparent draws in list order, vk_engine.cpp:1459-1465).

    State (best id, nums x4, metas x12; nums PRE-divide so slabs compose)
    lives in the VMEM out refs, read-modify-written per GROUP skip group
    gated on the entry's gmask bit (the opaque kernel's free scalar-bit
    skip). The attribute winner test is id-equality against the post-chunk
    best plane: within a walk only the FIRST eligible triangle ever takes
    a pixel (ids ascend, take requires idx < best), and ids are globally
    unique, so best == idx identifies exactly the old carried takes —
    bit-identical, and each group's block RMWs the refs independently.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    tile = i * tiles_x + j
    X, Y = _tile_coords(i, j, tile_h, tile_w)
    best_ref, nums_ref, metas_ref = refs

    def vis_group(base, tid_base, grp):
        best = best_ref[:, :]
        for t in range(grp * GROUP, (grp + 1) * GROUP):
            r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
            idx = tid_base + t
            e0a, e0b = r(0), r(1)
            e1a, e1b = r(3), r(4)
            e2a, e2b = r(6), r(7)
            c0v = e0a * X + e0b * Y + r(2)
            c1v = e1a * X + e1b * Y + r(5)
            c2v = e2a * X + e2b * Y + r(8)
            zv = r(9) * X + r(10) * Y + r(11)
            cov = ((c0v >= _edge_bound(e0a, e0b))
                   & (c1v >= _edge_bound(e1a, e1b))
                   & (c2v >= _edge_bound(e2a, e2b))
                   & (zv <= 1.0))
            # padding rows inside a partial chunk have zero edge planes
            # (never covered) — no per-triangle count mask needed;
            # zv >= 0 is subsumed by zv >= zbase (opaque depth, >= 0)
            take = cov & (zv >= zbase) & (idx > last) & (idx < best)
            best = jnp.where(take, idx, best)
        best_ref[:, :] = best

    def attr_group(base, tid_base, best, grp):
        nums = [nums_ref[a, :, :] for a in range(N_NUMS)]
        metas = [metas_ref[m, :, :] for m in range(N_SMETA)]
        for t in range(grp * GROUP, (grp + 1) * GROUP):
            r = lambda col, _t=t: scratch_ref[base + _t // ROW_TRIS, (_t % ROW_TRIS) * _HALF + col]  # noqa: E731
            take = best == (tid_base + t)
            for a in range(N_NUMS):
                num = r(13 + a) * X + r(19 + a) * Y + r(25 + a)
                nums[a] = jnp.where(take, num, nums[a])
            for m, col in enumerate(SMETA_COLS):
                metas[m] = jnp.where(take, r(col), metas[m])
        for a in range(N_NUMS):
            nums_ref[a, :, :] = nums[a]
        for m in range(N_SMETA):
            metas_ref[m, :, :] = metas[m]

    def eval_entry(entry, base, carry):
        tid_base = (entry >> ENTRY_SHIFT) * CHUNK
        gmask = entry & ENTRY_GMASK_ALL
        if N_GROUPS == 1:
            vis_group(base, tid_base, 0)
        else:
            for grp in range(N_GROUPS):
                @pl.when(((gmask >> grp) & 1) != 0)
                def _(grp=grp):
                    vis_group(base, tid_base, grp)

        best = best_ref[:, :]

        @pl.when(jnp.any((best >= tid_base) & (best < tid_base + CHUNK)))
        def _():
            if N_GROUPS == 1:
                attr_group(base, tid_base, best, 0)
            else:
                for grp in range(N_GROUPS):
                    @pl.when(((gmask >> grp) & 1) != 0)
                    def _(grp=grp):
                        attr_group(base, tid_base, best, grp)
        return carry

    _walk_bins_cols(counts_ref, bins_ref, rows_hbm, scratch_ref,
                    sem_ref, tile, eval_entry, 0)


def _peel_outputs_gathered(best, nums, metas):
    """Peel epilogue for the GATHERED kernel's state (N_GMETA layout)."""
    attrs, metas_pub, inv = _reconstruct_outputs(
        nums, tuple(metas[k] for k in range(6)),
        tuple(metas[6 + k] for k in range(9)))
    return best, attrs, metas_pub, inv


def _peel_outputs_stream(best, nums, metas):
    """Peel epilogue for the STREAM kernels' state (N_SMETA layout)."""
    tex6 = _unpack2(metas[0]) + _unpack2(metas[1]) + _unpack2(metas[2])
    attrs, metas_pub, inv = _reconstruct_outputs(
        nums, tex6, tuple(metas[3 + k] for k in range(9)))
    return best, attrs, metas_pub, inv


def _peel_state_shapes(hp: int, wp: int):
    return (
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),       # best (smallest id)
        jax.ShapeDtypeStruct((N_NUMS, hp, wp), jnp.float32),  # attr nums
        jax.ShapeDtypeStruct((N_SMETA, hp, wp), jnp.float32),  # meta
    )


def _peel_state_specs(tile_h: int, tile_w: int):
    return (
        pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((N_NUMS, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((N_SMETA, tile_h, tile_w), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
    )


def _peel_chunks_fresh_kernel(counts_ref, bins_ref, rows_hbm, zbase_ref,
                              last_ref, best_ref, nums_ref, metas_ref,
                              scratch_ref, sem_ref, *,
                              tiles_x: int, tile_h: int, tile_w: int):
    """First peel slab: fresh peel state (best = ID_INF)."""
    best_ref[:, :] = jnp.full((tile_h, tile_w), ID_INF, jnp.int32)
    for a in range(N_NUMS):
        nums_ref[a, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)
    for m in range(N_SMETA):
        metas_ref[m, :, :] = jnp.zeros((tile_h, tile_w), jnp.float32)
    _peel_stream_loop(counts_ref, bins_ref, rows_hbm, scratch_ref,
                      sem_ref, zbase_ref[:, :], last_ref[:, :],
                      (best_ref, nums_ref, metas_ref),
                      tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w)


def _peel_chunks_state_kernel(counts_ref, bins_ref, rows_hbm, zbase_ref,
                              last_ref, best_in, nums_in, metas_in,
                              best_ref, nums_ref, metas_ref,
                              scratch_ref, sem_ref, *,
                              tiles_x: int, tile_h: int, tile_w: int):
    """Continuation peel slab: carries the previous slab's peel state."""
    best_ref[:, :] = best_in[:, :]
    for a in range(N_NUMS):
        nums_ref[a, :, :] = nums_in[a, :, :]
    for m in range(N_SMETA):
        metas_ref[m, :, :] = metas_in[m, :, :]
    _peel_stream_loop(counts_ref, bins_ref, rows_hbm, scratch_ref,
                      sem_ref, zbase_ref[:, :], last_ref[:, :],
                      (best_ref, nums_ref, metas_ref),
                      tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w)


def _peel_slab_call(ccounts, bins3, rows64, z_base, last_id, state, *,
                    tiles_x: int, tiles_y: int, tile_w: int, tile_h: int):
    """One chunk-streaming peel pass. state=None -> fresh peel state."""
    n_tiles, bcap = bins3.shape[:2]
    hp = tiles_y * tile_h
    wp = tiles_x * tile_w
    base_specs = [
        pl.BlockSpec((n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        # column-major (G, BIN_LANES) packing — see _pack_bins_cols
        pl.BlockSpec((1, bcap, BIN_LANES),
                     lambda i, j, _tx=tiles_x: (i * _tx + j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # fat rows stay in HBM
        pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    common = dict(
        out_shape=_peel_state_shapes(hp, wp),
        grid=(tiles_y, tiles_x),
        out_specs=_peel_state_specs(tile_h, tile_w),
        scratch_shapes=[
            pltpu.SMEM((NBUF * STREAM_ROWS, ROW_PAD), jnp.float32),  # scalar-consumed coeffs: see _stream_slab_call
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=use_interpret(),
    )
    args = (ccounts.reshape(n_tiles, 1), bins3, rows64, z_base, last_id)
    if state is None:
        return pl.pallas_call(
            functools.partial(_peel_chunks_fresh_kernel, tiles_x=tiles_x,
                              tile_h=tile_h, tile_w=tile_w),
            in_specs=base_specs,
            **common,
        )(*args)
    return pl.pallas_call(
        functools.partial(_peel_chunks_state_kernel, tiles_x=tiles_x,
                          tile_h=tile_h, tile_w=tile_w),
        in_specs=base_specs + list(_peel_state_specs(tile_h, tile_w)),
        # carry the 17 peel-state planes in place
        input_output_aliases={5: 0, 6: 1, 7: 2},
        **common,
    )(*args, *state)


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tiles_y", "tile_w", "tile_h", "slab_cap"),
)
def rasterize_peel_slabs(fat_rows, bins_full, counts, z_base, last_id, *,
                         tiles_x: int, tiles_y: int, tile_w: int,
                         tile_h: int, slab_cap: int = None):
    """Transparency peel over UNCAPPED dense chunk bins, in slabs.

    bins_full/counts: bin_triangles_full output over chunk AABBs. The peel
    is a min-reduction over eligible triangle ids, so the carried-state slab
    pattern of rasterize_fused_slabs applies unchanged: each slab carries
    (best, nums, metas), slabs past every tile's count cost one
    predicate, the perspective divide runs once after the last slab. With
    this, NO path in the renderer has a triangle capacity — full parity
    with the reference's cliff-free pipeline (vk_engine.cpp:1453-1465).

    Returns (best id (ID_INF where no layer), attrs (N_ATTR,Hp,Wp),
    meta (N_META,Hp,Wp), inv (Hp,Wp)).
    """
    C = fat_rows.shape[0] // CHUNK
    rows64 = _prep_stream_rows(fat_rows)
    kw = dict(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tile_w, tile_h=tile_h)
    best, nums, metas = _for_each_slab(
        bins_full, counts, C, slab_cap,
        lambda sc, b3: _peel_slab_call(sc, b3, rows64, z_base, last_id,
                                       None, **kw),
        lambda sc, b3, st: _peel_slab_call(sc, b3, rows64, z_base, last_id,
                                           st, **kw))
    return _peel_outputs_stream(best, nums, metas)

