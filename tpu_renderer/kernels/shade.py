"""Deferred shading — mesh.frag (shaders/mesh.frag:12-19) evaluated per pixel
over the visibility buffer, plus the sampler/texture machinery the reference
gets from combined image samplers (input_structures.glsl:13-16, sampler
creation vk_loader.cpp:197-211, REPEAT addressing by Vulkan default).

TPU-first constraint: every gather costs ~tens of ns per index regardless of
row width, so this stage performs exactly THREE per-pixel gathers at 1080p:

1. one 48-float *shade row* per pixel (edge planes + per-corner attributes +
   texture metadata, packed by ``build_shade_rows``),
2. one prebaked bilinear-quad row per sampled mip level (1 for nearest-mip
   samplers, 2 for trilinear).

Everything else — barycentrics, perspective-correct interpolation, mip LOD
from 2x2 pixel-quad derivatives, analytic mip addressing, filtering,
lighting — is pure elementwise VPU work that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_renderer.resources import (
    FILTER_MAG_LINEAR,
    FILTER_MIN_LINEAR,
    FILTER_MIP_LINEAR,
)

# fat-row layout (48 f32 per triangle): everything the fused raster kernel
# and the deferred shade need about a triangle, in one gatherable row
C_EDGE = 0     # 9: edge planes (barycentric numerators)
C_Z = 9        # 3: affine depth plane
C_MAT = 12     # 1: material id
C_ATTR = 13    # 24: per-corner normal(3) color(3) uv(2), corner-major
C_TEX = 37     # 6: base_x, base_y, w0, h0, n_levels, filter_flags
SHADE_COLS = 48


def build_shade_rows(packed, attrs, mat_meta):
    """(T,16) setup rows + (T,3,8) attrs + (M,8) material meta -> (T,48).

    mat_meta rows: [base_x, base_y, w0, h0, n_levels, filter_flags, 0, 0]
    (f32 values; all are small integers, exactly representable).
    """
    T = packed.shape[0]
    mat = packed[:, 13].astype(jnp.int32)
    meta = mat_meta[jnp.clip(mat, 0, mat_meta.shape[0] - 1)]  # (T, 8)
    return jnp.concatenate(
        [
            packed[:, 0:12],
            packed[:, 13:14],
            attrs.reshape(T, 24),
            meta[:, :6],
            jnp.zeros((T, 5), jnp.float32),
        ],
        axis=1,
    )


def _unpack_rgb(texel_u32):
    """uint32 RGBA8 -> (..., 3) f32 in [0,1] (UNORM)."""
    r = (texel_u32 & 0xFF).astype(jnp.float32)
    g = ((texel_u32 >> 8) & 0xFF).astype(jnp.float32)
    b = ((texel_u32 >> 16) & 0xFF).astype(jnp.float32)
    return jnp.stack([r, g, b], axis=-1) * jnp.float32(1.0 / 255.0)


def _quad_derivatives(uv):
    """Hardware-style coarse derivatives over 2x2 pixel quads.

    uv: (H, W, 2) with H, W even. Each 2x2 quad shares one derivative (like
    GPU helper-invocation quads).
    """
    h, w = uv.shape[:2]
    q = uv.reshape(h // 2, 2, w // 2, 2, 2)
    dx = q[:, :, :, 1, :] - q[:, :, :, 0, :]
    dx = jnp.repeat(dx[:, :, :, None, :], 2, axis=3)
    dy = q[:, 1, :, :, :] - q[:, 0, :, :, :]
    dy = jnp.repeat(dy[:, None, :, :, :], 2, axis=1)
    return dx.reshape(h, w, 2), dy.reshape(h, w, 2)


def _filter_quad(t00, t10, t01, t11, fu, fv, linear):
    """Bilinear or nearest over one 2x2 quad (texel fractions fu, fv)."""
    fu_ = fu[..., None]
    fv_ = fv[..., None]
    bilin = (t00 * (1 - fu_) * (1 - fv_) + t10 * fu_ * (1 - fv_)
             + t01 * (1 - fu_) * fv_ + t11 * fu_ * fv_)
    # nearest texel: floor(u*w) == x0 or x0+1; both live in this quad
    nx = (fu >= 0.5)[..., None]
    ny = (fv >= 0.5)[..., None]
    near = jnp.where(nx, jnp.where(ny, t11, t10), jnp.where(ny, t01, t00))
    return jnp.where(linear[..., None], bilin, near)


def _level_coords(w0, h0, li, uv):
    """Texel addressing at mip level li: wrapped quad top-left + fractions."""
    wl = jnp.maximum(w0.astype(jnp.int32) >> li, 1)
    hl = jnp.maximum(h0.astype(jnp.int32) >> li, 1)
    su = uv[..., 0] * wl.astype(jnp.float32) - 0.5
    sv = uv[..., 1] * hl.astype(jnp.float32) - 0.5
    x0 = jnp.floor(su).astype(jnp.int32)
    y0 = jnp.floor(sv).astype(jnp.int32)
    return wl, hl, jnp.mod(x0, wl), jnp.mod(y0, hl), su - x0, sv - y0


def _sample_level(atlas, base_x, base_y, w0, h0, level, uv, linear,
                  active=None):
    """One mip tap = ONE quad-row gather + elementwise filtering.

    Analytic addressing: level L sits at x = base_x + L*w0 with size
    (w0>>L, h0>>L). `linear` selects bilinear vs nearest per pixel.
    `active` (optional bool mask): pixels whose result is unused get gather
    index 0 — repeated-index gathers are nearly free, so masking the address
    is cheaper than fetching a dead texel.
    """
    li = level.astype(jnp.int32)
    wl, hl, x0w, y0w, fu, fv = _level_coords(w0, h0, li, uv)
    ex = base_x.astype(jnp.int32) + li * w0.astype(jnp.int32)
    ey = base_y.astype(jnp.int32)

    flat = (ey + y0w) * atlas.width + (ex + x0w)
    if active is not None:
        flat = jnp.where(active, flat, 0)
    quad = atlas.quads[flat]                       # (..., 4) u32 — THE gather
    return _filter_quad(_unpack_rgb(quad[..., 0]), _unpack_rgb(quad[..., 1]),
                        _unpack_rgb(quad[..., 2]), _unpack_rgb(quad[..., 3]),
                        fu, fv, linear)


def sample_texture(atlas, base_x, base_y, w0, h0, n_levels, flags, uv):
    """Full sampler: LOD from quad derivatives, trilinear/nearest filtering,
    REPEAT wrap — two taps max."""
    fl = flags.astype(jnp.int32)
    dudx, dudy = _quad_derivatives(uv)
    rho_x = jnp.sqrt((dudx[..., 0] * w0) ** 2 + (dudx[..., 1] * h0) ** 2)
    rho_y = jnp.sqrt((dudy[..., 0] * w0) ** 2 + (dudy[..., 1] * h0) ** 2)
    rho = jnp.maximum(rho_x, rho_y)
    lod = jnp.log2(jnp.maximum(rho, jnp.float32(1e-12)))
    max_level = n_levels - 1.0
    lod = jnp.clip(lod, 0.0, max_level)

    mip_linear = (fl & FILTER_MIP_LINEAR) != 0
    # Vulkan: NEAREST mip mode picks ceil(lod + 0.5) - 1; LINEAR blends
    # floor/floor+1 by the fraction.
    l_near = jnp.clip(jnp.ceil(lod + 0.5) - 1.0, 0.0, max_level)
    l_lo = jnp.floor(lod)
    l_hi = jnp.minimum(l_lo + 1.0, max_level)
    frac = jnp.where(mip_linear, lod - l_lo, 0.0)
    lev_a = jnp.where(mip_linear, l_lo, l_near)
    lev_b = jnp.where(mip_linear, l_hi, l_near)

    mag_lin = (fl & FILTER_MAG_LINEAR) != 0
    min_lin = (fl & FILTER_MIN_LINEAR) != 0
    linear = jnp.where(lod > 0.0, min_lin, mag_lin)

    # two quad-row taps; a single-gather 16-u32 "trilinear row" variant was
    # measured 4x SLOWER (gather cost scales with row bytes beyond ~16 B on
    # this hardware) — see docs/PERF.md. The second tap's address is masked
    # for pixels whose mip fraction is 0 (mip-nearest samplers, magnified or
    # exactly-on-level pixels): its result is multiplied by 0 anyway.
    ca = _sample_level(atlas, base_x, base_y, w0, h0, lev_a, uv, linear)
    cb = _sample_level(atlas, base_x, base_y, w0, h0, lev_b, uv, linear,
                       active=frac > 0.0)
    return ca * (1.0 - frac[..., None]) + cb * frac[..., None]


def light_and_texture(normal, color_in, uv, texmeta, atlas, ambient_rgb,
                      sun_dir, sun_power, textured: bool = True):
    """mesh.frag:12-19 given already-interpolated attributes.

    texmeta: (..., 6) [base_x, base_y, w0, h0, n_levels, filter_flags].
    """
    hp, wp = normal.shape[:2]
    if textured:
        tex_rgb = sample_texture(
            atlas, texmeta[..., 0], texmeta[..., 1], texmeta[..., 2],
            texmeta[..., 3], texmeta[..., 4], texmeta[..., 5], uv)
    else:
        tex_rgb = jnp.ones((hp, wp, 3), jnp.float32)
    # mesh.frag:13 — light = max(dot(N, sunlight_direction.xyz), 0.1);
    # N is the interpolated model-rotated normal, NOT renormalized.
    light = jnp.maximum(
        normal[..., 0] * sun_dir[0] + normal[..., 1] * sun_dir[1]
        + normal[..., 2] * sun_dir[2],
        jnp.float32(0.1),
    )
    # mesh.frag:15-18
    color = color_in * tex_rgb
    return color * (light * sun_power)[..., None] + color * ambient_rgb[None, None, :]


def shade_fused(attrs, meta, atlas, ambient_rgb, sun_dir, sun_power,
                textured: bool = True):
    """Shade from the fused raster outputs (no per-pixel row gather).

    attrs: (8, Hp, Wp) interpolated normal/rgb/uv planes;
    meta: (6, Hp, Wp) texture metadata planes.
    Returns (Hp, Wp, 3) rgb.
    """
    a = jnp.moveaxis(attrs, 0, -1)
    m = jnp.moveaxis(meta, 0, -1)
    return light_and_texture(a[..., 0:3], a[..., 3:6], a[..., 6:8], m,
                             atlas, ambient_rgb, sun_dir, sun_power,
                             textured=textured)


def shade_core(t, shade_rows, atlas, ambient_rgb, sun_dir, sun_power,
               textured: bool = True):
    """mesh.frag for per-pixel triangle index t (clamped valid index; pixels
    whose t is a placeholder produce garbage the caller masks).
    Returns (H, W, 3) f32 linear rgb.
    """
    hp, wp = t.shape
    g = shade_rows[t]                                  # (Hp,Wp,48) — gather 1

    xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(jnp.float32) + 0.5
    yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(jnp.float32) + 0.5
    c0 = g[..., 0] * xx + g[..., 1] * yy + g[..., 2]
    c1 = g[..., 3] * xx + g[..., 4] * yy + g[..., 5]
    c2 = g[..., 6] * xx + g[..., 7] * yy + g[..., 8]
    csum = c0 + c1 + c2
    inv = jnp.where(csum != 0.0, 1.0 / csum, 0.0)
    b0 = (c0 * inv)[..., None]
    b1 = (c1 * inv)[..., None]
    b2 = (c2 * inv)[..., None]

    a0 = g[..., C_ATTR:C_ATTR + 8]
    a1 = g[..., C_ATTR + 8:C_ATTR + 16]
    a2 = g[..., C_ATTR + 16:C_ATTR + 24]
    interp = a0 * b0 + a1 * b1 + a2 * b2               # perspective-correct
    normal = interp[..., 0:3]
    color_in = interp[..., 3:6]
    uv = interp[..., 6:8]

    return light_and_texture(normal, color_in, uv, g[..., C_TEX:C_TEX + 6],
                             atlas, ambient_rgb, sun_dir, sun_power,
                             textured=textured)


def shade(tid, shade_rows, atlas, ambient_rgb, sun_dir, sun_power, background):
    """Opaque pass: mesh.frag over the visibility buffer.

    tid: (Hp, Wp) i32 visibility buffer (-1 = background)
    background: (4, Hp, Wp) f32 — survives where no geometry (the LOAD-op
    color attachment semantics, vk_initializers.cpp:125)
    Returns (4, Hp, Wp) f32.
    """
    valid = tid >= 0
    t = jnp.where(valid, tid, 0)
    out_rgb = shade_core(t, shade_rows, atlas, ambient_rgb, sun_dir, sun_power)
    rgb = jnp.where(valid[None, :, :], jnp.moveaxis(out_rgb, -1, 0), background[:3])
    alpha = jnp.where(valid, jnp.float32(1.0), background[3])
    return jnp.concatenate([rgb, alpha[None]], axis=0)


def blend_layer(fb, tid, shade_rows, atlas, ambient_rgb, sun_dir, sun_power,
                textured: bool = True):
    """Transparent additive blend of one peeled layer into the framebuffer.

    Blend state from enable_blending_additive (vk_pipelines.cpp:157-167):
    rgb = src*1 + dst*dstAlpha, alpha = src (mesh.frag always writes a=1).
    tid: (Hp, Wp) i32 layer triangle ids (-1 = no fragment).
    Returns the blended (4, Hp, Wp) framebuffer.
    """
    found = tid >= 0
    t = jnp.where(found, tid, 0)
    src = shade_core(t, shade_rows, atlas, ambient_rgb, sun_dir, sun_power,
                     textured=textured)
    src = jnp.moveaxis(src, -1, 0)
    dst_rgb = fb[:3]
    dst_a = fb[3]
    rgb = jnp.where(found[None], src + dst_rgb * dst_a[None], dst_rgb)
    alpha = jnp.where(found, jnp.float32(1.0), dst_a)
    return jnp.concatenate([rgb, alpha[None]], axis=0)
