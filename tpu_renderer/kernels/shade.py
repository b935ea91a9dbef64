"""Deferred shading — mesh.frag (shaders/mesh.frag:12-19) evaluated per pixel
over the visibility buffer, plus the sampler/texture machinery the reference
gets from combined image samplers (input_structures.glsl:13-16, sampler
creation vk_loader.cpp:197-211, REPEAT addressing by Vulkan default).

TPU-first design: rasterization wrote only (tri_id, z) per pixel; this stage
re-evaluates the barycentric weights from the triangle's edge planes at each
pixel (cheaper than storing 3 extra framebuffer planes), gathers per-corner
attributes by tri_id (one contiguous-row XLA gather), interpolates
perspective-correct, and samples the texture atlas with mip LOD computed
from hardware-style 2x2 pixel-quad UV derivatives.

The whole stage is jnp: gathers and elementwise math fuse under XLA, and the
HBM traffic (a few hundred MB at 1080p) rides full memory bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_renderer.kernels import vertex as vx
from tpu_renderer.resources import (
    FILTER_MAG_LINEAR,
    FILTER_MIN_LINEAR,
    FILTER_MIP_LINEAR,
)


def _unpack_rgb(texel_u32):
    """uint32 RGBA8 -> (r, g, b) f32 in [0,1] (UNORM)."""
    r = (texel_u32 & 0xFF).astype(jnp.float32)
    g = ((texel_u32 >> 8) & 0xFF).astype(jnp.float32)
    b = ((texel_u32 >> 16) & 0xFF).astype(jnp.float32)
    scale = jnp.float32(1.0 / 255.0)
    return r * scale, g * scale, b * scale


def _fetch(atlas_data, ex, ey, w, h, x, y):
    """Texel fetch with REPEAT wrap inside an atlas region (positions i32)."""
    xw = jnp.mod(x, w)
    yw = jnp.mod(y, h)
    wa = atlas_data.shape[1]
    flat = atlas_data.reshape(-1)
    idx = (ey + yw) * wa + (ex + xw)
    return flat[idx]


def _sample_level(atlas_data, ex, ey, w, h, uv, linear):
    """One mip level: bilinear or nearest, REPEAT wrap (per-pixel select)."""
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    # bilinear footprint
    su = uv[..., 0] * wf - 0.5
    sv = uv[..., 1] * hf - 0.5
    x0 = jnp.floor(su).astype(jnp.int32)
    y0 = jnp.floor(sv).astype(jnp.int32)
    fu = su - x0
    fv = sv - y0
    t00 = _unpack_rgb(_fetch(atlas_data, ex, ey, w, h, x0, y0))
    t10 = _unpack_rgb(_fetch(atlas_data, ex, ey, w, h, x0 + 1, y0))
    t01 = _unpack_rgb(_fetch(atlas_data, ex, ey, w, h, x0, y0 + 1))
    t11 = _unpack_rgb(_fetch(atlas_data, ex, ey, w, h, x0 + 1, y0 + 1))
    # nearest footprint
    xn = jnp.floor(uv[..., 0] * wf).astype(jnp.int32)
    yn = jnp.floor(uv[..., 1] * hf).astype(jnp.int32)
    tn = _unpack_rgb(_fetch(atlas_data, ex, ey, w, h, xn, yn))
    out = []
    for c in range(3):
        bi = (t00[c] * (1 - fu) * (1 - fv) + t10[c] * fu * (1 - fv)
              + t01[c] * (1 - fu) * fv + t11[c] * fu * fv)
        out.append(jnp.where(linear, bi, tn[c]))
    return jnp.stack(out, axis=-1)


def _quad_derivatives(uv):
    """Hardware-style coarse derivatives over 2x2 pixel quads.

    uv: (H, W, 2) with H, W even. Returns (dudx (H,W,2), dudy (H,W,2)) where
    each 2x2 quad shares one derivative (like GPU helper-invocation quads).
    """
    h, w = uv.shape[:2]
    q = uv.reshape(h // 2, 2, w // 2, 2, 2)
    dx = q[:, :, :, 1, :] - q[:, :, :, 0, :]          # (h/2, 2, w/2, 2chan)
    dx = jnp.repeat(dx[:, :, :, None, :], 2, axis=3)  # both columns
    dy = q[:, 1, :, :, :] - q[:, 0, :, :, :]          # (h/2, w/2, 2, 2chan)
    dy = jnp.repeat(dy[:, None, :, :, :], 2, axis=1)  # both rows
    return dx.reshape(h, w, 2), dy.reshape(h, w, 2)


def sample_texture(atlas_data, atlas_entries, tex_base, tex_levels,
                   filter_flags, tex_id, uv):
    """Full sampler: mip LOD from quad derivatives, trilinear/nearest filter.

    tex_id: (H, W) i32 per-pixel texture index; uv: (H, W, 2) f32.
    Returns (H, W, 3) f32 linear color.
    """
    base = tex_base[tex_id]                       # (H,W)
    levels = tex_levels[tex_id]
    flags = filter_flags[tex_id]

    e0 = atlas_entries[base]                      # (H,W,4) level-0 x,y,w,h
    w0 = e0[..., 2].astype(jnp.float32)
    h0 = e0[..., 3].astype(jnp.float32)

    dudx, dudy = _quad_derivatives(uv)
    rho_x = jnp.sqrt((dudx[..., 0] * w0) ** 2 + (dudx[..., 1] * h0) ** 2)
    rho_y = jnp.sqrt((dudy[..., 0] * w0) ** 2 + (dudy[..., 1] * h0) ** 2)
    rho = jnp.maximum(rho_x, rho_y)
    lod = jnp.log2(jnp.maximum(rho, jnp.float32(1e-12)))
    max_level = (levels - 1).astype(jnp.float32)
    lod = jnp.clip(lod, 0.0, max_level)

    mip_linear = (flags & FILTER_MIP_LINEAR) != 0
    # Vulkan: NEAREST mip mode picks ceil(lod + 0.5) - 1; LINEAR blends
    # floor/floor+1 by the fraction.
    l_near = jnp.clip(jnp.ceil(lod + 0.5) - 1.0, 0.0, max_level)
    l_lo = jnp.floor(lod)
    l_hi = jnp.minimum(l_lo + 1.0, max_level)
    frac = jnp.where(mip_linear, lod - l_lo, 0.0)
    lev_a = jnp.where(mip_linear, l_lo, l_near).astype(jnp.int32)
    lev_b = jnp.where(mip_linear, l_hi, l_near).astype(jnp.int32)

    # Filter select: mag filter when lod <= 0, min filter otherwise
    # (Vulkan sampler rules).
    mag_lin = (flags & FILTER_MAG_LINEAR) != 0
    min_lin = (flags & FILTER_MIN_LINEAR) != 0
    linear = jnp.where(lod > 0.0, min_lin, mag_lin)

    def at_level(lev):
        e = atlas_entries[base + lev]
        return _sample_level(atlas_data, e[..., 0], e[..., 1], e[..., 2],
                             e[..., 3], uv, linear)

    ca = at_level(lev_a)
    cb = at_level(lev_b)
    return ca * (1.0 - frac[..., None]) + cb * frac[..., None]


def shade_core(t, packed, attrs, tex_for_mat, filter_for_mat,
               atlas, ambient_rgb, sun_dir, sun_power):
    """mesh.frag for per-pixel triangle index t (must be a clamped valid
    index; pixels whose t is a placeholder produce garbage the caller masks).
    Returns (Hp, Wp, 3) f32 linear rgb.
    """
    hp, wp = t.shape
    rows = packed[t]                                  # (Hp,Wp,16)
    xx = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1).astype(jnp.float32) + 0.5
    yy = jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0).astype(jnp.float32) + 0.5
    c0 = rows[..., 0] * xx + rows[..., 1] * yy + rows[..., 2]
    c1 = rows[..., 3] * xx + rows[..., 4] * yy + rows[..., 5]
    c2 = rows[..., 6] * xx + rows[..., 7] * yy + rows[..., 8]
    csum = c0 + c1 + c2
    inv = jnp.where(csum != 0.0, 1.0 / csum, 0.0)
    bary = jnp.stack([c0 * inv, c1 * inv, c2 * inv], axis=-1)  # (Hp,Wp,3)

    a = attrs[t]                                      # (Hp,Wp,3,8)
    interp = jnp.einsum("hwc,hwcf->hwf", bary, a)     # perspective-correct
    normal = interp[..., 0:3]
    color_in = interp[..., 3:6]
    uv = interp[..., 6:8]

    mat = rows[..., vx.COL_MAT].astype(jnp.int32)
    tex_id = tex_for_mat[mat]

    tex_rgb = sample_texture(atlas.data, atlas.entries, atlas.tex_base,
                             atlas.tex_levels, filter_for_mat, tex_id, uv)

    # mesh.frag:13 — light = max(dot(N, sunlight_direction.xyz), 0.1);
    # N is the interpolated model-rotated normal, NOT renormalized.
    light = jnp.maximum(
        normal[..., 0] * sun_dir[0] + normal[..., 1] * sun_dir[1]
        + normal[..., 2] * sun_dir[2],
        jnp.float32(0.1),
    )
    # mesh.frag:15-18
    color = color_in * tex_rgb
    out_rgb = color * (light * sun_power)[..., None] + color * ambient_rgb[None, None, :]
    return out_rgb


def shade(tid, packed, attrs, tex_for_mat, filter_for_mat,
          atlas, ambient_rgb, sun_dir, sun_power, background):
    """Opaque pass: mesh.frag over the visibility buffer.

    tid: (Hp, Wp) i32 visibility buffer (-1 = background)
    background: (4, Hp, Wp) f32 — survives where no geometry (the LOAD-op
    color attachment semantics, vk_initializers.cpp:125)
    Returns (4, Hp, Wp) f32.
    """
    valid = tid >= 0
    t = jnp.where(valid, tid, 0)
    out_rgb = shade_core(t, packed, attrs, tex_for_mat, filter_for_mat,
                         atlas, ambient_rgb, sun_dir, sun_power)
    rgb = jnp.where(valid[None, :, :], jnp.moveaxis(out_rgb, -1, 0), background[:3])
    alpha = jnp.where(valid, jnp.float32(1.0), background[3])
    return jnp.concatenate([rgb, alpha[None]], axis=0)


def blend_layer(fb, tid, packed, attrs, tex_for_mat, filter_for_mat,
                atlas, ambient_rgb, sun_dir, sun_power):
    """Transparent additive blend of one peeled layer into the framebuffer.

    Blend state from enable_blending_additive (vk_pipelines.cpp:157-167):
    rgb = src*1 + dst*dstAlpha, alpha = src (mesh.frag always writes a=1).
    tid: (Hp, Wp) i32 layer triangle ids (-1 = no fragment).
    Returns the blended (4, Hp, Wp) framebuffer.
    """
    found = tid >= 0
    t = jnp.where(found, tid, 0)
    src = shade_core(t, packed, attrs, tex_for_mat, filter_for_mat,
                     atlas, ambient_rgb, sun_dir, sun_power)
    src = jnp.moveaxis(src, -1, 0)                    # (3,Hp,Wp)
    dst_rgb = fb[:3]
    dst_a = fb[3]
    rgb = jnp.where(found[None], src + dst_rgb * dst_a[None], dst_rgb)
    alpha = jnp.where(found, jnp.float32(1.0), dst_a)
    return jnp.concatenate([rgb, alpha[None]], axis=0)
