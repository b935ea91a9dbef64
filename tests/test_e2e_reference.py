"""End-to-end pin: the jitted pipeline vs an INDEPENDENT numpy renderer.

Every other full-frame check compares the renderer against its own goldens;
this test re-implements the reference's frame semantics (vk_engine.cpp
draw_background -> draw_geometry -> transparent additive pass; mesh.vert /
mesh.frag math) from scratch in scalar-ish numpy — per-draw vertex
transform, per-pixel homogeneous barycentric raster with the top-left rule
and reversed-Z GREATER_OR_EQUAL depth, bilinear REPEAT texture sampling,
lambert-with-floor lighting, additive transparency — and asserts the real
pipeline matches within a couple of unorm8 steps (fp16 framebuffer rounding
+ association differences).
"""

import numpy as np

import jax.numpy as jnp

from tpu_renderer import scene as scene_mod
from tpu_renderer.pipeline import FrameParams, render_frame
from tpu_renderer.present import unpack_u8
from tpu_renderer.utils.glb_writer import GLBBuilder

W, H = 64, 32
SUN = np.asarray([0.3, 0.5, 0.9], np.float32)
SUN_POWER = 0.8
AMBIENT = np.asarray([0.08, 0.06, 0.1], np.float32)
BG = np.asarray([0.25, 0.3, 0.4, 1.0], np.float32)


def _build_scene(tmp_path):
    b = GLBBuilder()
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., 0] = np.linspace(40, 220, 8, dtype=np.uint8)[None, :]
    tex[..., 1] = np.linspace(220, 40, 8, dtype=np.uint8)[:, None]
    tex[..., 2] = 128
    tex[..., 3] = 255
    img = b.add_image(tex)
    smp = b.add_sampler(mag=9729, min_=9729)  # bilinear, no mips declared
    t = b.add_texture(img, smp)
    m_tex = b.add_material((1.0, 0.9, 0.8, 1), texture=t, name="m0")
    m_plain = b.add_material((0.3, 0.9, 0.5, 1), name="m1")
    m_glass = b.add_material((0.9, 0.4, 0.2, 0.5), alpha_mode="BLEND",
                             name="glass")

    def quad(z, s=0.7):
        pos = np.asarray([[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]],
                         np.float32)
        nrm = np.tile(np.asarray([[0.2, 0.1, 0.95]], np.float32), (4, 1))
        uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint32)
        col = np.asarray([[1, 1, 1, 1], [1, 0.5, 0.5, 1],
                          [0.5, 1, 0.5, 1], [0.5, 0.5, 1, 1]], np.float32)
        return pos, nrm, uv, idx, col

    # textured quad mid-depth; plain quad behind it offset right; glass front
    def prim(p, mat):
        pos, nrm, uv, idx, col = p
        return dict(positions=pos, normals=nrm, uvs=uv, indices=idx,
                    colors=col, material=mat)

    mesh0 = b.add_mesh([prim(quad(0.5), m_tex)], name="m_tex")
    mesh1 = b.add_mesh([prim(quad(0.2, s=0.9), m_plain)], name="m_plain")
    mesh2 = b.add_mesh([prim(quad(0.8, s=0.35), m_glass)], name="m_glass")
    b.add_node(mesh=mesh0)
    shift = np.eye(4, dtype=np.float32)
    shift[0, 3] = 0.25   # translate +x, exercises the node-matrix path
    b.add_node(mesh=mesh1, matrix=shift)
    b.add_node(mesh=mesh2)
    path = str(tmp_path / "e2e.glb")
    b.save(path)
    return path, tex


def _reference_render(scene, tex):
    """Independent numpy frame: reference semantics re-implemented."""
    fb = np.tile(BG[:, None, None], (1, H, W)).astype(np.float32)

    # draw list: walk top nodes like LoadedGLTF::Draw, opaque sorted by
    # (material, mesh) like vk_engine.cpp:1369-1378, transparent in order
    draws = []
    for node in scene.top_nodes:
        stack = [node]
        while stack:
            n = stack.pop(0)
            if hasattr(n, "mesh_index"):
                mesh = scene.meshes[n.mesh_index]
                for si, s in enumerate(mesh.surfaces):
                    draws.append((n, mesh, si, s))
            stack.extend(n.children)
    opaque = [d for d in draws if not scene.materials[d[3].material].transparent]
    transp = [d for d in draws if scene.materials[d[3].material].transparent]
    opaque.sort(key=lambda d: (d[3].material, d[1].name))

    xs = np.arange(W, dtype=np.float64)[None, :] + 0.5
    ys = np.arange(H, dtype=np.float64)[:, None] + 0.5
    X = np.broadcast_to(xs, (H, W))
    Y = np.broadcast_to(ys, (H, W))

    def tri_planes(p):
        """Corner (Xh, Yh, w) -> per-pixel barycentric c_i (H, W) arrays."""
        e = [np.cross(p[(i + 1) % 3], p[(i + 2) % 3]) for i in range(3)]
        det = float(np.dot(e[0], p[0]))
        if det == 0 or not np.isfinite(det):
            return None
        sgn = -1.0 if det < 0 else 1.0
        cs = []
        for i in range(3):
            a, bb, c = (e[i] * sgn / abs(det)).tolist()
            cs.append(a * X + bb * Y + c)
        return cs

    def coverage(cs, planes_ab):
        cov = np.ones((H, W), bool)
        for (a, bb), c in zip(planes_ab, cs):
            tl = (a > 0) or (a == 0 and bb > 0)
            cov &= (c > 0) | ((c == 0) & tl)
        return cov

    def sample(u, v):
        """Bilinear REPEAT at level 0 (the scene declares no mips)."""
        th, tw = tex.shape[:2]
        su = u * tw - 0.5
        sv = v * th - 0.5
        x0 = np.floor(su).astype(int)
        y0 = np.floor(sv).astype(int)
        fu = su - x0
        fv = sv - y0
        out = np.zeros(u.shape + (3,), np.float64)
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (fu if dx else 1 - fu) * (fv if dy else 1 - fv)
                texel = tex[(y0 + dy) % th, (x0 + dx) % tw, :3] / 255.0
                out += wgt[..., None] * texel
        return out

    def shade_draw(node, mesh, surf, *, z_test, z_buf, accumulate):
        mat = scene.materials[surf.material]
        world = node.world_transform  # top matrix = identity
        vs = mesh.vertex_offset
        idx = scene.indices[surf.start_index + mesh.index_offset:
                            surf.start_index + mesh.index_offset + surf.count]
        for t in range(0, len(idx), 3):
            vi = idx[t:t + 3].astype(int) + vs
            pos = scene.positions[vi]
            posh = np.concatenate([pos, np.ones((3, 1), np.float32)], 1)
            clip = (world @ posh.T).T  # view = proj = identity
            w = clip[:, 3]
            xh = (clip[:, 0] + w) * 0.5 * W
            yh = (clip[:, 1] + w) * 0.5 * H
            p = np.stack([xh, yh, w], 1).astype(np.float64)
            cs = tri_planes(p)
            if cs is None:
                continue
            planes_ab = []
            for i in range(3):
                e = np.cross(p[(i + 1) % 3], p[(i + 2) % 3])
                det = np.dot(np.cross(p[1], p[2]), p[0])
                sgn = -1.0 if det < 0 else 1.0
                planes_ab.append(((e * sgn / abs(det))[0],
                                  (e * sgn / abs(det))[1]))
            cov = coverage(cs, planes_ab)
            # z plane: z(X,Y) = sum c_i * zclip_i (affine; c are w-scaled)
            zc = clip[:, 2]
            zpx = cs[0] * zc[0] + cs[1] * zc[1] + cs[2] * zc[2]
            cov &= (zpx >= 0.0) & (zpx <= 1.0)
            take = cov & (zpx >= z_test)
            if not take.any():
                continue
            den = cs[0] + cs[1] + cs[2]
            den = np.where(den == 0, 1e-30, den)
            b0, b1, b2 = cs[0] / den, cs[1] / den, cs[2] / den

            nrm = scene.normals[vi]
            nw = (world[:3, :3] @ nrm.T).T
            col = scene.colors[vi][:, :3] * mat.color_factors[:3]
            uv = scene.uvs[vi]
            light_c = nw @ SUN.astype(np.float64)
            lnum = b0 * light_c[0] + b1 * light_c[1] + b2 * light_c[2]
            light = np.maximum(lnum, 0.1)
            rgb = np.stack([b0 * col[0][k] + b1 * col[1][k] + b2 * col[2][k]
                            for k in range(3)])
            if mat.tex != scene_mod.TEX_WHITE:
                u = b0 * uv[0, 0] + b1 * uv[1, 0] + b2 * uv[2, 0]
                v = b0 * uv[0, 1] + b1 * uv[1, 1] + b2 * uv[2, 1]
                rgb = rgb * np.moveaxis(sample(u, v), -1, 0)
            out = rgb * (light * SUN_POWER) + rgb * AMBIENT[:, None, None]
            if accumulate:
                # additive blend: rgb = src + dst*dstAlpha
                # (vk_pipelines.cpp:157-167; mesh.frag writes alpha = 1)
                for k in range(3):
                    fb[k][take] = out[k][take] + fb[k][take] * fb[3][take]
                fb[3][take] = 1.0
            else:
                upd = take & (zpx >= z_buf)
                for k in range(3):
                    fb[k][upd] = out[k][upd]
                fb[3][upd] = 1.0
                z_buf[upd] = zpx[upd]
        return z_buf

    z_buf = np.zeros((H, W), np.float64)
    for node, mesh, si, surf in opaque:
        z_buf = shade_draw(node, mesh, surf, z_test=0.0, z_buf=z_buf,
                           accumulate=False)
    for node, mesh, si, surf in transp:
        shade_draw(node, mesh, surf, z_test=z_buf, z_buf=None,
                   accumulate=True)
    img = np.clip(fb[:3], 0, 1)
    return np.moveaxis((img * 255 + 0.5).astype(np.uint8), 0, -1)


def test_pipeline_matches_independent_numpy_reference(tmp_path):
    path, tex = _build_scene(tmp_path)
    scene = scene_mod.load_scene(path)
    flat = scene_mod.flatten_scene(scene, mipmapped=False)

    I4 = jnp.eye(4, dtype=jnp.float32)
    params = FrameParams(
        view=I4, proj=I4, bg_effect=jnp.int32(0),
        bg_data1=jnp.asarray(BG), bg_data2=jnp.asarray(BG),
        ambient=jnp.asarray([*AMBIENT, 0.0], jnp.float32),
        sun_dir=jnp.asarray([*SUN, 1.0], jnp.float32),
        sun_color=jnp.asarray([1, 1, 1, SUN_POWER], jnp.float32),
    )
    img, _ = render_frame(flat.buffers, params, width=W, height=H,
                          bin_cap=64)
    got = unpack_u8(np.asarray(img))[..., :3]

    want = _reference_render(scene, tex)

    # the scene must actually cover a meaningful part of the frame (guards
    # against a trivially-passing all-background comparison)
    bg_u8 = (BG[:3] * 255 + 0.5).astype(int)
    nonbg = (np.abs(want.astype(int) - bg_u8).sum(-1) > 6).sum()
    assert nonbg > W * H * 0.3, f"only {nonbg} non-background pixels"

    diff = np.abs(got.astype(int) - want.astype(int))
    # fp16 framebuffer rounding + f32 association differences: a few unorm8
    # steps; larger disagreement means a real semantics bug
    assert diff.max() <= 3, (
        f"max diff {diff.max()} at {np.unravel_index(diff.argmax(), diff.shape)}")
