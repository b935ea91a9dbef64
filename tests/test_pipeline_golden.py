"""End-to-end pipeline tests over the BASELINE.json milestone configs:
analytic expectations (no stored goldens needed), depth semantics,
texture sampling exactness, additive transparency, and determinism.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_renderer import milestones
from tpu_renderer.pipeline import FrameParams, render_frame
from tpu_renderer.scene import flatten_scene

W, H = 128, 64
I4 = jnp.eye(4, dtype=jnp.float32)


def render(scene, *, view=None, proj=None, bg_effect=0,
           bg1=(1, 1, 1, 1), bg2=(1, 1, 1, 1),
           ambient=(0, 0, 0, 0), sun_dir=(0, 0, 1, 1), sun_color=(1, 1, 1, 1),
           width=W, height=H, mipmapped=True):
    flat = flatten_scene(scene, mipmapped=mipmapped)
    params = FrameParams(
        view=I4 if view is None else jnp.asarray(view),
        proj=I4 if proj is None else jnp.asarray(proj),
        bg_effect=jnp.int32(bg_effect),
        bg_data1=jnp.asarray(bg1, jnp.float32),
        bg_data2=jnp.asarray(bg2, jnp.float32),
        ambient=jnp.asarray(ambient, jnp.float32),
        sun_dir=jnp.asarray(sun_dir, jnp.float32),
        sun_color=jnp.asarray(sun_color, jnp.float32),
    )
    img, aux = render_frame(flat.buffers, params, width=width, height=height,
                            bin_cap=128)
    from tpu_renderer.present import unpack_u8

    return unpack_u8(np.asarray(img)), aux


def test_colored_triangle():
    """Milestone 1: NDC triangle (1,1) (-1,1) (0,-1) with RGB corners."""
    img, _ = render(milestones.colored_triangle_scene())
    # vertex 2 (0,-1) is top-center in screen space (y down): blue-ish there
    top_center = img[2, W // 2]
    assert top_center[2] > 180 and top_center[0] < 80, top_center
    # bottom-right corner -> vertex 0 red
    br = img[H - 2, W - 3]
    assert br[0] > 180 and br[2] < 80, br
    # bottom-left -> vertex 1 green
    bl = img[H - 2, 2]
    assert bl[1] > 180 and bl[0] < 80, bl
    # background stays white (default gradient data1=data2=1)
    assert (img[0, 0] == [255, 255, 255, 255]).all()
    # center of triangle: roughly equal mix
    c = img[2 * H // 3, W // 2].astype(int)
    assert abs(int(c[0]) - int(c[1])) < 60


@pytest.mark.slow
def test_depth_reversed_z_between_quads():
    """Milestone 3: two quads; reversed-Z GREATER_OR_EQUAL — larger z wins."""
    near = milestones.colored_quad_scene(z0=0.8, z1=0.8)   # nearer
    far = milestones.colored_quad_scene(z0=0.2, z1=0.2)
    # merge: draw far after near; near must still win
    import tpu_renderer.scene as sm

    scene = milestones.colored_quad_scene(z0=0.8, z1=0.8)
    # tint the near quad pure red via vertex colors
    scene.colors = np.tile(np.array([1, 0, 0, 1], np.float32), (4, 1))
    far_sc = milestones.colored_quad_scene(z0=0.2, z1=0.2)
    # append far quad (pure green) as a second mesh+node
    base_v = scene.positions.shape[0]
    scene.positions = np.concatenate([scene.positions, far_sc.positions])
    scene.normals = np.concatenate([scene.normals, far_sc.normals])
    scene.colors = np.concatenate(
        [scene.colors, np.tile(np.array([0, 1, 0, 1], np.float32), (4, 1))])
    scene.uvs = np.concatenate([scene.uvs, far_sc.uvs])
    scene.indices = np.concatenate([scene.indices, far_sc.indices])
    mesh2 = sm.MeshAsset(
        name="far", surfaces=[sm.GeoSurface(0, 6, len(scene.materials) - 1,
                              sm.Bounds(np.zeros(3, np.float32), np.full(3, 10.0, np.float32)))],
        vertex_offset=base_v, index_offset=6)
    scene.meshes.append(mesh2)
    node2 = sm.MeshNode(1, "far")
    node2.refresh_transform(np.eye(4, dtype=np.float32))
    scene.nodes.append(node2)
    scene.top_nodes.append(node2)

    img, _ = render(scene)
    center = img[H // 2, W // 2]
    assert center[0] > 180 and center[1] < 80, f"near quad lost: {center}"


def test_textured_quad_nearest_exact():
    """Milestone 4: tex_image.frag — exact texel values with nearest filter."""
    tex = np.zeros((4, 4, 4), np.uint8)
    tex[..., 3] = 255
    tex[0, 0] = [255, 0, 0, 255]      # uv (0..0.25, 0..0.25)
    tex[0, 3] = [0, 255, 0, 255]
    tex[3, 0] = [0, 0, 255, 255]
    tex[3, 3] = [255, 255, 0, 255]
    scene = milestones.textured_quad_scene(tex, nearest=True, mipmapped=False)
    img, _ = render(scene, mipmapped=False)
    # quad spans NDC -0.5..0.5 => screen x [W/4, 3W/4), y [H/4, 3H/4)
    # uv (0,0) at quad corner (-0.5,-0.5) which is screen upper-left of quad
    x0, y0 = W // 4, H // 4
    qw, qh = W // 2, H // 2
    # sample near each quad corner (inside first/last texel cell)
    np.testing.assert_array_equal(img[y0 + 1, x0 + 1], [255, 0, 0, 255])
    np.testing.assert_array_equal(img[y0 + 1, x0 + qw - 2], [0, 255, 0, 255])
    np.testing.assert_array_equal(img[y0 + qh - 2, x0 + 1], [0, 0, 255, 255])
    np.testing.assert_array_equal(img[y0 + qh - 2, x0 + qw - 2], [255, 255, 0, 255])


def test_transparent_additive_blend():
    """Additive pass: out = src + dst*dstA (vk_pipelines.cpp:157-167)."""
    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    # make the quad transparent with color (0.25, 0.5, 0.125)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.25, 0.5, 0.125, 1], np.float32), (4, 1))
    img, aux = render(scene, bg1=(0.5, 0.25, 0.5, 1.0), bg2=(0.5, 0.25, 0.5, 1.0))
    center = img[H // 2, W // 2].astype(np.float32) / 255.0
    expected = np.array([0.25 + 0.5, 0.5 + 0.25, 0.125 + 0.5])
    np.testing.assert_allclose(center[:3], expected, atol=2 / 255)
    # background untouched outside the quad
    np.testing.assert_allclose(img[1, 1][:3] / 255.0, [0.5, 0.25, 0.5], atol=1 / 255)


def test_transparent_layers_accumulate():
    """Two overlapping transparent quads sum (order-independent additive)."""
    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.2, 0.2, 0.2, 1], np.float32), (4, 1))
    # duplicate the quad as a second node at same depth
    import tpu_renderer.scene as sm

    node2 = sm.MeshNode(0, "again")
    node2.refresh_transform(np.eye(4, dtype=np.float32))
    scene.nodes.append(node2)
    scene.top_nodes.append(node2)
    img, _ = render(scene, bg1=(0.1, 0.1, 0.1, 1), bg2=(0.1, 0.1, 0.1, 1))
    center = img[H // 2, W // 2].astype(np.float32) / 255.0
    np.testing.assert_allclose(center[:3], [0.5, 0.5, 0.5], atol=2 / 255)


@pytest.mark.slow
def test_six_transparent_layers_unbounded_sum():
    """Six stacked glass quads all blend (reference blends EVERY transparent
    fragment, vk_engine.cpp:1459-1465 — no layer cap may drop the 3rd+)."""
    import tpu_renderer.scene as sm

    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.1, 0.05, 0.025, 1], np.float32), (4, 1))
    for k in range(5):
        node = sm.MeshNode(0, f"layer{k}")
        node.refresh_transform(np.eye(4, dtype=np.float32))
        scene.nodes.append(node)
        scene.top_nodes.append(node)
    img, aux = render(scene, bg1=(0.1, 0.1, 0.1, 1), bg2=(0.1, 0.1, 0.1, 1))
    assert int(aux["transparent_layers"]) == 6
    center = img[H // 2, W // 2].astype(np.float32) / 255.0
    # 6 * src + bg (bg alpha 1.0)
    expected = np.array([0.6 + 0.1, 0.3 + 0.1, 0.15 + 0.1])
    np.testing.assert_allclose(center[:3], expected, atol=2 / 255)


def test_determinism():
    """Same scene+camera twice => bit-identical frames (SURVEY §4 item 5)."""
    scene = milestones.colored_triangle_scene()
    img1, _ = render(scene)
    img2, _ = render(scene)
    np.testing.assert_array_equal(img1, img2)


def test_sky_background_behind_geometry():
    img, _ = render(milestones.colored_triangle_scene(), bg_effect=1,
                    bg1=(0.1, 0.2, 0.4, 0.97))
    # top rows: dark sky gradient, not white
    assert img[0, 0][2] < 60
    # triangle still drawn
    assert img[2, W // 2][2] > 150


def test_fused_matches_deferred():
    """The fused-raster path must match the gather-based deferred path
    (within 1 u8 step: the interpolation divides in a different order)."""
    tex = (np.indices((8, 8)).sum(0) % 2 * 200 + 30).astype(np.uint8)
    img = np.stack([tex, tex // 2, 255 - tex, np.full_like(tex, 255)], -1)
    scene = milestones.textured_quad_scene(img, nearest=False, mipmapped=True)
    scene.colors = np.tile(np.array([1, 0.8, 0.6, 1], np.float32), (4, 1))
    flat = flatten_scene(scene)
    params = FrameParams(
        view=I4, proj=I4, bg_effect=jnp.int32(0),
        bg_data1=jnp.asarray([0.3, 0.3, 0.3, 1], jnp.float32),
        bg_data2=jnp.asarray([0.3, 0.3, 0.3, 1], jnp.float32),
        ambient=jnp.asarray([0.1, 0.1, 0.1, 0.1], jnp.float32),
        sun_dir=jnp.asarray([0.2, 0.4, 0.9, 1], jnp.float32),
        sun_color=jnp.ones(4, jnp.float32))
    a, _ = render_frame(flat.buffers, params, width=W, height=H,
                        bin_cap=128, fused=True)
    b, _ = render_frame(flat.buffers, params, width=W, height=H,
                        bin_cap=128, fused=False)
    diff = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_fused_transparent_matches_deferred():
    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.25, 0.5, 0.125, 1], np.float32), (4, 1))
    flat = flatten_scene(scene)
    params = FrameParams(
        view=I4, proj=I4, bg_effect=jnp.int32(0),
        bg_data1=jnp.asarray([0.5, 0.25, 0.5, 1], jnp.float32),
        bg_data2=jnp.asarray([0.5, 0.25, 0.5, 1], jnp.float32),
        ambient=jnp.zeros(4, jnp.float32),
        sun_dir=jnp.asarray([0, 0, 1, 1], jnp.float32),
        sun_color=jnp.ones(4, jnp.float32))
    a, _ = render_frame(flat.buffers, params, width=W, height=H,
                        bin_cap=128, fused=True)
    b, _ = render_frame(flat.buffers, params, width=W, height=H,
                        bin_cap=128, fused=False)
    diff = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


@pytest.mark.slow
def test_nearest_mip_scene_single_tap_identical():
    """Scenes with no trilinear sampler render bit-identically with the
    static single-tap fast path (trilinear=False drops the second mip-tap
    gather; the per-pixel mip fraction is provably 0 there)."""
    tex = (np.arange(8 * 8 * 4, dtype=np.uint32) % 256).astype(np.uint8)
    tex = tex.reshape(8, 8, 4)
    tex[..., 3] = 255
    # nearest-mip sampler (FILTER_MIP_LINEAR off), mipmapped texture
    scene = milestones.textured_quad_scene(tex, nearest=True, mipmapped=True)
    flat = flatten_scene(scene)
    params = FrameParams(
        view=I4, proj=I4, bg_effect=jnp.int32(0),
        bg_data1=jnp.asarray((1, 1, 1, 1), jnp.float32),
        bg_data2=jnp.asarray((1, 1, 1, 1), jnp.float32),
        ambient=jnp.zeros(4, jnp.float32),
        sun_dir=jnp.asarray((0, 0, 1, 1), jnp.float32),
        sun_color=jnp.ones(4, jnp.float32))
    a, _ = render_frame(flat.buffers, params, width=W, height=H,
                        trilinear=True)
    b, _ = render_frame(flat.buffers, params, width=W, height=H,
                        trilinear=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_detects_trilinear_statically():
    from tpu_renderer.config import RendererConfig
    from tpu_renderer.engine import Engine
    from tpu_renderer.resources import (
        FILTER_MAG_LINEAR, FILTER_MIN_LINEAR, FILTER_MIP_LINEAR)

    tex = np.full((8, 8, 4), 200, np.uint8)
    tri_flags = FILTER_MAG_LINEAR | FILTER_MIN_LINEAR | FILTER_MIP_LINEAR
    for flags, mipped, expect in (
            (0, True, False),                      # nearest-everything
            (tri_flags, False, False),             # trilinear sampler, 1 level
            (tri_flags, True, True)):              # trilinear + mip chain
        scene = milestones.textured_quad_scene(tex, mipmapped=mipped)
        scene.materials[-1].filter_flags = flags
        eng = Engine(RendererConfig(width=64, height=32,
                                    **milestones.UNLIT_CONFIG_OVERRIDES))
        eng.init(scene=scene)
        assert eng._trilinear == expect, (flags, mipped, eng._trilinear)
