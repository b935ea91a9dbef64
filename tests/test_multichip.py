"""Multi-chip sharding: the ('rows', 'tri') mesh render must be pixel-exact
vs the single-chip pipeline (8 virtual CPU devices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_renderer import milestones
from tpu_renderer.parallel.multichip import make_mesh, render_frame_multichip
from tpu_renderer.pipeline import FrameParams, render_frame
from tpu_renderer.scene import flatten_scene

W, H = 128, 64
I4 = jnp.eye(4, dtype=jnp.float32)


def _params(**kw):
    d = dict(view=I4, proj=I4, bg_effect=jnp.int32(0),
             bg_data1=jnp.asarray([0.2, 0.3, 0.4, 1.0], jnp.float32),
             bg_data2=jnp.asarray([0.8, 0.7, 0.6, 1.0], jnp.float32),
             ambient=jnp.zeros(4, jnp.float32),
             sun_dir=jnp.asarray([0, 0, 1, 1], jnp.float32),
             sun_color=jnp.ones(4, jnp.float32))
    d.update(kw)
    return FrameParams(**d)


@pytest.mark.parametrize(
    "fused", [pytest.param(True, marks=pytest.mark.slow), False])
@pytest.mark.parametrize("rows,tri", [(2, 1), (1, 2), (2, 4)])
def test_multichip_matches_single_chip(rows, tri, fused):
    if len(jax.devices()) < rows * tri:
        pytest.skip("not enough devices")
    scene = milestones.colored_quad_scene(z0=0.4, z1=0.7)
    flat = flatten_scene(scene)
    params = _params()
    single, aux1 = render_frame(flat.buffers, params, width=W, height=H,
                                bin_cap=128, fused=fused)
    mesh = make_mesh(rows, tri)
    multi, aux2 = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                         width=W, height=H,
                                         bin_cap=128, fused=fused)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(single))
    # the psum'd aux counters must composite to the single-chip values
    for k in ("opaque_triangles", "visible_opaque_draws"):
        assert int(aux2[k]) == int(aux1[k]), k
    assert int(aux2["opaque_triangles"]) == 2


@pytest.mark.slow
def test_multichip_transparent():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.25, 0.5, 0.125, 1], np.float32), (4, 1))
    flat = flatten_scene(scene)
    params = _params(bg_data1=jnp.asarray([0.5, 0.25, 0.5, 1.0], jnp.float32),
                     bg_data2=jnp.asarray([0.5, 0.25, 0.5, 1.0], jnp.float32))
    single, _ = render_frame(flat.buffers, params, width=W, height=H,
                             bin_cap=128, transp_textured=False)
    mesh = make_mesh(2, 2)
    multi, _ = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                   width=W, height=H,
                                   bin_cap=128, transp_textured=False)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(single))


@pytest.mark.slow
def test_multichip_stacked_transparent_layers():
    """3 stacked glass layers: the psum'd accumulation must match the
    single-chip sum (f32 association differs across shards: 1 u8 step)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    import tpu_renderer.scene as sm

    scene = milestones.colored_quad_scene(z0=0.5, z1=0.5)
    scene.materials[-1].transparent = True
    scene.colors = np.tile(np.array([0.1, 0.15, 0.05, 1], np.float32), (4, 1))
    for k in range(2):
        node = sm.MeshNode(0, f"l{k}")
        node.refresh_transform(np.eye(4, dtype=np.float32))
        scene.nodes.append(node)
        scene.top_nodes.append(node)
    flat = flatten_scene(scene)
    params = _params(bg_data1=jnp.asarray([0.2, 0.2, 0.2, 1.0], jnp.float32),
                     bg_data2=jnp.asarray([0.2, 0.2, 0.2, 1.0], jnp.float32))
    single, _ = render_frame(flat.buffers, params, width=W, height=H,
                             bin_cap=128, transp_textured=False)
    mesh = make_mesh(2, 2)
    multi, _ = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                   width=W, height=H,
                                   bin_cap=128, transp_textured=False)
    diff = np.abs(np.asarray(multi).astype(int) - np.asarray(single).astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


@pytest.mark.parametrize(
    "fused", [pytest.param(True, marks=pytest.mark.slow), False])
def test_multichip_textured_transparent_unbounded(fused):
    """Textured-transparent goes through the per-shard peel while_loop
    (fused=True: the chunk-streaming slab peel; False: the deferred one)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    tex = np.full((4, 4, 4), 255, np.uint8)
    tex[..., 0] = 128
    scene = milestones.textured_quad_scene(tex, nearest=True, mipmapped=False)
    scene.materials[-1].transparent = True
    flat = flatten_scene(scene, mipmapped=False)
    params = _params(bg_data1=jnp.asarray([0.1, 0.1, 0.1, 1.0], jnp.float32),
                     bg_data2=jnp.asarray([0.1, 0.1, 0.1, 1.0], jnp.float32))
    single, _ = render_frame(flat.buffers, params, width=W, height=H,
                             bin_cap=128, transp_textured=True, fused=fused)
    mesh = make_mesh(2, 2)
    multi, _ = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                   width=W, height=H,
                                   bin_cap=128, transp_textured=True,
                                   fused=fused)
    diff = np.abs(np.asarray(multi).astype(int) - np.asarray(single).astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


@pytest.mark.parametrize(
    "fused", [pytest.param(True, marks=pytest.mark.slow), False])
def test_multichip_stacked_textured_transparent(fused):
    """3 stacked TEXTURED transparent layers: the global-order peel must
    composite + fp16-quantize PER LAYER exactly like the single-chip loop
    (pipeline.py one_peel) — the divergent regime round 4 left untested
    (per-layer vs once-at-the-end quantization)."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    import tpu_renderer.scene as sm

    tex = np.full((4, 4, 4), 255, np.uint8)
    tex[..., 0] = 96
    tex[1::2, ::2, 1] = 40
    scene = milestones.textured_quad_scene(tex, nearest=True, mipmapped=False)
    scene.materials[-1].transparent = True
    # fractional color factors make every peel's blend land between fp16
    # lattice points, so a once-at-the-end quantization CANNOT hide
    scene.materials[-1].color_factors = np.asarray(
        [0.3, 0.21, 0.17, 1.0], np.float32)
    for k in range(2):
        node = sm.MeshNode(0, f"l{k}")
        node.refresh_transform(np.eye(4, dtype=np.float32))
        scene.nodes.append(node)
        scene.top_nodes.append(node)
    flat = flatten_scene(scene, mipmapped=False)
    params = _params(bg_data1=jnp.asarray([0.3, 0.3, 0.3, 1.0], jnp.float32),
                     bg_data2=jnp.asarray([0.3, 0.3, 0.3, 1.0], jnp.float32))
    single, aux1 = render_frame(flat.buffers, params, width=W, height=H,
                                bin_cap=128, transp_textured=True,
                                fused=fused)
    mesh = make_mesh(2, 2)
    multi, aux2 = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                         width=W, height=H,
                                         bin_cap=128, transp_textured=True,
                                         fused=fused)
    assert int(aux1["transparent_layers"]) == 3
    assert int(aux2["transparent_layers"]) == 3
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(single))


def _trilinear_textured_scene():
    from tpu_renderer import resources, scene as sm

    tex = np.zeros((16, 16, 4), np.uint8)
    tex[::2, :, 0] = 255
    tex[:, ::2, 1] = 255
    tex[..., 3] = 255
    scene = milestones.textured_quad_scene(tex, nearest=False, mipmapped=True)
    m = scene.materials[-1]
    m.filter_flags = (sm.DEFAULT_SAMPLER_LINEAR_FLAGS
                      | resources.FILTER_MIP_LINEAR)
    return scene


@pytest.mark.parametrize(
    "fused", [pytest.param(True, marks=pytest.mark.slow), False])
def test_multichip_trilinear_textured(fused):
    """The two-tap trilinear sampler path (the reference's DEFAULT mipmap
    mode, vk_loader.cpp:43-54) must compose identically under the mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    flat = flatten_scene(_trilinear_textured_scene())
    params = _params()
    single, _ = render_frame(flat.buffers, params, width=W, height=H,
                             bin_cap=128, fused=fused, trilinear=True)
    mesh = make_mesh(2, 2)
    multi, _ = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                   width=W, height=H,
                                   bin_cap=128, fused=fused, trilinear=True)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(single))


def test_multichip_render_scale_out_extent():
    """Live render-scale under the mesh: draw at (W, H), upscale-blit to
    (2W, 2H) after the bands gather — must match the single-chip blit."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    scene = milestones.colored_quad_scene(z0=0.4, z1=0.7)
    flat = flatten_scene(scene)
    params = _params()
    single, _ = render_frame(flat.buffers, params, width=W, height=H,
                             bin_cap=128, fused=False,
                             out_width=2 * W, out_height=2 * H)
    mesh = make_mesh(2, 1)
    multi, _ = render_frame_multichip(flat.buffers, params, mesh=mesh,
                                   width=W, height=H,
                                   bin_cap=128, fused=False,
                                   out_width=2 * W, out_height=2 * H)
    assert multi.shape == (2 * H, 2 * W)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(single))


@pytest.mark.parametrize(
    "fused", [pytest.param(True, marks=pytest.mark.slow), False])
def test_engine_multichip_product_path(tmp_path, fused):
    """Engine(config.multichip) routes draw() through the sharded renderer
    and matches the single-chip engine pixel-exactly — on a scene the
    camera actually sees, so the live psum'd aux counters are exercised.
    fused=True is the production default: the full product stack
    (Engine -> caps/statics -> fused sharded slab render -> stats)."""
    from tpu_renderer.config import RendererConfig
    from tpu_renderer.engine import Engine
    from tpu_renderer.utils.demo import build_demo_glb

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    path = str(tmp_path / "scene.glb")
    build_demo_glb(path, grid=2)
    base = dict(width=W, height=H, fused=fused,
                camera_position=(0.0, 2.0, 12.0))
    eng1 = Engine(RendererConfig(**base))
    eng1.init(scene_path=path)
    img1 = eng1.draw()
    eng2 = Engine(RendererConfig(multichip=(2, 2), **base))
    eng2.init(scene_path=path)
    assert eng2.mesh is not None and eng2.mesh.shape == {"rows": 2, "tri": 2}
    img2 = eng2.draw()
    np.testing.assert_array_equal(img2, img1)
    # live psum'd aux counters must match the single-chip engine's
    assert eng2.stats.triangle_count == eng1.stats.triangle_count > 0
    assert eng2.stats.drawcall_count == eng1.stats.drawcall_count > 0


@pytest.mark.slow
def test_cli_benchmark_multichip():
    from tpu_renderer import cli

    rc = cli.main(["benchmark", "--grid", "2", "--width", "256",
                   "--height", "64", "--frames", "2", "--multichip", "2x2"])
    assert rc == 0
