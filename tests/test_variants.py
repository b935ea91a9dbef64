"""KHR_materials_variants: parsing + default-variant parity + selection.

The reference enables the extension in fastgltf (vk_loader.cpp:169-191) but
never selects a variant, so its render equals our default (base-material)
render; select_variant goes beyond the reference.
"""

import base64
import json

import numpy as np

from tpu_renderer import gltf as gltf_mod
from tpu_renderer import scene as scene_mod


def _variant_gltf(tmp_path):
    # one quad with base material red; variants: "alt" -> green, "third" -> blue
    pos = np.asarray([[-0.5, -0.5, 0.5], [0.5, -0.5, 0.5],
                      [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5]], np.float32)
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "extensionsUsed": ["KHR_materials_variants"],
        "extensions": {"KHR_materials_variants": {
            "variants": [{"name": "alt"}, {"name": "third"}]}},
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "materials": [
            {"name": "red", "pbrMetallicRoughness":
                {"baseColorFactor": [1, 0, 0, 1]}},
            {"name": "green", "pbrMetallicRoughness":
                {"baseColorFactor": [0, 1, 0, 1]}},
            {"name": "blue", "pbrMetallicRoughness":
                {"baseColorFactor": [0, 0, 1, 1]}},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1, "material": 0,
            "extensions": {"KHR_materials_variants": {"mappings": [
                {"material": 1, "variants": [0]},
                {"material": 2, "variants": [1]},
            ]}}}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
    }
    p = tmp_path / "variants.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_parse_variants(tmp_path):
    parsed = gltf_mod.load_gltf(_variant_gltf(tmp_path))
    assert parsed.variants == ["alt", "third"]
    surf = parsed.meshes[0].surfaces[0]
    assert surf.material == 0
    assert surf.variant_materials == {0: 1, 1: 2}


def test_default_render_uses_base_material(tmp_path):
    scene = scene_mod.load_scene(_variant_gltf(tmp_path))
    surf = scene.meshes[0].surfaces[0]
    mat = scene.materials[surf.material]
    np.testing.assert_array_equal(mat.color_factors, [1, 0, 0, 1])


def test_select_variant_by_name_and_index(tmp_path):
    scene = scene_mod.load_scene(_variant_gltf(tmp_path))
    assert scene_mod.select_variant(scene, "alt") == 1
    surf = scene.meshes[0].surfaces[0]
    np.testing.assert_array_equal(
        scene.materials[surf.material].color_factors, [0, 1, 0, 1])
    assert scene_mod.select_variant(scene, 1) == 1
    np.testing.assert_array_equal(
        scene.materials[surf.material].color_factors, [0, 0, 1, 1])
    # re-selecting the same variant is a no-op
    assert scene_mod.select_variant(scene, 1) == 0


def test_select_variant_renders_mapped_material(tmp_path):
    import jax.numpy as jnp

    from tpu_renderer.pipeline import FrameParams, render_frame
    from tpu_renderer.present import unpack_u8

    path = _variant_gltf(tmp_path)
    I4 = jnp.eye(4, dtype=jnp.float32)
    params = FrameParams(
        view=I4, proj=I4, bg_effect=jnp.int32(0),
        bg_data1=jnp.zeros(4, jnp.float32), bg_data2=jnp.zeros(4, jnp.float32),
        ambient=jnp.zeros(4, jnp.float32),
        sun_dir=jnp.asarray([0, 0, 0, 0], jnp.float32),  # floor light 0.1
        sun_color=jnp.asarray([1, 1, 1, 10.0], jnp.float32),
    )

    def center_px(scene):
        flat = scene_mod.flatten_scene(scene)
        img, _ = render_frame(flat.buffers, params, width=128, height=64,
                              bin_cap=64)
        return unpack_u8(np.asarray(img))[32, 64]

    base = center_px(scene_mod.load_scene(path))
    assert base[0] > 150 and base[1] < 50, base          # red
    alt = center_px(scene_mod.load_scene(path, variant="alt"))
    assert alt[1] > 150 and alt[0] < 50, alt             # green


def test_unknown_variant_raises(tmp_path):
    import pytest

    scene = scene_mod.load_scene(_variant_gltf(tmp_path))
    with pytest.raises(KeyError):
        scene_mod.select_variant(scene, "nope")
