"""Loader tests on tiny hand-built GLB fixtures (SURVEY §4 plan item 3)."""

import numpy as np
import pytest

from tpu_renderer import gltf
from tpu_renderer.resources import FILTER_MAG_LINEAR, FILTER_MIN_LINEAR, FILTER_MIP_LINEAR
from tpu_renderer.utils.glb_writer import GLBBuilder


def test_triangle_roundtrip(tmp_path):
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    col = np.array([[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]], np.float32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    nrm = np.array([[0, 0, 1]] * 3, np.float32)
    b.add_material((1, 1, 1, 1), name="m")
    b.add_mesh([dict(positions=pos, normals=nrm, uvs=uv, colors=col,
                     indices=[0, 1, 2], material=0)], name="tri")
    b.add_node(mesh=0, name="trinode")
    path = str(tmp_path / "tri.glb")
    b.save(path)

    parsed = gltf.load_gltf(path)
    m = parsed.meshes[0]
    np.testing.assert_allclose(m.positions, pos)
    np.testing.assert_allclose(m.colors, col)
    np.testing.assert_allclose(m.uvs, uv)
    np.testing.assert_allclose(m.normals, nrm)
    np.testing.assert_array_equal(m.indices, [0, 1, 2])
    assert parsed.top_nodes == [0]
    assert parsed.nodes[0].mesh == 0


def test_vertex_defaults_when_attributes_missing(tmp_path):
    # vk_loader.cpp:320-328 — normal (1,0,0), color white, uv 0
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2])])
    b.add_node(mesh=0)
    path = str(tmp_path / "bare.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    np.testing.assert_allclose(m.normals, [[1, 0, 0]] * 3)
    np.testing.assert_allclose(m.colors, np.ones((3, 4)))
    np.testing.assert_allclose(m.uvs, np.zeros((3, 2)))


def test_multi_primitive_index_offsets_and_bounds_quirk(tmp_path):
    b = GLBBuilder()
    p0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    p1 = np.array([[5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    b.add_mesh([
        dict(positions=p0, indices=[0, 1, 2]),
        dict(positions=p1, indices=[0, 1, 2]),
    ])
    b.add_node(mesh=0)
    path = str(tmp_path / "two.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    # second primitive's indices offset by the first's vertex count
    np.testing.assert_array_equal(m.indices, [0, 1, 2, 3, 4, 5])
    s0, s1 = m.surfaces
    assert (s0.start_index, s0.count) == (0, 3)
    assert (s1.start_index, s1.count) == (3, 3)
    # surface 0 bounds: only p0 (computed before p1 loaded)
    np.testing.assert_allclose(s0.bounds_origin, [0.5, 0.5, 0.0])
    # reference quirk: surface 1 bounds span ALL mesh vertices so far
    # (vk_loader.cpp:366-375), i.e. p0 ∪ p1
    np.testing.assert_allclose(s1.bounds_origin, [3.0, 3.0, 2.5])
    np.testing.assert_allclose(s1.bounds_extents, [3.0, 3.0, 2.5])


def test_node_transforms_trs_and_matrix(tmp_path):
    from tpu_renderer import math3d

    b = GLBBuilder()
    b.add_mesh([dict(positions=np.zeros((3, 3), np.float32), indices=[0, 1, 2])])
    b.add_node(mesh=0, translation=(1, 2, 3), rotation=(0, 0, 0.7071068, 0.7071068),
               scale=(2, 2, 2), name="trs")
    mat = math3d.translate((5, 0, 0)) @ math3d.scale((3, 1, 1))
    b.add_node(mesh=0, matrix=mat, name="mat")
    path = str(tmp_path / "nodes.glb")
    b.save(path)
    parsed = gltf.load_gltf(path)
    trs = parsed.nodes[0].local_transform
    expected = (math3d.translate((1, 2, 3))
                @ math3d.quat_to_mat4(math3d.quat(0.7071068, 0, 0, 0.7071068))
                @ math3d.scale((2, 2, 2)))
    np.testing.assert_allclose(trs, expected, atol=1e-6)
    np.testing.assert_allclose(parsed.nodes[1].local_transform, mat, atol=1e-6)


def test_materials_samplers_and_images(tmp_path):
    b = GLBBuilder()
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 0] = 200
    img[..., 3] = 255
    i = b.add_image(img)
    s_nearest = b.add_sampler(mag=9728, min_=9984)  # nearest, nearest-mip-nearest
    s_tri = b.add_sampler(mag=9729, min_=9987)      # linear, trilinear
    t0 = b.add_texture(i, s_nearest)
    t1 = b.add_texture(i, s_tri)
    b.add_material((0.5, 0.25, 1, 1), texture=t0, metallic=0.3, roughness=0.7, name="a")
    b.add_material((1, 1, 1, 0.5), texture=t1, alpha_mode="BLEND", name="b")
    b.add_mesh([dict(positions=np.zeros((3, 3), np.float32), indices=[0, 1, 2], material=0)])
    b.add_node(mesh=0)
    path = str(tmp_path / "mats.glb")
    b.save(path)
    parsed = gltf.load_gltf(path)
    a, bb = parsed.materials
    np.testing.assert_allclose(a.color_factors, [0.5, 0.25, 1, 1])
    np.testing.assert_allclose(a.metal_rough_factors[:2], [0.3, 0.7])
    assert not a.transparent and bb.transparent
    assert parsed.samplers[0].filter_flags == 0
    assert parsed.samplers[1].filter_flags == (
        FILTER_MAG_LINEAR | FILTER_MIN_LINEAR | FILTER_MIP_LINEAR)
    np.testing.assert_array_equal(parsed.images[0], img)


def test_common_samplers_default_to_trilinear(tmp_path):
    """extract_mipmap_mode (vk_loader.cpp:43-54) defaults to
    MIPMAP_MODE_LINEAR for every min filter except *MipMapNearest — plain
    LINEAR/NEAREST min filters and missing filters (defaulted to Nearest by
    the caller, vk_loader.cpp:206) all get trilinear mip interpolation."""
    b = GLBBuilder()
    i = b.add_image(np.zeros((4, 4, 4), np.uint8))
    cases = [
        b.add_sampler(mag=9729, min_=9729),   # plain linear min
        b.add_sampler(mag=9729, min_=9728),   # plain nearest min
        b.add_sampler(mag=None, min_=None),   # missing filters
        b.add_sampler(mag=9728, min_=9986),   # nearest-mip-linear
        b.add_sampler(mag=9729, min_=9985),   # linear-mip-NEAREST
        b.add_sampler(mag=12345, min_=54321),  # out-of-enum values
    ]
    for s in cases:
        b.add_texture(i, s)
    b.add_mesh([dict(positions=np.zeros((3, 3), np.float32), indices=[0, 1, 2])])
    b.add_node(mesh=0)
    path = str(tmp_path / "samplers.glb")
    b.save(path)
    flags = [s.filter_flags for s in gltf.load_gltf(path).samplers]
    assert flags[0] == FILTER_MAG_LINEAR | FILTER_MIN_LINEAR | FILTER_MIP_LINEAR
    assert flags[1] == FILTER_MAG_LINEAR | FILTER_MIP_LINEAR
    # missing mag/min both default to Nearest (vk_loader.cpp:204-206), but
    # the mipmap mode still falls to the LINEAR default branch
    assert flags[2] == FILTER_MIP_LINEAR
    # NearestMipMapLinear is in extract_filter's NEAREST group (vk_loader.cpp:31)
    assert flags[3] == FILTER_MIP_LINEAR
    assert flags[4] == FILTER_MAG_LINEAR | FILTER_MIN_LINEAR
    # out-of-enum filter values fall to the default LINEAR branches of both
    # extract_filter (vk_loader.cpp:38-40) and extract_mipmap_mode (:51-53)
    assert flags[5] == FILTER_MAG_LINEAR | FILTER_MIN_LINEAR | FILTER_MIP_LINEAR


def test_sparse_accessor_substitution(tmp_path):
    """Sparse accessors patch indices/values over the base view
    (fastgltf iterateAccessor semantics, vk_loader.cpp:306-308)."""
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 2, 2]], np.float32)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2])])
    b.add_node(mesh=0)
    # make POSITION sparse: replace vertices 1 and 3
    sidx = np.array([1, 3], np.uint16)
    svals = np.array([[9, 9, 9], [7, 7, 7]], np.float32)
    iview = b.add_buffer_view(sidx.tobytes())
    vview = b.add_buffer_view(svals.tobytes())
    b.gltf["accessors"][0]["sparse"] = {
        "count": 2,
        "indices": {"bufferView": iview, "componentType": 5123},
        "values": {"bufferView": vview},
    }
    path = str(tmp_path / "sparse.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    expected = pos.copy()
    expected[[1, 3]] = svals
    np.testing.assert_array_equal(m.positions, expected)


def test_triangle_strip_and_fan_triangulate(tmp_path):
    b = GLBBuilder()
    pos = np.zeros((5, 3), np.float32)
    pos[:, 0] = np.arange(5)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2, 3]),
                dict(positions=pos, indices=[0, 1, 2, 3, 4])])
    b.add_node(mesh=0)
    b.gltf["meshes"][0]["primitives"][0]["mode"] = 5  # STRIP
    b.gltf["meshes"][0]["primitives"][1]["mode"] = 6  # FAN
    path = str(tmp_path / "modes.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    # strip 0123 -> (0,1,2), (2,1,3) [odd flips winding]
    np.testing.assert_array_equal(m.indices[:6], [0, 1, 2, 2, 1, 3])
    # fan 01234 -> (0,1,2), (0,2,3), (0,3,4), offset by the strip's 5 verts
    np.testing.assert_array_equal(m.indices[6:] - 5, [0, 1, 2, 0, 2, 3, 0, 3, 4])
    assert m.surfaces[0].count == 6 and m.surfaces[1].count == 9


def test_line_primitive_skipped(tmp_path):
    b = GLBBuilder()
    pos = np.zeros((4, 3), np.float32)
    b.add_mesh([dict(positions=pos, indices=[0, 1]),
                dict(positions=pos, indices=[0, 1, 2])])
    b.add_node(mesh=0)
    b.gltf["meshes"][0]["primitives"][0]["mode"] = 1  # LINES
    path = str(tmp_path / "lines.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    assert len(m.surfaces) == 1 and m.surfaces[0].count == 3


def test_khr_texture_transform_applied(tmp_path):
    b = GLBBuilder()
    i = b.add_image(np.zeros((4, 4, 4), np.uint8))
    t = b.add_texture(i, b.add_sampler())
    mat = b.add_material((1, 1, 1, 1), texture=t)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    b.add_mesh([dict(positions=np.zeros((3, 3), np.float32), uvs=uv,
                     indices=[0, 1, 2], material=mat)])
    b.add_node(mesh=0)
    b.gltf["materials"][mat]["pbrMetallicRoughness"]["baseColorTexture"][
        "extensions"] = {"KHR_texture_transform": {
            "offset": [0.5, 0.25], "scale": [2.0, 3.0]}}
    path = str(tmp_path / "ktt.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    expected = uv * [2.0, 3.0] + [0.5, 0.25]
    np.testing.assert_allclose(m.uvs, expected, atol=1e-6)


def test_non_indexed_primitive_generates_indices(tmp_path):
    b = GLBBuilder()
    pos = np.zeros((6, 3), np.float32)
    b.add_mesh([dict(positions=pos)])
    b.add_node(mesh=0)
    path = str(tmp_path / "noidx.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    np.testing.assert_array_equal(m.indices, np.arange(6))


def test_normalized_u8_colors(tmp_path):
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    col = np.array([[255, 0, 128, 255]] * 3, np.uint8)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2])])
    # manually patch a normalized u8 VEC4 COLOR_0 accessor
    acc = b.add_accessor(col, "VEC4", 5121, normalized=True)
    b.gltf["meshes"][0]["primitives"][0]["attributes"]["COLOR_0"] = acc
    b.add_node(mesh=0)
    path = str(tmp_path / "ncol.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    np.testing.assert_allclose(m.colors[0], [1.0, 0.0, 128 / 255, 1.0], atol=1e-6)


def test_hierarchy_top_nodes(tmp_path):
    b = GLBBuilder()
    b.add_mesh([dict(positions=np.zeros((3, 3), np.float32), indices=[0, 1, 2])])
    child = b.add_node(mesh=0, name="child", top_level=False)
    b.add_node(children=[child], name="root")
    path = str(tmp_path / "hier.glb")
    b.save(path)
    parsed = gltf.load_gltf(path)
    assert parsed.top_nodes == [1]
    assert parsed.nodes[1].children == [0]


def test_vec3_colors_alpha_defaults_to_one(tmp_path):
    """COLOR_0 may be VEC3 (glTF 2.0 spec); alpha then defaults to 1 — the
    reference's accessor iteration fills a vec4 the same way
    (vk_loader.cpp:345-352)."""
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    col = np.array([[0.25, 0.5, 0.75]] * 3, np.float32)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2])])
    acc = b.add_accessor(col, "VEC3", 5126)
    b.gltf["meshes"][0]["primitives"][0]["attributes"]["COLOR_0"] = acc
    b.add_node(mesh=0)
    path = str(tmp_path / "c3.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    np.testing.assert_allclose(m.colors, [[0.25, 0.5, 0.75, 1.0]] * 3)


def test_normalized_u16_uvs(tmp_path):
    """KHR_mesh_quantization-style normalized u16 TEXCOORD_0 (the reference
    enables that extension, vk_loader.cpp:169-178)."""
    b = GLBBuilder()
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [65535, 0], [0, 32768]], np.uint16)
    b.add_mesh([dict(positions=pos, indices=[0, 1, 2])])
    acc = b.add_accessor(uv, "VEC2", 5123, normalized=True)
    b.gltf["meshes"][0]["primitives"][0]["attributes"]["TEXCOORD_0"] = acc
    b.add_node(mesh=0)
    path = str(tmp_path / "quv.glb")
    b.save(path)
    m = gltf.load_gltf(path).meshes[0]
    np.testing.assert_allclose(
        m.uvs, [[0, 0], [1, 0], [0, 32768 / 65535]], atol=1e-6)
