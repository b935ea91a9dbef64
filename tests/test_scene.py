"""Scene graph semantics — including the reference's two transform quirks."""

import numpy as np

from tpu_renderer import math3d
from tpu_renderer.scene import (
    Bounds,
    DrawContext,
    GeoSurface,
    LoadedScene,
    MeshAsset,
    MeshNode,
    Node,
    SceneMaterial,
    default_materials_and_textures,
    flatten_scene,
)


def _mat(name, transparent=False):
    return SceneMaterial(
        name=name,
        color_factors=np.ones(4, np.float32),
        metal_rough_factors=np.array([1, 0.5, 0, 0], np.float32),
        transparent=transparent,
        tex=0,
        filter_flags=3,
    )


def _mesh_scene(n_meshes=1, materials=None):
    scene = LoadedScene()
    default_materials_and_textures(scene)
    if materials:
        scene.materials.extend(materials)
    tris = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    all_pos = []
    all_idx = []
    for m in range(n_meshes):
        mesh = MeshAsset(
            name=f"mesh{m}",
            surfaces=[GeoSurface(0, 3, min(m + 1, len(scene.materials) - 1),
                                 Bounds(np.zeros(3, np.float32), np.ones(3, np.float32)))],
            vertex_offset=3 * m,
            index_offset=3 * m,
        )
        scene.meshes.append(mesh)
        all_pos.append(tris)
        all_idx.append(np.arange(3, dtype=np.uint32))
    scene.positions = np.concatenate(all_pos)
    scene.normals = np.zeros_like(scene.positions)
    scene.colors = np.ones((scene.positions.shape[0], 4), np.float32)
    scene.uvs = np.zeros((scene.positions.shape[0], 2), np.float32)
    scene.indices = np.concatenate(all_idx)
    return scene


def test_refresh_transform_quirk_children_get_parent_matrix():
    # vk_types.h:157-163 — children receive parent_matrix, not the node's
    # world transform; with identity roots, every world == local.
    root = Node("root")
    child = Node("child")
    grandchild = Node("gc")
    root.children = [child]
    child.children = [grandchild]
    t_root = math3d.translate((1, 0, 0))
    t_child = math3d.translate((0, 1, 0))
    t_gc = math3d.translate((0, 0, 1))
    root.local_transform = t_root
    child.local_transform = t_child
    grandchild.local_transform = t_gc
    root.refresh_transform(np.eye(4, dtype=np.float32))
    np.testing.assert_allclose(root.world_transform, t_root)
    np.testing.assert_allclose(child.world_transform, t_child)  # NOT t_root@t_child
    np.testing.assert_allclose(grandchild.world_transform, t_gc)


def test_meshnode_draw_transform_order_quirk():
    # vk_engine.cpp:1717 — node_matrix = world_transform * top_matrix
    scene = _mesh_scene(1, [_mat("a")])
    node = MeshNode(0, "n")
    node.world_transform = math3d.translate((1, 2, 3))
    scene.nodes = [node]
    scene.top_nodes = [node]
    top = math3d.scale((2, 2, 2))
    ctx = scene.draw(top)
    expected = node.world_transform @ top
    np.testing.assert_allclose(ctx.opaque_surfaces[0].transform, expected)


def test_opaque_sort_and_transparent_split():
    mats = [_mat("a"), _mat("b"), _mat("t", transparent=True)]
    scene = _mesh_scene(3, mats)
    # meshes use materials 1,2,3 where 3 is transparent
    nodes = []
    for m in (2, 0, 1):  # submission order scrambled
        n = MeshNode(m, f"n{m}")
        n.refresh_transform(np.eye(4, dtype=np.float32))
        nodes.append(n)
    scene.nodes = nodes
    scene.top_nodes = nodes
    flat = flatten_scene(scene)
    # transparent object (mesh 2 -> material 3) excluded from opaque
    assert flat.n_opaque == 2
    opaque_mats = [o.material for o in flat.objects[:2]]
    assert opaque_mats == sorted(opaque_mats)  # material-sorted
    assert flat.objects[-1].transparent
    # buffers padded to chunk multiples
    from tpu_renderer.kernels import raster as _r; assert flat.buffers.opaque_tri_vidx.shape[0] % _r.CHUNK == 0
    assert int(np.sum(np.asarray(flat.buffers.opaque_tri_valid))) == 2
    assert int(np.sum(np.asarray(flat.buffers.transp_tri_valid))) == 1


def test_draw_context_emits_per_surface():
    scene = _mesh_scene(1, [_mat("a")])
    scene.meshes[0].surfaces.append(
        GeoSurface(0, 3, 1, Bounds(np.zeros(3, np.float32), np.ones(3, np.float32))))
    node = MeshNode(0)
    node.refresh_transform(np.eye(4, dtype=np.float32))
    scene.nodes = [node]
    scene.top_nodes = [node]
    ctx = scene.draw(np.eye(4, dtype=np.float32))
    assert len(ctx.opaque_surfaces) == 2
