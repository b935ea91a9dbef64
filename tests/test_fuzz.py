"""Loader + pipeline fuzzing over a randomized glTF corpus (ROADMAP parity
stretch): every generated GLB must load, flatten, and render without error,
and rendering must be deterministic (SURVEY §4 item 5). Mirrors the breadth
fastgltf tolerates for the reference (vk_loader.cpp:169-191, 286-358)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tpu_renderer import gltf
from tpu_renderer.config import RendererConfig
from tpu_renderer.engine import Engine
from tpu_renderer.scene import load_scene
from tpu_renderer.utils.glb_writer import GLBBuilder

W, H = 128, 32


def _random_glb(rng, path):
    b = GLBBuilder()
    n_mats = int(rng.integers(0, 3))
    for m in range(n_mats):
        tex = None
        if rng.uniform() < 0.5:
            img = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
            # 12345 = out-of-enum filter value: extract_filter/
            # extract_mipmap_mode default branches map it to LINEAR
            # (vk_loader.cpp:38-40, :51-53)
            sampler = b.add_sampler(
                mag=int(rng.choice([9728, 9729, 12345])),
                min_=int(rng.choice([9728, 9729, 9985, 9987, 12345])))
            tex = b.add_texture(b.add_image(np.asarray(img)), sampler)
        mi = b.add_material(tuple(rng.uniform(0, 1, 4).astype(float)),
                            texture=tex,
                            alpha_mode="BLEND" if rng.uniform() < 0.3 else "OPAQUE")
        if tex is not None and rng.uniform() < 0.4:
            # KHR_texture_transform permutation (vk_loader.cpp:169-191
            # enables it; exact-value case: test_gltf.py::test_khr_...)
            b.gltf["materials"][mi]["pbrMetallicRoughness"][
                "baseColorTexture"]["extensions"] = {
                    "KHR_texture_transform": {
                        "offset": [float(x) for x in rng.uniform(-1, 1, 2)],
                        "scale": [float(x) for x in rng.uniform(0.5, 2, 2)]}}
    n_meshes = int(rng.integers(1, 3))
    for _ in range(n_meshes):
        prims = []
        for _ in range(int(rng.integers(1, 3))):
            if rng.uniform() < 0.15:
                # non-indexed primitive (loader generates indices — the
                # fastgltf GenerateMeshIndices analog)
                nv = 3 * int(rng.integers(1, 4))
                prim = dict(
                    positions=rng.uniform(-1, 1, (nv, 3)).astype(np.float32))
            else:
                nv = int(rng.integers(3, 12))
                prim = dict(
                    positions=rng.uniform(-1, 1, (nv, 3)).astype(np.float32),
                    indices=list(rng.integers(0, nv, 3 * int(rng.integers(1, 5)))),
                )
            if rng.uniform() < 0.5:
                prim["normals"] = rng.uniform(-1, 1, (nv, 3)).astype(np.float32)
            if rng.uniform() < 0.5:
                prim["uvs"] = rng.uniform(-2, 2, (nv, 2)).astype(np.float32)
            if rng.uniform() < 0.5:
                prim["colors"] = rng.uniform(0, 1, (nv, 4)).astype(np.float32)
            if n_mats and rng.uniform() < 0.8:
                prim["material"] = int(rng.integers(0, n_mats))
            prims.append(prim)
        mesh_i = b.add_mesh(prims)
        for prim in b.gltf["meshes"][mesh_i]["primitives"]:
            if "indices" in prim and rng.uniform() < 0.3:
                # STRIP / FAN get triangulated; LINES get skipped (a mesh
                # may legitimately end up with zero triangle surfaces)
                prim["mode"] = int(rng.choice([5, 6, 1]))
            if rng.uniform() < 0.25:
                # sparse POSITION patch over the base view
                # (test_gltf.py::test_sparse_accessor_substitution semantics)
                acc = b.gltf["accessors"][prim["attributes"]["POSITION"]]
                k = int(rng.integers(1, min(3, acc["count"]) + 1))
                sidx = np.sort(rng.choice(acc["count"], size=k,
                                          replace=False)).astype(np.uint16)
                svals = rng.uniform(-1, 1, (k, 3)).astype(np.float32)
                acc["sparse"] = {
                    "count": k,
                    "indices": {"bufferView": b.add_buffer_view(sidx.tobytes()),
                                "componentType": 5123},
                    "values": {"bufferView": b.add_buffer_view(svals.tobytes())},
                }
    # random node forest with TRS or matrix transforms, some nested
    n_nodes = int(rng.integers(1, 5))
    for i in range(n_nodes):
        kw = {}
        if rng.uniform() < 0.7:
            kw["mesh"] = int(rng.integers(0, n_meshes))
        if rng.uniform() < 0.5:
            kw["translation"] = tuple(rng.uniform(-2, 2, 3).astype(float))
            kw["scale"] = tuple(rng.uniform(0.5, 2, 3).astype(float))
        b.add_node(**kw)
        if i > 0 and rng.uniform() < 0.3:
            b.gltf["nodes"][i - 1].setdefault("children", []).append(i)
            b.gltf["scenes"][0]["nodes"].remove(i)
    if n_mats >= 2 and rng.uniform() < 0.4:
        # KHR_materials_variants mapping; the default (unselected) variant
        # must load and render (tests/test_variants.py has the exact case)
        b.gltf["extensionsUsed"] = (b.gltf.get("extensionsUsed", [])
                                    + ["KHR_materials_variants"])
        b.gltf.setdefault("extensions", {})["KHR_materials_variants"] = {
            "variants": [{"name": "alt"}]}
        b.gltf["meshes"][0]["primitives"][0].setdefault("extensions", {})[
            "KHR_materials_variants"] = {"mappings": [
                {"material": int(rng.integers(0, n_mats)), "variants": [0]}]}
    b.save(path)


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_scene_loads_and_renders(tmp_path, seed):
    rng = np.random.default_rng(100 + seed)
    path = str(tmp_path / f"fuzz{seed}.glb")
    _random_glb(rng, path)

    parsed = gltf.load_gltf(path)  # must parse
    for mesh in parsed.meshes:
        assert mesh.positions.shape[1] == 3
        # a mesh whose only primitive was skipped (e.g. LINES) legitimately
        # loads empty — 0 vertices, 0 indices, 0 surfaces
        if mesh.indices.size:
            assert mesh.indices.max() < len(mesh.positions)

    scene = load_scene(path)
    cfg = RendererConfig(width=W, height=H)
    eng = Engine(cfg)
    eng.init(scene=scene)
    img1 = eng.draw(with_stats=False)
    img2 = eng.draw(with_stats=False)
    assert img1.shape == (H, W, 4) and img1.dtype == np.uint8
    np.testing.assert_array_equal(img1, img2)  # jit purity / determinism
