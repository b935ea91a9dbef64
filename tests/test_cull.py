"""Frustum-cull semantics: device impl vs a direct numpy transcription of
is_visible (vk_engine.cpp:56-86), plus the property that on-screen geometry
is never culled (SURVEY §4 item 4).
"""

import jax.numpy as jnp
import numpy as np

from tpu_renderer import math3d
from tpu_renderer.kernels.vertex import draw_visibility

_CORNERS = np.array(
    [[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
     [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1]], np.float32)


def is_visible_reference(viewproj, model, origin, extents):
    m = viewproj @ model
    mn = np.array([1.5, 1.5, 1.5], np.float32)
    mx = np.array([-1.5, -1.5, -1.5], np.float32)
    for c in _CORNERS:
        v = m @ np.append(origin + c * extents, 1.0).astype(np.float32)
        v = v[:3] / v[3]
        mn = np.minimum(v, mn)
        mx = np.maximum(v, mx)
    if mn[2] > 1 or mx[2] < 0 or mn[0] > 1 or mx[0] < -1 or mn[1] > 1 or mx[1] < -1:
        return False
    return True


def test_matches_reference_transcription():
    rng = np.random.default_rng(11)
    proj = math3d.vulkan_perspective(math3d.radians(70), 16 / 9, 10000.0, 0.1)
    n = 64
    models = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    models[:, :3, 3] = rng.uniform(-100, 100, (n, 3)).astype(np.float32)
    origins = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    extents = rng.uniform(0.1, 10, (n, 3)).astype(np.float32)
    got = np.asarray(draw_visibility(
        jnp.asarray(proj), jnp.asarray(models), jnp.asarray(origins),
        jnp.asarray(extents)))
    want = np.array([
        is_visible_reference(proj, models[i], origins[i], extents[i])
        for i in range(n)])
    np.testing.assert_array_equal(got, want)


def test_never_culls_box_containing_visible_point():
    # boxes straddling a point well inside the frustum must survive
    rng = np.random.default_rng(3)
    proj = math3d.vulkan_perspective(math3d.radians(70), 16 / 9, 10000.0, 0.1)
    n = 64
    # points at z in [-50, -1] (in front of camera), inside the cone
    pts = np.stack([
        rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
        -rng.uniform(1, 50, n)], axis=1).astype(np.float32)
    pts[:, 0] *= -pts[:, 2]
    pts[:, 1] *= -pts[:, 2]
    models = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    origins = pts
    extents = rng.uniform(0.01, 5, (n, 3)).astype(np.float32)
    got = np.asarray(draw_visibility(
        jnp.asarray(proj), jnp.asarray(models), jnp.asarray(origins),
        jnp.asarray(extents)))
    assert got.all()
