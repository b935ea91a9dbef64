"""math3d vs GLM conventions.

Oracle values are derived from the GLM definitions the reference relies on
(perspectiveRH_ZO with GLM_FORCE_DEPTH_ZERO_TO_ONE, vk_engine.cpp:5,1492-1494).
"""

import numpy as np

from tpu_renderer import math3d


def test_perspective_reversed_z_mapping():
    # The reference calls perspective(70deg, aspect, near=10000, far=0.1)
    # (vk_engine.cpp:1492-1493): depth 1.0 at distance 0.1, 0.0 at 10000.
    p = math3d.perspective_zo(math3d.radians(70.0), 1700 / 900, 10000.0, 0.1)

    def ndc_depth(dist):
        v = p @ np.array([0, 0, -dist, 1], dtype=np.float32)
        return v[2] / v[3]

    assert abs(ndc_depth(0.1) - 1.0) < 1e-5
    assert abs(ndc_depth(10000.0) - 0.0) < 1e-5
    # Monotonically decreasing with distance (reversed-Z)
    assert ndc_depth(1.0) > ndc_depth(100.0) > ndc_depth(5000.0)


def test_perspective_matrix_entries():
    fov, aspect, near, far = math3d.radians(70.0), 1700 / 900, 10000.0, 0.1
    p = math3d.perspective_zo(fov, aspect, near, far)
    t = np.tan(fov / 2)
    assert np.isclose(p[0, 0], 1 / (aspect * t), rtol=1e-6)
    assert np.isclose(p[1, 1], 1 / t, rtol=1e-6)
    assert np.isclose(p[2, 2], far / (near - far), rtol=1e-6)
    assert p[3, 2] == -1.0
    assert np.isclose(p[2, 3], -(far * near) / (far - near), rtol=1e-6)
    # Vulkan y-flip (vk_engine.cpp:1494)
    pv = math3d.vulkan_perspective(fov, aspect, near, far)
    assert np.isclose(pv[1, 1], -p[1, 1])


def test_quat_to_mat4_identity_and_axis():
    assert np.allclose(math3d.quat_to_mat4(math3d.quat(1, 0, 0, 0)), np.eye(4))
    # 90 deg about +z maps +x to +y
    q = math3d.angle_axis(np.pi / 2, (0, 0, 1))
    m = math3d.quat_to_mat4(q)
    v = math3d.transform_dir(m, (1, 0, 0))
    assert np.allclose(v, [0, 1, 0], atol=1e-6)


def test_rotate_matches_quat_composition():
    m = math3d.rotate(math3d.translate((1, 2, 3)), 0.7, (0, 1, 0))
    r = math3d.quat_to_mat4(math3d.angle_axis(0.7, (0, 1, 0)))
    assert np.allclose(m, math3d.translate((1, 2, 3)) @ r, atol=1e-6)


def test_inverse():
    m = math3d.translate((5, -3, 2)) @ math3d.quat_to_mat4(math3d.angle_axis(0.3, (1, 0, 0)))
    assert np.allclose(m @ math3d.inverse(m), np.eye(4), atol=1e-6)
