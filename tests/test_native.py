"""Native asset library (native/assetlib.cpp) vs numpy fallbacks: bit parity."""

import numpy as np
import pytest

from tpu_renderer.utils import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native assetlib not built (no g++?)")


def test_downsample_matches_numpy():
    import os

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(64, 48, 4), dtype=np.uint8)
    nat = native.downsample_blit_rgba8(img)
    os.environ["TPU_RENDERER_NO_NATIVE"] = "1"
    try:
        # numpy reference path (resources.downsample_blit falls back)
        import importlib

        from tpu_renderer import resources

        ref = resources.downsample_blit.__wrapped__(img) if hasattr(
            resources.downsample_blit, "__wrapped__") else None
    finally:
        del os.environ["TPU_RENDERER_NO_NATIVE"]
    # direct numpy transcription (same as resources fallback)
    h, w = img.shape[:2]
    nh, nw = h // 2, w // 2
    src = img.astype(np.float32)
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    out = (src[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
           + src[np.ix_(y0, x1)] * (1 - fy) * fx
           + src[np.ix_(y1, x0)] * fy * (1 - fx)
           + src[np.ix_(y1, x1)] * fy * fx)
    ref = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(nat, ref)


def test_accessor_decode_strided_normalized():
    rng = np.random.default_rng(1)
    count, n, stride = 37, 4, 20
    raw = bytearray(rng.integers(0, 256, size=count * stride, dtype=np.uint8).tobytes())
    nat = native.decode_accessor_f32(bytes(raw), count, n, 5121, stride, True)
    assert nat is not None
    buf = np.frombuffer(bytes(raw), np.uint8)
    ref = np.stack([buf[i * stride:i * stride + n] for i in range(count)]).astype(np.float32) / 255.0
    np.testing.assert_allclose(nat, ref, atol=1e-7)


def test_accessor_decode_f32():
    rng = np.random.default_rng(2)
    count, n = 11, 3
    vals = rng.normal(size=(count, n)).astype(np.float32)
    stride = 4 * n + 8
    raw = bytearray(count * stride)
    for i in range(count):
        raw[i * stride:i * stride + 4 * n] = vals[i].tobytes()
    nat = native.decode_accessor_f32(bytes(raw), count, n, 5126, stride, False)
    np.testing.assert_array_equal(nat, vals)


def test_indices_decode_u16():
    idx = np.array([0, 5, 65535, 7], np.uint16)
    nat = native.decode_indices_u32(idx.tobytes(), 4, 5123, 2)
    np.testing.assert_array_equal(nat, idx.astype(np.uint32))


def test_quad_rows_blit():
    rng = np.random.default_rng(3)
    level = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    atlas = np.zeros((16, 16, 4), np.uint32)
    assert native.blit_quad_rows_u32(level, atlas, 2, 3)
    packed = (level[..., 0].astype(np.uint32)
              | (level[..., 1].astype(np.uint32) << 8)
              | (level[..., 2].astype(np.uint32) << 16)
              | (level[..., 3].astype(np.uint32) << 24))
    xp = np.roll(packed, -1, 1)
    yp = np.roll(packed, -1, 0)
    xyp = np.roll(xp, -1, 0)
    ref = np.stack([packed, xp, yp, xyp], -1)
    np.testing.assert_array_equal(atlas[3:11, 2:10], ref)
    assert (atlas[:3] == 0).all()
