"""YUV420 wire-format tests: device expansion matches cv2's inverse."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp

from laryngeal_tpu.data.video import rgb_to_yuv420
from laryngeal_tpu.preprocess.transforms import yuv420_to_rgb


def test_yuv420_roundtrip_matches_cv2():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (2, 64, 48, 3), dtype=np.uint8)
    yuv = rgb_to_yuv420(rgb)
    assert yuv.shape == (2, 96, 48)
    mine = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), 64, 48))
    ref = np.stack([cv2.cvtColor(f, cv2.COLOR_YUV2RGB_I420) for f in yuv]).astype(np.float32)
    assert np.abs(mine - ref).max() < 1.0  # sub-LSB agreement


def test_yuv420_preserves_smooth_content():
    # Chroma-smooth content (like real video) survives 4:2:0 nearly exactly.
    yy, xx = np.mgrid[0:64, 0:64]
    rgb = np.stack([
        (yy * 2).astype(np.uint8),
        (xx * 2).astype(np.uint8),
        np.full_like(yy, 90, dtype=np.uint8),
    ], axis=-1)[None]
    yuv = rgb_to_yuv420(rgb)
    back = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), 64, 64))
    assert np.abs(back - rgb.astype(np.float32)).mean() < 3.0


def test_wire_size_halved():
    rgb = np.zeros((1, 224, 224, 3), np.uint8)
    yuv = rgb_to_yuv420(rgb)
    assert yuv.nbytes * 2 == rgb.nbytes
