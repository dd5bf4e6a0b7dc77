"""Native C++ cliploader parity tests vs the cv2 path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data import native
from laryngeal_tpu.data.synthetic import synth_video
from laryngeal_tpu.data.video import decode_frames as cv2_decode
from laryngeal_tpu.data.video import get_video_properties as cv2_props
from laryngeal_tpu.data.video import write_video

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native cliploader not built")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    rng = np.random.default_rng(0)
    clip = synth_video(rng, 20, 64, 96, referral=True)
    path = tmp_path_factory.mktemp("native") / "v.mp4"
    write_video(path, clip, fps=10)
    return path


def test_props_match_cv2(video):
    nt, nf, nd, nw, nh = native.get_video_properties(video)
    ct, cf, cd, cw, ch = cv2_props(video)
    assert (nt, nw, nh) == (ct, cw, ch)
    assert nf == pytest.approx(cf, rel=0.01)


def test_decode_matches_cv2(video):
    idx = [0, 3, 3, 10, 19]
    a = native.decode_frames(video, idx)
    b = cv2_decode(video, idx)
    assert a.shape == b.shape == (5, 64, 96, 3)
    # Same decoder family (libav under cv2 too) — near-identical pixels.
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0
    np.testing.assert_array_equal(a[1], a[2])  # duplicate index


def test_decode_resize(video):
    a = native.decode_frames(video, [0, 5], resize_to=(48, 32))
    assert a.shape == (2, 32, 48, 3)


def test_decode_i420_matches_rgb(video):
    import jax.numpy as jnp

    from laryngeal_tpu.preprocess.transforms import yuv420_to_rgb

    yuv = native.decode_frames(video, [0, 7], resize_to=(96, 64), fmt="i420")
    assert yuv.shape == (2, 96, 96)
    rgb_from_yuv = np.asarray(yuv420_to_rgb(jnp.asarray(yuv), 64, 96))
    rgb = native.decode_frames(video, [0, 7], resize_to=(96, 64)).astype(np.float32)
    # Direct-I420 avoids one colorspace roundtrip; compare loosely.
    assert np.abs(rgb_from_yuv - rgb).mean() < 6.0


def test_out_of_range_gives_placeholder(video):
    a = native.decode_frames(video, [0, 500])
    assert (a[1] == 127).all()


def test_bad_path_raises():
    with pytest.raises(ValueError):
        native.decode_frames("/nonexistent.mp4", [0])
    with pytest.raises(ValueError):
        native.get_video_properties("/nonexistent.mp4")


def test_i420_odd_dims_rejected(video):
    with pytest.raises(ValueError):
        native.decode_frames(video, [0], resize_to=(33, 33), fmt="i420")


def test_auto_fallback_rgb(video):
    out = native.decode_frames_auto(video, [1, 2], resize_to=(32, 32))
    assert out.shape == (2, 32, 32, 3)
