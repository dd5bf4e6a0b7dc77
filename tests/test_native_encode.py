"""Native libx264 encoder + fast-decode (skip_loop_filter) tests.

The reference's codec preference is avc1/H264 (src/yolo_detector.py:546-569)
and its raw-filter mode re-encodes with libx264 (src/yolo_detector.py:625-648);
cv2 in this image cannot encode h264, so data/native.py::encode_h264 goes
through libavcodec directly. These tests pin the round trip, the container
metadata, the cv2 interop, and the bounded drift of the fast-decode knob.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data import native
from laryngeal_tpu.data.synthetic import synth_video
from laryngeal_tpu.data.video import write_video

pytestmark = pytest.mark.skipif(
    not (native.available() and native.encoder_available()),
    reason="native h264 encoder not built")


def _smooth_clip(t=24, h=128, w=160):
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack([
        ((np.sin(xx / 20 + i / 3) * 0.5 + 0.5) * 200 + yy / h * 40)
        .astype(np.uint8) for i in range(t)
    ])
    return np.repeat(frames[..., None], 3, axis=-1)


@pytest.fixture(scope="module")
def h264_video(tmp_path_factory):
    path = tmp_path_factory.mktemp("enc") / "v.mp4"
    native.encode_h264(path, _smooth_clip(), fps=30, crf=23)
    return path


def test_roundtrip_props_exact(h264_video):
    total, fps, _, w, h = native.get_video_properties(h264_video)
    assert (total, w, h) == (24, 160, 128)
    assert fps == pytest.approx(30.0, abs=1e-6)  # exact rational time base


def test_roundtrip_psnr(h264_video):
    src = _smooth_clip()
    dec = native.decode_frames(h264_video, list(range(24)))
    mse = np.mean((dec.astype(np.float64) - src.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 35.0  # crf 23 on smooth content measured ~44 dB


def test_cv2_can_read(h264_video):
    cap = cv2.VideoCapture(str(h264_video))
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (128, 160, 3)


def test_write_video_h264_codec(tmp_path):
    path = tmp_path / "w.mp4"
    codec = write_video(path, _smooth_clip(8), fps=30, codec="h264")
    assert codec == "h264"
    total, fps, _, _, _ = native.get_video_properties(path)
    assert total == 8 and fps == pytest.approx(30.0)


def test_fast_decode_bounded_drift(h264_video):
    """skip_loop_filter drift must stay small vs the spec decode (measured
    max 38 / mean 2.2 at crf 23 on noisy content; smooth content lower).
    It is only used for lossy transports whose quantization dominates."""
    idx = list(range(24))
    exact = native.decode_frames(h264_video, idx)
    fast = native.decode_frames(h264_video, idx, fast=True)
    assert fast.shape == exact.shape
    d = np.abs(exact.astype(np.int16) - fast.astype(np.int16))
    assert d.max() <= 64 and d.mean() < 4.0


def test_fast_decode_noop_on_mp4v(tmp_path):
    """mpeg4 part 2 has no in-loop filter: fast decode must be bit-exact."""
    rng = np.random.default_rng(3)
    clip = synth_video(rng, 10, 64, 96, referral=False)
    path = tmp_path / "m.mp4"
    assert write_video(path, clip, fps=10) == "mp4v"
    idx = [0, 2, 5, 9]
    np.testing.assert_array_equal(
        native.decode_frames(path, idx),
        native.decode_frames(path, idx, fast=True))


def test_clip_decode_ex_flags0_matches_clip_decode(h264_video):
    """The extended ABI with flags=0 is the original exact decode."""
    import ctypes

    lib = native._load()
    idx = [0, 5, 11, 23]
    n = len(idx)
    c_idx = (ctypes.c_int * n)(*idx)
    a = np.empty((n, 128, 160, 3), np.uint8)
    b = np.empty((n, 128, 160, 3), np.uint8)
    dec = ctypes.c_int()
    assert lib.clip_decode(str(h264_video).encode(), c_idx, n, 160, 128, 0,
                           a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           ctypes.byref(dec)) == 0
    assert lib.clip_decode_ex(str(h264_video).encode(), c_idx, n, 160, 128, 0,
                              0,
                              b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.byref(dec)) == 0
    np.testing.assert_array_equal(a, b)


def test_encode_rejects_odd_dims(tmp_path):
    with pytest.raises(ValueError):
        native.encode_h264(tmp_path / "x.mp4",
                           np.zeros((4, 33, 32, 3), np.uint8))


def test_web_reencode_native(tmp_path):
    """_web_reencode takes the native libx264 path and the output stays
    readable with the same frame count (reference: yolo_detector.py:625-648)."""
    from laryngeal_tpu.preprocess.yolo_roi import YOLODetector

    clip = _smooth_clip(10)
    path = tmp_path / "roi.mp4"
    write_video(path, clip, fps=30)
    det = YOLODetector.__new__(YOLODetector)  # no weights needed
    status = det._web_reencode(path)
    assert status == "native_libx264"
    total, fps, _, w, h = native.get_video_properties(path)
    assert (total, w, h) == (10, 160, 128)
    assert fps == pytest.approx(30.0, rel=0.01)
