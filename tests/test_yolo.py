"""YOLOv5 detector subsystem tests: NMS, letterbox, model shapes, video modes.

Real glottis weights are not vendored (the reference's model/yolov5.pt is
external too), so pipeline tests inject a synthetic ``infer_fn`` that
"detects" the bright disk in synthetic referral clips.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.nms import box_iou, nms_boxes, non_max_suppression, xywh2xyxy
from laryngeal_tpu.preprocess.letterbox import letterbox, scale_boxes


# ---------- NMS ----------

def test_xywh2xyxy():
    np.testing.assert_allclose(
        xywh2xyxy(np.array([[10.0, 20.0, 4.0, 6.0]])),
        np.array([[8.0, 17.0, 12.0, 23.0]]))


def test_box_iou_known_values():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou(a, b)[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175)
    assert iou[2] == pytest.approx(0.0)


def test_nms_suppresses_overlaps():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = nms_boxes(boxes, scores, iou_thres=0.5)
    assert list(keep) == [0, 2]


def test_non_max_suppression_end_to_end():
    # Two overlapping detections + one low-conf + one distinct.
    pred = np.zeros((1, 4, 6), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.9]
    pred[0, 1] = [52, 52, 20, 20, 0.8, 0.8]
    pred[0, 2] = [200, 200, 30, 30, 0.7, 0.9]
    pred[0, 3] = [300, 300, 10, 10, 0.1, 0.9]  # below conf gate
    out = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45)[0]
    assert out.shape == (2, 6)
    assert out[0, 4] >= out[1, 4]  # sorted by confidence


def test_nms_empty():
    out = non_max_suppression(np.zeros((1, 5, 6), np.float32))[0]
    assert out.shape == (0, 6)


# ---------- letterbox ----------

def test_letterbox_shapes_and_inverse():
    img = np.full((100, 200, 3), 50, np.uint8)
    out, (r, _), (dw, dh) = letterbox(img, (640, 640), auto=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[1] == 640  # wide image fills width
    # Round-trip a box through scale_boxes.
    boxes = np.array([[dw, dh, dw + 200 * r, dh + 100 * r]], np.float32)
    back = scale_boxes(out.shape[:2], boxes, img.shape)
    np.testing.assert_allclose(back[0], [0, 0, 200, 100], atol=1.0)


def test_letterbox_pad_value():
    img = np.zeros((100, 200, 3), np.uint8)
    out, _, _ = letterbox(img, (640, 640), auto=False)
    assert out.shape == (640, 640, 3)
    assert (out[0] == 114).all()  # top padding rows


# ---------- model ----------

def test_yolov5n_forward_shapes():
    from laryngeal_tpu.models.yolov5 import create_yolov5

    model = create_yolov5("n", num_classes=1)
    x = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # anchors: 3 * (20*20 + 10*10 + 5*5) = 1575
    assert out.shape == (1, 3 * (400 + 100 + 25), 6)
    o = np.asarray(out)
    assert (o[..., 4:] >= 0).all() and (o[..., 4:] <= 1).all()  # sigmoided
    assert (o[..., 2:4] >= 0).all()  # wh positive


def test_yolov5_bad_size():
    from laryngeal_tpu.models.yolov5 import create_yolov5

    with pytest.raises(ValueError):
        create_yolov5("giant")


# ---------- detector pipeline with synthetic infer_fn ----------

def disk_detector_infer(images):
    """Fake decoded predictions: one box on the brightest region per image."""
    imgs = np.asarray(images)
    b, h, w, _ = imgs.shape
    preds = np.zeros((b, 1, 6), np.float32)
    for i, im in enumerate(imgs):
        gray = im.mean(axis=-1)
        bright = gray > 0.6  # letterboxed [0,1]
        if bright.sum() > 20:
            ys, xs = np.nonzero(bright)
            x1, x2, y1, y2 = xs.min(), xs.max(), ys.min(), ys.max()
            preds[i, 0] = [(x1 + x2) / 2, (y1 + y2) / 2,
                           x2 - x1 + 1, y2 - y1 + 1, 0.95, 0.99]
    return preds


@pytest.fixture(scope="module")
def synth_video(tmp_path_factory):
    from laryngeal_tpu.data.synthetic import synth_video as make
    from laryngeal_tpu.data.video import write_video

    rng = np.random.default_rng(0)
    clip = make(rng, 16, 96, 128, referral=True)
    # Make half the frames disk-free (non-detections).
    clip[8:] = (np.clip(rng.normal(60, 10, clip[8:].shape), 0, 255)).astype(np.uint8)
    path = tmp_path_factory.mktemp("yolo") / "v.mp4"
    write_video(path, clip, fps=10)
    return path


@pytest.fixture(scope="module")
def detector():
    from laryngeal_tpu.preprocess.yolo_roi import YOLODetector

    return YOLODetector(infer_fn=disk_detector_infer)


def test_process_image_detects_disk(detector):
    img = np.full((96, 128, 3), 40, np.uint8)
    cv2.circle(img, (64, 48), 20, (250, 250, 250), -1)
    res = detector.process_image(img)
    assert len(res["detections"]) == 1
    det = res["detections"][0]
    assert det["class"] == "glottis"
    x1, y1, x2, y2 = det["bbox"]
    assert 30 < x1 < 64 < x2 < 100
    assert 15 < y1 < 48 < y2 < 80
    assert res["annotated_image"].shape == img.shape


def test_process_image_no_detection(detector):
    img = np.full((96, 128, 3), 40, np.uint8)
    assert detector.process_image(img)["detections"] == []


def test_detected_only_raw_mode(detector, synth_video, tmp_path):
    res = detector.process_video_detected_only_raw(
        str(synth_video), "clip", output_dir=str(tmp_path))
    assert res["status"] == "processed_successfully"
    assert 0 < res["detected_frame_count"] <= 10
    assert res["detected_frame_count"] < res["total_frames"]
    assert res["output_fps"] >= 5
    # Skip-if-exists cache.
    res2 = detector.process_video_detected_only_raw(
        str(synth_video), "clip", output_dir=str(tmp_path))
    assert res2["status"] == "skipped_existing_file"
    # force_reprocess overrides.
    res3 = detector.process_video_detected_only_raw(
        str(synth_video), "clip", output_dir=str(tmp_path), force_reprocess=True)
    assert res3["status"] == "processed_successfully"


def test_raw_mode_web_reencode_skipped_without_ffmpeg(
        detector, synth_video, tmp_path, monkeypatch):
    """No native encoder, ffmpeg bindings, or binary => keep cv2 output,
    status says so (reference src/yolo_detector.py:645-648 'skipping
    conversion')."""
    import shutil
    import sys

    from laryngeal_tpu.data import native as _native

    monkeypatch.setattr(_native, "encoder_available", lambda: False)
    monkeypatch.delitem(sys.modules, "ffmpeg", raising=False)
    monkeypatch.setattr(shutil, "which", lambda name: None)
    res = detector.process_video_detected_only_raw(
        str(synth_video), "noff", output_dir=str(tmp_path))
    assert res["web_reencode"] == "skipped_no_ffmpeg"
    assert (tmp_path / "noff_processed.mp4").stat().st_size > 0


def test_raw_mode_web_reencode_ffmpeg_python(
        detector, synth_video, tmp_path, monkeypatch):
    """With the native encoder absent and ffmpeg-python importable, the
    output is re-encoded in place (libx264, 2M, aac — reference
    src/yolo_detector.py:630-641)."""
    import sys
    import types
    from pathlib import Path as _P

    from laryngeal_tpu.data import native as _native

    monkeypatch.setattr(_native, "encoder_available", lambda: False)
    calls = {}
    mod = types.ModuleType("ffmpeg")
    mod.input = lambda p: ("in", p)

    def _output(stream, out, **kw):
        calls["out"], calls["kw"] = out, kw
        return ("out", stream, out)

    def _run(stream, overwrite_output=False, capture_stderr=False):
        _P(calls["out"]).write_bytes(b"H264!")
        calls["overwrite"] = overwrite_output

    mod.output = _output
    mod.run = _run
    monkeypatch.setitem(sys.modules, "ffmpeg", mod)
    res = detector.process_video_detected_only_raw(
        str(synth_video), "reenc", output_dir=str(tmp_path))
    assert res["web_reencode"] == "ffmpeg_python"
    assert calls["kw"]["vcodec"] == "libx264"
    assert calls["kw"]["b:v"] == "2M"
    assert calls["overwrite"] is True
    # os.replace moved the converted file over the cv2 one.
    assert (tmp_path / "reenc_processed.mp4").read_bytes() == b"H264!"
    assert not (tmp_path / "temp_reenc_processed.mp4").exists()


def test_annotated_modes_skip_reencode(detector, synth_video, tmp_path):
    res = detector.process_video_detected_only(
        str(synth_video), "annmode", output_dir=str(tmp_path))
    assert res["web_reencode"] == "not_applicable"


def test_annotated_video_mode(detector, synth_video, tmp_path):
    res = detector.process_video(str(synth_video), "ann", save_path=str(tmp_path))
    assert res["total_frames"] == 16
    assert (tmp_path / "ann.mp4").exists()


def test_crop_roi_mode(detector, synth_video, tmp_path):
    res = detector.crop_video_roi(str(synth_video), "roi", output_dir=str(tmp_path))
    assert res["status"] == "processed_successfully"
    x1, y1, x2, y2 = res["roi"]
    assert x2 > x1 and y2 > y1
    from laryngeal_tpu.data.video import get_video_properties

    total, fps, dur, w, h = get_video_properties(res["output_path"])
    assert w == h  # square ROI
    assert total == res["detected_frame_count"]
