"""HTTP inference server: endpoints, dynamic batching, error paths."""

import json
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax
import jax.numpy as jnp

from laryngeal_tpu.infer.predictor import Predictor
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.serve.server import DynamicBatcher, InferenceServer
from laryngeal_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    from laryngeal_tpu.data.synthetic import synth_video
    from laryngeal_tpu.data.video import write_video

    rng = np.random.default_rng(3)
    p = tmp_path_factory.mktemp("serve") / "clip.mp4"
    write_video(p, synth_video(rng, 12, 64, 64, referral=True), fps=30)
    return p


@pytest.fixture(scope="module")
def predictor():
    spec = get_model_spec("vivit")
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4)
    model = VivitForVideoClassification(cfg)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
    return Predictor(model, spec, state, num_frames=4, crop_size=64)


@pytest.fixture(scope="module")
def server(predictor):
    srv = InferenceServer(predictor, port=0, max_batch=4, batch_timeout_ms=100)
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.close()


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
        return json.loads(r.read())


def _post(server, path, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", data=body,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_healthz_and_stats(server):
    health = _get(server, "/healthz")
    assert health["status"] == "ok" and health["model"] == "vivit"
    assert set(_get(server, "/stats")) >= {"requests", "batches", "max_batch"}


def test_predict_by_path_matches_offline(server, predictor, video_path):
    got = _post(server, "/predict",
                json.dumps({"video_path": str(video_path)}).encode(),
                "application/json")
    want = predictor.predict_video(str(video_path))
    assert got["predicted_class"] == want["predicted_class"]
    assert got["frame_indices"] == want["frame_indices"]
    np.testing.assert_allclose(
        [got["probabilities"][c] for c in sorted(got["probabilities"])],
        [want["probabilities"][c] for c in sorted(want["probabilities"])],
        atol=1e-6)


def test_predict_uploaded_bytes(server, video_path):
    got = _post(server, "/predict", video_path.read_bytes(),
                "application/octet-stream")
    assert got["video_path"] == "<uploaded video>"
    assert set(got["probabilities"]) == {"non_referral", "referral"}
    assert abs(sum(got["probabilities"].values()) - 1.0) < 1e-5


def test_concurrent_requests_batch(server, video_path):
    body = json.dumps({"video_path": str(video_path)}).encode()
    before = _get(server, "/stats")
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(
            lambda _: _post(server, "/predict", body, "application/json"),
            range(6)))
    assert len({r["predicted_class"] for r in results}) == 1
    after = _get(server, "/stats")
    assert after["requests"] - before["requests"] == 6
    assert after["batches"] > before["batches"]


def test_error_paths(server):
    for body, ctype, code in [
        (json.dumps({"video_path": "/nope/missing.mp4"}).encode(),
         "application/json", 404),
        (b"{not json", "application/json", 400),
        (b"", "application/octet-stream", 400),
        (b"x", "text/plain", 400),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, "/predict", body, ctype)
        assert ei.value.code == code
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/whatever")
    assert ei.value.code == 404


def test_batcher_pads_and_resolves_errors():
    calls = []

    def predict(clips):
        calls.append(clips.shape)
        if len(calls) == 2:
            raise RuntimeError("boom")
        return np.tile([[0.25, 0.75]], (clips.shape[0], 1))

    b = DynamicBatcher(predict, max_batch=4, batch_timeout_ms=50)
    clip = np.zeros((4, 8, 8, 3), np.uint8)
    fut = b.submit(clip)
    np.testing.assert_allclose(fut.result(timeout=5), [0.25, 0.75])
    assert calls[0] == (4, 4, 8, 8, 3)  # padded to the fixed shape

    with pytest.raises(RuntimeError):
        b.submit(clip).result(timeout=5)
    assert b.stats()["batch_errors"] == 1

    fut = b.submit(clip)  # the loop survives a failed batch
    np.testing.assert_allclose(fut.result(timeout=5), [0.25, 0.75])
    b.close()


def test_batcher_buckets_dispatch_smallest_fit():
    """bucket_sizes: a lone request pads to the smallest compiled shape,
    a burst fills the big bucket; stats expose per-bucket dispatches."""
    calls = []

    def predict(clips):
        calls.append(clips.shape[0])
        return np.tile([[0.5, 0.5]], (clips.shape[0], 1))

    b = DynamicBatcher(predict, max_batch=4, batch_timeout_ms=40,
                       bucket_sizes=(1, 2, 4))
    clip = np.zeros((4, 8, 8, 3), np.uint8)
    b.submit(clip).result(timeout=5)
    assert calls[-1] == 1  # lone request -> B=1 bucket, not max_batch
    futs = [b.submit(clip) for _ in range(3)]
    [f.result(timeout=5) for f in futs]
    assert calls[-1] in (2, 4)  # 3 reqs -> the 4-bucket (or 2+1 split)
    st = b.stats()
    assert st["bucket_sizes"] == [1, 2, 4]
    assert sum(st["bucket_dispatches"].values()) == st["batches"]
    assert st["bucket_dispatches"][1] >= 1
    b.close()

    with pytest.raises(ValueError):
        DynamicBatcher(predict, max_batch=4, bucket_sizes=(0, 4))
    # max_batch is appended when missing so every burst has a home.
    b2 = DynamicBatcher(predict, max_batch=4, bucket_sizes=(1, 2))
    assert b2.bucket_sizes == (1, 2, 4)
    b2.close()


def test_serve_cli_rejects_malformed_buckets():
    """Bucket validation fails fast with a clean SystemExit (not an int()
    traceback) BEFORE any model load / warmup compile is paid."""
    from laryngeal_tpu.cli import serve as serve_cli

    for bad in ("1,4,", "1,,8", "a,b"):
        with pytest.raises(SystemExit, match="batch_buckets"):
            serve_cli.main(["--model", "vivit", "--model_path", "/nonexist",
                            "--batch_buckets", bad])
    with pytest.raises(SystemExit, match="outside"):
        serve_cli.main(["--model", "vivit", "--model_path", "/nonexist",
                        "--batch_buckets", "0,4"])


def test_serve_from_exported_artifact(predictor, video_path, tmp_path):
    """The server runs against an AOT artifact (ExportedPredictor drop-in)
    with no checkpoint/model code, and matches the live predictor."""
    from laryngeal_tpu.infer.export import (
        ExportedPredictor, export_predictor, save_exported)

    path = save_exported(export_predictor(predictor, batch_sizes=(1, 4)),
                         tmp_path / "vivit.lxa")
    srv = InferenceServer(ExportedPredictor.load(path), port=0,
                          max_batch=4, batch_timeout_ms=50)
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    try:
        assert _get(srv, "/healthz")["status"] == "ok"
        got = _post(srv, "/predict",
                    json.dumps({"video_path": str(video_path)}).encode(),
                    "application/json")
        want = predictor.predict_video(str(video_path))
        assert got["predicted_class"] == want["predicted_class"]
        assert got["frame_indices"] == want["frame_indices"]
        np.testing.assert_allclose(
            [got["probabilities"][c] for c in sorted(got["probabilities"])],
            [want["probabilities"][c] for c in sorted(want["probabilities"])],
            atol=1e-6)
    finally:
        srv.close()
