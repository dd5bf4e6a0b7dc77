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


def test_batcher_bounded_queue_rejects_when_full():
    """Overload semantics (round-4 VERDICT #5): a full bounded queue raises
    Overloaded at submit instead of growing without bound; the retry hint is
    positive; stats count the rejections."""
    from laryngeal_tpu.serve.server import Overloaded

    release = threading.Event()

    def predict(clips):
        release.wait(timeout=10)
        return np.tile([[0.5, 0.5]], (clips.shape[0], 1))

    b = DynamicBatcher(predict, max_batch=2, batch_timeout_ms=1,
                       queue_depth=2)
    clip = np.zeros((2, 8, 8, 3), np.uint8)
    futs = []
    rejected = 0
    # First dispatch blocks in predict; keep stuffing until the bound trips.
    for _ in range(12):
        try:
            futs.append(b.submit(clip))
        except Overloaded as e:
            rejected += 1
            assert e.retry_after_s >= 1.0
    assert rejected >= 1
    assert b.stats()["rejected_queue_full"] == rejected
    release.set()
    for f in futs:
        np.testing.assert_allclose(f.result(timeout=10), [0.5, 0.5])
    b.close()


def test_batcher_request_deadline_sheds_stale_requests():
    """Requests that exhaust their deadline while queued resolve with
    DeadlineExceeded and are never dispatched to the device."""
    from laryngeal_tpu.serve.server import DeadlineExceeded

    dispatched = []
    release = threading.Event()

    def predict(clips):
        dispatched.append(clips.shape[0])
        release.wait(timeout=10)
        return np.tile([[0.5, 0.5]], (clips.shape[0], 1))

    b = DynamicBatcher(predict, max_batch=2, batch_timeout_ms=1,
                       queue_depth=8, request_timeout_ms=150)
    clip = np.zeros((2, 8, 8, 3), np.uint8)
    f1 = b.submit(clip)  # dispatches immediately, blocks in predict
    import time

    time.sleep(0.05)
    f2 = b.submit(clip)  # sits queued past its 150 ms deadline
    time.sleep(0.3)
    release.set()
    np.testing.assert_allclose(f1.result(timeout=10), [0.5, 0.5])
    with pytest.raises(DeadlineExceeded):
        f2.result(timeout=10)
    assert b.stats()["expired_in_queue"] == 1
    b.close()


def test_server_queue_full_returns_503_with_retry_after(predictor, video_path):
    """End-to-end HTTP overload: with queue_depth=1 and a slowed device
    path, concurrent clients see 503 + Retry-After; the server keeps
    answering afterwards."""
    import time as _time

    srv = InferenceServer(predictor, port=0, max_batch=1,
                          batch_timeout_ms=1, queue_depth=1,
                          request_timeout_ms=0.0, decode_threads=4)
    slow_orig = srv.batcher.predict_batch

    def slow(clips):
        _time.sleep(0.4)
        return slow_orig(clips)

    srv.batcher.predict_batch = slow
    t = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"video_path": str(video_path)}).encode()

        def one():
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/predict", data=body,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, dict(r.headers)
            except urllib.error.HTTPError as e:
                return e.code, dict(e.headers)

        with ThreadPoolExecutor(max_workers=8) as pool:
            results = list(pool.map(lambda _: one(), range(8)))
        codes = [c for c, _ in results]
        assert 200 in codes, codes
        assert 503 in codes, codes
        hdrs = next(h for c, h in results if c == 503)
        assert int(hdrs["Retry-After"]) >= 1
        # Server recovers: a lone request succeeds post-burst.
        code, _ = one()
        assert code == 200
        assert srv.batcher.stats()["rejected_queue_full"] >= 1
    finally:
        srv.close()


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
