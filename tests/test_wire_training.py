"""Wire-format training feed (VideoDataset(wire=...) + in-graph decode).

The training/eval feed can ship i420 / delta / dct payloads instead of RGB24
(preprocess.transforms.decode_wire_batch) — TPU-native infrastructure for
bandwidth-limited host->device links; no reference counterpart (the
reference feeds an in-process DataLoader, SURVEY.md §2.4). These tests pin:

- in-graph decode correctness: i420/delta wires reproduce the host BT.601
  conversion exactly; dct matches the dct_wire contract;
- the full loader -> prepare_batch -> train/eval step path for every wire
  (including the dct tuple payload through collate, pad_last, grad-accum
  micro-batching and a dp mesh);
- loss parity: i420/delta training losses agree with each other exactly
  (same decoded pixels) and with rgb to preprocessing tolerance.
"""

import numpy as np
import pytest

from laryngeal_tpu.data.pipeline import ClipLoader, create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wire_synth")
    make_synthetic_dataset(d, videos_per_class={"referral": 2,
                                                "non_referral": 2},
                           num_frames=12, h=64, w=64)
    return d


def _loaders(synth_dir, wire, **kw):
    return create_dataloaders(
        synth_dir, num_frames=4, batch_size=2, resize_to=(64, 64),
        pad_last=True, wire=wire, num_workers=1, **kw)


def test_wire_payload_shapes(synth_dir):
    for wire, check in {
        "rgb": lambda p: p.shape == (2, 4, 64, 64, 3) and p.dtype == np.uint8,
        "i420": lambda p: p.shape == (2, 4, 96, 64) and p.dtype == np.uint8,
        "delta": lambda p: p.shape == (2, 4, 96, 64) and p.dtype == np.uint8,
    }.items():
        batch = next(iter(_loaders(synth_dir, wire)["train"]))
        assert check(batch["pixel_values"]), (wire, batch["pixel_values"].shape)
    batch = next(iter(_loaders(synth_dir, "dct")["train"]))
    dc, ac = batch["pixel_values"]
    nb = (64 // 8) ** 2 + 2 * (64 // 16) ** 2
    assert dc.shape == (2, 4, nb) and dc.dtype == np.int16
    assert ac.shape == (2, 31, 4, nb) and ac.dtype == np.int8
    batch = next(iter(_loaders(synth_dir, "dctp")["train"]))
    dc, ac_hi, ac_pk = batch["pixel_values"]
    assert dc.shape == (2, 4, nb) and dc.dtype == np.int16
    assert ac_hi.shape == (2, 14, 4, nb) and ac_hi.dtype == np.int8
    assert ac_pk.shape == (2, 9, 4, nb) and ac_pk.dtype == np.uint8


def test_i420_wire_decode_matches_host_rgb(synth_dir):
    """In-graph i420/delta decode == transforms.yuv420_to_rgb on the same
    planes (exact), and the planes round-trip the host rgb_to_yuv420."""
    from laryngeal_tpu.preprocess.transforms import (decode_wire_batch,
                                                     yuv420_to_rgb)

    b_i420 = next(iter(_loaders(synth_dir, "i420")["val"]))
    b_delta = next(iter(_loaders(synth_dir, "delta")["val"]))
    planes = b_i420["pixel_values"]
    rgb_graph = np.asarray(decode_wire_batch(planes, "i420"))
    rgb_host = np.stack(
        [np.asarray(yuv420_to_rgb(c, 64, 64)) for c in planes])
    np.testing.assert_allclose(rgb_graph, rgb_host, atol=1e-4)
    rgb_delta = np.asarray(decode_wire_batch(b_delta["pixel_values"], "delta"))
    np.testing.assert_allclose(rgb_delta, rgb_graph, atol=1e-4)


def _tiny_vivit():
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.vivit import (VivitConfig,
                                            VivitForVideoClassification)

    model = VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        image_size=64, num_frames=4, num_classes=2, tubelet_size=(2, 16, 16)))
    return model


def _state_for(model):
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.train.state import create_train_state

    return create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer="adamw", learning_rate=1e-3, weight_decay=0.01)


@pytest.mark.parametrize("wire", ["i420", "delta", "dct", "dctp"])
def test_train_and_eval_step_per_wire(synth_dir, wire):
    import jax

    from laryngeal_tpu.train.steps import (make_eval_step, make_train_step,
                                           prepare_batch)

    model = _tiny_vivit()
    state = _state_for(model)
    kw = dict(wire=wire,
              wire_hw=(64, 64) if wire in ("dct", "dctp") else None)
    train_step = make_train_step(model, "vivit", "ce", crop=64, **kw)
    eval_step = make_eval_step(model, "vivit", "ce", crop=64, **kw)
    batch = next(iter(_loaders(synth_dir, wire)["train"]))
    pixel, labels, mask = prepare_batch(batch)
    state2, m = train_step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1
    ev = eval_step(state2, pixel, labels, mask)
    assert np.isfinite(float(ev["loss"]))
    assert ev["probs"].shape == (2, 2)


def test_wire_loss_parity(synth_dir):
    """i420 and delta produce IDENTICAL losses (same decoded pixels); rgb
    differs only by host-uint8 vs device-f32 BT.601 rounding; dct stays
    within the lossy-wire tolerance."""
    import jax

    from laryngeal_tpu.train.steps import make_eval_step, prepare_batch

    model = _tiny_vivit()
    state = _state_for(model)
    losses = {}
    for wire in ("rgb", "i420", "delta", "dct", "dctp"):
        step = make_eval_step(
            model, "vivit", "ce", crop=64, wire=wire,
            wire_hw=(64, 64) if wire in ("dct", "dctp") else None)
        batch = next(iter(_loaders(synth_dir, wire)["val"]))
        pixel, labels, mask = prepare_batch(batch)
        losses[wire] = float(step(state, pixel, labels, mask)["loss"])
    # Same decoded pixels; the two jitted graphs fuse differently, so allow
    # ulp-level drift (measured 6e-8).
    assert losses["i420"] == pytest.approx(losses["delta"], abs=1e-5)
    assert losses["i420"] == pytest.approx(losses["rgb"], abs=0.05)
    assert losses["dct"] == pytest.approx(losses["i420"], abs=0.1)
    # the packed wire's extra loss over dct is only the [-8,7] clamp on
    # planes >= 14 — near-identical losses
    assert losses["dctp"] == pytest.approx(losses["dct"], abs=0.02)


def test_dct_wire_grad_accum_and_mesh(synth_dir):
    """The dct tuple payload must survive the strided grad-accum split and
    dp-mesh sharding (tree-mapped _strided + pytree shard_batch)."""
    import jax

    from laryngeal_tpu.parallel.mesh import make_mesh
    from laryngeal_tpu.train.steps import make_train_step, prepare_batch

    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    mesh = make_mesh(n_data=2)
    model = _tiny_vivit()
    state = _state_for(model)
    from laryngeal_tpu.parallel.mesh import replicate

    state = replicate(mesh, state)
    step = make_train_step(model, "vivit", "ce", mesh=mesh, crop=64,
                           grad_accum=2, wire="dct", wire_hw=(64, 64))
    batch = next(iter(_loaders(synth_dir, "dct")["train"]))
    pixel, labels, mask = prepare_batch(batch, mesh)
    state2, m = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_pytorchvideo_regime_i420_wire(synth_dir):
    """The augmenting (pytorchvideo) regime + BatchNorm family must accept
    the f32 output of the in-graph wire decode (scale/crop/flip gathers are
    dtype-agnostic; BN stats update through the decoded pixels)."""
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.resnet3d import create_resnet3d
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_train_step, prepare_batch

    model = create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer="adam", learning_rate=1e-3, weight_decay=0.0)
    step = make_train_step(model, "pytorchvideo", "ce", crop=64, wire="i420")
    batch = next(iter(_loaders(synth_dir, "i420")["train"]))
    pixel, labels, mask = prepare_batch(batch)
    state2, m = step(state, pixel, labels, mask, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1


def test_placeholder_clip_per_wire(synth_dir):
    """Decode failures must yield wire-format gray placeholders (the
    reference's robustness contract, vivit dataset.py:370-381)."""
    from laryngeal_tpu.data.dataset import VideoDataset

    for wire in ("rgb", "i420", "dct", "dctp"):
        ds = VideoDataset(synth_dir, mode="train", num_frames=4,
                          resize_to=(64, 64), wire=wire)
        item = ds.materialize({"video_path": "missing.mp4", "label": 0,
                               "frame_indices": None})
        assert item["frame_indices"] == []
        pv = item["pixel_values"]
        if wire in ("dct", "dctp"):
            assert isinstance(pv, tuple) and pv[0].shape[0] == 4
        else:
            assert pv.shape[0] == 4


def test_wire_requires_16_multiple():
    from laryngeal_tpu.data.dataset import VideoDataset

    with pytest.raises(ValueError):
        VideoDataset("/nonexistent", mode="train", resize_to=(60, 60),
                     wire="dct", video_paths=["x.mp4"])
    # Lowres shifts the constraint to the REDUCED geometry.
    with pytest.raises(ValueError):
        VideoDataset("/nonexistent", mode="train", resize_to=(16, 16),
                     wire="dct", wire_lowres=1, video_paths=["x.mp4"])


def test_lowres_wire_training_feed(synth_dir):
    """wire_lowres=1: the dataset ships (resize>>1)-geometry payloads, the
    trainer's wire_hw follows, a train+eval step runs, and the loss lands
    within the lowres loss envelope of the full-res wire."""
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.vivit import (VivitConfig,
                                            VivitForVideoClassification)
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_eval_step, make_train_step

    loaders = _loaders(synth_dir, "dctp", wire_lowres=1)
    ds = loaders["train"].dataset
    assert ds.wire_wh == (32, 32)
    item = ds[0]
    dc = item["pixel_values"][0]
    # 32x32 i420 -> (32*32 + 2*16*16) / 64 = 24 blocks/frame.
    assert dc.shape == (4, 24), dc.shape

    model = VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        image_size=64, num_frames=4, num_classes=2,
        tubelet_size=(2, 16, 16)))

    from laryngeal_tpu.train.steps import prepare_batch

    losses = {}
    for lowres in (0, 1):
        # Fresh state per arm: the jitted train step donates the state
        # buffers, and PRNGKey(0) makes the two inits identical anyway.
        state = create_train_state(
            model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
            optimizer="adamw", learning_rate=1e-3, weight_decay=0.01)
        lo = _loaders(synth_dir, "dctp", wire_lowres=lowres)
        dtr = lo["train"].dataset
        ww, wh = dtr.wire_wh
        step = make_train_step(model, "vivit", "ce", crop=64, wire="dctp",
                               wire_hw=(wh, ww))
        estep = make_eval_step(model, "vivit", "ce", crop=64, wire="dctp",
                               wire_hw=(wh, ww))
        pixel, labels, mask = prepare_batch(next(iter(lo["train"])))
        em = estep(state, pixel, labels, mask)
        losses[lowres] = float(em["loss"])
        _, m = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
    # Same clips through the same random-init model: the lowres loss must
    # track the full-res wire (quantization+resolution loss only).
    assert abs(losses[1] - losses[0]) < 0.15, losses


def test_rgb_clip_for_visualization(synth_dir):
    ds = create_dataloaders(synth_dir, num_frames=4, batch_size=2,
                            resize_to=(64, 64), wire="dct",
                            num_workers=1)["test"].dataset
    clip = ds.rgb_clip(0)
    assert clip.shape == (4, 64, 64, 3) and clip.dtype == np.uint8
