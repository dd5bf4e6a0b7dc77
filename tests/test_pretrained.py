"""Pretrained bootstrap + shape reconciliation (--pretrained default path).

The reference fine-tunes pretrained weights by default (vivit_model.py:26-41,
swin3d.py:20-38, model.py:10-34) and relies on HF
``ignore_mismatched_sizes=True`` for the 400->2 classifier-head swap.
These tests pin our equivalents: reconcile_params keeps the fresh head on
shape mismatch, interpolates mismatched time_embeddings, and the offline
fetch path reports loaded=False so cli.main can warn loudly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from laryngeal_tpu.compat import pretrained as P
from laryngeal_tpu.compat.loading import (load_torch_weights_into_state,
                                          reconcile_params)
from laryngeal_tpu.compat.torch_port import resize_time_embeddings


def test_resize_time_embeddings_identity_and_interp():
    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (1, 8, 16)).astype(np.float32)
    assert resize_time_embeddings(emb, 8) is emb

    out = resize_time_embeddings(emb, 32)
    assert out.shape == (1, 32, 16)
    # Endpoints are exact; interior is a convex combination of neighbors.
    np.testing.assert_allclose(out[:, 0], emb[:, 0], rtol=1e-6)
    np.testing.assert_allclose(out[:, -1], emb[:, -1], rtol=1e-6)
    lo = np.minimum.reduce([emb[:, i] for i in range(8)])
    hi = np.maximum.reduce([emb[:, i] for i in range(8)])
    assert (out >= lo.min() - 1e-6).all() and (out <= hi.max() + 1e-6).all()

    # Downsample path too (32f checkpoint -> 8f model).
    down = resize_time_embeddings(out, 8)
    assert down.shape == (1, 8, 16)


def test_reconcile_keeps_fresh_head_and_interpolates_time():
    current = {
        "embeddings": {"time_embeddings": np.zeros((1, 4, 8), np.float32)},
        "classifier": {"kernel": np.full((8, 2), 7.0, np.float32),
                       "bias": np.zeros((2,), np.float32)},
        "layer_0": {"w": np.zeros((3, 3), np.float32)},
    }
    rng = np.random.default_rng(1)
    converted = {
        "embeddings": {"time_embeddings":
                       rng.normal(0, 1, (1, 2, 8)).astype(np.float32)},
        "classifier": {"kernel": rng.normal(0, 1, (8, 400)).astype(np.float32),
                       "bias": rng.normal(0, 1, (400,)).astype(np.float32)},
        "layer_0": {"w": rng.normal(0, 1, (3, 3)).astype(np.float32)},
    }
    out = reconcile_params(current, converted)
    # Head mismatch: fresh init kept (reference ignore_mismatched_sizes).
    np.testing.assert_array_equal(out["classifier"]["kernel"],
                                  current["classifier"]["kernel"])
    np.testing.assert_array_equal(out["classifier"]["bias"],
                                  current["classifier"]["bias"])
    # time_embeddings: interpolated 2 -> 4, endpoints exact.
    te = out["embeddings"]["time_embeddings"]
    assert te.shape == (1, 4, 8)
    src = converted["embeddings"]["time_embeddings"]
    np.testing.assert_allclose(te[:, 0], src[:, 0], rtol=1e-6)
    np.testing.assert_allclose(te[:, -1], src[:, -1], rtol=1e-6)
    # Matched leaves: ported values win.
    np.testing.assert_array_equal(out["layer_0"]["w"], converted["layer_0"]["w"])


def test_timesformer_8f_checkpoint_into_32f_model():
    """Port an HF tiny 2-frame/3-class checkpoint into a 4-frame/2-class
    model — the exact shape of loading the 8f k400 checkpoint at the
    reference-default 32 frames (timesformer/main.py:39)."""
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification as HFModel

    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.timesformer import (TimesformerConfig,
                                                  TimesformerForVideoClassification)
    from laryngeal_tpu.train.state import create_train_state

    torch.manual_seed(0)
    hf = HFModel(HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, num_frames=2, patch_size=16,
        num_labels=3, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)).eval()
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if "embeddings" in name and p.abs().sum() == 0:
                p.normal_(0, 0.02)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    model = TimesformerForVideoClassification(TimesformerConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        image_size=32, num_frames=4, patch_size=16, num_classes=2))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3)),
                               optimizer="adamw", learning_rate=1e-3)
    fresh_head = np.asarray(state.params["classifier"]["kernel"]).copy()

    state = load_torch_weights_into_state(state, "timesformer", "<test>", sd=sd)

    te = np.asarray(state.params["embeddings"]["time_embeddings"])
    assert te.shape == (1, 4, 32)
    np.testing.assert_allclose(
        te[:, 0], sd["timesformer.embeddings.time_embeddings"][:, 0],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(state.params["classifier"]["kernel"]), fresh_head)
    # Ported encoder weights actually arrived.
    np.testing.assert_allclose(
        np.asarray(state.params["layer_0"]["temporal_dense"]["kernel"]),
        sd["timesformer.encoder.layer.0.temporal_dense.weight"].T,
        rtol=1e-6)
    # The reconciled state runs.
    logits = model.apply({"params": state.params},
                         jnp.zeros((1, 4, 32, 32, 3)))
    assert np.asarray(logits).shape == (1, 2)

    # And the registry default that makes this path the default path:
    assert get_model_spec("timesformer").default_num_frames == 32


def test_offline_fetch_reports_not_loaded(monkeypatch):
    """No cache + no network (conftest sets HF_HUB_OFFLINE=1): the vivit
    fetch must fail cleanly so cli.main's loud random-init warning fires."""
    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
    from laryngeal_tpu.train.state import create_train_state

    model = VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        image_size=32, num_frames=4, num_classes=2))
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3)),
                               optimizer="adamw", learning_rate=1e-3)
    out, loaded = P.load_pretrained_into_state(state, "vivit")
    assert loaded is False
    assert out is state

    # resnet3d: scratch IS the reference default -> no warning owed.
    _, loaded = P.load_pretrained_into_state(state, "resnet3d")
    assert loaded is True


def test_resnet50_lstm_trunk_bootstrap(monkeypatch):
    """Trunk-only install: ImageNet resnet50 layout -> params['resnet50'] +
    batch_stats, LSTM/classifier left at fresh init (model.py:10-34)."""
    from test_resnet_lstm_parity import make_torch_resnet50_trunk

    from laryngeal_tpu.models.resnet import ResNetLSTMConfig, VideoResNet50LSTM
    from laryngeal_tpu.train.state import create_train_state

    torch.manual_seed(3)
    trunk = make_torch_resnet50_trunk().eval()
    seq_sd = {k: v.detach().numpy() for k, v in trunk.state_dict().items()}
    # Rename sequential-layout keys to plain torchvision names.
    ren = {"0.": "conv1.", "1.": "bn1.", "4.": "layer1.", "5.": "layer2.",
           "6.": "layer3.", "7.": "layer4."}
    tv_sd = {}
    for k, v in seq_sd.items():
        head, rest = k.split(".", 1)
        tv_sd[ren[head + "."] + rest] = v

    monkeypatch.setattr(P, "_tv_resnet50_state_dict",
                        lambda logger=None: (tv_sd, "test/resnet50"))

    model = VideoResNet50LSTM(ResNetLSTMConfig())
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 2, 64, 64, 3)),
                               optimizer="adam", learning_rate=1e-3)
    fresh_lstm = np.asarray(state.params["lstm"]["w_ih_l0"]).copy()

    state, loaded = P.load_pretrained_into_state(state, "resnet50_lstm")
    assert loaded is True
    np.testing.assert_allclose(
        np.asarray(state.params["resnet50"]["conv1"]["kernel"]),
        tv_sd["conv1.weight"].transpose(2, 3, 1, 0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["resnet50"]["bn1"]["mean"]),
        tv_sd["bn1.running_mean"], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(state.params["lstm"]["w_ih_l0"]), fresh_lstm)
