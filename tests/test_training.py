"""End-to-end training framework tests on synthetic data (CPU, tiny configs)."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.evals.evaluator import Evaluator
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from laryngeal_tpu.train.losses import bce_with_logits, cross_entropy, reference_pos_weight
from laryngeal_tpu.train.selection import (
    CompositeSelection,
    EarlyStopping,
    LossAccThresholdSelection,
    MinLossSelection,
    ReduceLROnPlateau,
)
from laryngeal_tpu.train.state import create_train_state, get_learning_rate, set_learning_rate
from laryngeal_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_synth")
    make_synthetic_dataset(
        str(root), {"train": 4, "val": 2, "test": 2}, num_frames=12, h=64, w=64, seed=5
    )
    return root


def tiny_vivit():
    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4,
                      num_classes=2)
    return VivitForVideoClassification(cfg)


# ---------- losses ----------

def test_losses_match_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 8)
    ce = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    t_ce = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)).item()
    assert float(ce) == pytest.approx(t_ce, abs=1e-6)

    logit1 = rng.normal(0, 2, (8, 1)).astype(np.float32)
    pw = reference_pos_weight(3, 5)
    bce = bce_with_logits(jnp.asarray(logit1), jnp.asarray(labels), pos_weight=pw)
    t_bce = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([pw]))(
        torch.from_numpy(logit1.reshape(-1)),
        torch.from_numpy(labels.astype(np.float32))).item()
    assert float(bce) == pytest.approx(t_bce, abs=1e-6)
    assert reference_pos_weight(31, 61) == pytest.approx(61 / 31 * 1.5)


def test_masked_loss_ignores_padding():
    logits = jnp.asarray([[2.0, -1.0], [100.0, -100.0]])
    labels = jnp.asarray([0, 1])
    mask = jnp.asarray([True, False])
    full = cross_entropy(logits, labels, mask)
    solo = cross_entropy(logits[:1], labels[:1])
    assert float(full) == pytest.approx(float(solo))


# ---------- selection policies ----------

def test_min_loss_selection():
    s = MinLossSelection()
    assert s(val_loss=1.0) and not s(val_loss=1.1) and s(val_loss=0.9)


def test_composite_selection_reference_semantics():
    s = CompositeSelection(loss_weight=0.3)
    assert s(val_loss=1.0, val_auroc=0.5)
    # Better AUROC at slightly worse loss can still win (weight 0.7 on auroc).
    assert s(val_loss=1.05, val_auroc=0.9)
    # Much worse on both loses.
    assert not s(val_loss=2.0, val_auroc=0.5)


def test_loss_acc_threshold_selection():
    s = LossAccThresholdSelection(acc_threshold=0.02)
    assert s(val_loss=1.0, val_acc=0.8)
    # Loss improves but acc fell more than 2% below best: reject.
    assert not s(val_loss=0.9, val_acc=0.70)
    # Loss improves and acc within threshold: accept.
    assert s(val_loss=0.85, val_acc=0.79)


def test_early_stopping_counter():
    es = EarlyStopping(patience=2, delta=0.0)
    assert es(1.0)
    assert not es(1.2)
    assert not es(1.3)
    assert es.should_stop


def test_reduce_lr_on_plateau():
    sch = ReduceLROnPlateau(lr=1.0, mode="max", factor=0.5, patience=1)
    assert sch.step(0.5) == 1.0
    assert sch.step(0.4) == 1.0   # counter 1
    assert sch.step(0.4) == 0.5   # exceeded patience -> halve
    assert sch.step(0.9) == 0.5   # new best


# ---------- state / lr injection ----------

def test_set_get_learning_rate_with_mask():
    import flax

    model = tiny_vivit()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer="adamw", learning_rate=1e-3, weight_decay=0.01,
        trainable_mask_fn=lambda p: jax.tree.map(lambda _: True, p),
    )
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)


# ---------- end-to-end training ----------

def test_trainer_end_to_end_vivit(synth_root, tmp_path):
    spec = get_model_spec("vivit")
    loaders = create_dataloaders(
        str(synth_root),
        sampling_methods={"train": "random_window", "val": "uniform", "test": "uniform"},
        num_frames=4, batch_size=4, resize_to=(64, 64), pad_last=True,
    )
    model = tiny_vivit()
    config = {"epochs": 2, "learning_rate": 1e-3, "crop_size": 64,
              "patience": 5, "seed": 42}
    trainer = Trainer(model, spec, loaders, config, exp_dir=tmp_path)
    state = trainer.train()

    assert len(trainer.history["train_loss"]) == 2
    assert (tmp_path / "training_history.json").exists()
    assert (tmp_path / "training_config.json").exists()
    assert (tmp_path / "best_model").exists()

    # Evaluate the trained state.
    ev = Evaluator(trainer.eval_step, loaders["test"],
                   class_names=loaders["test"].dataset.class_labels,
                   exp_dir=tmp_path)
    auroc, f1, cm = ev.evaluate(state, sampling_method="uniform")
    assert 0.0 <= auroc <= 1.0
    assert cm.shape == (2, 2)
    saved = json.loads((tmp_path / "test_metrics_uniform.json").read_text())
    assert "auroc" in saved and "per_video" in saved
    assert len(saved["per_video"]) == len(loaders["test"].dataset)


def test_checkpoint_roundtrip(tmp_path):
    model = tiny_vivit()
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer="adamw", learning_rate=1e-3,
    )
    save_checkpoint(tmp_path / "ck", state, epoch=3,
                    history={"val_loss": [1.0, 0.5]},
                    config={"batch_size": 4},
                    class_labels=["non_referral", "referral"])
    blank = create_train_state(
        model, jax.random.PRNGKey(1), jnp.zeros((1, 4, 64, 64, 3)),
        optimizer="adamw", learning_rate=1e-3,
    )
    out = load_checkpoint(tmp_path / "ck", blank)
    assert out["epoch"] == 3
    assert out["class_labels"] == ["non_referral", "referral"]
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(out["state"].params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_multichip_mesh(synth_root, tmp_path):
    """Same trainer on a virtual 8-device CPU mesh (data-parallel)."""
    from laryngeal_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    spec = get_model_spec("vivit")
    loaders = create_dataloaders(
        str(synth_root), num_frames=4, batch_size=8, resize_to=(64, 64),
        pad_last=True,
    )
    model = tiny_vivit()
    config = {"epochs": 1, "learning_rate": 1e-3, "crop_size": 64, "seed": 0}
    trainer = Trainer(model, spec, loaders, config, exp_dir=tmp_path, mesh=mesh)
    state = trainer.train()
    assert len(trainer.history["train_loss"]) == 1
    assert np.isfinite(trainer.history["val_loss"][0])
