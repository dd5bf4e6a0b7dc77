"""Mid-training resume + profiling utilities + multi-model mesh steps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.trainer import Trainer
from laryngeal_tpu.utils.profiling import StepTimer, block, trace


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume_synth")
    make_synthetic_dataset(str(root), {"train": 3, "val": 2, "test": 2},
                           num_frames=10, h=64, w=64, seed=11)
    return root


def make_trainer(synth_root, exp_dir, epochs):
    spec = get_model_spec("vivit")
    loaders = create_dataloaders(str(synth_root), num_frames=4, batch_size=4,
                                 resize_to=(64, 64), pad_last=True)
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4)
    model = VivitForVideoClassification(cfg)
    config = {"epochs": epochs, "learning_rate": 1e-3, "crop_size": 64, "seed": 0}
    return Trainer(model, spec, loaders, config, exp_dir=exp_dir)


def test_resume_continues_from_epoch(synth_root, tmp_path):
    t1 = make_trainer(synth_root, tmp_path / "run1", epochs=2)
    t1.train()
    assert len(t1.history["train_loss"]) == 2
    step_after_2 = int(np.asarray(t1.state.step))

    # Resume from the best checkpoint into a 4-epoch schedule.
    t2 = make_trainer(synth_root, tmp_path / "run2", epochs=4)
    start = t2.resume(t1.best_path)
    assert start >= 1
    assert len(t2.history["train_loss"]) == start  # history restored
    t2.train()
    assert len(t2.history["train_loss"]) == 4
    # Optimizer state continued (step counter advanced from the restored one).
    assert int(np.asarray(t2.state.step)) > step_after_2 // 2


def test_preempted_run_resumed_from_latest_reproduces_history(synth_root, tmp_path):
    """Kill-and-resume == uninterrupted (VERDICT r4 #4): a 2-epoch run
    leaves its rolling 'latest' checkpoint (save_every default 1); resuming
    it into a 4-epoch schedule reproduces the uninterrupted 4-epoch run's
    history EXACTLY (uniform sampling; absolute-epoch shuffle seeds;
    augmentation/dropout RNG keyed on the restored step counter)."""
    full = make_trainer(synth_root, tmp_path / "full", epochs=4)
    full.train()

    part = make_trainer(synth_root, tmp_path / "part", epochs=2)
    part.train()
    latest = part.exp_dir / "latest"
    assert (latest / "metadata.json").exists()

    resumed = make_trainer(synth_root, tmp_path / "resumed", epochs=4)
    start = resumed.resume(latest)
    assert start == 2
    resumed.train()

    for k in ("train_loss", "val_loss", "train_acc", "val_acc",
              "train_auroc", "val_auroc", "lr"):
        np.testing.assert_allclose(
            resumed.history[k], full.history[k], rtol=0, atol=0,
            err_msg=f"history[{k}] diverged after resume")


def test_find_resume_checkpoint(synth_root, tmp_path):
    from laryngeal_tpu.train.checkpoint import find_resume_checkpoint

    assert find_resume_checkpoint(tmp_path / "nope", "vivit") is None
    log_dir = tmp_path / "logs"
    exp = log_dir / "vivit-classifier-20260101_000000"
    t = make_trainer(synth_root, exp, epochs=1)
    t.train()
    found = find_resume_checkpoint(log_dir, "vivit")
    assert found is not None and found.endswith("latest")
    # A newer run wins.
    import time as _t

    _t.sleep(0.05)
    exp2 = log_dir / "vivit-classifier-20260101_000001"
    t2 = make_trainer(synth_root, exp2, epochs=1)
    t2.train()
    found2 = find_resume_checkpoint(log_dir, "vivit")
    assert found2 is not None and str(exp2) in found2


def test_step_timer_summary():
    st = StepTimer(warmup=1, items_per_step=4)
    import time

    for _ in range(4):
        with st:
            time.sleep(0.01)
    s = st.summary()
    assert s["steps"] == 3  # warmup excluded
    assert s["mean_s"] >= 0.01
    assert s["items_per_sec"] == pytest.approx(4 / s["mean_s"])
    assert StepTimer().summary() == {"steps": 0}


def test_block_barrier():
    x = jnp.arange(8).reshape(2, 4)
    block({"a": x})  # must not raise
    block([])


def test_trace_noop_and_dir(tmp_path):
    with trace(None):
        pass
    with trace(tmp_path / "prof"):
        _ = jnp.ones(4) * 2
    # Trace dir may or may not be populated on CPU; context must not raise.


@pytest.mark.parametrize("model_name", ["resnet3d", "swin3d"])
def test_mesh_train_step_bn_models(synth_root, tmp_path, model_name):
    """Data-parallel train step for the BatchNorm/window models on the
    8-device CPU mesh — BN stats reduce over the *global* batch via GSPMD."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.models.registry import create_model
    from laryngeal_tpu.parallel.mesh import make_mesh, replicate
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_train_step, prepare_batch

    mesh = make_mesh(n_data=8)
    spec = get_model_spec(model_name)
    if model_name == "resnet3d":
        from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig

        model = ResNet3D(ResNet3DConfig(stage_sizes=(1, 1, 1, 1)))
    else:
        from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

        model = SwinTransformer3D(Swin3DConfig(
            embed_dim=8, depths=(1, 1), num_heads=(2, 2), window=(2, 2, 2)))

    crop = 32
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, crop, crop, 3)),
                               optimizer=spec.optimizer, learning_rate=1e-3)
    state = replicate(mesh, state)
    step = make_train_step(model, spec.preprocess_regime, spec.loss,
                           mesh=mesh, crop=crop)
    rng_np = np.random.default_rng(0)
    batch = {
        "pixel_values": rng_np.integers(0, 255, (16, 4, 48, 48, 3)).astype(np.uint8),
        "labels": rng_np.integers(0, 2, 16).astype(np.int32),
        "mask": np.ones(16, np.bool_),
    }
    pixel, labels, mask = prepare_batch(batch, mesh)
    new_state, metrics = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    if model_name == "resnet3d":
        before = jax.tree.leaves(state.batch_stats)
        # state was donated; compare against fresh init stats instead
        fresh = create_train_state(model, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 4, crop, crop, 3)),
                                   optimizer=spec.optimizer, learning_rate=1e-3)
        a = np.asarray(jax.tree.leaves(fresh.batch_stats)[0])
        b = np.asarray(jax.tree.leaves(new_state.batch_stats)[0])
        assert not np.allclose(a, b)  # stats updated under the mesh
