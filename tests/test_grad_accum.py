"""Gradient accumulation (lax.scan micro-batching inside one jitted step).

For a deterministic-preprocess, BN-free model the valid-count-weighted
accumulation must reproduce the full-batch GRADIENTS exactly (same
masked-mean loss, one optimizer step). Gradients, not post-Adam params, are
compared: at step 1 Adam's update is ~lr*sign(g), which amplifies fp-level
reassociation noise on near-zero gradient elements to O(lr) param deltas.
BN models accumulate running stats sequentially per micro-batch — asserted
to run and advance exactly one optimizer step. The dp case checks the scan +
sharding-constraint path composes with a multi-device mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.parallel.mesh import make_mesh, replicate
from laryngeal_tpu.train.state import create_train_state
from laryngeal_tpu.train.steps import make_train_step, prepare_batch


def _tiny_vivit():
    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification

    return VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
        image_size=32, num_frames=4, num_classes=2))


def _state(model):
    spec = get_model_spec("vivit")
    return spec, create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01,
    )


def _batch(batch_size=8, n_pad=0):
    rng = np.random.default_rng(7)
    mask = np.ones((batch_size,), np.bool_)
    if n_pad:
        mask[-n_pad:] = False
    return {
        "pixel_values": rng.integers(
            0, 255, (batch_size, 4, 32, 32, 3)).astype(np.uint8),
        "labels": rng.integers(0, 2, (batch_size,)).astype(np.int32),
        "mask": mask,
    }


def _run(model, spec, accum, batch, mesh=None):
    state = _state(model)[1]
    if mesh is not None:
        state = replicate(mesh, state)
    step = make_train_step(model, spec.preprocess_regime, spec.loss,
                           mesh=mesh, crop=32, grad_accum=accum,
                           return_grads=True)
    pixel, labels, mask = prepare_batch(batch, mesh)
    new_state, metrics = step(state, pixel, labels, mask, jax.random.PRNGKey(3))
    return new_state, metrics


def _assert_grads_close(g1, g2):
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        # Per-leaf scale with an fp32-noise floor: leaves whose gradients are
        # entirely ~1e-9 (dead inputs) only carry reassociation noise.
        atol = max(1e-4 * float(np.abs(a).max()), 3e-8)
        np.testing.assert_allclose(a, b, atol=atol, rtol=0)


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_matches_full_batch(accum):
    model = _tiny_vivit()
    spec, _ = _state(model)
    batch = _batch(8)
    s1, m1 = _run(model, spec, 1, batch)
    sk, mk = _run(model, spec, accum, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(mk["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(m1["probs"]), np.asarray(mk["probs"]), atol=2e-5)
    _assert_grads_close(m1["grads"], mk["grads"])
    assert int(sk.step) == 1  # one optimizer update per batch, not per micro


def test_accum_with_padded_batch():
    """A fully-padded final micro-batch contributes zero, not NaN."""
    model = _tiny_vivit()
    spec, _ = _state(model)
    batch = _batch(8, n_pad=4)  # micro-batch 2/2 is all padding at accum=2
    s1, m1 = _run(model, spec, 1, batch)
    sk, mk = _run(model, spec, 2, batch)
    assert np.isfinite(float(mk["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(mk["loss"]), rtol=2e-5)
    _assert_grads_close(m1["grads"], mk["grads"])


def test_accum_bn_model_runs():
    """BN stats thread through the scan carry (sequential micro-batch
    updates, torch grad-accumulation semantics)."""
    from laryngeal_tpu.models.resnet3d import create_resnet3d

    spec = get_model_spec("resnet3d")
    model = create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01,
    )
    before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    step = make_train_step(model, spec.preprocess_regime, spec.loss,
                           crop=32, grad_accum=2)
    batch = _batch(8)
    pixel, labels, mask = prepare_batch(batch)
    new_state, metrics = step(state, pixel, labels, mask, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(a, np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(before), after))


def test_accum_dp_matches_single_device():
    model = _tiny_vivit()
    spec, _ = _state(model)
    batch = _batch(8)
    mesh = make_mesh(n_data=4)  # micro-batch 4 shards over 4 devices
    s_dp, m_dp = _run(model, spec, 2, batch, mesh=mesh)
    s_one, m_one = _run(model, spec, 2, batch)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_one["loss"]),
                               rtol=2e-5)
    _assert_grads_close(m_dp["grads"], m_one["grads"])
