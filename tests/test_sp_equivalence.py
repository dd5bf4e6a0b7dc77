"""Sequence-parallel (token-axis) numerical equivalence.

GSPMD semantics are single-program: a step traced with per-block token
sharding constraints (parallel/sp.py) over a mesh with a 'seq' axis must
compute the same function as the unconstrained single-device step — the
constraints only pin layouts; the partitioner inserts the k/v all-gathers
and reshape re-shards. These tests pin that for the two long-token
families (ViViT joint space-time, TimeSformer divided space-time), for
train (loss/grads/probs) and with dp x sp x tp composed on one mesh.

ViViT's tiny config carries 9 tokens (8 patches + cls) over sp=4 — an
uneven split exercising GSPMD's padded-shard path that the full model
(N=3137, prime) relies on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.parallel.mesh import make_mesh, replicate
from laryngeal_tpu.parallel.sp import (
    sequence_sharding, sequence_sharding_enabled)
from laryngeal_tpu.train.state import create_train_state
from laryngeal_tpu.train.steps import make_train_step, prepare_batch


def _tiny(family):
    if family == "vivit":
        from laryngeal_tpu.models.vivit import (
            VivitConfig, VivitForVideoClassification)

        return VivitForVideoClassification(VivitConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, num_frames=4, num_classes=2))
    if family == "timesformer":
        from laryngeal_tpu.models.timesformer import (
            TimesformerConfig, TimesformerForVideoClassification)

        return TimesformerForVideoClassification(TimesformerConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=32, num_frames=4, num_classes=2))
    raise ValueError(family)


def _run_step(family, mesh, tp=False):
    spec = get_model_spec(family)
    model = _tiny(family)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01,
    )
    if mesh is not None:
        if tp:
            from laryngeal_tpu.parallel.tp import shard_train_state

            state = shard_train_state(state, mesh)
        else:
            state = replicate(mesh, state)
    step = make_train_step(model, spec.preprocess_regime, spec.loss,
                           mesh=mesh, crop=32, tp=tp, return_grads=True)
    rng_np = np.random.default_rng(7)
    batch = {
        "pixel_values": rng_np.integers(0, 255, (8, 4, 32, 32, 3)).astype(np.uint8),
        "labels": rng_np.integers(0, 2, (8,)).astype(np.int32),
        "mask": np.ones((8,), np.bool_),
    }
    pixel, labels, mask = prepare_batch(batch, mesh)
    new_state, metrics = step(state, pixel, labels, mask, jax.random.PRNGKey(3))
    jax.tree.map(lambda x: x.block_until_ready(), metrics)
    return new_state, metrics


def _assert_close(m_sp, m_1, grad_tol=1e-4):
    assert float(m_sp["loss"]) == pytest.approx(float(m_1["loss"]), abs=1e-5)
    np.testing.assert_allclose(np.asarray(m_sp["probs"]),
                               np.asarray(m_1["probs"]), atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(m_sp["grads"]), jax.tree.leaves(m_1["grads"])):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0, atol=grad_tol * max(np.abs(b).max(), 1e-3))


@pytest.mark.parametrize("family", ["vivit", "timesformer"])
def test_sp_matches_single_device(family):
    """dp=2 x sp=4: token-sharded step == single-device step."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=4)
    with sequence_sharding(mesh):
        assert sequence_sharding_enabled()
        _, m_sp = _run_step(family, mesh)
    assert not sequence_sharding_enabled()
    _, m_1 = _run_step(family, None)
    _assert_close(m_sp, m_1)


def test_sp_composes_with_tp():
    """dp=2 x sp=2 x tp=2 on one mesh: batch, tokens, and heads sharded
    simultaneously; still the single-device function."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    with sequence_sharding(mesh):
        _, m = _run_step("vivit", mesh, tp=True)
    _, m_1 = _run_step("vivit", None)
    _assert_close(m, m_1)


def test_sp_inserts_collectives():
    """The token constraints must actually partition: the compiled module
    contains cross-device collectives (k/v all-gather at minimum), and the
    single-device trace contains none."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.models.vivit import (
        VivitConfig, VivitForVideoClassification)

    model = VivitForVideoClassification(VivitConfig(
        hidden_size=32, num_layers=1, num_heads=2, intermediate_size=64,
        image_size=32, num_frames=4, num_classes=2))
    x = jnp.zeros((4, 4, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mesh = make_mesh(n_data=1, n_seq=8)

    def fwd(p, v):
        return model.apply({"params": p}, v)

    with sequence_sharding(mesh):
        txt = jax.jit(fwd).lower(params, x).compile().as_text()
    assert any(c in txt for c in ("all-gather", "all-to-all", "collective-permute")), \
        "sp-enabled compile has no collectives — constraints not partitioning"
