"""Fully-sharded data parallelism — parallel/fsdp.py.

FSDP must be a pure memory relayout: training dynamics identical to
replicated dp (same gradient all-reduce, just scattered), params and
optimizer moments actually sharded over 'data', and the sharding surviving
the jitted step (a step that silently re-replicates would erase the memory
win without failing numerically).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.parallel.fsdp import (
    fsdp_leaf_sharding, shard_train_state_fsdp)
from laryngeal_tpu.parallel.mesh import make_mesh, replicate
from laryngeal_tpu.train.state import create_train_state
from laryngeal_tpu.train.steps import make_train_step

CFG = VivitConfig(hidden_size=128, num_layers=2, num_heads=2,
                  intermediate_size=512, image_size=32, num_frames=4,
                  num_classes=2)


def _state():
    model = VivitForVideoClassification(CFG)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    return model, create_train_state(
        model, jax.random.PRNGKey(0), sample, optimizer="adamw",
        learning_rate=1e-3, weight_decay=0.01)


def test_leaf_sharding_rules():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    # Large divisible matrix: largest divisible dim sharded.
    s = fsdp_leaf_sharding(mesh, (512, 2048))
    assert s.spec == jax.sharding.PartitionSpec(None, "data")
    # Small leaf: replicated despite divisibility.
    assert fsdp_leaf_sharding(mesh, (128,)).spec == jax.sharding.PartitionSpec()
    # No divisible dim: replicated.
    assert fsdp_leaf_sharding(
        mesh, (1001, 999)).spec == jax.sharding.PartitionSpec()


def test_fsdp_state_is_sharded_and_stays_sharded():
    """Params AND Adam moments shard over 'data'; one jitted train step
    preserves the layout (no silent re-replication)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    model, state = _state()
    state = shard_train_state_fsdp(state, mesh)

    def is_sharded(x):
        return any(p is not None for p in x.sharding.spec)

    big = state.params["layer_0"]["mlp"]["fc1"]["kernel"]
    assert is_sharded(big), big.sharding
    mu = state.opt_state  # walk to the Adam mu tree leaf of the same param
    flat = [x for x in jax.tree.leaves(state.opt_state)
            if getattr(x, "shape", ()) == big.shape]
    assert flat and all(is_sharded(x) for x in flat), "moments not sharded"

    step = make_train_step(model, "vivit", "ce", mesh=mesh, tp=True, crop=32)
    rng = np.random.default_rng(0)
    pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
    mask = jnp.ones((8,), jnp.bool_)
    state, m = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    big2 = state.params["layer_0"]["mlp"]["fc1"]["kernel"]
    assert is_sharded(big2), f"step re-replicated params: {big2.sharding}"


def test_fsdp_dynamics_match_replicated():
    """Three optimizer updates under FSDP == replicated dp (losses and all
    params except the zero-gradient attention key biases, where Adam
    amplifies reduction-order noise — same exclusion as tests/test_pp.py)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    model, state_r = _state()
    _, state_f = _state()
    state_r = replicate(mesh, state_r)
    state_f = shard_train_state_fsdp(state_f, mesh)

    step_r = make_train_step(model, "vivit", "ce", mesh=mesh, crop=32)
    step_f = make_train_step(model, "vivit", "ce", mesh=mesh, tp=True, crop=32)

    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3),
                                         dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
        mask = jnp.ones((8,), jnp.bool_)
        state_r, m_r = step_r(state_r, pixel, labels, mask, key)
        state_f, m_f = step_f(state_f, pixel, labels, mask, key)
        np.testing.assert_allclose(float(m_f["loss"]), float(m_r["loss"]),
                                   atol=1e-5, rtol=1e-5)

    flat_r = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_r.params))[0]
    flat_f = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_f.params))[0]
    for (pa, a), (pb, b) in zip(flat_f, flat_r):
        assert pa == pb
        path = jax.tree_util.keystr(pa)
        if "['key']['bias']" in path:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=path)


def test_fsdp_batchnorm_family():
    """BN families under FSDP: sharded params, replicated (small) batch
    stats, finite loss, stats advance."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.models.resnet3d import create_resnet3d

    mesh = make_mesh(n_data=8)
    model = create_resnet3d(num_classes=2, stage_sizes=(1, 1, 1, 1))
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), sample,
                               optimizer="adam", learning_rate=1e-3)
    state = shard_train_state_fsdp(state, mesh)
    before = jax.device_get(jax.tree.leaves(state.batch_stats)[0])

    step = make_train_step(model, "pytorchvideo", "ce", mesh=mesh, tp=True,
                           crop=32)
    rng = np.random.default_rng(2)
    pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
    mask = jnp.ones((8,), jnp.bool_)
    state, m = step(state, pixel, labels, mask, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    after = jax.device_get(jax.tree.leaves(state.batch_stats)[0])
    assert not np.allclose(before, after), "batch stats did not advance"
