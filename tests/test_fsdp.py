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


def test_fsdp_tp_composition_dynamics_match_replicated():
    """FSDP x TP (ZeRO-3 within each tensor-parallel group,
    shard_train_state_fsdp_tp): two optimizer updates on a (data=4,
    model=2) mesh match replicated dp, params carry BOTH axes, and the
    2-D layout survives the jitted step."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.parallel.fsdp import shard_train_state_fsdp_tp

    mesh = make_mesh(n_data=4, n_model=2)
    model, state_r = _state()
    _, state_c = _state()
    state_r = replicate(mesh, state_r)
    state_c = shard_train_state_fsdp_tp(state_c, mesh, min_elems=64)

    # The fc1 kernel (128, 512): TP puts 'model' on dim 1, FSDP adds 'data'
    # on the remaining dim 0.
    big = state_c.params["layer_0"]["mlp"]["fc1"]["kernel"]
    assert set(p for p in big.sharding.spec if p) == {"data", "model"}, (
        big.sharding)
    moments = [x for x in jax.tree.leaves(state_c.opt_state)
               if getattr(x, "shape", ()) == big.shape]
    assert moments and all(
        set(p for p in x.sharding.spec if p) == {"data", "model"}
        for x in moments), "Adam moments not 2-D sharded"

    step_r = make_train_step(model, "vivit", "ce", mesh=mesh, crop=32)
    step_c = make_train_step(model, "vivit", "ce", mesh=mesh, tp=True,
                             crop=32)
    rng = np.random.default_rng(3)
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3),
                                         dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
        mask = jnp.ones((8,), jnp.bool_)
        state_r, m_r = step_r(state_r, pixel, labels, mask, key)
        state_c, m_c = step_c(state_c, pixel, labels, mask, key)
        np.testing.assert_allclose(float(m_c["loss"]), float(m_r["loss"]),
                                   atol=1e-5, rtol=1e-5)

    big2 = state_c.params["layer_0"]["mlp"]["fc1"]["kernel"]
    assert set(p for p in big2.sharding.spec if p) == {"data", "model"}, (
        f"step dropped an axis: {big2.sharding}")
    flat_r = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_r.params))[0]
    flat_c = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_c.params))[0]
    for (pa, a), (pb, b) in zip(flat_c, flat_r):
        assert pa == pb
        path = jax.tree_util.keystr(pa)
        if "['key']['bias']" in path:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=path)


def test_pp_fsdp_composition_matches_pp():
    """PP x FSDP (shard_pp_state_fsdp): one train step on a (data=2,
    stage=4) GPipe mesh matches the plain stage-sharded pipeline, with the
    stacked block params carrying BOTH 'stage' and 'data'."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.parallel.pp import (
        PipelinedModel, make_pp_mesh, shard_pp_state, shard_pp_state_fsdp)

    mesh = make_pp_mesh(n_stage=4, n_data=2)
    cfg = VivitConfig(hidden_size=128, num_layers=4, num_heads=2,
                      intermediate_size=512, image_size=32, num_frames=4,
                      num_classes=2)
    model = VivitForVideoClassification(cfg)
    pmodel = PipelinedModel(model, mesh, num_microbatches=4)
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)

    def fresh():
        return create_train_state(pmodel, jax.random.PRNGKey(0), sample,
                                  optimizer="adamw", learning_rate=1e-3,
                                  weight_decay=0.01)

    state_p = shard_pp_state(fresh(), mesh)
    state_f = shard_pp_state_fsdp(fresh(), mesh, min_elems=64)

    stacked_fc1 = state_f.params["stacked"]["mlp"]["fc1"]["kernel"]
    assert set(p for p in stacked_fc1.sharding.spec if p) == {
        "stage", "data"}, stacked_fc1.sharding

    step = make_train_step(pmodel, "vivit", "ce", mesh=mesh, tp=True,
                           crop=32)
    rng = np.random.default_rng(4)
    pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3),
                                     dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
    mask = jnp.ones((8,), jnp.bool_)
    key = jax.random.PRNGKey(9)
    state_p, m_p = step(state_p, pixel, labels, mask, key)
    state_f, m_f = step(state_f, pixel, labels, mask, key)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_p["loss"]),
                               atol=1e-5, rtol=1e-5)
    flat_p = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_p.params))[0]
    flat_f = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_f.params))[0]
    for (pa, a), (pb, b) in zip(flat_f, flat_p):
        assert pa == pb
        path = jax.tree_util.keystr(pa)
        # Zero-gradient attention key biases: Adam's eps-dominated update
        # amplifies reduction-order noise there (same exclusion as
        # test_fsdp_dynamics_match_replicated / tests/test_pp.py).
        if "['key']['bias']" in path:
            continue
        # 1e-4: the data-axis reduce-scatter reassociates the gradient sum
        # (observed worst case 3.5e-5 on 1/65536 elements).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4,
            err_msg=path)
