"""Pipeline-parallel (GPipe) equivalence — parallel/pp.py.

The pipeline schedule (shard_map + ppermute over a 'stage' axis, stacked
block params scanned per stage) must compute exactly the sequential block
composition, forward and backward: GPipe is exact for these LayerNorm-only
transformer stacks (no cross-microbatch state), so the tolerance is fp
reassociation noise only.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.models.layers import TransformerBlock, gelu_fast
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.parallel.pp import (
    make_pp_mesh, pipeline_apply, stack_layer_params, stage_sharding,
    unstack_layer_params, vivit_pipeline_forward)

CFG = VivitConfig(hidden_size=32, num_layers=4, num_heads=2,
                  intermediate_size=64, image_size=32, num_frames=4,
                  num_classes=2)


def _init():
    model = VivitForVideoClassification(CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_stack_unstack_roundtrip():
    _, params, _ = _init()
    stacked, rest = stack_layer_params(params, CFG.num_layers)
    back = unstack_layer_params(stacked, CFG.num_layers)
    for i in range(CFG.num_layers):
        for a, b in zip(jax.tree.leaves(back[f"layer_{i}"]),
                        jax.tree.leaves(params[f"layer_{i}"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert set(rest) == {"embeddings", "layernorm", "classifier"}


def _block_apply(p, tokens):
    block = TransformerBlock(CFG.hidden_size, CFG.num_heads,
                             CFG.intermediate_size, act=gelu_fast,
                             layer_norm_eps=CFG.layer_norm_eps)
    return block.apply({"params": p}, tokens)


def _sequential(stacked, tokens):
    layers = unstack_layer_params(stacked, CFG.num_layers)
    for i in range(CFG.num_layers):
        tokens = _block_apply(layers[f"layer_{i}"], tokens)
    return tokens


@pytest.mark.parametrize("n_stage,n_data,m", [(4, 1, 4), (4, 2, 2), (2, 1, 4)])
def test_pipeline_matches_sequential_forward(n_stage, n_data, m):
    if jax.device_count() < n_stage * n_data:
        pytest.skip("needs 8 virtual devices")
    _, params, _ = _init()
    stacked, _ = stack_layer_params(params, CFG.num_layers)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (8, 9, CFG.hidden_size))

    mesh = make_pp_mesh(n_stage=n_stage, n_data=n_data)
    stacked_dev = jax.device_put(stacked, stage_sharding(mesh))

    out_pp = jax.jit(
        lambda s, t: pipeline_apply(mesh, _block_apply, s, t, m)
    )(stacked_dev, tokens)
    out_seq = _sequential(stacked, tokens)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_backward_matches_sequential():
    """jax.grad through the schedule (AD reverses ppermute) == sequential
    grads, for both the stacked block params and the input tokens."""
    if jax.device_count() < 4:
        pytest.skip("needs 8 virtual devices")
    _, params, _ = _init()
    stacked, _ = stack_layer_params(params, CFG.num_layers)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (8, 9, CFG.hidden_size))
    mesh = make_pp_mesh(n_stage=4)
    stacked_dev = jax.device_put(stacked, stage_sharding(mesh))

    def loss_pp(s, t):
        return jnp.sum(pipeline_apply(mesh, _block_apply, s, t, 4) ** 2)

    def loss_seq(s, t):
        return jnp.sum(_sequential(s, t) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked_dev, tokens)
    g_seq = jax.grad(loss_seq, argnums=(0, 1))(stacked, tokens)
    # Per-leaf atol floored at 1e-3 of the global grad scale: the attention
    # key bias has an exactly-zero mathematical gradient (softmax is
    # invariant to a uniform key-logit shift), so its computed values are
    # cancellation noise whose pattern differs between the microbatched
    # schedule and the one-shot sequential sum; every meaningful leaf
    # matches at ~1e-7 relative (measured).
    gmax = max(np.abs(np.asarray(g)).max() for g in jax.tree.leaves(g_seq))
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            a, b, rtol=0,
            atol=1e-4 * max(np.abs(b).max(), 1e-3 * gmax, 1e-3))


def test_vivit_pipeline_full_model():
    """Whole-model pipelined forward == VivitForVideoClassification.apply."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    model, params, x = _init()
    ref = model.apply({"params": params}, x)

    mesh = make_pp_mesh(n_stage=4, n_data=2)
    stacked, rest = stack_layer_params(params, CFG.num_layers)
    stacked_dev = jax.device_put(stacked, stage_sharding(mesh))

    out = jax.jit(
        lambda s, r, v: vivit_pipeline_forward(CFG, s, r, v, mesh, 4)
    )(stacked_dev, rest, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_timesformer_pipeline_full_model():
    """Whole-model pipelined TimeSformer forward == sequential apply (the
    divided space-time reshapes live inside each block, so the block is
    still a same-shape token map)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)
    from laryngeal_tpu.parallel.pp import timesformer_pipeline_forward

    cfg = TimesformerConfig(hidden_size=32, num_layers=4, num_heads=2,
                            intermediate_size=64, image_size=32, num_frames=4,
                            patch_size=16, num_classes=2)
    model = TimesformerForVideoClassification(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    mesh = make_pp_mesh(n_stage=4, n_data=2)
    stacked, rest = stack_layer_params(params, cfg.num_layers)
    stacked_dev = jax.device_put(stacked, stage_sharding(mesh))
    out = jax.jit(
        lambda s, r, v: timesformer_pipeline_forward(cfg, s, r, v, mesh, 4)
    )(stacked_dev, rest, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pp_trainer_dynamics_match_sequential():
    """The user-reachable path: PipelinedModel through the standard
    make_train_step == the sequential model's train step, for several
    optimizer updates (same init, same batches). GPipe is exact for these
    LayerNorm-only stacks, so losses and the updated params must agree to
    fp noise."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.parallel.pp import (
        PipelinedModel, shard_pp_state, to_sequential_params)
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_train_step

    model, params, _ = _init()
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    seq_state = create_train_state(model, jax.random.PRNGKey(0), sample,
                                   optimizer="adamw", learning_rate=1e-3,
                                   weight_decay=0.01)

    mesh = make_pp_mesh(n_stage=4, n_data=2)
    pmodel = PipelinedModel(model, mesh, num_microbatches=4)
    pp_state = create_train_state(pmodel, jax.random.PRNGKey(0), sample,
                                  optimizer="adamw", learning_rate=1e-3,
                                  weight_decay=0.01)
    pp_state = shard_pp_state(pp_state, mesh)

    seq_step = make_train_step(model, "vivit", "ce", crop=32)
    pp_step = make_train_step(pmodel, "vivit", "ce", mesh=mesh, tp=True,
                              crop=32)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        pixel = jnp.asarray(rng.integers(0, 255, (8, 4, 32, 32, 3),
                                         dtype=np.uint8))
        labels = jnp.asarray(rng.integers(0, 2, (8,)).astype(np.int32))
        mask = jnp.ones((8,), jnp.bool_)
        seq_state, m_seq = seq_step(seq_state, pixel, labels, mask, key)
        pp_state, m_pp = pp_step(pp_state, pixel, labels, mask, key)
        np.testing.assert_allclose(float(m_pp["loss"]), float(m_seq["loss"]),
                                   atol=1e-5, rtol=1e-5)

    seq_from_pp = to_sequential_params(
        jax.device_get(pp_state.params), CFG.num_layers)
    flat_pp = jax.tree_util.tree_flatten_with_path(seq_from_pp)[0]
    flat_seq = jax.tree_util.tree_flatten_with_path(
        jax.device_get(seq_state.params))[0]
    for (pa, a), (pb, b) in zip(flat_pp, flat_seq):
        assert pa == pb
        path = jax.tree_util.keystr(pa)
        if "['key']['bias']" in path:
            # Softmax is invariant to a uniform key-logit shift, so the key
            # bias has an exactly-zero mathematical gradient; its computed
            # gradient is pure cancellation noise that Adam normalizes into
            # a full lr-sized update — legitimately different between the
            # microbatched schedule and the one-shot sum (measured: only
            # these four leaves diverge; every real leaf matches at <2e-5).
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5, err_msg=path)


def test_pp_checkpoint_cross_layout(tmp_path):
    """A checkpoint written by a --pp_stages run restores into a sequential
    template (inference path) and vice versa; logits identical (stack/
    unstack is a pure relayout). Optimizer state resets, by contract."""
    if jax.device_count() < 4:
        pytest.skip("needs 8 virtual devices")
    from laryngeal_tpu.parallel.pp import PipelinedModel, from_sequential_params
    from laryngeal_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from laryngeal_tpu.train.state import create_train_state

    model, params, x = _init()
    sample = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    seq_state = create_train_state(model, jax.random.PRNGKey(0), sample,
                                   optimizer="adamw", learning_rate=1e-3)
    mesh = make_pp_mesh(n_stage=4, n_data=1)
    pmodel = PipelinedModel(model, mesh, num_microbatches=4)
    pp_state = create_train_state(pmodel, jax.random.PRNGKey(0), sample,
                                  optimizer="adamw", learning_rate=1e-3)
    pp_state = pp_state.replace(params=from_sequential_params(
        jax.device_get(seq_state.params), CFG.num_layers))

    # pp checkpoint -> sequential template.
    save_checkpoint(tmp_path / "pp_ckpt", pp_state, epoch=1)
    restored = load_checkpoint(tmp_path / "pp_ckpt", seq_state)["state"]
    ref = model.apply({"params": seq_state.params}, x)
    got = model.apply({"params": restored.params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0, rtol=0)

    # sequential checkpoint -> pp template.
    save_checkpoint(tmp_path / "seq_ckpt", seq_state, epoch=1)
    restored_pp = load_checkpoint(tmp_path / "seq_ckpt", pp_state)["state"]
    for a, b in zip(jax.tree.leaves(restored_pp.params),
                    jax.tree.leaves(pp_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
