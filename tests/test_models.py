"""Structural tests for ResNet3D and Swin3D (no torch counterpart offline)
plus the model registry."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.models.registry import MODEL_REGISTRY, create_model, get_model_spec
from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig
from laryngeal_tpu.models.swin3d import (
    Swin3DConfig,
    SwinTransformer3D,
    adjust_window,
    relative_position_index,
    shift_attention_mask,
    window_merge,
    window_partition,
)


def test_resnet3d_shapes_small():
    cfg = ResNet3DConfig(num_classes=2, stage_sizes=(1, 1, 1, 1))
    model = ResNet3D(cfg)
    x = jnp.zeros((2, 8, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 2)
    assert "batch_stats" in vars_


def test_resnet3d_train_updates_stats():
    cfg = ResNet3DConfig(num_classes=2, stage_sizes=(1, 1, 1, 1))
    model = ResNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out, updates = model.apply(
        vars_, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    before = jax.tree.leaves(vars_["batch_stats"])[0]
    after = jax.tree.leaves(updates["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_resnet3d_s2d_stem_exact_equivalence():
    """The space-to-depth stem is a pure reassociation of the same MACs —
    same params, same output as the direct conv to fp tolerance."""
    from laryngeal_tpu.models.resnet3d import _StemConv

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32, 48, 3),
                          jnp.float32)
    direct = _StemConv(s2d=False)
    params = direct.init(jax.random.PRNGKey(1), x)
    y_direct = direct.apply(params, x)
    # Both s2d variants: output-pair packed (default, W/2 even here) and
    # plain 4-tap. Both must be exact reassociations of the same MACs.
    for pair in (True, False):
        y_s2d = _StemConv(s2d=True, pair=pair).apply(params, x)
        assert y_direct.shape == y_s2d.shape == (2, 5, 16, 24, 64)
        np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_direct),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"pair={pair}")
    # Odd W/2 falls back to the unpaired s2d path.
    x_odd = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 32, 44, 3),
                              jnp.float32)
    y_odd_direct = direct.apply(params, x_odd)
    y_odd = _StemConv(s2d=True, pair=True).apply(params, x_odd)
    np.testing.assert_allclose(np.asarray(y_odd), np.asarray(y_odd_direct),
                               rtol=1e-5, atol=1e-5)


def test_resnet2d_s2d_stem_exact_equivalence():
    from laryngeal_tpu.models.resnet import _StemConv2D

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 32, 48, 3), jnp.float32)
    direct = _StemConv2D(s2d=False)
    params = direct.init(jax.random.PRNGKey(1), x)
    y_direct = direct.apply(params, x)
    y_s2d = _StemConv2D(s2d=True).apply(params, x)
    assert y_direct.shape == y_s2d.shape == (3, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_direct),
                               rtol=1e-5, atol=1e-5)


def test_resnet3d_s2d_odd_size_falls_back():
    """Odd spatial sizes can't phase-decompose; the model silently uses the
    direct conv (same params) instead of crashing."""
    cfg = ResNet3DConfig(num_classes=2, stage_sizes=(1, 1, 1, 1))
    model = ResNet3D(cfg)
    x = jnp.zeros((1, 4, 63, 63, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(vars_, x).shape == (1, 2)


# ---------- swin3d unit pieces ----------

def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8, 8, 16))
    window = (2, 4, 4)
    wins = window_partition(x, window)
    assert wins.shape == (2 * 2 * 2 * 2, 2 * 4 * 4, 16)
    back = window_merge(wins, window, (4, 8, 8), 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_adjust_window_clamps_and_zeroes_shift():
    # dim <= window (incl. equality) clamps the window AND zeroes the shift.
    win, shift = adjust_window((4, 7, 7), (8, 7, 7), (4, 3, 3))
    assert win == (4, 7, 7)
    assert shift == (0, 0, 0)
    win, shift = adjust_window((16, 56, 28), (8, 7, 7), (4, 3, 3))
    assert win == (8, 7, 7)
    assert shift == (4, 3, 3)


def test_relative_position_index_properties():
    idx = relative_position_index((2, 3, 3))
    n = 2 * 3 * 3
    assert idx.shape == (n, n)
    assert idx.min() >= 0
    assert idx.max() < (2 * 2 - 1) * (2 * 3 - 1) * (2 * 3 - 1)
    # Diagonal (self-relative) is constant.
    assert len(set(np.diag(idx))) == 1
    # Antisymmetric pairs map to distinct entries unless centered.
    assert idx[0, 1] != idx[1, 0]


def test_shift_mask_blocks_cross_region_attention():
    mask = shift_attention_mask((4, 8, 8), (2, 4, 4), (1, 2, 2))
    nw = (4 // 2) * (8 // 4) * (8 // 4)
    assert mask.shape == (nw, 32, 32)
    assert set(np.unique(mask)) <= {0.0, -100.0}
    # Some windows (at the rolled boundary) must have masked pairs.
    assert (mask == -100.0).any()
    # Unshifted mask would be all zeros.
    m0 = shift_attention_mask((4, 8, 8), (2, 4, 4), (0, 0, 0))
    assert (m0 == 0).all()


def test_swin3d_forward_and_grad_small():
    cfg = Swin3DConfig(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                       window=(2, 2, 2), patch_size=(2, 4, 4), num_classes=2)
    model = SwinTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(vars_, x)
    assert out.shape == (2, 2)

    def loss(p):
        return model.apply({"params": p}, x).sum()

    g = jax.grad(loss)(vars_["params"])
    assert jax.tree.all(jax.tree.map(lambda a: bool(jnp.all(jnp.isfinite(a))), g))
    # Relative bias table exists per attention.
    flat = jax.tree_util.tree_flatten_with_path(vars_["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("relative_position_bias_table" in n for n in names)


def test_swin3d_shifted_vs_unshifted_differ():
    # With two blocks, the second is shifted; degenerate to one window so the
    # shift mask is the only difference — outputs must still be valid.
    cfg = Swin3DConfig(embed_dim=8, depths=(2,), num_heads=(2,),
                       window=(2, 2, 2), patch_size=(2, 4, 4), num_classes=2)
    model = SwinTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16, 3))
    vars_ = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(vars_, x)
    assert np.isfinite(np.asarray(out)).all()


def test_swin3d_stochastic_depth_train_only():
    cfg = Swin3DConfig(embed_dim=8, depths=(2,), num_heads=(2,),
                       window=(2, 2, 2), patch_size=(2, 4, 4),
                       stochastic_depth=0.9, num_classes=2)
    model = SwinTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 16, 16, 3))
    vars_ = model.init(jax.random.PRNGKey(1), x)
    a = model.apply(vars_, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    b = model.apply(vars_, x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = model.apply(vars_, x)
    d = model.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


# ---------- registry ----------

def test_registry_complete():
    assert set(MODEL_REGISTRY) == {"resnet50_lstm", "resnet3d", "vivit", "timesformer", "swin3d"}
    with pytest.raises(ValueError):
        get_model_spec("alexnet")


def test_registry_factories_instantiate():
    m = create_model("swin3d", model_size="tiny", num_classes=2)
    assert m.config.embed_dim == 96
    with pytest.raises(ValueError):
        create_model("swin3d", model_size="huge")
    m2 = create_model("vivit", num_frames=8, image_size=64)
    assert m2.config.num_frames == 8
