"""Selective remat (save attn_out) must be a pure memory/FLOP trade.

All three transformer families wrap their blocks in
``nn.remat(..., policy=save_only_these_names('attn_out'))`` when
``cfg.remat`` is set (models/{vivit,timesformer,swin3d}.py): the attention
outputs are saved so the remat pass skips the N^2 attention forwards (the
pallas kernels' custom_vjp re-derives softmax from q/k/v residuals anyway).
These tests pin that the policy changes NOTHING numerically — loss and every
gradient leaf match the no-remat model exactly (same fp ops, same order).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def assert_remat_equivalent(model_no, model_yes, variables, x, *apply_args):
    def loss(m):
        def f(v):
            return (m.apply(v, x, *apply_args) ** 2).sum()
        return f

    l0, g0 = jax.value_and_grad(loss(model_no))(variables)
    l1, g1 = jax.value_and_grad(loss(model_yes))(variables)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_timesformer_remat_policy_numerics():
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)

    cfg = TimesformerConfig(num_frames=4, num_layers=2, hidden_size=64,
                            num_heads=4, intermediate_size=128,
                            image_size=32, patch_size=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    m0 = TimesformerForVideoClassification(cfg)
    m1 = TimesformerForVideoClassification(
        dataclasses.replace(cfg, remat=True))
    v = m0.init(jax.random.PRNGKey(1), x)
    assert_remat_equivalent(m0, m1, v, x)


def test_vivit_remat_policy_numerics():
    from laryngeal_tpu.models.vivit import (
        VivitConfig, VivitForVideoClassification)

    cfg = VivitConfig(num_frames=4, num_layers=2, hidden_size=64,
                      num_heads=4, intermediate_size=128, image_size=32,
                      tubelet_size=(2, 16, 16), num_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    m0 = VivitForVideoClassification(cfg)
    m1 = VivitForVideoClassification(dataclasses.replace(cfg, remat=True))
    v = m0.init(jax.random.PRNGKey(1), x)
    assert_remat_equivalent(m0, m1, v, x)


def test_swin3d_remat_policy_numerics():
    from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

    cfg = Swin3DConfig(embed_dim=24, depths=(2, 2), num_heads=(2, 2),
                       window=(2, 4, 4), num_classes=2,
                       stochastic_depth=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32, 32, 3))
    m0 = SwinTransformer3D(cfg)
    m1 = SwinTransformer3D(dataclasses.replace(cfg, remat=True))
    v = m0.init(jax.random.PRNGKey(3), x, False)
    assert_remat_equivalent(m0, m1, v, x, False)


def test_attn_out_actually_saved():
    """The policy must keep attn_out residuals: the remat backward jaxpr
    should contain FEWER recomputed dot_generals than plain remat (the
    attention forward is not re-traced)."""
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)
    import flax.linen as nn
    from laryngeal_tpu.models import timesformer as TF

    cfg = TimesformerConfig(num_frames=4, num_layers=1, hidden_size=64,
                            num_heads=4, intermediate_size=128,
                            image_size=32, patch_size=16, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3))
    m_policy = TimesformerForVideoClassification(cfg)
    v = m_policy.init(jax.random.PRNGKey(1), x)

    # Plain remat baseline: same layer, no policy.
    class PlainRemat(nn.Module):
        config: TimesformerConfig

        @nn.compact
        def __call__(self, pixel_values):
            c = self.config
            h = TF.TimesformerEmbeddings(c, name="embeddings")(pixel_values)
            layer = nn.remat(TF.TimesformerLayer)
            for i in range(c.num_layers):
                h = layer(c, name=f"layer_{i}")(h)
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layernorm")(h)
            return nn.Dense(c.num_classes, name="classifier")(h[:, 0])

    m_plain = PlainRemat(cfg)

    def count_dots(m):
        jaxpr = jax.make_jaxpr(
            jax.grad(lambda vv: (m.apply(vv, x) ** 2).sum()))(v)
        return str(jaxpr).count("dot_general")

    assert count_dots(m_policy) < count_dots(m_plain)
