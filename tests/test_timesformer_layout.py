"""The transpose-free "nt" TimeSformer layout (round-3 VERDICT #7 probe).

``layout="nt"`` carries (cls, (B,N,T,D)) through the encoder and fuses the
cls token into the spatial attention as an extra score column — zero
materialized transposes per layer. It must be numerically interchangeable
with the HF-parity "flat" layout (same parameter tree, same math), which
this module pins for logits AND gradients from the SAME parameter values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laryngeal_tpu.models.timesformer import (
    TimesformerConfig, TimesformerForVideoClassification)


def _pair(remat=False):
    kw = dict(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
              image_size=32, num_frames=4, num_classes=2, remat=remat)
    return (TimesformerForVideoClassification(TimesformerConfig(**kw)),
            TimesformerForVideoClassification(
                TimesformerConfig(layout="nt", **kw)))


def test_layout_typo_rejected_at_config_time():
    """Anything but 'flat'/'nt' raises — a typo like 'NT' must not silently
    select the flat layout and masquerade as an nt measurement."""
    with pytest.raises(ValueError, match="layout"):
        TimesformerConfig(layout="NT")


def test_nt_layout_matches_flat_logits_and_grads():
    flat, nt = _pair()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 4, 32, 32, 3)).astype(np.float32))
    params = flat.init(jax.random.PRNGKey(0), x)["params"]

    # Identical parameter TREE (checkpoints interchange between layouts).
    params_nt = nt.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_nt))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(params_nt)[0]):
        assert pa == pb and a.shape == b.shape

    out_flat = flat.apply({"params": params}, x)
    out_nt = nt.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_nt), np.asarray(out_flat),
                               atol=1e-5, rtol=1e-5)

    def loss(model):
        def f(p):
            o = model.apply({"params": p}, x)
            return jnp.sum(jax.nn.log_softmax(o)[:, 0])
        return f

    g_flat = jax.grad(loss(flat))(params)
    g_nt = jax.grad(loss(nt))(params)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.device_get(g_flat))[0],
            jax.tree_util.tree_flatten_with_path(jax.device_get(g_nt))[0]):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("layout", ["flat", "nt"])
def test_remat_matches_no_remat(layout):
    kw = dict(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
              image_size=32, num_frames=4, num_classes=2, layout=layout)
    plain = TimesformerForVideoClassification(TimesformerConfig(**kw))
    remat = TimesformerForVideoClassification(
        TimesformerConfig(remat=True, **kw))
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 4, 32, 32, 3)).astype(np.float32))
    params = plain.init(jax.random.PRNGKey(0), x)["params"]
    np.testing.assert_allclose(
        np.asarray(remat.apply({"params": params}, x)),
        np.asarray(plain.apply({"params": params}, x)), atol=1e-6)

    def f(model):
        return lambda p: jnp.sum(model.apply({"params": p}, x) ** 2)

    g_a = jax.device_get(jax.grad(f(plain))(params))
    g_b = jax.device_get(jax.grad(f(remat))(params))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(b, a, atol=1e-5),
                 g_a, g_b)
