"""Sequence-parallel flash attention — parallel/sp.py::sp_sharded_attention.

Round-3 sp initially forced the XLA attention path because GSPMD cannot
partition an opaque Pallas custom call. This suite pins the replacement:
the kernel generalized to Nq != Nk (+ a static trailing-key mask), and a
shard_map that keeps q token-sharded and all-gathers k/v over the 'seq'
axis, calling the kernel per shard. On CPU the kernel runs in interpret
mode — same code path the TPU compiles, numerically identical.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.attention import attention_reference, dot_product_attention
from laryngeal_tpu.ops.flash_attention import flash_attention
from laryngeal_tpu.parallel.mesh import make_mesh
from laryngeal_tpu.parallel.sp import (
    TrailingKeyMask, sequence_sharding, sp_sharded_attention)


def _qkv(b, n_q, n_k, h, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, n_q, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n_k, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n_k, h, d), jnp.float32)
    return q, k, v


def test_flash_cross_length_forward_and_grads():
    """Nq != Nk (the sp q-shard vs full-k/v geometry) against the einsum
    reference, values and all three gradients."""
    q, k, v = _qkv(2, 160, 640, 2, 32)

    out = flash_attention(q, k, v, None, 128, 256)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 256) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_flash_kv_valid_masks_trailing_keys():
    """Static kv_valid == materialized -1e9 trailing-key bias, and the
    masked keys' dk/dv are exactly zero."""
    q, k, v = _qkv(2, 640, 640, 2, 32, seed=1)
    n_real = 600

    out = flash_attention(q, k, v, None, 256, 640, n_real)
    mask = TrailingKeyMask(640, n_real).materialize()
    ref = attention_reference(q, k, v, bias=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 256, 640, n_real) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_array_equal(np.asarray(dk[:, n_real:]), 0.0)
    np.testing.assert_array_equal(np.asarray(dv[:, n_real:]), 0.0)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, bias=mask) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip((dq, dk, dv), g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("n_model", [1, 2])
def test_sp_sharded_attention_matches_reference(n_model):
    """shard_map path (q sharded over 'seq', k/v all-gathered) == reference,
    with and without a model (head) axis."""
    if jax.device_count() < 4 * n_model:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=2, n_model=n_model)
    q, k, v = _qkv(2, 640, 640, 2 * n_model, 32, seed=2)
    with sequence_sharding(mesh):
        out = jax.jit(lambda q, k, v: sp_sharded_attention(q, k, v))(q, k, v)
    assert out is not None
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_sharded_attention_grads_and_mask():
    """Gradients through the shard_map (all_gather transposes to a
    reduce-scatter for dk/dv) with the trailing-key mask applied in-kernel,
    vs the single-device reference with the materialized bias."""
    if jax.device_count() < 4:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=2)
    n_real = 600
    q, k, v = _qkv(2, 640, 640, 2, 32, seed=3)
    mask = TrailingKeyMask(640, n_real)

    def loss_sp(q, k, v):
        return jnp.sum(sp_sharded_attention(q, k, v, kv_valid=n_real) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v,
                                           bias=mask.materialize()) ** 2)

    with sequence_sharding(mesh):
        g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_router_engages_sp_path_and_falls_back():
    """dot_product_attention with impl='pallas' under sp: shardable shapes
    take the shard_map kernel path; non-divisible token counts fall back to
    XLA with the materialized mask — both match the reference."""
    if jax.device_count() < 4:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_seq=2)
    with sequence_sharding(mesh):
        q, k, v = _qkv(2, 640, 640, 2, 32, seed=4)
        out = dot_product_attention(q, k, v, bias=TrailingKeyMask(640, 600),
                                    impl="pallas")
        ref = attention_reference(
            q, k, v, bias=TrailingKeyMask(640, 600).materialize())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

        # 641 % 2 != 0: not seq-shardable -> XLA fallback, same numbers.
        q2, k2, v2 = _qkv(2, 641, 641, 2, 32, seed=5)
        out2 = dot_product_attention(q2, k2, v2,
                                     bias=TrailingKeyMask(641, 600),
                                     impl="pallas")
        ref2 = attention_reference(
            q2, k2, v2, bias=TrailingKeyMask(641, 600).materialize())
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=2e-5, rtol=2e-5)
