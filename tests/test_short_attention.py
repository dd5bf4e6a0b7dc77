"""Short-sequence batched attention kernel tests (interpret mode on CPU).

The kernel's consumer is TimeSformer's divided space-time attention
(N=32 temporal / N=197 spatial); parity vs jax.nn.dot_product_attention is
the contract the router in ops/attention.py relies on.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.short_attention import short_attention


def make_qkv(b=4, n=32, h=3, d=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, h, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("n", [8, 32, 100, 197])
def test_short_matches_jax_nn(n):
    q, k, v = make_qkv(n=n, d=64)
    out = short_attention(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_short_odd_batch_heads_padding():
    # b*h = 15 — not a multiple of any chunk size; exercises G padding.
    q, k, v = make_qkv(b=5, n=24, h=3, d=16)
    out = short_attention(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_short_bf16():
    q, k, v = make_qkv(n=32, d=64, dtype=jnp.bfloat16)
    out = short_attention(q, k, v)
    ref = jax.nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("n", [32, 100])
def test_short_gradients_match_reference(n):
    q, k, v = make_qkv(n=n, d=32)
    w = jax.random.normal(jax.random.PRNGKey(7), q.shape)

    def loss_kernel(q, k, v):
        return (short_attention(q, k, v) * w).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) * w).sum()

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


@pytest.mark.parametrize("n,exp_p", [(8, 16), (24, 4), (32, 4), (64, 2),
                                     (100, 1), (197, 1)])
def test_packed_layout_geometry(n, exp_p):
    """N<128 packs P=128//pow2(N) sequences per 128-lane score block."""
    from laryngeal_tpu.ops.short_attention import _layout

    p, s_q, s_k, r, k_w, c, g_rows = _layout(n, 64, 2, g_tot=12)
    assert p == exp_p
    if n < 128:
        assert r == k_w == 128 and s_q == s_k and p * s_q == 128
    assert g_rows % c == 0


@pytest.mark.parametrize("n", [8, 24])
def test_packed_gradients_match_reference(n):
    """Heavy packing (P=16/P=4 with non-pow2 N): cross-sequence grads must
    cancel exactly through the block-diagonal mask."""
    q, k, v = make_qkv(b=3, n=n, h=5, d=32, seed=3)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_kernel(q, k, v):
        return (short_attention(q, k, v) * w).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) * w).sum()

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gk, gr, name in zip(g_kernel, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


@pytest.mark.parametrize("n", [197, 32])
def test_router_dispatch(n, monkeypatch):
    """impl='pallas' routes N<512 self-attn (both TimeSformer shapes) to
    the short kernel — and it agrees with the reference numerics."""
    from laryngeal_tpu.ops import attention as A
    from laryngeal_tpu.ops import short_attention as SA

    calls = []
    orig = SA.short_attention

    def spy(q, k, v, interpret=None):
        calls.append(q.shape)
        return orig(q, k, v, interpret)

    monkeypatch.setattr(A, "dot_product_attention", A.dot_product_attention)
    monkeypatch.setattr(
        "laryngeal_tpu.ops.short_attention.short_attention", spy)
    q, k, v = make_qkv(b=2, n=n, h=2, d=64)
    out = A.dot_product_attention(q, k, v, impl="pallas")
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    assert calls, "short kernel not dispatched"


def test_short_jittable_and_inside_larger_graph():
    q, k, v = make_qkv(n=20, d=16)

    @jax.jit
    def f(q, k, v):
        return short_attention(q, k, v).sum()

    assert np.isfinite(float(f(q, k, v)))
