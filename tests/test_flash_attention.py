"""Flash-attention kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.attention import attention_reference, dot_product_attention
from laryngeal_tpu.ops.flash_attention import flash_attention


def make_qkv(b=2, n=300, h=3, d=32, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (b, n, h, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("n", [64, 300, 513])
def test_flash_matches_reference(n):
    q, k, v = make_qkv(n=n)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_matches_jax_nn():
    q, k, v = make_qkv(n=200, d=64)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    q, k, v = make_qkv(n=256, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = attention_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=3e-2, rtol=3e-2)


def test_flash_gradients_match_reference():
    q, k, v = make_qkv(n=160, d=16)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, None, 128, 128).sum()

    def loss_ref(q, k, v):
        return attention_reference(q, k, v).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_bias_supported_in_kernel():
    q, k, v = make_qkv(n=64, h=2, d=16)
    bias = jax.random.normal(jax.random.PRNGKey(9), (2, 2, 64, 64))
    out = flash_attention(q, k, v, bias, 128, 128)
    ref = attention_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    # Dispatcher route.
    out2 = dot_product_attention(q, k, v, bias=bias, impl="pallas")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_bias_broadcast_and_padding():
    # Head-broadcast bias (1, H, N, N) with N not a block multiple.
    q, k, v = make_qkv(n=150, h=2, d=16)
    bias = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 150, 150))
    out = flash_attention(q, k, v, bias, 128, 128)
    ref = attention_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_bias_gradients():
    q, k, v = make_qkv(n=96, h=2, d=16)
    bias = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 96, 96))

    gf = jax.grad(lambda q, k, v: flash_attention(q, k, v, bias, 128, 128).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: attention_reference(q, k, v, bias=bias).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def _all_avals(jaxpr):
    """All intermediate output avals in a jaxpr, recursing into sub-jaxprs
    (pallas kernel bodies, loops, custom_vjp branches)."""
    out = []
    for eqn in jaxpr.eqns:
        for var in eqn.outvars:
            out.append(var.aval)
        for val in eqn.params.values():
            if hasattr(val, "jaxpr"):
                out.extend(_all_avals(val.jaxpr))
            elif isinstance(val, (list, tuple)):
                for item in val:
                    if hasattr(item, "jaxpr"):
                        out.extend(_all_avals(item.jaxpr))
    return out


def test_backward_never_materializes_n_by_n():
    """The flash backward must keep all intermediates blocked: no aval with
    two sequence-sized trailing dims anywhere in the grad jaxpr (the round-1
    recompute-through-XLA backward produced (B, H, N, N) logits)."""
    n, d = 512, 32
    q, k, v = make_qkv(n=n, d=d)

    def loss(q, k, v):
        return flash_attention(q, k, v, None, 128, 128).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    offenders = [
        a for a in _all_avals(jaxpr.jaxpr)
        if hasattr(a, "shape") and len(a.shape) >= 2
        and a.shape[-1] >= n and a.shape[-2] >= n
    ]
    assert not offenders, f"found N x N intermediates: {offenders}"


def test_gradients_match_at_padded_and_blocked_shapes():
    """Exercises padded tails (n not a block multiple) and multi-block
    streaming in both bwd kernels."""
    for n in (96, 160, 300, 513):
        q, k, v = make_qkv(n=n, d=32, seed=n)
        g_spec = jax.random.normal(jax.random.PRNGKey(n), q.shape)

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, None, 128, 128) * g_spec).sum()

        def loss_ref(q, k, v):
            return (attention_reference(q, k, v) * g_spec).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3, err_msg=f"n={n}")


def test_value_and_grad_bf16():
    q, k, v = make_qkv(n=256, d=64, dtype=jnp.bfloat16)

    def loss(q, k, v):
        return flash_attention(q, k, v, None, 128, 128).astype(jnp.float32).sum()

    gf = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.12, rtol=0.08)


def test_dispatcher_pallas_impl():
    q, k, v = make_qkv(n=100, d=32)
    out = dot_product_attention(q, k, v, impl="pallas")
    ref = dot_product_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_broadcastable_bias_gradient_with_kv_valid():
    """dbias must come back in the PRIMAL bias's (broadcastable) shape when
    kv_valid is also set — the mask add must not expand the vjp primal
    (regression: the bwd used to pre-add the mask, broadcasting bias to
    (B,H,Nq,Nk) and returning a mismatched cotangent)."""
    q, k, v = make_qkv(b=2, n=96, h=2, d=32, seed=11)
    kv_valid = 80
    for bias_shape in [(2, 96, 96), (1, 1, 96, 96)]:
        bias = jax.random.normal(jax.random.PRNGKey(7), bias_shape)
        val, gb = jax.value_and_grad(
            lambda b: flash_attention(q, k, v, b, 128, 128,
                                      kv_valid=kv_valid).sum())(bias)
        assert gb.shape == bias_shape

        # Numerics: must match the reference with an explicit trailing mask.
        mask = jnp.where(jnp.arange(96) < kv_valid, 0.0, -1e30)
        gr = jax.grad(
            lambda b: attention_reference(
                q, k, v, bias=b + mask[None, None, None, :]).sum())(bias)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gr),
                                   atol=2e-5, rtol=1e-4)
