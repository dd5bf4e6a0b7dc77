"""3D shifted-window attention kernel tests (interpret mode on CPU).

The Pallas kernel must match the materialized-bias XLA semantics exactly —
including the bias (rel-pos table) gradient, which accumulates across the
batch·window grid dimension inside the kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.attention import window_attention
from laryngeal_tpu.ops.window_attention import (
    region_mask,
    supports_shape,
    window_attention_pallas,
)


def make_inputs(bw=6, n=40, h=2, d=16, nw=3, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q, k, v = (jax.random.normal(kk, (bw, n, h, d), jnp.float32) for kk in ks[:3])
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32)
    rid = np.asarray(
        jax.random.randint(ks[4], (nw, n), 0, 3), np.int32)
    return q, k, v, bias, rid


def reference(q, k, v, bias, rid=None):
    bw, n, h, d = q.shape
    full = bias[None]
    if rid is not None:
        m = region_mask(rid)
        nw = m.shape[0]
        full = full[None] + m[None, :, None]
        full = jnp.broadcast_to(full, (bw // nw, nw, h, n, n)).reshape(bw, h, n, n)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d) + full
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def test_forward_matches_reference_masked():
    q, k, v, bias, rid = make_inputs()
    out = window_attention_pallas(q, k, v, bias, rid)
    ref = reference(q, k, v, bias, rid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_matches_reference_unmasked():
    q, k, v, bias, _ = make_inputs()
    out = window_attention_pallas(q, k, v, bias, None)
    ref = reference(q, k, v, bias, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("use_rid", [True, False])
def test_gradients_including_bias(use_rid):
    q, k, v, bias, rid = make_inputs(seed=7)
    rid_arg = rid if use_rid else None
    g_spec = jax.random.normal(jax.random.PRNGKey(1), q.shape)

    def loss_pallas(q, k, v, bias):
        return (window_attention_pallas(q, k, v, bias, rid_arg) * g_spec).sum()

    def loss_ref(q, k, v, bias):
        return (reference(q, k, v, bias, rid_arg) * g_spec).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    names = ("dq", "dk", "dv", "dbias")
    for nm, a, b in zip(names, gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3, err_msg=nm)


def test_swin_full_window_shape():
    """The real Swin3D window: N=392 (8x7x7), 8 windows, stage-1 heads."""
    q, k, v, bias, rid = make_inputs(bw=16, n=392, h=3, d=32, nw=8, seed=3)
    out = window_attention_pallas(q, k, v, bias, rid)
    ref = reference(q, k, v, bias, rid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_dispatcher_fallback_for_unaligned_window():
    """Clamped windows with N % 8 != 0 must route to XLA and still be right."""
    assert not supports_shape(196, 32)
    assert supports_shape(392, 32)
    q, k, v, bias, rid = make_inputs(bw=4, n=36, h=2, d=16, nw=2, seed=5)
    # n=36 supports pallas; the dispatcher test instead forces the xla route.
    out = window_attention(q, k, v, bias, region_id=rid, impl="xla")
    ref = reference(q, k, v, bias, rid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_no_broadcast_bias_in_pallas_jaxpr():
    """The (B*nW, H, N, N) broadcast bias must not exist on the kernel path."""
    import sys
    sys.path.insert(0, "tests")
    from test_flash_attention import _all_avals

    bw, n, h, d, nw = 24, 392, 3, 32, 8
    q, k, v, bias, rid = make_inputs(bw=bw, n=n, h=h, d=d, nw=nw, seed=2)

    def loss(q, k, v, bias):
        return window_attention_pallas(q, k, v, bias, rid).sum()

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    offenders = [
        a for a in _all_avals(jaxpr.jaxpr)
        if hasattr(a, "shape") and len(a.shape) >= 3
        and a.shape[-1] == n and a.shape[-2] == n and np.prod(a.shape[:-2]) > h * nw
    ]
    assert not offenders, f"broadcast bias materialized: {offenders}"


def test_gradients_batched_windows_multi_rid():
    """nwin>1 with per-window region ids — the production shifted-block
    configuration (stage-1 runs nwin=8, rid block index rem(bwi, nw//nwin)).
    Gradients through the batched kernel must match the XLA reference."""
    q, k, v, bias, rid = make_inputs(bw=16, n=40, h=2, d=16, nw=8, seed=11)
    from laryngeal_tpu.ops.window_attention import _pick_nwin

    assert _pick_nwin(16, 8) == 8  # this case exercises the batched path

    def loss_pallas(q, k, v, bias):
        return (window_attention_pallas(q, k, v, bias, rid) ** 2).sum()

    def loss_ref(q, k, v, bias):
        return (reference(q, k, v, bias, rid) ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-3)
