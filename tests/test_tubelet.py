"""Tubelet-embedding implementations agree with each other and with the
model's conv path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from laryngeal_tpu.ops.tubelet import (
    extract_tubelets,
    tubelet_embed,
    tubelet_embed_conv,
    tubelet_embed_matmul,
    tubelet_embed_pallas,
)


@pytest.fixture(scope="module")
def data():
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    video = jax.random.normal(k[0], (2, 4, 32, 32, 3))
    kernel = jax.random.normal(k[1], (2, 16, 16, 3, 48)) * 0.05
    bias = jax.random.normal(k[2], (48,))
    return video, kernel, bias


def test_extract_tubelets_token_order():
    # Distinct constant per tubelet lets us check ordering exactly.
    video = jnp.arange(2 * 4 * 4, dtype=jnp.float32).reshape(1, 2, 4, 4, 1)
    patches = extract_tubelets(video, (2, 2, 2))
    assert patches.shape == (1, 4, 8)
    # First token = t-block 0, h-block 0, w-block 0.
    np.testing.assert_array_equal(
        np.asarray(patches[0, 0]), [0, 1, 4, 5, 16, 17, 20, 21])


def test_matmul_matches_conv(data):
    video, kernel, bias = data
    a = tubelet_embed_conv(video, kernel, bias)
    b = tubelet_embed_matmul(video, kernel, bias)
    assert a.shape == b.shape == (2, 2 * 2 * 2, 48)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_pallas_matches_matmul(data):
    video, kernel, bias = data
    a = tubelet_embed_matmul(video, kernel, bias)
    b = tubelet_embed_pallas(video, kernel, bias, block_n=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_matches_vivit_embedding_params(data):
    """Drop-in for the model's 'projection' conv params."""
    from laryngeal_tpu.models.vivit import VivitConfig, VivitEmbeddings

    video, _, _ = data
    cfg = VivitConfig(hidden_size=48, image_size=32, num_frames=4)
    emb = VivitEmbeddings(cfg)
    params = emb.init(jax.random.PRNGKey(1), video)["params"]
    kernel = params["projection"]["kernel"]
    bias = params["projection"]["bias"]
    ours = tubelet_embed(video, kernel, bias, impl="matmul")
    full = emb.apply({"params": params}, video)
    # Model output = tokens (with cls prepended + pos added); compare patch part.
    pos = params["position_embeddings"][0, 1:]
    np.testing.assert_allclose(np.asarray(full[:, 1:] - pos), np.asarray(ours),
                               atol=1e-4, rtol=1e-4)


def test_dispatch_and_errors(data):
    video, kernel, bias = data
    with pytest.raises(ValueError):
        tubelet_embed(video, kernel, bias, impl="magic")
    out = tubelet_embed(video, kernel, bias, impl="conv")
    assert out.shape == (2, 8, 48)
