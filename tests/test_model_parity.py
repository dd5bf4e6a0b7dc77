"""Logit parity: Flax models vs randomly-initialized HF torch counterparts.

HF models are constructed config-only (no download), so this runs offline.
Parity on random weights through the full converter is a stronger check than
shape tests: any transpose, token-order, or activation mismatch diverges
immediately.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_timesformer, port_vivit
from laryngeal_tpu.models.timesformer import TimesformerConfig, TimesformerForVideoClassification
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification


def state_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def vivit_pair():
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification as HFModel

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, num_frames=4,
        tubelet_size=[2, 16, 16], num_labels=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=32, num_frames=4,
                      num_classes=2)
    model = VivitForVideoClassification(cfg)
    params = port_vivit(state_numpy(hf), num_layers=2)
    return hf, model, params


def test_vivit_logit_parity(vivit_pair):
    hf, model, params = vivit_pair
    rng = np.random.default_rng(0)
    video = rng.normal(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        expected = hf(torch.from_numpy(video).permute(0, 1, 4, 2, 3)).logits.numpy()

    logits = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(logits), expected, atol=2e-4, rtol=1e-3)


def test_vivit_param_tree_complete(vivit_pair):
    hf, model, params = vivit_pair
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes


@pytest.fixture(scope="module")
def timesformer_pair():
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification as HFModel

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, num_frames=4, patch_size=16,
        num_labels=2, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(1)
    hf = HFModel(hf_cfg).eval()
    # HF inits pos/time embeddings to zeros with trunc-normal in _init_weights?
    # Randomize them so parity actually exercises the embedding paths.
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if "embeddings" in name and p.abs().sum() == 0:
                p.normal_(0, 0.02)

    cfg = TimesformerConfig(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64, image_size=32, num_frames=4,
                            patch_size=16, num_classes=2)
    model = TimesformerForVideoClassification(cfg)
    params = port_timesformer(state_numpy(hf), num_layers=2)
    return hf, model, params


def test_timesformer_logit_parity(timesformer_pair):
    hf, model, params = timesformer_pair
    rng = np.random.default_rng(1)
    video = rng.normal(0, 1, (2, 4, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        expected = hf(torch.from_numpy(video).permute(0, 1, 4, 2, 3)).logits.numpy()

    logits = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(np.asarray(logits), expected, atol=2e-4, rtol=1e-3)


def test_timesformer_param_tree_complete(timesformer_pair):
    hf, model, params = timesformer_pair
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 32, 32, 3)))["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == jax.tree.map(lambda x: x.shape, params)


def test_vivit_jit_and_grad():
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=32, num_frames=4)
    model = VivitForVideoClassification(cfg)
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def loss_fn(p, x):
        logits = model.apply({"params": p}, x)
        return logits.sum()

    g = jax.grad(loss_fn)(params, x)
    assert jax.tree.all(jax.tree.map(lambda a: bool(jnp.all(jnp.isfinite(a))), g))
