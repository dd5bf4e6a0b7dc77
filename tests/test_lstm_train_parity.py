"""Training-dynamics parity for the resnet50_lstm pipeline vs torch.

Covers the machinery the other parity tests don't: weighted BCE loss,
Adam masked to exclude the frozen ResNet trunk, and BatchNorm batch-stat
normalization under train mode. Step-0 loss must match to fp32 exactness;
later steps to 2% (6-sample BN statistics amplify fp noise chaotically).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from laryngeal_tpu.compat.torch_port import port_resnet50_lstm
from laryngeal_tpu.models.resnet import (
    ResNetLSTMConfig,
    VideoResNet50LSTM,
    backbone_param_mask,
)
from laryngeal_tpu.train.losses import bce_with_logits, reference_pos_weight
from tests.test_resnet_lstm_parity import TorchVideoResNet50LSTM


def test_masked_adam_bce_training_matches_torch():
    torch.manual_seed(0)
    tm = TorchVideoResNet50LSTM(dropout=0.0).train()
    for p in tm.resnet50.parameters():
        p.requires_grad = False

    variables = port_resnet50_lstm(tm.state_dict())
    # Direct stem: step-level dynamics vs torch are pinned at tight
    # tolerance, which the space-to-depth reassociation legitimately
    # perturbs; s2d == direct is pinned separately at rtol 1e-5
    # (test_models.py::test_resnet2d_s2d_stem_exact_equivalence).
    model = VideoResNet50LSTM(ResNetLSTMConfig(dropout=0.0, stem_s2d=False))
    pw = reference_pos_weight(3, 5)

    crit = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([pw]))
    opt_t = torch.optim.Adam(
        [p for p in tm.parameters() if p.requires_grad], lr=1e-3)

    rng = np.random.default_rng(0)
    batches = [(rng.normal(0, 1, (2, 3, 64, 64, 3)).astype(np.float32),
                rng.integers(0, 2, 2)) for _ in range(3)]

    losses_t = []
    for x, y in batches:
        opt_t.zero_grad()
        out = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).reshape(-1)
        loss = crit(out, torch.from_numpy(y.astype(np.float32)))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))

    from laryngeal_tpu.train.state import make_optimizer

    params = jax.tree.map(jnp.asarray, variables["params"])
    stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    tx = make_optimizer("adam", 1e-3, trainable_mask=backbone_param_mask(params))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
            return bce_with_logits(logits, y, pos_weight=pw), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses_j = []
    for x, y in batches:
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(x), jnp.asarray(y))
        losses_j.append(float(loss))

    # Identical weights + batch -> the first loss is fp-exact.
    assert losses_j[0] == pytest.approx(losses_t[0], abs=1e-4)
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-2)

    # The frozen trunk received zero updates on the flax side.
    before = variables["params"]["resnet50"]["conv1"]["kernel"]
    after = params["resnet50"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(after), np.asarray(before))
