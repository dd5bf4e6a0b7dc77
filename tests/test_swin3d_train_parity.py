"""Training-dynamics parity for the swin3d pipeline vs torch.

Pins what the other swin tests don't: AdamW (decay on all params, the
torch.optim.AdamW default both sides) driving gradients through the
windowed attention — including the relative-position-bias TABLE gradient,
which on the Pallas path accumulates in-kernel across the window sweep.
Stochastic depth is zeroed on both sides (the torch reference has none);
clamped windows at this small size apply the same rule in both
implementations. Step-0 loss matches to fp32 exactness; later steps to 1%.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from laryngeal_tpu.compat.torch_port import port_swin3d
from laryngeal_tpu.models.swin3d import create_swin3d
from laryngeal_tpu.train.losses import cross_entropy
from tests.test_swin3d_parity import DEPTHS, TorchSwin3dT

LR, WD = 1e-4, 0.05


def test_adamw_training_matches_torch():
    torch.manual_seed(2)
    tm = TorchSwin3dT(num_classes=2).train()
    with torch.no_grad():
        for m in tm.modules():
            if hasattr(m, "relative_position_bias_table"):
                m.relative_position_bias_table.normal_(0, 0.02)

    params = port_swin3d({k: v.detach() for k, v in tm.state_dict().items()},
                         depths=DEPTHS)
    model = create_swin3d("tiny", num_classes=2, stochastic_depth=0.0)

    crit = torch.nn.CrossEntropyLoss()
    opt_t = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)

    rng = np.random.default_rng(6)
    batches = [(rng.normal(0, 1, (1, 8, 56, 56, 3)).astype(np.float32),
                rng.integers(0, 2, 1)) for _ in range(3)]

    losses_t = []
    for x, y in batches:
        opt_t.zero_grad()
        out = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        loss = crit(out, torch.from_numpy(y.astype(np.int64)))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))

    jparams = jax.tree.map(jnp.asarray, params)
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(jparams)

    @jax.jit
    def step(p, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return cross_entropy(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    losses_j = []
    for x, y in batches:
        jparams, opt_state, loss = step(jparams, opt_state,
                                        jnp.asarray(x), jnp.asarray(y))
        losses_j.append(float(loss))

    assert losses_j[0] == pytest.approx(losses_t[0], abs=1e-4)
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-2)

    # The rel-pos table actually moved (its gradient flowed both sides).
    before = params["stage1_block1"]["attn"]["relative_position_bias_table"]
    after = np.asarray(
        jparams["stage1_block1"]["attn"]["relative_position_bias_table"])
    assert np.abs(after - np.asarray(before)).max() > 0
    # Compare table updates directly against torch (same layer).
    torch_table = tm.features[0][1].attn.relative_position_bias_table.detach().numpy()
    np.testing.assert_allclose(after, torch_table, atol=5e-4, rtol=1e-2)
