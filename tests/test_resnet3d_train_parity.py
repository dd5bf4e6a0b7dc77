"""Training-dynamics parity for the resnet3d pipeline vs torch.

The logit-parity test (test_resnet3d_parity) pins eval-mode semantics; this
pins the TRAINING side the reference exercises
(``resnet50-3d-video/video_classifier/trainers/trainer.py``): cross-entropy
loss, full-network Adam, and torch BatchNorm3d train-mode statistics
(biased batch variance for normalization, momentum-0.1 running updates —
flax momentum 0.9 in the retention convention).

Both heads clamp the (4,7,7) avg-pool to the feature size so the test runs
at 64 px (the real pytorchvideo head would reject features smaller than its
kernel; clamping identically on both sides keeps the comparison exact).
Step-0 loss matches to fp32 exactness; later steps to 2% (small-batch BN
statistics amplify fp noise).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from laryngeal_tpu.compat.torch_port import port_resnet3d
from laryngeal_tpu.models.resnet3d import create_resnet3d
from laryngeal_tpu.train.losses import cross_entropy
from tests.test_resnet3d_parity import TorchSlowR50


def test_adam_ce_training_matches_torch():
    torch.manual_seed(1)
    tm = TorchSlowR50(num_classes=2).train()
    # Clamp the head pool like the Flax model does (64-px features are 2x2).
    tm.blocks[5].pool = torch.nn.AvgPool3d((4, 2, 2), stride=1)

    variables = port_resnet3d({k: v.detach() for k, v in tm.state_dict().items()})
    # Direct (non-s2d) stem: this test pins step-level dynamics vs torch at
    # 1e-4, which fp reassociation in the space-to-depth stem legitimately
    # perturbs; s2d == direct is pinned separately at rtol 1e-5
    # (test_models.py::test_resnet3d_s2d_stem_exact_equivalence), closing
    # the equivalence chain torch == direct == s2d.
    model = create_resnet3d(num_classes=2, dropout=0.0, stem_s2d=False)

    crit = torch.nn.CrossEntropyLoss()
    opt_t = torch.optim.Adam(tm.parameters(), lr=1e-3)

    rng = np.random.default_rng(4)
    batches = [(rng.normal(0, 1, (2, 4, 64, 64, 3)).astype(np.float32),
                rng.integers(0, 2, 2)) for _ in range(3)]

    losses_t = []
    for x, y in batches:
        opt_t.zero_grad()
        out = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3))
        loss = crit(out, torch.from_numpy(y.astype(np.int64)))
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss.detach()))

    from laryngeal_tpu.train.state import make_optimizer

    params = jax.tree.map(jnp.asarray, variables["params"])
    stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    tx = make_optimizer("adam", 1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, y):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return cross_entropy(logits, y), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    losses_j = []
    for x, y in batches:
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(x), jnp.asarray(y))
        losses_j.append(float(loss))

    assert losses_j[0] == pytest.approx(losses_t[0], abs=1e-4)
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-2)

    # Running BN stats moved identically (spot-check the stem).
    torch_mean = tm.blocks[0].norm.running_mean.detach().numpy()
    flax_mean = np.asarray(stats["stem_bn"]["mean"])
    np.testing.assert_allclose(flax_mean, torch_mean, atol=1e-4, rtol=1e-3)
