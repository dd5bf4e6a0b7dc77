"""3D-ResNet50 logit parity vs a torch reimplementation of pytorchvideo.

pytorchvideo is absent in this image, so the test reconstructs the network
``create_resnet(input_channel=3, model_depth=50, model_num_class=N)``
builds — the reference's model, ``resnet50-3d-video/video_classifier/models/
resnet3d.py:4-49`` — in plain torch, with the EXACT pytorchvideo state-dict
layout (``blocks.0.conv``, ``blocks.{1-4}.res_blocks.{i}.branch2.conv_{a,b,c}``,
``branch1_conv``/``branch1_norm`` shortcuts, ``blocks.5.proj``). Random
weights flow through ``compat.torch_port.port_resnet3d`` into the Flax model
and the logits must match: this checks the architecture semantics (conv
geometry, BN placement, head pooling order) the structural manifest tests
cannot, and any pytorchvideo layout drift fails the converter here first.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_resnet3d
from laryngeal_tpu.models.resnet3d import create_resnet3d

STAGE_SIZES = (3, 4, 6, 3)
STAGE_TEMPORAL_KA = (1, 1, 3, 3)
STAGE_SPATIAL_STRIDE = (1, 2, 2, 2)
WIDTHS = (64, 128, 256, 512)


class Branch2(tnn.Module):
    def __init__(self, cin, w, ka, stride):
        super().__init__()
        self.conv_a = tnn.Conv3d(cin, w, (ka, 1, 1), padding=(ka // 2, 0, 0),
                                 bias=False)
        self.norm_a = tnn.BatchNorm3d(w)
        self.conv_b = tnn.Conv3d(w, w, (1, 3, 3), stride=(1, stride, stride),
                                 padding=(0, 1, 1), bias=False)
        self.norm_b = tnn.BatchNorm3d(w)
        self.conv_c = tnn.Conv3d(w, w * 4, (1, 1, 1), bias=False)
        self.norm_c = tnn.BatchNorm3d(w * 4)

    def forward(self, x):
        x = torch.relu(self.norm_a(self.conv_a(x)))
        x = torch.relu(self.norm_b(self.conv_b(x)))
        return self.norm_c(self.conv_c(x))


class ResBlock(tnn.Module):
    def __init__(self, cin, w, ka, stride, shortcut):
        super().__init__()
        if shortcut:
            self.branch1_conv = tnn.Conv3d(cin, w * 4, (1, 1, 1),
                                           stride=(1, stride, stride), bias=False)
            self.branch1_norm = tnn.BatchNorm3d(w * 4)
        self.branch2 = Branch2(cin, w, ka, stride)

    def forward(self, x):
        identity = x
        if hasattr(self, "branch1_conv"):
            identity = self.branch1_norm(self.branch1_conv(x))
        return torch.relu(self.branch2(x) + identity)


class Stem(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                               padding=(1, 3, 3), bias=False)
        self.norm = tnn.BatchNorm3d(64)
        self.pool = tnn.MaxPool3d((1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.norm(self.conv(x))))


class Stage(tnn.Module):
    def __init__(self, cin, w, depth, ka, stride):
        super().__init__()
        blocks = []
        for i in range(depth):
            blocks.append(ResBlock(cin if i == 0 else w * 4, w, ka,
                                   stride if i == 0 else 1, shortcut=(i == 0)))
        self.res_blocks = tnn.ModuleList(blocks)

    def forward(self, x):
        for b in self.res_blocks:
            x = b(x)
        return x


class Head(tnn.Module):
    """pytorchvideo ResNetBasicHead: pool -> (dropout) -> position-wise proj
    -> global average (head_output_with_global_average=True)."""

    def __init__(self, num_classes):
        super().__init__()
        self.pool = tnn.AvgPool3d((4, 7, 7), stride=1)
        self.proj = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.pool(x)
        x = x.permute(0, 2, 3, 4, 1)           # (B,T,H,W,C)
        x = self.proj(x)
        return x.mean(dim=(1, 2, 3))


class TorchSlowR50(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        mods = [Stem()]
        cin = 64
        for depth, w, ka, s in zip(STAGE_SIZES, WIDTHS, STAGE_TEMPORAL_KA,
                                   STAGE_SPATIAL_STRIDE):
            mods.append(Stage(cin, w, depth, ka, s))
            cin = w * 4
        mods.append(Head(num_classes))
        self.blocks = tnn.ModuleList(mods)

    def forward(self, x):  # (B, C, T, H, W)
        for m in self.blocks:
            x = m(x)
        return x


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf = TorchSlowR50(num_classes=2).eval()
    # Perturb BN running stats so eval-mode normalization is non-trivial.
    with torch.no_grad():
        for m in hf.modules():
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.4)
    state = {k: v.detach() for k, v in hf.state_dict().items()}
    variables = port_resnet3d(state)
    return hf, variables


def test_resnet3d_logit_parity(pair):
    hf, variables = pair
    rng = np.random.default_rng(0)
    video = rng.normal(0, 1, (1, 4, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf(torch.from_numpy(video).permute(0, 4, 1, 2, 3)).numpy()
    model = create_resnet3d(num_classes=2)
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(video), train=False))
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_param_tree_matches_init(pair):
    """The converter's tree is structurally identical to model.init's."""
    import jax

    _, variables = pair
    model = create_resnet3d(num_classes=2)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 64, 64, 3), jnp.float32))
    for col in ("params", "batch_stats"):
        a = jax.tree_util.tree_structure(init[col])
        b = jax.tree_util.tree_structure(variables[col])
        assert a == b, f"{col} tree mismatch"
        for (pa, va), (pb, vb) in zip(
                jax.tree_util.tree_flatten_with_path(init[col])[0],
                jax.tree_util.tree_flatten_with_path(variables[col])[0]):
            assert va.shape == vb.shape, (pa, va.shape, vb.shape)
