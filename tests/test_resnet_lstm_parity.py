"""ResNet50-2D+LSTM parity vs a torch reimplementation.

torchvision is absent in this image, so the test reconstructs torchvision's
ResNet50 (standard Bottleneck arrangement) in plain torch with the exact
state_dict key layout of the reference model
(resnet50-2d-lstm/src/models/model.py: nn.Sequential-wrapped trunk ->
resnet50.0/.1/.4-.7 keys), wires it to nn.LSTM + the reference classifier,
and checks logits through the converter to ~1e-4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_resnet50_lstm
from laryngeal_tpu.models.resnet import ResNetLSTMConfig, VideoResNet50LSTM


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def make_torch_resnet50_trunk():
    layers = []
    inplanes = 64

    def make_layer(planes, blocks, stride):
        nonlocal inplanes
        downsample = tnn.Sequential(
            tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        blocks_list = [TorchBottleneck(inplanes, planes, stride, downsample)]
        inplanes = planes * 4
        for _ in range(1, blocks):
            blocks_list.append(TorchBottleneck(inplanes, planes))
        return tnn.Sequential(*blocks_list)

    return tnn.Sequential(
        tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
        tnn.BatchNorm2d(64),
        tnn.ReLU(inplace=True),
        tnn.MaxPool2d(3, stride=2, padding=1),
        make_layer(64, 3, 1),
        make_layer(128, 4, 2),
        make_layer(256, 6, 2),
        make_layer(512, 3, 2),
        tnn.AdaptiveAvgPool2d(1),
    )


class TorchVideoResNet50LSTM(tnn.Module):
    """Mirror of the reference model (resnet50-2d-lstm/src/models/model.py)."""

    def __init__(self, hidden_size=256, num_layers=2, dropout=0.5):
        super().__init__()
        self.resnet50 = make_torch_resnet50_trunk()
        self.lstm = tnn.LSTM(2048, hidden_size, num_layers, batch_first=True,
                             dropout=dropout if num_layers > 1 else 0)
        self.classifier = tnn.Sequential(
            tnn.Linear(hidden_size, 64), tnn.ReLU(), tnn.Dropout(dropout),
            tnn.Linear(64, 1),
        )

    def forward(self, x):  # x: (B, C, T, H, W)
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resnet50(x).squeeze(-1).squeeze(-1)
        x = x.reshape(b, t, -1)
        x, _ = self.lstm(x)
        return self.classifier(x[:, -1, :])


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf = TorchVideoResNet50LSTM().eval()
    # Randomize BN running stats so eval-mode parity exercises them.
    with torch.no_grad():
        for m in hf.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    variables = port_resnet50_lstm(state)
    model = VideoResNet50LSTM(ResNetLSTMConfig())
    return hf, model, variables


def test_resnet50_lstm_logit_parity(pair):
    hf, model, variables = pair
    rng = np.random.default_rng(0)
    video = rng.normal(0, 1, (2, 3, 64, 64, 3)).astype(np.float32)  # B,T,H,W,C

    with torch.no_grad():
        expected = hf(torch.from_numpy(video).permute(0, 4, 1, 2, 3)).numpy()

    logits = model.apply(variables, jnp.asarray(video), train=False)
    np.testing.assert_allclose(np.asarray(logits), expected, atol=5e-4, rtol=1e-3)


def test_param_tree_matches_init(pair):
    _, model, variables = pair
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)))
    for col in ("params", "batch_stats"):
        a = jax.tree.map(lambda x: x.shape, ref[col])
        b = jax.tree.map(lambda x: x.shape, variables[col])
        assert a == b, col


def test_backbone_mask(pair):
    _, model, variables = pair
    from laryngeal_tpu.models.resnet import backbone_param_mask

    mask = backbone_param_mask(variables["params"])
    import flax

    flat = flax.traverse_util.flatten_dict(mask)
    assert not any(v for k, v in flat.items() if k[0] == "resnet50")
    assert all(v for k, v in flat.items() if k[0] != "resnet50")
