"""YOLOv5-s prediction parity vs a torch reimplementation of ultralytics.

The reference drives an external ultralytics/yolov5 checkout
(``src/yolo_detector.py:10-18``); that package is absent here, so this test
reconstructs the v6.x yolov5s network in plain torch with ultralytics'
EXACT state-dict layout (``model.{0..23}`` Conv/C3/SPPF with
``cv1/cv2/cv3/m.{j}`` nesting, ``model.24.m.{0,1,2}`` Detect convs).
Random weights flow through ``compat.torch_port.port_yolov5`` into the
Flax model and the fully decoded predictions (xywh + obj + cls, sigmoided)
must match — covering the conv/BN/SiLU semantics, the PANet wiring, the
detect-channel ordering (na x no blocks) and the grid/anchor decode.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax.numpy as jnp

from laryngeal_tpu.compat.torch_port import port_yolov5
from laryngeal_tpu.models.yolov5 import (
    DEFAULT_ANCHORS,
    STRIDES,
    create_yolov5,
)

NC = 1
NO = NC + 5
NA = 3


class TConv(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3, momentum=0.03)

    def forward(self, x):
        return torch.nn.functional.silu(self.bn(self.conv(x)))


class TBottleneck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c, 1)
        self.cv2 = TConv(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class TC3(tnn.Module):
    def __init__(self, cin, cout, n=1, shortcut=True):
        super().__init__()
        c_ = cout // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(cin, c_, 1)
        self.cv3 = TConv(2 * c_, cout, 1)
        self.m = tnn.Sequential(*[TBottleneck(c_, shortcut) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat([self.m(self.cv1(x)), self.cv2(x)], dim=1))


class TSPPF(tnn.Module):
    def __init__(self, cin, cout, k=5):
        super().__init__()
        c_ = cin // 2
        self.cv1 = TConv(cin, c_, 1)
        self.cv2 = TConv(4 * c_, cout, 1)
        self.pool = tnn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        x = self.cv1(x)
        y1 = self.pool(x)
        y2 = self.pool(y1)
        return self.cv2(torch.cat([x, y1, y2, self.pool(y2)], dim=1))


class TDetect(tnn.Module):
    def __init__(self, chs):
        super().__init__()
        self.m = tnn.ModuleList([tnn.Conv2d(c, NA * NO, 1) for c in chs])


class TorchYoloV5s(tnn.Module):
    """yolov5s (gd=0.33, gw=0.5): widths 32/64/128/256/512, depths 1/2/3."""

    def __init__(self):
        super().__init__()
        self.model = tnn.ModuleList([
            TConv(3, 32, 6, 2),            # 0
            TConv(32, 64, 3, 2),           # 1
            TC3(64, 64, 1),                # 2
            TConv(64, 128, 3, 2),          # 3
            TC3(128, 128, 2),              # 4
            TConv(128, 256, 3, 2),         # 5
            TC3(256, 256, 3),              # 6
            TConv(256, 512, 3, 2),         # 7
            TC3(512, 512, 1),              # 8
            TSPPF(512, 512),               # 9
            TConv(512, 256, 1, 1),         # 10
            tnn.Identity(),                # 11 upsample
            tnn.Identity(),                # 12 concat
            TC3(512, 256, 1, shortcut=False),   # 13
            TConv(256, 128, 1, 1),         # 14
            tnn.Identity(),                # 15 upsample
            tnn.Identity(),                # 16 concat
            TC3(256, 128, 1, shortcut=False),   # 17 -> P3
            TConv(128, 128, 3, 2),         # 18
            tnn.Identity(),                # 19 concat
            TC3(256, 256, 1, shortcut=False),   # 20 -> P4
            TConv(256, 256, 3, 2),         # 21
            tnn.Identity(),                # 22 concat
            TC3(512, 512, 1, shortcut=False),   # 23 -> P5
            TDetect((128, 256, 512)),      # 24
        ])

    def forward(self, x):  # (B, 3, H, W) -> decoded (B, total, NO)
        m = self.model
        up = lambda v: torch.nn.functional.interpolate(v, scale_factor=2,
                                                       mode="nearest")
        x = m[2](m[1](m[0](x)))
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        x = m[9](m[8](m[7](p4)))
        h10 = m[10](x)
        h13 = m[13](torch.cat([up(h10), p4], dim=1))
        h14 = m[14](h13)
        o3 = m[17](torch.cat([up(h14), p3], dim=1))
        o4 = m[20](torch.cat([m[18](o3), h14], dim=1))
        o5 = m[23](torch.cat([m[21](o4), h10], dim=1))

        outs = []
        for li, (feat, stride, anchors) in enumerate(
                zip((o3, o4, o5), STRIDES, DEFAULT_ANCHORS)):
            raw = self.model[24].m[li](feat)           # (B, NA*NO, gh, gw)
            b, _, gh, gw = raw.shape
            raw = raw.view(b, NA, NO, gh, gw).permute(0, 3, 4, 1, 2)
            sig = raw.sigmoid()
            gy, gx = torch.meshgrid(torch.arange(gh), torch.arange(gw),
                                    indexing="ij")
            grid = torch.stack([gx, gy], dim=-1).float()[None, :, :, None]
            anchor = torch.tensor(anchors, dtype=torch.float32)[None, None, None]
            xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
            wh = (sig[..., 2:4] * 2.0) ** 2 * anchor
            out = torch.cat([xy, wh, sig[..., 4:]], dim=-1)
            outs.append(out.reshape(b, gh * gw * NA, NO))
        return torch.cat(outs, dim=1)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    hf = TorchYoloV5s().eval()
    with torch.no_grad():
        for mod in hf.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.8, 1.2)
    state = {k: v.detach() for k, v in hf.state_dict().items()}
    variables = port_yolov5(state, size="s", num_classes=NC)
    return hf, variables


def test_yolov5_prediction_parity(pair):
    hf, variables = pair
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        expected = hf(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    model = create_yolov5("s", num_classes=NC)
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(img), train=False))
    assert got.shape == expected.shape  # (1, (8^2+4^2+2^2)*3, 6)
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_param_tree_matches_init(pair):
    import jax

    _, variables = pair
    model = create_yolov5("s", num_classes=NC)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    for col in ("params", "batch_stats"):
        assert (jax.tree_util.tree_structure(init[col])
                == jax.tree_util.tree_structure(variables[col])), col
        for (pa, va), (pb, vb) in zip(
                jax.tree_util.tree_flatten_with_path(init[col])[0],
                jax.tree_util.tree_flatten_with_path(variables[col])[0]):
            assert va.shape == vb.shape, (pa, va.shape, vb.shape)
