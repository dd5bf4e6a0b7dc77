"""pytorchvideo.models.resnet.create_resnet stub — plain-torch slow-R50.

Rebuilds exactly the network the reference configures
(``resnet50-3d-video/video_classifier/models/resnet3d.py:4-49``) with
pytorchvideo's state-dict naming (``blocks.0`` stem {conv, norm};
``blocks.{1-4}.res_blocks.{i}`` with ``branch1_{conv,norm}`` shortcut and
``branch2.{conv,norm}_{a,b,c}``; ``blocks.5`` head {proj}) — the same
contract ``compat.torch_port.port_resnet3d`` converts and
``tests/test_resnet3d_parity.py`` pins logits against.

Only the architecture the reference requests is supported; any deviating
kwarg raises instead of silently building a different network.

``LARYNGEAL_STUB_RESNET_INIT=<path.pth>`` loads a state dict right after
construction — the weight-injection hook scripts/reference_ab.py uses to
start the unmodified reference ``main.py`` and our CLI from IDENTICAL
weights (the reference trains this family from random init and has no
weight-loading flag of its own outside --checkpoint_path eval mode).
"""

import os

import torch
import torch.nn as nn

_STAGE_SIZES = (3, 4, 6, 3)
_WIDTHS = (64, 128, 256, 512)


class _Branch2(nn.Module):
    def __init__(self, cin, w, ka, stride):
        super().__init__()
        self.conv_a = nn.Conv3d(cin, w, (ka, 1, 1), padding=(ka // 2, 0, 0),
                                bias=False)
        self.norm_a = nn.BatchNorm3d(w)
        self.conv_b = nn.Conv3d(w, w, (1, 3, 3), stride=(1, stride, stride),
                                padding=(0, 1, 1), bias=False)
        self.norm_b = nn.BatchNorm3d(w)
        self.conv_c = nn.Conv3d(w, w * 4, (1, 1, 1), bias=False)
        self.norm_c = nn.BatchNorm3d(w * 4)

    def forward(self, x):
        x = torch.relu(self.norm_a(self.conv_a(x)))
        x = torch.relu(self.norm_b(self.conv_b(x)))
        return self.norm_c(self.conv_c(x))


class _ResBlock(nn.Module):
    def __init__(self, cin, w, ka, stride, shortcut):
        super().__init__()
        if shortcut:
            self.branch1_conv = nn.Conv3d(cin, w * 4, (1, 1, 1),
                                          stride=(1, stride, stride),
                                          bias=False)
            self.branch1_norm = nn.BatchNorm3d(w * 4)
        self.branch2 = _Branch2(cin, w, ka, stride)

    def forward(self, x):
        identity = x
        if hasattr(self, "branch1_conv"):
            identity = self.branch1_norm(self.branch1_conv(x))
        return torch.relu(self.branch2(x) + identity)


class _Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv3d(3, 64, (3, 7, 7), stride=(1, 2, 2),
                              padding=(1, 3, 3), bias=False)
        self.norm = nn.BatchNorm3d(64)
        self.pool = nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))

    def forward(self, x):
        return self.pool(torch.relu(self.norm(self.conv(x))))


class _Stage(nn.Module):
    def __init__(self, cin, w, depth, ka, stride):
        super().__init__()
        self.res_blocks = nn.ModuleList([
            _ResBlock(cin if i == 0 else w * 4, w, ka,
                      stride if i == 0 else 1, shortcut=(i == 0))
            for i in range(depth)
        ])

    def forward(self, x):
        for b in self.res_blocks:
            x = b(x)
        return x


class _Head(nn.Module):
    """pytorchvideo ResNetBasicHead: pool -> dropout -> position-wise proj
    -> global average (head_output_with_global_average=True)."""

    def __init__(self, num_classes, dropout_rate):
        super().__init__()
        self.pool = nn.AvgPool3d((4, 7, 7), stride=1)
        self.dropout = nn.Dropout(dropout_rate)
        self.proj = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.dropout(self.pool(x))
        x = x.permute(0, 2, 3, 4, 1)            # (B, T, H, W, C)
        x = self.proj(x)
        return x.mean(dim=(1, 2, 3))


class _SlowR50(nn.Module):
    def __init__(self, num_classes, dropout_rate, temporal_ka, spatial_stride):
        super().__init__()
        mods = [_Stem()]
        cin = 64
        for depth, w, ka, s in zip(_STAGE_SIZES, _WIDTHS, temporal_ka,
                                   spatial_stride):
            mods.append(_Stage(cin, w, depth, ka, s))
            cin = w * 4
        mods.append(_Head(num_classes, dropout_rate))
        self.blocks = nn.ModuleList(mods)

    def forward(self, x):                        # (B, C, T, H, W)
        for m in self.blocks:
            x = m(x)
        return x


def create_resnet(*, model_depth=50, model_num_class=400, dropout_rate=0.5,
                  input_channel=3, stem_dim_out=64,
                  stem_conv_kernel_size=(3, 7, 7), stem_conv_stride=(1, 2, 2),
                  stage_conv_a_kernel_size=((1, 1, 1), (1, 1, 1),
                                            (3, 1, 1), (3, 1, 1)),
                  stage_spatial_h_stride=(1, 2, 2, 2),
                  stage_spatial_w_stride=(1, 2, 2, 2),
                  stage_temporal_stride=(1, 1, 1, 1),
                  head_pool_kernel_size=(4, 7, 7),
                  **_ignored) -> nn.Module:
    if (model_depth, input_channel, stem_dim_out) != (50, 3, 64) or \
            stem_conv_kernel_size != (3, 7, 7) or stem_conv_stride != (1, 2, 2) or \
            stage_spatial_h_stride != stage_spatial_w_stride or \
            stage_temporal_stride != (1, 1, 1, 1) or \
            head_pool_kernel_size != (4, 7, 7):
        raise NotImplementedError(
            "pytorchvideo stub: only the slow-R50 configuration the "
            "reference requests (resnet3d.py:4-49) is implemented")
    temporal_ka = tuple(k[0] for k in stage_conv_a_kernel_size)
    if os.environ.get("LARYNGEAL_STUB_DETERMINISTIC") == "1":
        # Train-mode head dropout is an RNG stream no cross-framework A/B
        # can align; the deterministic A/B mode zeroes it on both sides
        # (ours via --dropout 0), disclosed in AB_REPORT.md.
        dropout_rate = 0.0
    model = _SlowR50(model_num_class, dropout_rate, temporal_ka,
                     stage_spatial_h_stride)
    init = os.environ.get("LARYNGEAL_STUB_RESNET_INIT")
    if init:
        model.load_state_dict(torch.load(init, map_location="cpu"))
    return model
