"""torchvision.models stub — ``resnet50`` with torchvision's exact module
STRUCTURE (children order conv1, bn1, relu, maxpool, layer1-4, avgpool, fc
with Bottleneck blocks), which is all the reference consumes: it re-wraps
``list(resnet50(...).children())[:-1]`` in an nn.Sequential
(``resnet50-2d-lstm/src/models/model.py:10-13``), so checkpoint keys become
Sequential indices (``resnet50.0...``) regardless of the names here.

``weights=`` is accepted and IGNORED (random init): this image has no
network or torchvision weight cache. Fine for the eval-mode A/B — the
injected full-model checkpoint overrides every parameter; a *train* A/B of
this family would need real ImageNet trunk weights and is out of scope
(the frozen-trunk training dynamics are pinned separately in
tests/test_lstm_train_parity.py).
"""

import torch.nn as nn


class ResNet50_Weights:
    IMAGENET1K_V1 = "IMAGENET1K_V1"
    IMAGENET1K_V2 = "IMAGENET1K_V2"
    DEFAULT = "IMAGENET1K_V2"


class _Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet50(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64

        def make_layer(planes, blocks, stride):
            nonlocal inplanes
            downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            ) if (stride != 1 or inplanes != planes * 4) else None
            mods = [_Bottleneck(inplanes, planes, stride, downsample)]
            inplanes = planes * 4
            mods += [_Bottleneck(inplanes, planes) for _ in range(1, blocks)]
            return nn.Sequential(*mods)

        self.layer1 = make_layer(64, 3, 1)
        self.layer2 = make_layer(128, 4, 2)
        self.layer3 = make_layer(256, 6, 2)
        self.layer4 = make_layer(512, 3, 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.fc(self.avgpool(x).flatten(1))


def resnet50(weights=None, progress=True, **kwargs):
    return _ResNet50(**kwargs)
