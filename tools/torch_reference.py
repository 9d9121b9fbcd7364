"""Torch reference-equivalent models for parity testing and baseline
measurement.

`TorchvisionB0` is a spec-replica of torchvision's `efficientnet_b0` built
with plain torch (torchvision is not installed in this image) — identical
layer layout and state-dict key names, so it doubles as the golden model
for checkpoint-conversion tests and as the EfficientNet stage of the
reference-cost baseline pipeline.
"""

from __future__ import annotations

import torch
from torch import nn

from misinfo_tpu.models.efficientnet import B0_STAGES


class SqueezeExcitation(nn.Module):
    """torchvision SqueezeExcitation (1x1-conv fc layers, SiLU + sigmoid)."""

    def __init__(self, in_ch: int, sq_ch: int):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(in_ch, sq_ch, 1)
        self.fc2 = nn.Conv2d(sq_ch, in_ch, 1)
        self.activation = nn.SiLU()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.scale_activation(self.fc2(self.activation(self.fc1(s))))
        return x * s


def conv_norm_act(cin: int, cout: int, k: int, s: int, groups: int = 1,
                  act: bool = True) -> nn.Sequential:
    layers = [nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups,
                        bias=False),
              nn.BatchNorm2d(cout)]
    if act:
        layers.append(nn.SiLU())
    return nn.Sequential(*layers)


class MBConv(nn.Module):
    def __init__(self, e: int, k: int, s: int, cin: int, cout: int):
        super().__init__()
        exp = cin * e
        sq = max(1, cin // 4)
        mods = []
        if e != 1:
            mods.append(conv_norm_act(cin, exp, 1, 1))
        mods.append(conv_norm_act(exp, exp, k, s, groups=exp))
        mods.append(SqueezeExcitation(exp, sq))
        mods.append(conv_norm_act(exp, cout, 1, 1, act=False))
        self.block = nn.Sequential(*mods)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class TorchvisionB0(nn.Module):
    """torchvision efficientnet_b0 layout with a replaceable classifier
    (the reference uses Dropout(0.2)+Linear(1280,2),
    misinfo_forensics.py:72-75)."""

    def __init__(self, num_classes: int = 2):
        super().__init__()
        features = [conv_norm_act(3, 32, 3, 2)]
        for e, k, s, cin, cout, n in B0_STAGES:
            stage = []
            for b in range(n):
                stage.append(MBConv(e, k, s if b == 0 else 1,
                                    cin if b == 0 else cout, cout))
            features.append(nn.Sequential(*stage))
        features.append(conv_norm_act(320, 1280, 1, 1))
        self.features = nn.Sequential(*features)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(nn.Dropout(0.2),
                                        nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x).flatten(1)
        return self.classifier(x)
