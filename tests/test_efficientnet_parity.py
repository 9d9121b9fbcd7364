"""EfficientNet-B0 parity vs a spec-replica of torchvision's efficientnet_b0
built with plain torch (torchvision itself is not installed in this image).

The replica reproduces torchvision's exact layer layout and state-dict key
names (features.{stage}.{block}.block.{i}..., SE fc1/fc2, classifier.1) so
this test simultaneously validates the forward math AND the .pth key-mapping
used by checkpoints/torch_convert.convert_efficientnet.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
from torch import nn

from misinfo_tpu.core.config import PrecisionConfig
from misinfo_tpu.ops.common import Policy
from misinfo_tpu.models.efficientnet import (
    B0_STAGES, effnet_b0_init, effnet_apply,
)
from misinfo_tpu.checkpoints.torch_convert import convert_efficientnet, apply_updates

F32 = Policy(PrecisionConfig.highest())


class _SE(nn.Module):
    """torchvision SqueezeExcitation (fc = 1x1 convs, SiLU + sigmoid)."""

    def __init__(self, in_ch, sq_ch):
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


def _conv_na(cin, cout, k, s, groups=1, act=True):
    layers = [nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
              nn.BatchNorm2d(cout)]
    if act:
        layers.append(nn.SiLU())
    return nn.Sequential(*layers)


class _MBConv(nn.Module):
    def __init__(self, e, k, s, cin, cout):
        super().__init__()
        exp = cin * e
        sq = max(1, cin // 4)
        mods = []
        if e != 1:
            mods.append(_conv_na(cin, exp, 1, 1))
        mods.append(_conv_na(exp, exp, k, s, groups=exp))
        mods.append(_SE(exp, sq))
        mods.append(_conv_na(exp, cout, 1, 1, act=False))
        self.block = nn.Sequential(*mods)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class _B0(nn.Module):
    """torchvision efficientnet_b0 layout with a 2-class classifier
    (reference misinfo_forensics.py:72-75)."""

    def __init__(self, num_classes=2):
        super().__init__()
        features = [_conv_na(3, 32, 3, 2)]
        for e, k, s, cin, cout, n in B0_STAGES:
            stage = []
            for b in range(n):
                stage.append(_MBConv(e, k, s if b == 0 else 1,
                                     cin if b == 0 else cout, cout))
            features.append(nn.Sequential(*stage))
        features.append(_conv_na(320, 1280, 1, 1))
        self.features = nn.Sequential(*features)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x).flatten(1)
        return self.classifier(x)


@pytest.fixture(scope="module")
def torch_b0():
    torch.manual_seed(0)
    m = _B0()
    # randomize BN stats so inference-mode normalization is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)
    m.eval()
    return m


def test_forward_parity(torch_b0):
    params = effnet_b0_init(jax.random.PRNGKey(0))
    updates = convert_efficientnet(torch_b0.state_dict(), prefix="")
    applied, skipped = apply_updates(params, updates)
    assert not [s for s in skipped if "shape" in s[1]], skipped[:5]
    # stem(5) + head(5) + classifier(2) + 16 blocks
    assert applied > 150

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_b0(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours, _ = effnet_apply(params, x, policy=F32)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=0)


def test_softmax_deepfake_score(torch_b0):
    """Reference scoring: softmax class-1 prob (misinfo_forensics.py:368-369)."""
    params = effnet_b0_init(jax.random.PRNGKey(0))
    apply_updates(params, convert_efficientnet(torch_b0.state_dict(), prefix=""))
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    logits, _ = effnet_apply(params, x, policy=F32)
    probs = jax.nn.softmax(logits, axis=-1)
    score = float(np.asarray(probs)[0, 1])
    assert 0.0 <= score <= 1.0
