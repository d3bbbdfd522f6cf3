"""Numerical parity of the flax ResNet-50 against a torch implementation
with shared (converted) weights — validates utils/torch_convert.py layout
and the conv/frozen-BN/maxpool semantics used for pretrained backbones
(SURVEY §7 hard part (4))."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nsgp_repre_tpu.models import ResNet50  # noqa: E402
from nsgp_repre_tpu.utils import checkpoint as ckpt_io  # noqa: E402
from nsgp_repre_tpu.utils.torch_convert import convert_resnet50_state_dict  # noqa: E402


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, mid, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if cin != cout or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout),
            )
        self.relu = tnn.ReLU()

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class TorchResNet50(tnn.Module):
    def __init__(self, stage_blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        blocks = {s + 1: n for s, n in enumerate(stage_blocks)}
        cin = 64
        for s, n in blocks.items():
            mid = 64 * 2 ** (s - 1)
            cout = mid * 4
            layers = []
            for b in range(n):
                stride = 2 if (b == 0 and s > 1) else 1
                layers.append(TorchBottleneck(cin, mid, cout, stride))
                cin = cout
            setattr(self, f"layer{s}", tnn.Sequential(*layers))

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for s in (1, 2, 3, 4):
            y = getattr(self, f"layer{s}")(y)
            outs.append(y)
        return outs


def test_resnet50_matches_torch():
    torch.manual_seed(0)
    tmodel = TorchResNet50().eval()
    # randomize BN stats so the test covers them
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params_flat, stats_flat = convert_resnet50_state_dict(sd)
    # torch sequential names: layer1.0.conv1.weight — already matching
    model = ResNet50()
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = ckpt_io.restore_into(variables["params"], {
        k[len("backbone/"):]: v for k, v in params_flat.items()
    })
    stats = ckpt_io.restore_into(variables["batch_stats"], {
        k[len("backbone/"):]: v for k, v in stats_flat.items()
    })
    outs_jax = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))

    with torch.no_grad():
        outs_t = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for oj, ot in zip(outs_jax, outs_t):
        ot = ot.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(oj), ot, rtol=2e-3, atol=2e-3)


def test_grid_sample_roi_align_matches_gather_oracle():
    """torch_roi_align_level was rewritten on F.grid_sample (the gather
    version's autograd backward dominated the replica train step); the
    original advanced-indexing implementation stays as the oracle and
    the two must agree exactly — values AND input gradients — including
    out-of-range samples (zeroed but still averaged) and border clamps."""
    import sys
    import os.path as osp

    sys.path.insert(0, osp.dirname(__file__))
    from torch_loss_replica import (
        _torch_roi_align_gather,
        torch_roi_align_level,
    )

    rs = np.random.RandomState(7)
    for _ in range(3):
        B, C, H, W = 2, 8, 37, 53
        feat = torch.tensor(
            rs.randn(B, C, H, W), dtype=torch.float32, requires_grad=True
        )
        feat2 = feat.detach().clone().requires_grad_(True)
        R = 40
        x1 = rs.uniform(-30, W * 4, R)
        y1 = rs.uniform(-30, H * 4, R)
        w = rs.uniform(0.5, 80, R)
        h = rs.uniform(0.5, 80, R)
        rois = torch.tensor(
            np.stack([x1, y1, x1 + w, y1 + h], -1), dtype=torch.float32
        )
        bidx = torch.tensor(rs.randint(0, B, R))
        a = torch_roi_align_level(feat, rois, bidx, 0.25)
        b = _torch_roi_align_gather(feat2, rois, bidx, 0.25)
        np.testing.assert_allclose(
            a.detach().numpy(), b.detach().numpy(), rtol=1e-5, atol=1e-5
        )
        ga = torch.autograd.grad(a.sum(), feat)[0]
        gb = torch.autograd.grad(b.sum(), feat2)[0]
        np.testing.assert_allclose(ga.numpy(), gb.numpy(), rtol=1e-5, atol=1e-5)
