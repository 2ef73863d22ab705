import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from tpuseg.nn import resnet as R
from tpuseg.nn import darknet as D
from tpuseg.nn import fpn as F


class TorchBottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride=1, stride_in_1x1=False, dilation=1):
        super().__init__()
        s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
        self.conv1 = nn.Conv2d(cin, mid, 1, s1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, s2, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idt)


class TinyTorchResNet(nn.Module):
    """2-blocks-per-stage bottleneck resnet with torchvision naming."""

    def __init__(self, width=8, stride_in_1x1=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = width
        for si in range(4):
            mid = width * 2**si
            cout = mid * 4
            blocks = nn.Sequential(
                TorchBottleneck(cin, mid, cout, 1 if si == 0 else 2, stride_in_1x1),
                TorchBottleneck(cout, mid, cout, 1, stride_in_1x1),
            )
            setattr(self, f"layer{si+1}", blocks)
            cin = cout

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = []
        for si in range(4):
            x = getattr(self, f"layer{si+1}")(x)
            outs.append(x)
        return outs


def _randomize_bn(model, g):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.1
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5


def test_resnet_matches_torch(rng):
    for stride_in_1x1 in (False, True):
        g = torch.Generator().manual_seed(3)
        tm = TinyTorchResNet(8, stride_in_1x1).eval()
        _randomize_bn(tm, g)
        flat = {k: v.numpy() for k, v in tm.state_dict().items()}
        # our tiny config: depth-50 table replaced by 2-block stages
        cfg = R.ResNetConfig(depth=50, stride_in_1x1=stride_in_1x1,
                             frozen_bn=False, width=8)
        object.__setattr__(cfg, "_stage_blocks", None)
        # build param tree with the 2-2-2-2 layout via from_torch_state on a
        # patched config
        class Tiny(R.ResNetConfig):
            pass
        tiny = R.ResNetConfig(depth=50, stride_in_1x1=stride_in_1x1,
                              frozen_bn=False, width=8)
        import tpuseg.nn.resnet as rn
        old = rn.STAGE_BLOCKS[50]
        rn.STAGE_BLOCKS[50] = (2, 2, 2, 2)
        try:
            params = R.from_torch_state(flat, tiny)
            x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
            feats = R.forward(params, jnp.asarray(x), tiny)
            with torch.no_grad():
                want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
            for i, name in enumerate(["c2", "c3", "c4", "c5"]):
                got = np.asarray(feats[name])
                w = want[i].permute(0, 2, 3, 1).numpy()
                np.testing.assert_allclose(
                    got, w, rtol=1e-3, atol=1e-3,
                    err_msg=f"{name} stride_in_1x1={stride_in_1x1}")
        finally:
            rn.STAGE_BLOCKS[50] = old


def test_darknet_shapes():
    params = D.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 128, 128, 3))
    feats = D.forward(params, x)
    assert feats["c3"].shape == (1, 16, 16, 256)
    assert feats["c4"].shape == (1, 8, 8, 512)
    assert feats["c5"].shape == (1, 4, 4, 1024)


def test_fpn_shapes():
    key = jax.random.PRNGKey(0)
    feats = {
        "c2": jnp.zeros((1, 64, 64, 16)),
        "c3": jnp.zeros((1, 32, 32, 32)),
        "c4": jnp.zeros((1, 16, 16, 64)),
        "c5": jnp.zeros((1, 8, 8, 128)),
    }
    params = F.fpn_init(key, (16, 32, 64, 128), 32)
    out = F.fpn_forward(params, feats)
    assert out["p2"].shape == (1, 64, 64, 32)
    assert out["p5"].shape == (1, 8, 8, 32)
    assert out["p6"].shape == (1, 4, 4, 32)


def test_yolact_fpn_shapes():
    key = jax.random.PRNGKey(0)
    feats = {
        "c3": jnp.zeros((1, 32, 32, 32)),
        "c4": jnp.zeros((1, 16, 16, 64)),
        "c5": jnp.zeros((1, 8, 8, 128)),
    }
    params = F.yolact_fpn_init(key, (32, 64, 128), 32)
    outs = F.yolact_fpn_forward(params, feats)
    assert [o.shape for o in outs] == [
        (1, 32, 32, 32), (1, 16, 16, 32), (1, 8, 8, 32),
        (1, 4, 4, 32), (1, 2, 2, 32)]
