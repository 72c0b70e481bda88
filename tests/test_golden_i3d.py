"""Golden activation parity for the FVD I3D against an independent torch twin.

The reference ships I3D only as a torchscript binary with no source
(``/root/reference/metrics/utils/fvd.py:10-19``), so exec-the-reference is
impossible for this net. Instead — the ``tests/test_golden_vae.py`` pattern —
this builds the Inflated Inception-V1 graph independently in torch (NCDHW,
torch conv/BN semantics, its own TF-SAME padding arithmetic), pushes its
``state_dict`` through ``metrics.i3d.load_torch_state_dict``, and compares
the 400-d logits. It catches the silent-FVD-skew bug class: transposed conv
kernels, wrong inception branch order/widths, BN epsilon or running-stat
mixups, SAME-padding asymmetry on the strided stem, and the spatial-pool /
logits-conv / time-mean ordering of the head.

Reference consumption site: ``/root/reference/metrics/utils/fvd.py:107``
(logits -> Fréchet over 24-frame 224x224 clips).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from humanvid_tpu.metrics.i3d import I3D, load_torch_state_dict  # noqa: E402


def _same_pad3d(x, kernel, stride, value=0.0):
    """TF-SAME padding over (D, H, W) of an NCDHW tensor, computed the TF
    way: out = ceil(n/s), total = max((out-1)*s + k - n, 0), left = total//2.
    (torch's Conv3d `padding=` is symmetric and cannot express this for the
    strided stem, which is exactly the bug class this twin must expose.)"""
    flat = []
    for i, (k, s) in enumerate(zip(kernel, stride)):
        n = x.shape[2 + i]
        out = -(-n // s)
        total = max((out - 1) * s + k - n, 0)
        flat = [total // 2, total - total // 2] + flat  # F.pad is last-dim-first
    return F.pad(x, flat, value=value)


class TUnit3D(nn.Module):
    def __init__(self, cin, cout, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, activation=True, use_bias=False):
        super().__init__()
        self.kernel, self.stride, self.act = kernel, stride, activation
        self.conv3d = nn.Conv3d(cin, cout, kernel, stride, padding=0,
                                bias=use_bias)
        self.bn = nn.BatchNorm3d(cout, eps=0.001) if use_bn else None

    def forward(self, x):
        x = self.conv3d(_same_pad3d(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.act else x


def _maxpool_same(x, window, stride):
    x = _same_pad3d(x, window, stride, value=float("-inf"))
    return F.max_pool3d(x, window, stride)


class TInception(nn.Module):
    def __init__(self, cin, c):
        super().__init__()
        self.b0 = TUnit3D(cin, c[0])
        self.b1a = TUnit3D(cin, c[1])
        self.b1b = TUnit3D(c[1], c[2], (3, 3, 3))
        self.b2a = TUnit3D(cin, c[3])
        self.b2b = TUnit3D(c[3], c[4], (3, 3, 3))
        self.b3b = TUnit3D(cin, c[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x),
            self.b1b(self.b1a(x)),
            self.b2b(self.b2a(x)),
            self.b3b(_maxpool_same(x, (3, 3, 3), (1, 1, 1))),
        ], dim=1)


class TI3D(nn.Module):
    """Independent NCDHW Inflated Inception-V1; attribute names deliberately
    produce the ``Mixed_3b.b1a.conv3d.weight`` state_dict layout that
    ``load_torch_state_dict`` documents."""

    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, (3, 3, 3))
        self.Mixed_3b = TInception(192, [64, 96, 128, 16, 32, 32])
        self.Mixed_3c = TInception(256, [128, 128, 192, 32, 96, 64])
        self.Mixed_4b = TInception(480, [192, 96, 208, 16, 48, 64])
        self.Mixed_4c = TInception(512, [160, 112, 224, 24, 64, 64])
        self.Mixed_4d = TInception(512, [128, 128, 256, 24, 64, 64])
        self.Mixed_4e = TInception(512, [112, 144, 288, 32, 64, 64])
        self.Mixed_4f = TInception(528, [256, 160, 320, 32, 128, 128])
        self.Mixed_5b = TInception(832, [256, 160, 320, 32, 128, 128])
        self.Mixed_5c = TInception(832, [384, 192, 384, 48, 128, 128])
        self.logits = TUnit3D(1024, num_classes, use_bn=False,
                              activation=False, use_bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3c(self.Mixed_3b(x))
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        x = self.Mixed_4f(self.Mixed_4e(self.Mixed_4d(
            self.Mixed_4c(self.Mixed_4b(x)))))
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5c(self.Mixed_5b(x))
        x = x.mean(dim=(3, 4), keepdim=True)   # spatial pool, keep time
        x = self.logits(x)                      # (n, 400, t, 1, 1)
        return x.mean(dim=(2, 3, 4))            # (n, 400)


def _randomize(model, seed, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)
        for m in model.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.add_(
                    torch.randn(m.running_mean.shape, generator=g) * scale)
                m.running_var.mul_(
                    0.5 + torch.rand(m.running_var.shape, generator=g))
    model.eval()
    return model


def test_golden_i3d_logits():
    tm = _randomize(TI3D(), 23)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = load_torch_state_dict(sd)

    rng = np.random.default_rng(24)
    # small clip, full 400-class topology: survives all four spatial strides
    clips = rng.uniform(-1, 1, size=(2, 16, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_logits = tm(torch.from_numpy(
            np.transpose(clips, (0, 4, 1, 2, 3)).copy())).numpy()

    j_logits = np.asarray(I3D().apply(variables, jnp.asarray(clips)))

    assert j_logits.shape == (2, 400)
    # scale-aware tolerance: random-weight logits are O(100) and accumulate
    # ~1e-4 of reduction-order noise that varies with process-global state
    # (full-suite runs showed 2e-4 on 1/800 elements); a real wiring error
    # (transposed filter, wrong branch order) shifts logits by O(1)+.
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-3, atol=1e-3)
