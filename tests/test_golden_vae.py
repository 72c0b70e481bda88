"""Golden activation parity for the VAE against an independent torch twin.

Unlike the UNet/motion/camera/pose modules (vendored by the reference and
exec'd directly — ``tests/test_golden_torch.py``), the VAE is the external
diffusers ``AutoencoderKL``; its architecture is pinned publicly by the
sd-vae-ft-mse checkpoint format (key inventory asserted in
``tests/test_golden_parity.py``). This test builds that architecture in torch
(NCHW, torch conv/GN semantics — an independent implementation path), pushes
its state dict through ``convert_state_dict``, and compares encode moments
and decode output. It catches exactly the conversion-bug class VERDICT r1
flagged: transposed conv kernels, GN epsilon/grouping, attention qkv biases,
the asymmetric downsample padding, and nearest-upsample placement.

Reference consumption sites: ``/root/reference/train_stage_2.py:333-339``
(encode), ``/root/reference/src/pipelines/pipeline_pose2vid_long.py:114-127``
(per-frame decode).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from humanvid_tpu.models.configs import VAEConfig  # noqa: E402
from humanvid_tpu.models.vae import VAEDecoder, VAEEncoder  # noqa: E402
from humanvid_tpu.utils.convert import convert_state_dict  # noqa: E402

CH = (8, 8, 16, 16)
GROUPS = 4
LATENT = 4


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttn(nn.Module):
    """diffusers VAE mid-block attention: single head, qkv+out linears."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(GROUPS, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        t = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        a = torch.softmax(q @ k.transpose(1, 2) * c**-0.5, dim=-1)
        t = self.to_out[0](a @ v)
        return x + t.transpose(1, 2).view(b, c, h, w)


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _Seq(nn.Module):
    def __init__(self, resnets, samplers=None):
        super().__init__()
        self.resnets = nn.ModuleList(resnets)
        if samplers is not None:
            name = "downsamplers" if isinstance(samplers[0], TDown) else "upsamplers"
            setattr(self, name, nn.ModuleList(samplers))


class TMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([TResnet(c, c), TResnet(c, c)])
        self.attentions = nn.ModuleList([TAttn(c)])

    def forward(self, x):
        return self.resnets[1](self.attentions[0](self.resnets[0](x)))


class TEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_in = nn.Conv2d(3, CH[0], 3, padding=1)
        blocks = []
        for i, c in enumerate(CH):
            cin = CH[i - 1] if i else CH[0]
            blocks.append(_Seq([TResnet(cin, c), TResnet(c, c)],
                               [TDown(c)] if i < len(CH) - 1 else None))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = TMid(CH[-1])
        self.conv_norm_out = nn.GroupNorm(GROUPS, CH[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(CH[-1], 2 * LATENT, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        rev = CH[::-1]
        self.conv_in = nn.Conv2d(LATENT, rev[0], 3, padding=1)
        self.mid_block = TMid(rev[0])
        blocks, prev = [], rev[0]
        for i, c in enumerate(rev):
            blocks.append(_Seq(
                [TResnet(prev if j == 0 else c, c) for j in range(3)],
                [TUp(c)] if i < len(rev) - 1 else None))
            prev = c
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(GROUPS, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.mid_block(self.conv_in(z))
        for blk in self.up_blocks:
            for r in blk.resnets:
                x = r(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TAutoencoderKL(nn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = TEncoder()
        self.decoder = TDecoder()
        self.quant_conv = nn.Conv2d(2 * LATENT, 2 * LATENT, 1)
        self.post_quant_conv = nn.Conv2d(LATENT, LATENT, 1)


def _randomize(model, seed, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)
    model.eval()
    return model


def test_golden_vae_encode_decode():
    tm = _randomize(TAutoencoderKL(), 11)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    cfg = VAEConfig(block_out_channels=CH, norm_num_groups=GROUPS,
                    latent_channels=LATENT)
    enc, dec = VAEEncoder(config=cfg), VAEDecoder(config=cfg)

    rng = np.random.default_rng(12)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    z = rng.normal(size=(2, 4, 4, LATENT)).astype(np.float32)

    eparams = enc.init(jax.random.PRNGKey(0), jnp.asarray(img))
    eparams, miss, unused = convert_state_dict(eparams, sd, "vae_encoder",
                                               strict=True)
    dparams = dec.init(jax.random.PRNGKey(1), jnp.asarray(z))
    dparams, miss, unused = convert_state_dict(dparams, sd, "vae_decoder",
                                               strict=True)

    with torch.no_grad():
        m_t = tm.quant_conv(tm.encoder(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy())))
        x_t = tm.decoder(tm.post_quant_conv(
            torch.from_numpy(np.transpose(z, (0, 3, 1, 2)).copy())))

    m_o = np.asarray(enc.apply(eparams, jnp.asarray(img)))
    np.testing.assert_allclose(
        m_o, np.transpose(m_t.numpy(), (0, 2, 3, 1)), rtol=2e-4, atol=2e-4)

    x_o = np.asarray(dec.apply(dparams, jnp.asarray(z)))
    np.testing.assert_allclose(
        x_o, np.transpose(x_t.numpy(), (0, 2, 3, 1)), rtol=5e-4, atol=5e-4)
