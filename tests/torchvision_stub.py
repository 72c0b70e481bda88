"""Minimal torch ``torchvision`` stand-in so the REFERENCE's vendored metric
nets (`/root/reference/metrics/lpipsPyTorch/modules/networks.py:7`,
`/root/reference/metrics/utils/fid_inception.py:4`) can be executed under the
installed CPU torch without the torchvision package (not in this image).

Same pattern as ``tests/diffusers_stub.py``: the reference vendors the code
that matters (LPIPS stage taps / lin heads, pytorch-fid's patched Inception
blocks) but imports leaf model graphs from torchvision. This module
implements exactly those leaves — the public VGG16 ``features`` stack and the
torchvision InceptionV3 module graph, both pinned by their released
checkpoint formats — and installs them as ``sys.modules['torchvision*']`` so
the reference's own code runs unmodified for activation-golden comparison
against our JAX ports (``humanvid_tpu/metrics/{lpips,inception}.py``).

No weights are downloaded (zero egress): ``load_state_dict_from_url`` serves
from the in-process ``URL_STATE_DICTS`` registry that tests populate with
random-valued state dicts. Unsupported paths raise loudly.
"""

import importlib.machinery
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

#: url -> state_dict served by load_state_dict_from_url (tests populate this)
URL_STATE_DICTS = {}


def load_state_dict_from_url(url, progress=True, **kwargs):
    if url not in URL_STATE_DICTS:
        raise RuntimeError(
            f"torchvision stub: no registered state dict for {url!r} "
            "(zero-egress environment; register via "
            "torchvision_stub.URL_STATE_DICTS)")
    return URL_STATE_DICTS[url]


# ---------------------------------------------------------------------------
# VGG16 (cfg "D") — only .features is consumed by the reference
# (lpipsPyTorch/modules/networks.py:96: models.vgg16(...).features)
# ---------------------------------------------------------------------------

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class _VGG(nn.Module):
    def __init__(self):
        super().__init__()
        layers, cin = [], 3
        for v in _VGG16_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers.append(nn.Conv2d(cin, v, kernel_size=3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                cin = v
        self.features = nn.Sequential(*layers)

    def forward(self, x):  # classifier head unused by LPIPS
        return self.features(x)


class VGG16_Weights:  # noqa: N801 — torchvision naming
    IMAGENET1K_V1 = "IMAGENET1K_V1"


def vgg16(weights=None, **kwargs):
    # weights ignored: callers randomize/load parameters explicitly in tests
    return _VGG()


def _unavailable(name):
    def fn(*a, **k):
        raise NotImplementedError(
            f"torchvision stub: {name} is not implemented (only the vgg16 "
            "and inception_v3 graphs the HumanVid metrics use exist)")
    return fn


# ---------------------------------------------------------------------------
# InceptionV3 module graph (torchvision.models.inception), the structure
# pytorch-fid patches (fid_inception.py:195-217). Parameter/buffer naming is
# checkpoint-pinned; forwards follow the public torchvision implementation.
# ---------------------------------------------------------------------------


class BasicConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, **kwargs):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, out_channels, bias=False, **kwargs)
        self.bn = nn.BatchNorm2d(out_channels, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class InceptionA(nn.Module):
    def __init__(self, in_channels, pool_features, conv_block=None):
        super().__init__()
        cb = conv_block or BasicConv2d
        self.branch1x1 = cb(in_channels, 64, kernel_size=1)
        self.branch5x5_1 = cb(in_channels, 48, kernel_size=1)
        self.branch5x5_2 = cb(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, padding=1)
        self.branch_pool = cb(in_channels, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, in_channels, conv_block=None):
        super().__init__()
        cb = conv_block or BasicConv2d
        self.branch3x3 = cb(in_channels, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = cb(in_channels, 64, kernel_size=1)
        self.branch3x3dbl_2 = cb(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = cb(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(nn.Module):
    def __init__(self, in_channels, channels_7x7, conv_block=None):
        super().__init__()
        cb = conv_block or BasicConv2d
        c7 = channels_7x7
        self.branch1x1 = cb(in_channels, 192, kernel_size=1)
        self.branch7x7_1 = cb(in_channels, c7, kernel_size=1)
        self.branch7x7_2 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = cb(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = cb(in_channels, c7, kernel_size=1)
        self.branch7x7dbl_2 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = cb(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = cb(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = cb(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = cb(in_channels, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, in_channels, conv_block=None):
        super().__init__()
        cb = conv_block or BasicConv2d
        self.branch3x3_1 = cb(in_channels, 192, kernel_size=1)
        self.branch3x3_2 = cb(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = cb(in_channels, 192, kernel_size=1)
        self.branch7x7x3_2 = cb(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = cb(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = cb(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(nn.Module):
    def __init__(self, in_channels, conv_block=None):
        super().__init__()
        cb = conv_block or BasicConv2d
        self.branch1x1 = cb(in_channels, 320, kernel_size=1)
        self.branch3x3_1 = cb(in_channels, 384, kernel_size=1)
        self.branch3x3_2a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = cb(in_channels, 448, kernel_size=1)
        self.branch3x3dbl_2 = cb(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = cb(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = cb(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = cb(in_channels, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class Inception3(nn.Module):
    def __init__(self, num_classes=1000, aux_logits=True,
                 transform_input=False, init_weights=None, dropout=0.5):
        super().__init__()
        if aux_logits:
            raise NotImplementedError(
                "torchvision stub: aux_logits graph not needed by pytorch-fid "
                "(fid_inception.py:204 builds with aux_logits=False)")
        if transform_input:
            raise NotImplementedError("torchvision stub: transform_input")
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.maxpool1 = nn.MaxPool2d(kernel_size=3, stride=2)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.maxpool2 = nn.MaxPool2d(kernel_size=3, stride=2)
        self.Mixed_5b = InceptionA(192, pool_features=32)
        self.Mixed_5c = InceptionA(256, pool_features=64)
        self.Mixed_5d = InceptionA(288, pool_features=64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, channels_7x7=128)
        self.Mixed_6c = InceptionC(768, channels_7x7=160)
        self.Mixed_6d = InceptionC(768, channels_7x7=160)
        self.Mixed_6e = InceptionC(768, channels_7x7=192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.dropout = nn.Dropout(p=dropout)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        for m in (self.Conv2d_1a_3x3, self.Conv2d_2a_3x3, self.Conv2d_2b_3x3,
                  self.maxpool1, self.Conv2d_3b_1x1, self.Conv2d_4a_3x3,
                  self.maxpool2, self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                  self.Mixed_6a, self.Mixed_6b, self.Mixed_6c, self.Mixed_6d,
                  self.Mixed_6e, self.Mixed_7a, self.Mixed_7b, self.Mixed_7c):
            x = m(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(self.dropout(x))


def inception_v3(weights=None, **kwargs):
    if weights is not None:
        raise NotImplementedError(
            "torchvision stub: pretrained torchvision weights unavailable "
            "(zero egress); pytorch-fid loads its own via "
            "load_state_dict_from_url, served from URL_STATE_DICTS")
    kwargs.pop("init_weights", None)  # stub never runs torch init schemes
    return Inception3(**kwargs)


# ---------------------------------------------------------------------------
# module installation
# ---------------------------------------------------------------------------


def _module(name, **attrs):
    mod = types.ModuleType(name)
    # a real ModuleSpec: importlib.util.find_spec raises ValueError on
    # sys.modules entries whose __spec__ is None, which would break every
    # LATER ``import transformers`` in the pytest process (its import_utils
    # probes find_spec("torchvision") at import time)
    mod.__spec__ = importlib.machinery.ModuleSpec(
        name, loader=None, is_package="." not in name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stub():
    """Install fake torchvision modules. Idempotent; refuses to clobber a
    real torchvision if one ever appears in the image."""
    if "torchvision" in sys.modules and not getattr(
            sys.modules["torchvision"], "_IS_HVT_STUB", False):
        raise RuntimeError("real torchvision present; stub not needed")
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]

    utils_mod = _module("torchvision.models.utils",
                        load_state_dict_from_url=load_state_dict_from_url)
    inception_mod = _module(
        "torchvision.models.inception",
        BasicConv2d=BasicConv2d, Inception3=Inception3,
        InceptionA=InceptionA, InceptionB=InceptionB, InceptionC=InceptionC,
        InceptionD=InceptionD, InceptionE=InceptionE,
        inception_v3=inception_v3)
    models_mod = _module(
        "torchvision.models",
        vgg16=vgg16, VGG16_Weights=VGG16_Weights, inception_v3=inception_v3,
        squeezenet1_1=_unavailable("squeezenet1_1"),
        alexnet=_unavailable("alexnet"),
        inception=inception_mod, utils=utils_mod)
    top = _module("torchvision", _IS_HVT_STUB=True,
                  __version__="0.15.2+hvtstub", models=models_mod)
    return top
