"""Activation-level golden parity for the LPIPS and FID-Inception metric nets
vs the REFERENCE's own vendored torch code, executed under the torchvision
stub (VERDICT r2 "what's missing" #3).

The reference vendors both nets' source — ``metrics/lpipsPyTorch/modules/``
and ``metrics/utils/fid_inception.py`` — whose only import blocker is
torchvision. ``tests/torchvision_stub.py`` provides the vgg16-features and
InceptionV3 module graphs, so the reference's code runs unmodified with
shared random weights routed through our ``metrics/weights.py`` converters,
and activations are matched in fp32.

Notable conventions these tests pin (both caught divergences when written):
- LPIPS consumes ToTensor [0,1] images with NO [-1,1] rescale before
  ``BaseNet.z_score`` (``metrics/metrics.py:93-100``,
  ``scripts/eval_pose2img.py:273``).
- LPIPS lin heads are applied raw (no clamping), and the channel
  normalization is ``x / (||x|| + eps)`` (``modules/utils.py:6-8``).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torchvision_stub import URL_STATE_DICTS, install_stub  # noqa: E402

REF_METRICS = "/root/reference/metrics"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _load_package(name, path):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(path, "__init__.py"),
        submodule_search_locations=[path])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(module, seed, scale=0.05):
    """Perturb parameters AND BatchNorm running stats so eval-mode normal-
    ization carries signal (running_var stays positive)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(torch.randn(p.shape, generator=g) * scale)
        for name, buf in module.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn(buf.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.abs(
                    1.0 + torch.randn(buf.shape, generator=g) * 0.2) + 0.05)
    module.eval()
    return module


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


@pytest.fixture(scope="module")
def stub():
    install_stub()


def test_golden_lpips(stub, monkeypatch):
    """Our flax LPIPS vs the reference's lpipsPyTorch executed verbatim
    (``metrics/lpipsPyTorch/__init__.py:6-21`` -> ``modules/lpips.py``),
    shared random VGG + lin weights."""
    rng = np.random.default_rng(0)
    lin_channels = [64, 128, 256, 512, 512]
    # raw lpips checkpoint keys, renamed by the reference's get_state_dict
    # (modules/utils.py:11-30) before LinLayers.load_state_dict
    lins_raw = {
        f"lin{i}.model.1.weight": rng.normal(
            0, 0.1, (1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate(lin_channels)
    }
    monkeypatch.setattr(
        torch.hub, "load_state_dict_from_url",
        lambda url, **k: {k2: torch.from_numpy(v)
                          for k2, v in lins_raw.items()},
        raising=False)

    ref = _load_package("ref_lpips_pkg", os.path.join(REF_METRICS,
                                                      "lpipsPyTorch"))
    crit = ref.LPIPS(net_type="vgg")
    _randomize(crit.net.layers, 7)
    crit.eval()

    from humanvid_tpu.metrics.lpips import LPIPS, load_torch_weights

    vgg_sd = {k: v.numpy() for k, v in crit.net.layers.state_dict().items()}
    variables = load_torch_weights(vgg_sd, lins_raw)

    # odd H/W exercises the floor-division maxpool path in both stacks
    x = rng.uniform(0, 1, (2, 65, 47, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        theirs = crit(_nchw(x), _nchw(y))  # scalar: summed over batch+stages
    ours = LPIPS().apply(variables, jnp.asarray(x), jnp.asarray(y))  # (2,)
    np.testing.assert_allclose(float(np.asarray(ours).sum()),
                               float(theirs.reshape(())), rtol=2e-5,
                               atol=1e-6)

    # per-pair values: the reference reduces pairs one at a time in its
    # drivers (eval_pose2img.py:273), so single-pair calls must match too
    with torch.no_grad():
        one = crit(_nchw(x[:1]), _nchw(y[:1]))
    np.testing.assert_allclose(float(np.asarray(ours)[0]),
                               float(one.reshape(())), rtol=2e-5, atol=1e-6)


def test_golden_fid_inception(stub):
    """Our flax InceptionV3Features vs the reference's fid_inception.py
    executed verbatim — FIDInceptionA/C/E patches, count_include_pad=False
    average pools, the Mixed_7c max-pool quirk, resize+[-1,1] preprocessing
    (``metrics/utils/fid_inception.py:80-161,195-344``) — with shared random
    weights through ``metrics/inception.py:load_torch_state_dict``."""
    fid_mod = _load_module("ref_fid_inception",
                           os.path.join(REF_METRICS, "utils",
                                        "fid_inception.py"))

    # Build the FID graph exactly as fid_inception_v3 does (:204-213), then
    # register its randomized state dict so the reference's own constructor
    # path (InceptionV3.__init__ -> fid_inception_v3 -> load_state_dict) runs
    # end-to-end, download replaced by the zero-egress registry.
    proto = fid_mod._inception_v3(num_classes=1008, aux_logits=False,
                                  weights=None)
    proto.Mixed_5b = fid_mod.FIDInceptionA(192, pool_features=32)
    proto.Mixed_5c = fid_mod.FIDInceptionA(256, pool_features=64)
    proto.Mixed_5d = fid_mod.FIDInceptionA(288, pool_features=64)
    proto.Mixed_6b = fid_mod.FIDInceptionC(768, channels_7x7=128)
    proto.Mixed_6c = fid_mod.FIDInceptionC(768, channels_7x7=160)
    proto.Mixed_6d = fid_mod.FIDInceptionC(768, channels_7x7=160)
    proto.Mixed_6e = fid_mod.FIDInceptionC(768, channels_7x7=192)
    proto.Mixed_7b = fid_mod.FIDInceptionE_1(1280)
    proto.Mixed_7c = fid_mod.FIDInceptionE_2(2048)
    _randomize(proto, 11)
    URL_STATE_DICTS[fid_mod.FID_WEIGHTS_URL] = proto.state_dict()

    net = fid_mod.InceptionV3(output_blocks=[3], resize_input=True,
                              normalize_input=True)
    net.eval()

    from humanvid_tpu.metrics.inception import (InceptionV3Features,
                                                load_torch_state_dict)

    sd_np = {k: v.numpy()
             for k, v in URL_STATE_DICTS[fid_mod.FID_WEIGHTS_URL].items()}
    variables = load_torch_state_dict(sd_np)

    # non-299 input exercises the bilinear-resize parity path
    # (F.interpolate align_corners=False vs jax.image.resize half-pixel)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 48, 3)).astype(np.float32)

    with torch.no_grad():
        theirs = net(_nchw(x))[0].squeeze(-1).squeeze(-1).numpy()  # (2, 2048)
    ours = np.asarray(InceptionV3Features().apply(variables, jnp.asarray(x)))

    assert ours.shape == theirs.shape == (2, 2048)
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4,
                               atol=2e-4 * max(scale, 1.0))
