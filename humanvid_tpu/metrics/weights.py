"""Load metric feature-net weights from torch checkpoint files.

The reference downloads its metric nets at runtime (pytorch-fid InceptionV3,
the styleganv I3D torchscript, lpips VGG16, CLIP-L/14 — ``metrics/eval_fid.py``,
``metrics/eval_fvd.py:23-35``, ``metrics/sim.py:19-27``).  This environment has
zero egress, so the runner accepts a directory of torch state-dict files
instead; whichever files are present enable their metric, and
``tools/make_random_metric_weights.py`` can synthesize the full set with
random values to exercise the pipeline end-to-end before real weights exist.

Expected files (torch ``.pth`` state dicts, all optional):

  ``lpips_vgg16.pth``    torchvision ``vgg16.features`` keys (``0.weight``, ...)
  ``lpips_lins.pth``     lpips lin heads (``lin{i}.model.1.weight``)
  ``fid_inception.pth``  pytorch-fid / torchvision InceptionV3 keys
  ``fvd_i3d.pth``        I3D keys (``Mixed_3b.b1a.conv3d.weight`` naming)
  ``clip_vitl14.pth``    transformers ``CLIPVisionModelWithProjection`` keys
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

LPIPS_VGG = "lpips_vgg16.pth"
LPIPS_LINS = "lpips_lins.pth"
FID_INCEPTION = "fid_inception.pth"
FVD_I3D = "fvd_i3d.pth"
CLIP_VITL14 = "clip_vitl14.pth"


def _torch_load(path: str) -> Dict[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: np.asarray(v) for k, v in sd.items()}


def _make_clip_apply(sd: Dict[str, Any], clip_batch: int = 8):
    """CLIP-L/14 frame-feature extractor for the consistency metric
    (reference ``metrics/sim.py:37-77``): frames [0,1] -> (f, 768)."""
    import jax
    import jax.numpy as jnp

    from ..models.clip_vision import CLIPVisionEncoder, clip_preprocess
    from ..models.configs import CLIPVisionConfig
    from ..utils.convert import convert_state_dict

    model = CLIPVisionEncoder(config=CLIPVisionConfig(
        image_size=224, patch_size=14, hidden_size=1024, num_layers=24,
        num_heads=16, intermediate_size=4096, projection_dim=768,
    ))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 224, 224, 3), jnp.float32)))
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), params)
    params, missing, _ = convert_state_dict(params, sd, "clip", strict=True)
    if missing:
        raise KeyError(f"clip_vitl14: {len(missing)} missing keys, "
                       f"e.g. {missing[:3]}")
    # params ride as a jit ARGUMENT, staged once with a packed transfer: a
    # closure would bake the ~1.2 GB CLIP-L tree into the HLO as literals,
    # and serializing that program reliably broke the axon remote-compile
    # pipe (6/6 "Broken pipe (os error 32)" in the r5 eval-gate runs)
    from ..utils.transfer import packed_device_put

    params = packed_device_put(params)
    _run = jax.jit(lambda p, x: model.apply(p, clip_preprocess(x)))
    run = lambda x: _run(params, x)

    def clip_apply(frames: np.ndarray) -> np.ndarray:
        # reference sim.py:43 feeds frames through CLIPProcessor: short-side
        # 224 PIL-BICUBIC + center crop (NOT an aspect-distorting resize)
        from ..data.datasets import clip_crop_raw

        f = frames.shape[0]
        u8 = np.clip(np.asarray(frames) * 255.0 + 0.5, 0, 255).astype(np.uint8)
        v = jnp.asarray(np.stack([clip_crop_raw(fr) for fr in u8]))
        outs = []
        for i in range(0, f, clip_batch):
            chunk = v[i:i + clip_batch]
            if chunk.shape[0] < clip_batch:
                n = chunk.shape[0]
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((clip_batch - n,) + chunk.shape[1:],
                                      chunk.dtype)])
                outs.append(np.asarray(run(chunk))[:n])
            else:
                outs.append(np.asarray(run(chunk)))
        return np.concatenate(outs, axis=0)

    return clip_apply


def load_metric_nets(weights_dir: Optional[str]) -> Dict[str, Any]:
    """Build the ``evaluate_pairs`` feature-net kwargs from whatever metric
    weight files exist under ``weights_dir`` (``{}`` if None/empty)."""
    out: Dict[str, Any] = {}
    if not weights_dir:
        return out

    vgg_p = os.path.join(weights_dir, LPIPS_VGG)
    lin_p = os.path.join(weights_dir, LPIPS_LINS)
    if os.path.exists(vgg_p) and os.path.exists(lin_p):
        from .lpips import load_torch_weights
        out["lpips_variables"] = load_torch_weights(
            _torch_load(vgg_p), _torch_load(lin_p))

    inc_p = os.path.join(weights_dir, FID_INCEPTION)
    if os.path.exists(inc_p):
        from .inception import load_torch_state_dict
        out["inception_variables"] = load_torch_state_dict(_torch_load(inc_p))

    i3d_p = os.path.join(weights_dir, FVD_I3D)
    if os.path.exists(i3d_p):
        from .i3d import load_torch_state_dict
        out["i3d_variables"] = load_torch_state_dict(_torch_load(i3d_p))

    clip_p = os.path.join(weights_dir, CLIP_VITL14)
    if os.path.exists(clip_p):
        out["clip_apply"] = _make_clip_apply(_torch_load(clip_p))

    return out
