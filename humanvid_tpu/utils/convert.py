"""Checkpoint conversion: reference torch state dicts -> our param pytrees.

The reference splits checkpoints per module (``reference_unet-*.pth``,
``denoising_unet-*.pth``, ``pose_guider-*.pth``, ``camera_pose_encoder-*.pth``,
``motion_module-*.pth``; ``src/utils/util.py:17-44``) on top of upstream SD1.5
UNet / sd-vae-ft-mse / CLIP image encoder / AnimateDiff ``v3_sd15_mm.ckpt``
weights. This module maps those names onto the flax trees defined in
``humanvid_tpu.models``.

Strategy: walk OUR param tree (ground truth for structure), derive the torch
key for each leaf from its flax path, fetch + re-layout. This makes the
converter topology-agnostic and loudly reports missing/extra keys.

Layout rules (torch -> flax/NHWC):
- Conv2d weight (O, I, kh, kw)  -> kernel (kh, kw, I, O)
- Linear weight (O, I)          -> kernel (I, O)
- Norm weight/bias              -> scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

TorchDict = Dict[str, "np.ndarray"]


def load_torch_state_dict(path: str) -> TorchDict:
    """Load a .pth/.ckpt into numpy arrays (host-side; torch CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("pose_encoder_state_dict", "state_dict"):
        if isinstance(sd, dict) and key in sd:
            sd = sd[key]
    return {k: v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    if w.ndim == 5:  # InflatedConv3d stored (O, I, 1, kh, kw)? (defensive)
        w = w.squeeze(2)
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class NameMap:
    """Flax path -> (torch key, layout transform)."""

    def __init__(self, rules: List[Tuple[str, str]]):
        self.rules = [(re.compile(pat), repl) for pat, repl in rules]

    def torch_key(self, flax_path: str) -> str:
        for pat, repl in self.rules:
            if pat.fullmatch(flax_path):
                return pat.sub(repl, flax_path)
        raise KeyError(f"no rule for flax path: {flax_path}")


def _flatten(tree, prefix="") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _unflatten(flat: Dict[str, Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _leaf_transform(flax_path: str, torch_w: np.ndarray, target_shape) -> np.ndarray:
    leaf = flax_path.rsplit("/", 1)[-1]
    if leaf == "kernel":
        w = _conv(torch_w) if torch_w.ndim >= 4 else _linear(torch_w)
    elif leaf in ("scale", "bias", "class_embedding", "position_embedding"):
        w = torch_w
    else:
        w = torch_w
    if tuple(w.shape) != tuple(target_shape):
        raise ValueError(
            f"{flax_path}: converted shape {w.shape} != target {tuple(target_shape)}"
        )
    return w.astype(np.float32)


# ---------------------------------------------------------------------------
# per-model flax-path -> torch-key translators (string rewriting, not regex
# tables, because the grammar is small and positional)
# ---------------------------------------------------------------------------

def _unet_torch_key(path: str) -> str:
    """Flax UNetConditionModel path -> diffusers UNet(2D|3D)ConditionModel key."""
    p = path.replace("params/", "")
    parts = p.split("/")
    name = parts[0]
    leaf = parts[-1]
    mid = parts[1:-1]

    def norm_leaf(container: str) -> str:
        if leaf == "kernel":
            return f"{container}.weight"
        if leaf == "scale":
            return f"{container}.weight"
        return f"{container}.{leaf}"

    def tblock(rest: List[str], prefix: str) -> str:
        # blocks_{k} / <attn1|attn2|ff|norm1..3> / ...
        bk = rest[0].split("_")[1]
        sub = rest[1]
        inner = rest[2] if len(rest) > 2 else None
        base = f"{prefix}.transformer_blocks.{bk}"
        if sub in ("attn1", "attn2"):
            torch_inner = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                           "to_out": "to_out.0"}[inner]
            return f"{base}.{sub}.{norm_leaf(torch_inner)}"
        if sub == "ff":
            torch_inner = {"proj_in": "net.0.proj", "proj_out": "net.2"}[inner]
            return f"{base}.ff.{norm_leaf(torch_inner)}"
        return f"{base}.{norm_leaf(sub)}"

    def motion(rest: List[str], prefix: str) -> str:
        # TemporalTransformer: norm/proj_in/proj_out/blocks_{k}/...
        sub = rest[0]
        tt = f"{prefix}.temporal_transformer"
        if sub in ("norm", "proj_in", "proj_out"):
            return f"{tt}.{norm_leaf(sub)}"
        bk = sub.split("_")[1]
        base = f"{tt}.transformer_blocks.{bk}"
        sub2 = rest[1]
        if sub2.startswith("attention_blocks_"):
            a = sub2.rsplit("_", 1)[1]
            inner = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                     "to_out": "to_out.0"}[rest[3]]
            return f"{base}.attention_blocks.{a}.{norm_leaf(inner)}"
        if sub2.startswith("norms_"):
            a = sub2.rsplit("_", 1)[1]
            suffix = "weight" if leaf in ("scale", "kernel") else leaf
            return f"{base}.norms.{a}.{suffix}"
        if sub2 == "ff":
            inner = {"proj_in": "net.0.proj", "proj_out": "net.2"}[rest[2]]
            return f"{base}.ff.{norm_leaf(inner)}"
        if sub2 == "ff_norm":
            return f"{base}.{norm_leaf('ff_norm')}"
        raise KeyError(path)

    if name in ("conv_in", "conv_out", "conv_norm_out"):
        return norm_leaf(name)
    if name == "time_embedding_linear_1":
        return norm_leaf("time_embedding.linear_1")
    if name == "time_embedding_linear_2":
        return norm_leaf("time_embedding.linear_2")

    m = re.match(r"(down|up|mid)_(\d+)?_?(resnets|attentions|motion|downsample|upsample)_?(\d+)?$", name)
    if not m:
        raise KeyError(path)
    where, idx, kind, j = m.groups()
    if where == "mid":
        prefix = "mid_block"
        # mid naming: mid_resnets_0 -> kind='resnets', j from name suffix
    else:
        prefix = f"{where}_blocks.{idx}"

    if kind == "resnets":
        base = f"{prefix}.resnets.{j}"
        sub = mid[0] if mid else ""
        torch_sub = {"norm1": "norm1", "norm2": "norm2", "conv1": "conv1",
                     "conv2": "conv2", "time_emb_proj": "time_emb_proj",
                     "conv_shortcut": "conv_shortcut"}[sub]
        return f"{base}.{norm_leaf(torch_sub)}"
    if kind == "downsample":
        return f"{prefix}.downsamplers.0.{norm_leaf('conv')}"
    if kind == "upsample":
        return f"{prefix}.upsamplers.0.{norm_leaf('conv')}"
    if kind == "attentions":
        base = f"{prefix}.attentions.{j}"
        sub = mid[0]
        if sub in ("norm", "proj_in", "proj_out"):
            return f"{base}.{norm_leaf(sub)}"
        return tblock(mid, base)
    if kind == "motion":
        base = f"{prefix}.motion_modules.{j}"
        return motion(mid, base)
    raise KeyError(path)


def _mid_fixup(key: str, flax_name: str) -> str:
    """mid_resnets_0 style names carry their index in the name itself."""
    return key


def _pose_guider_torch_key(path: str) -> str:
    p = path.replace("params/", "")
    parts = p.split("/")
    name, leaf = parts[0], parts[-1]
    suffix = "weight" if leaf in ("kernel", "scale") else leaf
    return f"{name.replace('blocks_', 'blocks.')}.{suffix}"


def _camera_encoder_torch_key(path: str) -> str:
    p = path.replace("params/", "")
    parts = p.split("/")
    name, leaf = parts[0], parts[-1]
    suffix = "weight" if leaf in ("kernel", "scale") else leaf

    if name == "conv_in":
        return f"encoder_conv_in.{suffix}"
    m = re.match(r"res_(\d+)_(\d+)$", name)
    if m:
        i, j = m.groups()
        sub = parts[1]
        return f"encoder_down_conv_blocks.{i}.{j}.{sub}.{suffix}"
    m = re.match(r"zero_conv_(\d+)$", name)
    if m:
        return f"zero_conv_layers.{m.group(1)}.{suffix}"
    m = re.match(r"attn_(\d+)_(\d+)$", name)
    if m:
        i, j = m.groups()
        base = f"encoder_down_attention_blocks.{i}.{j}"
        sub = parts[1]
        if sub.startswith("attention_blocks_"):
            a = sub.rsplit("_", 1)[1]
            inner = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                     "to_out": "to_out.0"}[parts[3]]
            return f"{base}.attention_blocks.{a}.{inner}.{suffix}"
        if sub.startswith("norms_"):
            a = sub.rsplit("_", 1)[1]
            return f"{base}.norms.{a}.{suffix}"
        if sub == "ff":
            inner = {"proj_in": "net.0.proj", "proj_out": "net.2"}[parts[2]]
            return f"{base}.ff.{inner}.{suffix}"
        if sub == "ff_norm":
            return f"{base}.ff_norm.{suffix}"
    raise KeyError(path)


def _vae_torch_key(path: str, side: str) -> str:
    """side: 'encoder' | 'decoder' (diffusers AutoencoderKL keys)."""
    p = path.replace("params/", "")
    parts = p.split("/")
    name, leaf = parts[0], parts[-1]
    suffix = "weight" if leaf in ("kernel", "scale") else leaf

    if name in ("quant_conv", "post_quant_conv"):
        return f"{name}.{suffix}"
    prefix = side

    def res(base: str) -> str:
        sub = parts[1]
        return f"{base}.{sub}.{suffix}"

    m = re.match(r"(down|up)_(\d+)_resnets_(\d+)$", name)
    if m:
        where, i, j = m.groups()
        return res(f"{prefix}.{where}_blocks.{i}.resnets.{j}")
    m = re.match(r"down_(\d+)_downsample$", name)
    if m:
        return f"{prefix}.down_blocks.{m.group(1)}.downsamplers.0.conv.{suffix}"
    m = re.match(r"up_(\d+)_upsample$", name)
    if m:
        return f"{prefix}.up_blocks.{m.group(1)}.upsamplers.0.conv.{suffix}"
    m = re.match(r"mid_resnets_(\d+)$", name)
    if m:
        return res(f"{prefix}.mid_block.resnets.{m.group(1)}")
    if name == "mid_attn":
        sub = parts[1]
        if sub == "group_norm":
            return f"{prefix}.mid_block.attentions.0.group_norm.{suffix}"
        inner = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                 "to_out": "to_out.0"}[parts[2]]
        return f"{prefix}.mid_block.attentions.0.{inner}.{suffix}"
    if name in ("conv_in", "conv_out", "conv_norm_out"):
        return f"{prefix}.{name}.{suffix}"
    raise KeyError(path)


def _clip_torch_key(path: str) -> str:
    p = path.replace("params/", "")
    parts = p.split("/")
    name, leaf = parts[0], parts[-1]
    suffix = "weight" if leaf in ("kernel", "scale") else leaf
    vm = "vision_model"
    if name == "class_embedding":
        return f"{vm}.embeddings.class_embedding"
    if name == "position_embedding":
        return f"{vm}.embeddings.position_embedding.weight"
    if name == "patch_embedding":
        return f"{vm}.embeddings.patch_embedding.weight"
    if name in ("pre_layrnorm", "post_layernorm"):
        return f"{vm}.{name}.{suffix}"
    if name == "visual_projection":
        return f"visual_projection.{suffix}"
    m = re.match(r"layers_(\d+)$", name)
    if m:
        base = f"{vm}.encoder.layers.{m.group(1)}"
        sub = parts[1]
        if sub in ("layer_norm1", "layer_norm2"):
            return f"{base}.{sub}.{suffix}"
        if sub in ("q_proj", "k_proj", "v_proj", "out_proj"):
            return f"{base}.self_attn.{sub}.{suffix}"
        if sub in ("fc1", "fc2"):
            return f"{base}.mlp.{sub}.{suffix}"
    raise KeyError(path)


# Model kinds whose repeated trunk uses nn.scan-stacked params: the flax tree
# holds ``params/layers/<sub>`` leaves with a leading (num_layers,) axis that
# maps onto the torch checkpoint's per-layer ``layers_{i}`` keys.
_STACKED_KINDS = {"clip"}


def _match_stacked(model_kind: str, path: str):
    if model_kind not in _STACKED_KINDS:
        return None
    m = re.match(r"params/layers/(.+)$", path)
    return m.group(1) if m else None


_TRANSLATORS = {
    "unet": _unet_torch_key,
    "pose_guider": _pose_guider_torch_key,
    "camera_encoder": _camera_encoder_torch_key,
    "vae_encoder": lambda p: _vae_torch_key(p, "encoder"),
    "vae_decoder": lambda p: _vae_torch_key(p, "decoder"),
    "clip": _clip_torch_key,
}

# Pre-diffusers-0.18 attention naming (the 2022-era sd-vae-ft-mse
# ``diffusion_pytorch_model.bin`` on disk): tried as fallbacks when the
# primary key is absent, mirroring diffusers' own load-time rename.
_OLD_NAME_ALIASES = (
    (".to_q.", ".query."),
    (".to_k.", ".key."),
    (".to_v.", ".value."),
    (".to_out.0.", ".proj_attn."),
)


def _candidate_keys(tkey: str):
    yield tkey
    for new, old in _OLD_NAME_ALIASES:
        if new in tkey:
            yield tkey.replace(new, old)


def convert_state_dict(
    flax_params, torch_sd: TorchDict, model_kind: str,
    strict: bool = True,
) -> Tuple[Any, List[str], List[str]]:
    """Fill ``flax_params``-shaped tree from ``torch_sd``.

    Returns (new_params, missing_torch_keys, unused_torch_keys).
    """
    translate = _TRANSLATORS[model_kind]
    flat = _flatten(flax_params)
    out: Dict[str, Any] = {}
    missing: List[str] = []
    used = set()
    for path, leaf_val in flat.items():
        stacked = _match_stacked(model_kind, path)
        if stacked is not None:
            # nn.scan-stacked leaf: leading axis indexes the torch layers
            rest, n = stacked, np.shape(leaf_val)[0]
            per_shape = np.shape(leaf_val)[1:]
            vals = []
            for i in range(n):
                p_i = f"params/layers_{i}/{rest}"
                tkey = next((c for c in _candidate_keys(translate(p_i))
                             if c in torch_sd), None)
                if tkey is None:
                    missing.append(translate(p_i))
                    break
                vals.append(_leaf_transform(p_i, torch_sd[tkey], per_shape))
                used.add(tkey)
            out[path] = np.stack(vals) if len(vals) == n else leaf_val
            continue
        tkey = next(
            (c for c in _candidate_keys(translate(path)) if c in torch_sd), None)
        if tkey is None:
            missing.append(translate(path))
            out[path] = leaf_val
            continue
        out[path] = _leaf_transform(path, torch_sd[tkey], np.shape(leaf_val))
        used.add(tkey)
    unused = [k for k in torch_sd if k not in used]
    if strict and missing:
        raise KeyError(f"missing torch keys for {model_kind}: {missing[:10]}"
                       f" (+{max(0, len(missing)-10)} more)")
    return _unflatten(out), missing, unused


def export_state_dict(flax_params, model_kind: str) -> TorchDict:
    """Inverse conversion: our tree -> torch-layout state dict (for .pth export)."""
    translate = _TRANSLATORS[model_kind]
    flat = _flatten(flax_params)
    sd: TorchDict = {}
    for path, v in flat.items():
        arr = np.asarray(v)
        leaf = path.rsplit("/", 1)[-1]
        stacked = _match_stacked(model_kind, path)
        if stacked is not None:
            for i in range(arr.shape[0]):
                a = arr[i]
                if leaf == "kernel":
                    a = (np.transpose(a, (3, 2, 0, 1)) if a.ndim == 4
                         else np.transpose(a))
                sd[translate(f"params/layers_{i}/{stacked}")] = a
            continue
        tkey = translate(path)
        if leaf == "kernel":
            arr = np.transpose(arr, (3, 2, 0, 1)) if arr.ndim == 4 else np.transpose(arr)
        sd[tkey] = arr
    return sd
