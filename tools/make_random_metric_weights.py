"""Synthesize random-valued metric-net torch checkpoints with the REAL key
inventories, so the full evaluation pipeline (FID + FVD + LPIPS + CLIP-sim)
can be exercised end-to-end before real weights are available (zero egress).

Usage:  python tools/make_random_metric_weights.py OUT_DIR [--skip-clip]

The produced files slot into ``--metric_weights OUT_DIR`` of
``scripts/eval_pose2vid.py`` / ``humanvid_tpu.metrics.weights.load_metric_nets``.
The numbers they yield are meaningless; the point is that every conversion,
batching and Frechet path runs — the day real checkpoints appear, dropping
them into the same directory is the only change (reference protocol:
``metrics/eval_fid.py``, ``metrics/eval_fvd.py:59-126``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # shape-only work; stay off the TPU

import numpy as np

from humanvid_tpu.metrics import weights as W

# torchvision vgg16.features conv indices and channels
_VGG_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_LPIPS_CHANNELS = [64, 128, 256, 512, 512]


def _save(sd, path):
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
    print(f"wrote {path} ({len(sd)} keys)")


def make_lpips(out_dir, rng):
    vgg = {}
    for idx, cin, cout in _VGG_CONVS:
        vgg[f"{idx}.weight"] = rng.normal(
            0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
        vgg[f"{idx}.bias"] = np.zeros(cout, np.float32)
    _save(vgg, os.path.join(out_dir, W.LPIPS_VGG))
    lins = {
        f"lin{i}.model.1.weight": np.abs(rng.normal(
            0, 0.1, (1, c, 1, 1))).astype(np.float32)
        for i, c in enumerate(_LPIPS_CHANNELS)
    }
    _save(lins, os.path.join(out_dir, W.LPIPS_LINS))


def _mirror_flax(variables, kernel_perm, rng):
    """Flax variables -> torch-key state dict with random values (the inverse
    of the metric nets' load_torch_state_dict mappings)."""
    import jax

    sd = {}
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(variables.get(coll, {}))[0]
        for path, leaf in flat:
            keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
            *mod, pname = keys
            shape = np.shape(leaf)
            if coll == "params":
                if pname == "kernel":
                    t_shape = tuple(shape[i] for i in kernel_perm)
                    sd[".".join(mod) + ".weight"] = rng.normal(
                        0, 0.05, t_shape).astype(np.float32)
                elif pname == "scale":
                    sd[".".join(mod) + ".weight"] = np.abs(
                        rng.normal(1, 0.02, shape)).astype(np.float32)
                else:  # bias
                    sd[".".join(mod) + ".bias"] = np.zeros(shape, np.float32)
            else:
                tname = {"mean": "running_mean", "var": "running_var"}[pname]
                val = (np.abs(rng.normal(1, 0.02, shape)) if pname == "var"
                       else rng.normal(0, 0.02, shape))
                sd[".".join(mod) + f".{tname}"] = val.astype(np.float32)
    return sd


def make_inception(out_dir, rng):
    import jax
    import jax.numpy as jnp

    from humanvid_tpu.metrics.inception import InceptionV3Features

    variables = jax.eval_shape(
        lambda: InceptionV3Features().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3))))
    sd = _mirror_flax(variables, (3, 2, 0, 1), rng)
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)  # skipped on load
    sd["fc.bias"] = np.zeros((1000,), np.float32)
    _save(sd, os.path.join(out_dir, W.FID_INCEPTION))


def make_i3d(out_dir, rng):
    import jax
    import jax.numpy as jnp

    from humanvid_tpu.metrics.i3d import I3D

    variables = jax.eval_shape(
        lambda: I3D().init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 224, 224, 3))))
    sd = _mirror_flax(variables, (4, 3, 0, 1, 2), rng)
    _save(sd, os.path.join(out_dir, W.FVD_I3D))


def make_clip(out_dir):
    import torch
    import transformers

    cfg = transformers.CLIPVisionConfig(
        image_size=224, patch_size=14, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096, projection_dim=768,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(cfg)
    sd = {k: v.detach().to(torch.float16).numpy()
          for k, v in model.state_dict().items()}
    _save(sd, os.path.join(out_dir, W.CLIP_VITL14))


if __name__ == "__main__":
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/metric_weights"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    make_lpips(out_dir, rng)
    make_inception(out_dir, rng)
    make_i3d(out_dir, rng)
    if "--skip-clip" not in sys.argv:
        make_clip(out_dir)
