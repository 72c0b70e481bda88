"""Offline evaluation runner: pair generated vs GT videos, compute metrics.

Behavioral parity with the reference's metric drivers:
- frame metrics per paired video, stride-subsampled
  (``metrics/metrics.py:89-198``): SSIM, PSNR, LPIPS, L1;
- FID over up-to-24 extracted frames per clip
  (``metrics/video2jpg.py:4-47``, ``metrics/eval_fid.py:301-318``);
- FVD over 24-frame stride-3 clips at 224 center-crop
  (``metrics/eval_fvd.py:59-126``);
- CLIP frame-consistency (``metrics/sim.py:37-77``).

The reference shells out to multiprocessing pools per video; here decode is
the threaded native reader and the feature nets run jit-batched on device.
Feature-network weights are optional (zero-egress): metrics needing an
unavailable net are skipped with a notice.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..data.video_io import read_frames
from .clip_sim import frame_consistency
from .frame import l1, psnr, ssim
from .frechet import frechet_from_features


@dataclasses.dataclass
class MetricsConfig:
    frame_stride: int = 1          # metrics.py subsampling
    fid_frames_per_clip: int = 24  # video2jpg.py:4-28
    fvd_clip_len: int = 24         # eval_fvd.py
    fvd_stride: int = 3
    lpips_batch: int = 8


def pair_videos(gen_dir: str, gt_dir: str, exts=(".mp4", ".avi", ".mkv")) -> List:
    """Match generated/GT videos by stem name."""
    def stems(d):
        return {
            os.path.splitext(f)[0]: os.path.join(d, f)
            for f in sorted(os.listdir(d)) if os.path.splitext(f)[1] in exts
        }
    gen, gt = stems(gen_dir), stems(gt_dir)
    common = sorted(set(gen) & set(gt))
    if not common:
        raise ValueError(f"no paired videos between {gen_dir} and {gt_dir}")
    return [(k, gen[k], gt[k]) for k in common]


def _align(a: np.ndarray, b: np.ndarray) -> tuple:
    n = min(a.shape[0], b.shape[0])
    a, b = a[:n], b[:n]
    if a.shape[1:3] != b.shape[1:3]:
        # PIL-bilinear for reference parity; frames are float [0,1] here, so
        # round-trip uint8 (PIL cannot resize float32 RGB)
        from PIL import Image
        u8 = np.clip(b * 255.0 + 0.5, 0, 255).astype(np.uint8)
        b = np.stack([np.asarray(Image.fromarray(f).resize(
            (a.shape[2], a.shape[1]), Image.BILINEAR)) for f in u8])
        b = b.astype(np.float32) / 255.0
    return a, b


METRIC_GROUPS = ("frame", "lpips", "fid", "fvd", "clip")


def evaluate_pairs(
    pairs: Sequence,
    config: MetricsConfig = MetricsConfig(),
    lpips_variables=None,
    inception_variables=None,
    i3d_variables=None,
    clip_apply=None,
    groups: Optional[Sequence[str]] = None,
) -> Dict[str, float]:
    """Run all available metrics over (name, gen_path, gt_path) pairs.

    ``groups`` optionally restricts to a subset of :data:`METRIC_GROUPS` —
    used to split one evaluation into several small device programs that can
    be retried independently when the remote-compile tunnel drops mid-run.
    """
    groups = set(METRIC_GROUPS if groups is None else groups)
    unknown = groups - set(METRIC_GROUPS)
    if unknown:
        raise ValueError(f"unknown metric groups: {sorted(unknown)}")
    results: Dict[str, List[float]] = {"ssim": [], "psnr": [], "l1": [], "lpips": [],
                                       "clip_sim": []}
    fid_gen, fid_gt, fvd_gen, fvd_gt = [], [], [], []

    for name, gen_path, gt_path in pairs:
        gen = read_frames(gen_path).astype(np.float32) / 255.0
        gt = read_frames(gt_path).astype(np.float32) / 255.0
        gen, gt = _align(gen, gt)
        sub_g, sub_t = gen[::config.frame_stride], gt[::config.frame_stride]

        if "frame" in groups:
            results["ssim"].append(float(np.mean(np.asarray(ssim(jnp.asarray(sub_g), jnp.asarray(sub_t))))))
            results["psnr"].append(float(np.mean(np.asarray(psnr(jnp.asarray(sub_g), jnp.asarray(sub_t))))))
            results["l1"].append(float(np.mean(np.asarray(l1(jnp.asarray(sub_g), jnp.asarray(sub_t))))))

        if lpips_variables is not None and "lpips" in groups:
            from .lpips import lpips_distance
            results["lpips"].append(
                float(lpips_distance(lpips_variables, sub_g, sub_t,
                                     config.lpips_batch).mean()))

        if inception_variables is not None and "fid" in groups:
            k = config.fid_frames_per_clip
            idx = np.linspace(0, gen.shape[0] - 1, min(k, gen.shape[0])).astype(int)
            fid_gen.append(gen[idx])
            fid_gt.append(gt[idx])

        if (i3d_variables is not None and "fvd" in groups
                and gen.shape[0] >= config.fvd_clip_len):
            from .i3d import preprocess_video
            s = config.fvd_stride
            need = config.fvd_clip_len * s
            gsel = gen[:need:s] if gen.shape[0] >= need else gen[:config.fvd_clip_len]
            tsel = gt[:need:s] if gt.shape[0] >= need else gt[:config.fvd_clip_len]
            fvd_gen.append(preprocess_video(gsel))
            fvd_gt.append(preprocess_video(tsel))

        if clip_apply is not None and "clip" in groups:
            feats = clip_apply(gen)
            results["clip_sim"].append(frame_consistency(jnp.asarray(feats)))
        print(f"[metrics] {name} done ({'/'.join(sorted(groups))})",
              file=sys.stderr, flush=True)

    out = {k: float(np.mean(v)) for k, v in results.items() if v}
    out["num_videos"] = len(pairs)

    if inception_variables is not None and fid_gen:
        from .inception import fid_features
        # per-video feature extraction: raw frame stacks keep their native
        # resolutions (orientation-adaptive W/H), so concatenating pixels
        # across videos would fail — features share a width
        fg = [fid_features(inception_variables, g) for g in fid_gen]
        ft = [fid_features(inception_variables, t) for t in fid_gt]
        out["fid"] = frechet_from_features(fg, ft)

    if i3d_variables is not None and fvd_gen:
        from .i3d import fvd_logits
        lg = fvd_logits(i3d_variables, np.stack(fvd_gen))
        lt = fvd_logits(i3d_variables, np.stack(fvd_gt))
        out["fvd"] = frechet_from_features([lg], [lt])

    return out


def evaluate_dirs(gen_dir: str, gt_dir: str, out_json: Optional[str] = None,
                  merge: bool = False, **kwargs) -> Dict[str, float]:
    """Evaluate paired videos; with ``merge=True`` fold the result into an
    existing ``out_json`` (per-group runs accumulate into one record)."""
    result = evaluate_pairs(pair_videos(gen_dir, gt_dir), **kwargs)
    if out_json:
        if merge and os.path.exists(out_json):
            with open(out_json) as f:
                prior = json.load(f)
            prior.update(result)
            result = prior
        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result
