"""Benchmark: pose2vid throughput at the BASELINE flagship operating point.

Config #3 of BASELINE.json: pose2vid + CameraCtrl, 24 frames at 512x768,
DDIM 30 steps, CFG 3.5 — the full camera-aware denoise loop (ReferenceNet
once + 30 x windowed video-UNet CFG steps + VAE decode), bf16, random weights
(numerics are weight-independent for throughput).

Prints ONE JSON line: frames/sec/chip. ``vs_baseline`` compares against the
A100+diffusers reference estimate for the same op-point (~0.15 f/s: ~2.7 min
for a 24-frame 512x768 clip with 30 CFG'd UNet steps; the reference repo
publishes no numbers — BASELINE.md documents the measurement protocol).
"""

import json
import os
import statistics
import sys
import time

_T0 = time.time()


def _phase(msg):
    print(f"# bench [{time.strftime('%H:%M:%S')} +{time.time() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


_phase("interpreter up, importing")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from humanvid_tpu.ops.attention import set_default_attention_backend

# Pallas flash attention for the 6k-token spatial sequences (einsum logits at
# this op-point would need ~116 GB HBM); einsum for tiny temporal/cross attn.
set_default_attention_backend("auto")

H, W, F = 768, 512, 24
STEPS = int(os.environ.get("HVT_BENCH_STEPS", "30"))  # dev override; canonical 30
GUIDANCE = 3.5
A100_BASELINE_FPS = 0.15  # documented estimate; see module docstring
# the estimate's sensitivity band (BASELINE.md): 0.13 f/s optimistic-for-us,
# 0.40 f/s pessimistic-for-us. vs_baseline_range carries both bounds so the
# central multiplier is never mistaken for a measured one.
A100_BASELINE_FPS_BOUNDS = (0.13, 0.40)


def main():
    from humanvid_tpu.pipelines import CamAnimate, Pose2VideoPipeline
    from humanvid_tpu.pipelines.system import CamAnimateConfig
    from humanvid_tpu.data.camera import (
        get_relative_pose,
        intrinsics_vector,
        ray_condition,
        static_camera,
    )

    _phase("constructing system")
    system = CamAnimate(CamAnimateConfig(), dtype=jnp.bfloat16)
    # structure-only init, materialized as zeros ON DEVICE: a real on-device
    # init dribbles ~7k small eager allocations into the heap (fragmentation
    # pressure on a 16 GB chip) and costs minutes of per-module compiles;
    # throughput is weight-independent, and even the single packed transfer
    # of the zero tree cost minutes of tunnel staging in round 4 (the r4
    # driver bench spent 23 min in setup and timed out before the number).
    params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                abstract=True)
    _phase("materializing zero params on device (no host->device payload)")
    from humanvid_tpu.utils.transfer import device_put_zeros
    params = jax.block_until_ready(device_put_zeros(params))
    pipe = Pose2VideoPipeline(system, params)

    rng = np.random.default_rng(0)
    ref_image = rng.random((H, W, 3)).astype(np.float32)
    pose_video = rng.random((F, H, W, 3)).astype(np.float32)
    clip_image = rng.random((224, 224, 3)).astype(np.float32)
    cams = static_camera((W, H), F + 1)
    K = intrinsics_vector(cams[1:], (W, H))
    c2w = get_relative_pose(cams)[1:]
    plucker = ray_condition(K, c2w, H, W)

    _phase("staging conditioning inputs on device")
    # stage the big conditioning inputs on device ONCE, in the compute dtype:
    # like device_output above, per-run re-upload of ~170 MB (plucker +
    # pose video) measures the dev tunnel, not the chip — the production
    # loader stages inputs concurrently with the previous clip's compute.
    # jnp.asarray(x, bf16) inside the pipeline is a no-op on these.
    pose_video = jax.block_until_ready(jnp.asarray(pose_video, jnp.bfloat16))
    plucker = jax.block_until_ready(jnp.asarray(plucker, jnp.bfloat16))

    def run():
        out = pipe(
            ref_image, pose_video, plucker, clip_image,
            num_inference_steps=STEPS, guidance_scale=GUIDANCE,
            # decode_chunk 24: single-shot decode measured 0.85 s vs 0.99 at
            # chunk 8 (768x512x24f) — small frame batches starve the
            # elementwise path; fits HBM alongside the denoise working set
            context_frames=24, context_overlap=4, decode_chunk=24,
            # sequential CFG: two 24-row UNet passes per step — the 48-row
            # batched pass exceeds single-chip memory at this op-point
            cfg_mode="sequential",
            # several launches of one compiled program instead of a single
            # multi-minute program (remote workers kill those — see memory)
            steps_per_launch=int(os.environ.get("HVT_BENCH_SPL", "6")),
            # time device work; the host transfer of the decoded video is a
            # property of the dev tunnel, not the chip
            device_output=True,
        )
        # forced completion: block_until_ready can ack-return early on the
        # axon backend, so a wall-clock measurement is only valid once a
        # host fetch of a derived scalar has drained the device queue
        checksum = float(jnp.sum(out.latents.astype(jnp.float32)))
        assert checksum == checksum, "NaN latents checksum"
        return out

    t_setup = time.time()
    _phase("setup done; compiling + first run")
    run()  # compile
    t_compile = time.time()
    _phase(f"compile+first-run took {t_compile - t_setup:.1f}s")
    # median of 3 with reported spread: this chip's run-to-run variance is
    # large (observed 0.31 vs 0.50 f/s for identical programs in different
    # processes — PERF.md), so a best-of-N would overstate; the median is
    # robust to a single slow outlier and the spread is printed alongside
    dts = []
    for _ in range(int(os.environ.get("HVT_BENCH_RUNS", "3"))):
        t0 = time.time()
        out = run()
        dts.append(time.time() - t0)
    dt = statistics.median(dts)
    print(f"# timed runs: {['%.1f' % d for d in dts]}s "
          f"(median {dt:.1f}, spread {min(dts):.1f}-{max(dts):.1f})",
          file=sys.stderr, flush=True)

    fps = F / dt
    # the JSON line goes out BEFORE any further device interaction: on the
    # axon dev tunnel, launching a fresh executable after the big fused
    # program can fault the worker, and that must not lose the measurement
    print(json.dumps({
        "metric": "pose2vid_frames_per_sec_per_chip_512x768x24f_ddim30_cfg",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
        # [pessimistic, optimistic] multiplier vs the estimate's bounds
        "vs_baseline_range": [
            round(fps / A100_BASELINE_FPS_BOUNDS[1], 3),
            round(fps / A100_BASELINE_FPS_BOUNDS[0], 3),
        ],
    }), flush=True)
    # full-buffer fetch (no slicing: a slice would launch a new executable)
    video = np.asarray(out.videos, np.float32)
    assert np.isfinite(video[0, :2]).all(), "non-finite output frames"
    print(f"# output ok: {video.shape} mean={video.mean():.4f}",
          file=sys.stderr, flush=True)

    # ---- optional c4 long-clip point (48 frames, 2 overlapping windows) ----
    # The architecture's strongest case vs the reference's serial window loop
    # (pipeline_pose2vid_long.py:514). Runs AFTER the flagship JSON line is
    # banked, prints to stderr only (the driver captures the tail), and is
    # skipped when the elapsed budget is already tight.
    budget_min = float(os.environ.get("HVT_BENCH_C4_BUDGET_MIN", "45"))
    if os.environ.get("HVT_BENCH_NO_C4") or (time.time() - _T0) / 60 > budget_min:
        _phase("skipping c4 long-clip point (budget)")
        return
    _phase("c4 long-clip 48f: compiling + first run")
    F4 = 48
    pose4 = jax.block_until_ready(jnp.asarray(
        rng.random((F4, H, W, 3)).astype(np.float32), jnp.bfloat16))
    cams4 = static_camera((W, H), F4 + 1)
    plucker4 = jax.block_until_ready(jnp.asarray(ray_condition(
        intrinsics_vector(cams4[1:], (W, H)), get_relative_pose(cams4)[1:],
        H, W), jnp.bfloat16))

    def run_c4():
        out4 = pipe(
            ref_image, pose4, plucker4, clip_image,
            num_inference_steps=STEPS, guidance_scale=GUIDANCE,
            context_frames=24, context_overlap=4, decode_chunk=24,
            cfg_mode="sequential",
            steps_per_launch=int(os.environ.get("HVT_BENCH_SPL", "6")),
            device_output=True,
        )
        checksum = float(jnp.sum(out4.latents.astype(jnp.float32)))
        assert checksum == checksum, "NaN c4 latents checksum"
        return out4

    try:
        run_c4()  # compile
        _phase("c4 compiled; timing 2 runs")
        dts4 = []
        for _ in range(2):
            t0 = time.time()
            run_c4()
            dts4.append(time.time() - t0)
        dt4 = statistics.median(dts4)
        print("# c4 " + json.dumps({
            "metric": "pose2vid_long_frames_per_sec_per_chip_512x768x48f_ddim30_cfg",
            "value": round(F4 / dt4, 4),
            "unit": "frames/sec/chip",
            "spread_s": [round(min(dts4), 1), round(max(dts4), 1)],
        }), file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — c4 is a bonus point; never let it
        # taint the already-printed flagship measurement
        _phase(f"c4 failed (non-fatal): {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
