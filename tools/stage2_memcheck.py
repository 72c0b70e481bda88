"""Compile (AOT, no execution) the FULL-SCALE stage-2 training step for one
chip and report XLA's memory analysis.

Round-1 finding (PERF.md): at the reference op-point (bs 1, 24 frames,
896x512, grad-ckpt on, bf16 frozen masters) XLA needed 18.5 GB vs 15.75 GB
HBM, dominated by the XLA temporal-attention path's 5.3x-padded fp32 logits
activations.  The Pallas temporal kernel stores only q/k/v (one-pass
recompute backward), so this tool is the pass/fail gate for "stage-2 fits a
single chip".

Usage:  python tools/stage2_memcheck.py [H W F] [exec]   (defaults 896 512 24)
        python tools/stage2_memcheck.py stage1 [H W] [exec] (defaults 512 896)

With ``exec``, the tool additionally materializes a real TrainState on the
chip and runs 1 warmup + HVT_EXEC_STEPS (default 3) timed train steps — the
measured step time is the proof that the AOT "fits" verdict survives real
allocator behavior (fragmentation, donation) on the device.

``stage1`` mirrors the reference stage-1 op-point (bs 8 images at one
512x896 orientation bucket, NO gradient checkpointing — reference
``configs/train/stage1.yaml:1-36``, gradient_checkpointing: False): no
motion module, ReferenceNet+UNet+PoseGuider+camera-encoder trainable
(``stage1_trainable``), fp32 masters + bf16 activations.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    argv = [a for a in sys.argv[1:]]
    do_exec = "exec" in argv
    if do_exec:
        argv.remove("exec")
    stage = 1 if "stage1" in argv else 2
    if stage == 1:
        argv.remove("stage1")
        H = int(argv[0]) if len(argv) > 0 else 512
        W = int(argv[1]) if len(argv) > 1 else 896
        # reference global batch is 8 (configs/train/stage1.yaml); the
        # per-chip slice under the production 8-way data-parallel mesh is
        # bs 1 — HVT_STAGE1_BS probes any point
        B, F = int(os.environ.get("HVT_STAGE1_BS", "8")), 1
    else:
        H = int(argv[0]) if len(argv) > 0 else 896
        W = int(argv[1]) if len(argv) > 1 else 512
        F = int(argv[2]) if len(argv) > 2 else 24
        B = 1

    from humanvid_tpu.ops.attention import set_default_attention_backend
    from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
    from humanvid_tpu.train import (
        OptimizerConfig, TrainConfig, TrainState, cast_untrainable,
        make_optimizer, make_train_step, stage1_trainable, stage2_trainable)

    set_default_attention_backend("auto")

    import dataclasses

    cfg = CamAnimateConfig()
    if stage == 2:
        cfg = dataclasses.replace(
            cfg,
            denoising_unet=dataclasses.replace(
                cfg.denoising_unet, gradient_checkpointing=True,
                ff_chunk_tokens=1024),
            camera_encoder=dataclasses.replace(
                cfg.camera_encoder, ff_chunk_tokens=1024),
        )
    else:
        # stage 1: image-level UNet (no motion module), NO grad ckpt —
        # mirrors scripts/train_stage_1.py stage-1 construction and the
        # reference's gradient_checkpointing: False
        cfg = dataclasses.replace(
            cfg,
            denoising_unet=cfg.reference_unet,
            camera_encoder=dataclasses.replace(
                cfg.camera_encoder, position_encoding_max_len=16),
        )
    predicate = stage1_trainable if stage == 1 else stage2_trainable
    # stage 1 keeps fp32 masters for everything trainable (script default)
    system = CamAnimate(cfg, dtype=jnp.bfloat16,
                        **({"param_dtype": jnp.float32} if stage == 1 else {}))
    all_params = system.init_params(jax.random.PRNGKey(0), 256, 192, frames=2,
                                    abstract=True)
    frozen = {k: all_params[k] for k in ("vae_encoder", "vae_decoder", "clip")}
    trainable = {
        k: all_params[k]
        for k in ("reference_unet", "denoising_unet", "pose_guider",
                  "camera_encoder")
    }
    # mirror scripts/train_stage_1.py bf16 setup: no fp32 masters for
    # stage-frozen leaves, bf16 Adam first moment
    trainable = cast_untrainable(trainable, predicate)
    tx = make_optimizer(trainable, predicate,
                        OptimizerConfig(mu_dtype="bfloat16"))
    state = jax.eval_shape(
        lambda t, f: TrainState.create(t, f, tx), trainable, frozen)

    sched = system.make_schedule(beta_schedule="scaled_linear")
    step = make_train_step(system, sched, TrainConfig(),
                           trainable_predicate=predicate)

    sz = system.config.clip.image_size
    batch = {
        "tgt": jax.ShapeDtypeStruct((B, F, H, W, 3), jnp.float32),
        "ref": jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
        "clip": jax.ShapeDtypeStruct((B, sz, sz, 3), jnp.float32),
        "pose": jax.ShapeDtypeStruct((B, F, H, W, 3), jnp.float32),
        "plucker": jax.ShapeDtypeStruct((B, F, H, W, 6), jnp.float32),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    lowered = jax.jit(step, donate_argnums=(0,)).lower(state, batch, rng)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    rec = {
        "op_point": (f"{H}x{W}x{F}f bs1 grad-ckpt bf16-masters" if stage == 2
                     else f"stage1 {H}x{W} bs{B} no-ckpt fp32-masters"),
        "argument_gb": round(ma.argument_size_in_bytes / gb, 3),
        "output_gb": round(ma.output_size_in_bytes / gb, 3),
        "temp_gb": round(ma.temp_size_in_bytes / gb, 3),
        "peak_gb": round((ma.argument_size_in_bytes + ma.temp_size_in_bytes)
                         / gb, 3),
        "alias_gb": round(ma.alias_size_in_bytes / gb, 3),
        "hbm_gb": 15.75,
    }
    rec["fits"] = rec["peak_gb"] - rec["alias_gb"] <= rec["hbm_gb"]
    print(json.dumps(rec), flush=True)

    if not do_exec:
        return

    # --- real-step execution: prove the AOT verdict on the live allocator ---
    import time

    from humanvid_tpu.utils.transfer import packed_device_put

    rng_np = np.random.default_rng(0)
    host_batch = {
        "tgt": rng_np.uniform(-1, 1, (B, F, H, W, 3)).astype(np.float32),
        "ref": rng_np.uniform(-1, 1, (B, H, W, 3)).astype(np.float32),
        "clip": rng_np.uniform(-1, 1, (B, sz, sz, 3)).astype(np.float32),
        "pose": rng_np.uniform(0, 1, (B, F, H, W, 3)).astype(np.float32),
        "plucker": rng_np.uniform(-1, 1, (B, F, H, W, 6)).astype(np.float32),
    }
    from humanvid_tpu.utils.transfer import device_put_zeros

    # params as on-device zeros (no host->device payload — throughput and
    # allocator behavior are weight-independent); only the small real batch
    # rides the tunnel
    dev = {"t": jax.block_until_ready(device_put_zeros(trainable)),
           "f": jax.block_until_ready(device_put_zeros(frozen)),
           "b": jax.block_until_ready(packed_device_put(host_batch))}
    opt_state = jax.block_until_ready(jax.jit(tx.init)(dev["t"]))
    from humanvid_tpu.train import TrainState as TS
    live = TS(step=jnp.zeros((), jnp.int32), params=dev["t"],
              frozen=dev["f"], opt_state=opt_state, tx=tx)
    key = jax.device_put(jax.random.PRNGKey(0))

    n_steps = int(os.environ.get("HVT_EXEC_STEPS", "3"))
    profile_dir = os.environ.get("HVT_EXEC_PROFILE")  # trace timed steps
    dts, losses = [], []
    for i in range(n_steps + 1):  # step 0 = warmup/first launch
        if profile_dir and i == 1:
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        # fold the step index into the key so timed steps sample different
        # timesteps/noise — the median reflects timestep-dependent cost
        live, aux = compiled(live, dev["b"], jax.random.fold_in(key, i))
        loss = float(aux["loss"])  # forced fetch: drains the device queue
        dts.append(time.time() - t0)
        losses.append(loss)
    if profile_dir:
        jax.profiler.stop_trace()
        # reuse the trace tool's device-op budget for a train-step breakdown
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "trace_budget",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "trace_budget.py"))
        tb = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tb)
        budget, top, total, excluded = tb._device_op_budget(profile_dir)
        per_step = {k: round(v / n_steps, 4) for k, v in
                    sorted(budget.items(), key=lambda kv: -kv[1])}
        print(json.dumps({"train_step_budget_s": per_step,
                          "device_total_s": round(total / n_steps, 4),
                          "excluded_span_s": round(excluded / n_steps, 4)}),
              flush=True)
        for name, sec in top[:15]:
            print(f"#   {sec / n_steps:8.4f}s  {name[:110]}",
                  file=sys.stderr, flush=True)
    assert all(np.isfinite(losses)), losses
    import statistics
    print(json.dumps({
        "metric": "stage2_train_step_seconds",
        "value": round(statistics.median(dts[1:]), 3),
        "unit": "s/step",
        "spread_s": [round(min(dts[1:]), 2), round(max(dts[1:]), 2)],
        "loss0": round(losses[0], 4),
    }), flush=True)


if __name__ == "__main__":
    main()
