"""Stage-1 (pose2img) training driver.

Behavioral parity: reference ``train_stage_1.py`` — same config schema
(``configs/train/stage1.yaml``), same trainability (denoising UNet without
motion modules, ReferenceNet except its last up block, PoseGuider,
CameraPoseEncoder), min-SNR v-prediction loss with CFG dropout and noise
offset, per-module checkpoints with keep-last-K rotation, per-step
data/step timing logs with ETA.

TPU-native: one jitted data-parallel train step over a ``data`` mesh (XLA
emits the gradient psum), bf16 activations with fp32 params, threaded
prefetch loader.
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanvid_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from humanvid_tpu.data import (
    DatasetConfig,
    HumanDanceCameraImageDataset,
    Loader,
    OrientationBatchSampler,
)
from humanvid_tpu.ops.attention import set_default_attention_backend

# flash attention (fwd + dq/dkv Pallas bwd kernels) for the long spatial
# sequences: at 512x896 stage-1 shapes the einsum logits alone are ~26 GB;
# tiny/CPU smoke shapes stay below the routing threshold and use einsum
set_default_attention_backend("auto")
from humanvid_tpu.parallel.mesh import make_mesh
from humanvid_tpu.pipelines.system import CamAnimate, CamAnimateConfig
from humanvid_tpu.train import (
    OptimizerConfig,
    TrainConfig,
    TrainState,
    make_optimizer,
    make_train_step,
    stage1_trainable,
    stage2_trainable,
)
from humanvid_tpu.train.checkpoint import load_checkpoint, save_train_checkpoint
from humanvid_tpu.utils.config import load_config
from humanvid_tpu.utils.weights import load_pretrained_params

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
logger = logging.getLogger("train_stage_1")

STAGE = 1


def build_dataset(cfg, stage: int, clip_size: int = 224):
    dcfg = DatasetConfig(
        train_size_large=cfg.data.train_size_large,
        train_size_small=cfg.data.train_size_small,
        sample_margin=cfg.data.get("sample_margin", 30),
        n_sample_frames=cfg.data.get("n_sample_frames", 24),
        sample_rate=cfg.data.get("sample_rate", 4),
        clip_size=clip_size,
    )
    cls = HumanDanceCameraImageDataset
    if stage == 2:
        from humanvid_tpu.data import HumanDanceCameraVideoDataset as cls  # noqa: F811
    return cls(cfg.data.horizontal_meta, cfg.data.vertical_meta, dcfg)


def log_validation(pipe, params, batch, out_dir: str, step: int) -> None:
    """Render the first sample of the current batch through the stage-1
    sampler and save a ref|pose|gen|tgt grid.

    Reference parity: ``train_stage_1.py:142-221`` — the reference's version
    is bit-rotted (missing camera_embedding, wrong result key, SURVEY §4);
    this is the working equivalent, fed from live training data instead of a
    fixed directory.
    """
    import cv2

    from humanvid_tpu.data.datasets import CLIP_MEAN, CLIP_STD

    pipe.params = params
    tgt = np.asarray(batch["tgt"][0], np.float32)
    tgt = tgt[0] if tgt.ndim == 4 else tgt  # stage-2 batches carry frames
    ref = (np.asarray(batch["ref"][0], np.float32) + 1.0) / 2.0
    pose = np.asarray(batch["pose"][0], np.float32)
    pose = pose[0] if pose.ndim == 4 else pose
    plucker = np.asarray(batch["plucker"][0], np.float32)
    plucker = plucker[0] if plucker.ndim == 4 else plucker
    clip_raw = np.clip(
        np.asarray(batch["clip"][0], np.float32) * CLIP_STD + CLIP_MEAN, 0, 1)

    out = pipe(ref, pose, plucker, clip_raw, num_inference_steps=20,
               guidance_scale=3.5, rng=jax.random.PRNGKey(step))
    grid = np.concatenate([ref, pose, out.images[0], (tgt + 1.0) / 2.0], axis=1)
    os.makedirs(out_dir, exist_ok=True)
    cv2.imwrite(os.path.join(out_dir, f"val_{step}.png"),
                cv2.cvtColor((grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


def log_validation_video(pipe, params, batch, out_dir: str, step: int) -> None:
    """Stage-2 validation: render the clip of the current batch through the
    video sampler and save a ref|pose|gen|tgt panel video.

    Reference parity: the reference *intended* stage-appropriate validation
    (``train_stage_2.py`` imports Pose2VideoPipeline) but its validation path
    is bit-rotted and never triggered (SURVEY §4); this is the working
    equivalent — motion modules are exercised end-to-end, not just a single
    pose2img frame.
    """
    from humanvid_tpu.data.datasets import CLIP_MEAN, CLIP_STD
    from humanvid_tpu.data.video_io import save_video

    pipe.params = params
    tgt = (np.asarray(batch["tgt"][0], np.float32) + 1.0) / 2.0  # (f, H, W, 3)
    ref = (np.asarray(batch["ref"][0], np.float32) + 1.0) / 2.0
    pose = np.asarray(batch["pose"][0], np.float32)
    plucker = np.asarray(batch["plucker"][0], np.float32)
    clip_raw = np.clip(
        np.asarray(batch["clip"][0], np.float32) * CLIP_STD + CLIP_MEAN, 0, 1)

    f = pose.shape[0]
    # sequential CFG: the batched 2xF-row UNet pass exceeds single-chip HBM
    # at the full stage-2 op-point while training state is also resident
    out = pipe(ref, pose, plucker, clip_raw, num_inference_steps=8,
               guidance_scale=3.5, context_frames=f, cfg_mode="sequential",
               rng=jax.random.PRNGKey(step))
    gen = out.videos[0]  # (f, H, W, 3)
    panels = np.concatenate(
        [np.broadcast_to(ref[None], gen.shape), pose, gen, tgt], axis=2)
    os.makedirs(out_dir, exist_ok=True)
    save_video(panels.astype(np.float32),
               os.path.join(out_dir, f"val_{step}.mp4"), fps=8.0)


def to_train_batch(batch, stage: int):
    """numpy sample dict -> train-step batch (adds frame axis for stage 1)."""
    if stage == 1:
        return {
            "tgt": batch["tgt"][:, None],      # (b, 1, H, W, 3)
            "ref": batch["ref"],
            "clip": batch["clip"],
            "pose": batch["pose"][:, None],
            "plucker": batch["plucker"][:, None],
        }
    return batch


def run_training(stage: int, argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--profile_dir", default=None,
                   help="capture an XLA device trace of steps 10-12 here")
    args = p.parse_args(argv)
    cfg = load_config(args.config)

    if cfg.get("seed") is not None:
        np.random.seed(cfg.seed)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    use_motion = stage == 2
    import dataclasses as _dc
    grad_ckpt = bool(cfg.solver.get("enable_gradient_checkpointing", False))
    if cfg.get("model") == "tiny":  # smoke tests / CI
        from humanvid_tpu.pipelines.system import tiny_config
        base = tiny_config(motion_max_len=cfg.get("n_sample_frames", 8))
    else:
        base = CamAnimateConfig()
    # FF token chunking (layers.GEGLUFeedForward): on by default whenever
    # gradient checkpointing is on — it is a pure training-memory lever
    ff_chunk = int(cfg.solver.get("ff_chunk_tokens", 1024 if grad_ckpt else 0))
    system_cfg = _dc.replace(
        base,
        denoising_unet=_dc.replace(
            base.denoising_unet if use_motion else base.reference_unet,
            gradient_checkpointing=grad_ckpt,
            ff_chunk_tokens=ff_chunk,
        ),
        # stage 1 trains the ReferenceNet too — same memory lever applies
        reference_unet=_dc.replace(
            base.reference_unet,
            gradient_checkpointing=grad_ckpt,
            ff_chunk_tokens=ff_chunk,
        ),
        camera_encoder=_dc.replace(
            base.camera_encoder,
            position_encoding_max_len=(16 if stage == 1 else 24)
            if cfg.get("model") != "tiny" else base.camera_encoder.position_encoding_max_len,
            ff_chunk_tokens=ff_chunk,
        ),
    )
    # fp32 master params with (by default) bf16 activations
    system = CamAnimate(system_cfg, dtype=dtype, param_dtype=jnp.float32)

    params = load_pretrained_params(system, cfg)
    if cfg.get("resume_from_checkpoint"):
        step0 = int(cfg.get("resume_step", 0))
        for name in ("reference_unet", "denoising_unet", "pose_guider", "camera_encoder"):
            path = os.path.join(cfg.resume_from_checkpoint, f"{name}-{step0}.msgpack")
            if os.path.exists(path):
                params[name] = load_checkpoint(path, params[name])
                logger.info("resumed %s from %s", name, path)
        # stage-2 checkpoints store the video UNet as a motion-only subtree
        # (reference train_stage_2.py:421-431); merge it back on resume —
        # without this a stage-2 resume silently reset the motion modules
        mm_path = os.path.join(
            cfg.resume_from_checkpoint, f"motion_module-{step0}.msgpack")
        if os.path.exists(mm_path):
            from humanvid_tpu.train.checkpoint import merge_motion_modules
            from humanvid_tpu.utils.weights import load_msgpack_tree
            params["denoising_unet"] = merge_motion_modules(
                params["denoising_unet"], load_msgpack_tree(mm_path))
            logger.info("resumed motion modules from %s", mm_path)
    else:
        step0 = 0

    frozen = {k: params[k] for k in ("vae_encoder", "vae_decoder", "clip")}
    trainable = {k: params[k] for k in
                 ("reference_unet", "denoising_unet", "pose_guider", "camera_encoder")}
    opt_cfg = OptimizerConfig(
        learning_rate=float(cfg.solver.learning_rate),
        beta1=cfg.solver.adam_beta1,
        beta2=cfg.solver.adam_beta2,
        weight_decay=float(cfg.solver.adam_weight_decay),
        eps=float(cfg.solver.adam_epsilon),
        max_grad_norm=cfg.solver.max_grad_norm,
        warmup_steps=cfg.solver.lr_warmup_steps,
        gradient_accumulation_steps=cfg.solver.get(
            "gradient_accumulation_steps", 1),
        mu_dtype=cfg.solver.get("adam_mu_dtype", None),
    )
    predicate = stage1_trainable if stage == 1 else stage2_trainable
    # resume restores the step counter too: the LR warmup schedule, the
    # per-step rng fold-in, and MultiSteps accumulation all key off
    # state.step — restarting it at 0 would replay warmup and the exact
    # noise/timestep sequence already consumed before the interruption
    # (the reference resumes global_step only; this is the superset)
    if dtype == jnp.bfloat16:
        # stage-frozen leaves keep no fp32 master (see cast_untrainable) —
        # without this the full-scale stage-2 step exceeds single-chip HBM
        from humanvid_tpu.train import cast_untrainable
        trainable = cast_untrainable(trainable, predicate)
    tx = make_optimizer(trainable, predicate, opt_cfg)
    state = TrainState.create(trainable, frozen, tx)
    if step0:
        state = state.replace(step=jnp.asarray(step0, jnp.int32))
        opt_path = os.path.join(
            cfg.resume_from_checkpoint, f"opt_state-{step0}.msgpack")
        if os.path.exists(opt_path):
            state = state.replace(
                opt_state=load_checkpoint(opt_path, state.opt_state))
            logger.info("resumed optimizer state from %s", opt_path)

    # TRAIN schedule: the reference overwrites beta_schedule to scaled_linear
    # for the training scheduler regardless of the inference yaml's "linear"
    # (train_stage_1.py:277, train_stage_2.py:159)
    sched = system.make_schedule(beta_schedule="scaled_linear")
    tcfg = TrainConfig(
        uncond_ratio=cfg.get("uncond_ratio", 0.1),
        noise_offset=cfg.get("noise_offset", 0.05),
        snr_gamma=cfg.get("snr_gamma", 5.0),
    )
    # data-parallel mesh: the batch axis must divide evenly across devices;
    # shrink to the largest compatible device count (with a warning) instead
    # of failing (e.g. smoke tests with bs=2 on an 8-device virtual CPU mesh)
    import math
    batch_size = cfg.data.train_bs
    n_dev = len(jax.devices())
    n_mesh = math.gcd(batch_size, n_dev)
    if n_mesh < n_dev:
        logger.warning(
            "train_bs=%d not divisible by %d devices; using a %d-device mesh",
            batch_size, n_dev, n_mesh)
    # multi-slice: solver.dcn_slices > 1 builds a (replica=DCN, data=ICI)
    # hierarchical mesh; the batch shards over both axes, ZeRO-1 stays on
    # the intra-slice data axis so its all-gather rides ICI
    n_slices = int(cfg.solver.get("dcn_slices", 1))
    if n_slices > 1:
        if n_mesh % n_slices:
            raise ValueError(
                f"dcn_slices={n_slices} does not divide the {n_mesh}-device mesh")
        from humanvid_tpu.parallel.mesh import make_hierarchical_mesh
        mesh = make_hierarchical_mesh(n_slices, n_mesh // n_slices)
        batch_spec = P(("replica", "data"))
    else:
        mesh = make_mesh(n_mesh)
        batch_spec = P("data")
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, batch_spec)
    if cfg.solver.get("shard_optimizer_states", False) and n_mesh > 1:
        # ZeRO-1: Adam moments sharded over the data axis; XLA all-gathers
        # the parameter updates. Full-scale stage 2 does not fit one chip's
        # HBM with replicated moments (PERF.md).
        from humanvid_tpu.parallel.mesh import zero1_opt_sharding
        opt_sh = zero1_opt_sharding(state.opt_state, mesh)
        state_sh = state.replace(
            step=repl,
            params=jax.tree.map(lambda _: repl, state.params),
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=opt_sh,
        )
    else:
        state_sh = jax.tree.map(lambda _: repl, state)
    train_step = jax.jit(
        make_train_step(system, sched, tcfg, trainable_predicate=predicate),
        in_shardings=(state_sh, shard, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    state = jax.device_put(state, state_sh)

    dataset = build_dataset(cfg, stage, clip_size=system.config.clip.image_size)
    sampler = OrientationBatchSampler(
        dataset.num_horizontal, len(dataset) - dataset.num_horizontal,
        batch_size, seed=cfg.get("seed", 0),
    )
    save_dir = os.path.join(cfg.output_dir, cfg.exp_name)
    os.makedirs(save_dir, exist_ok=True)

    # production checkpoint backend: async, sharding-preserving orbax writes
    # (scales to multi-host ZeRO states) vs the default reference-compatible
    # per-module msgpack + .pth export
    orbax_ckpt = None
    if cfg.solver.get("checkpoint_backend", "msgpack") == "orbax":
        from humanvid_tpu.train.checkpoint import OrbaxCheckpointer
        orbax_ckpt = OrbaxCheckpointer(os.path.join(save_dir, "orbax"),
                                       keep=3 if stage == 1 else 10)
        if cfg.get("resume_from_checkpoint"):
            src = (OrbaxCheckpointer(
                os.path.join(cfg.resume_from_checkpoint, "orbax"))
                if os.path.abspath(cfg.resume_from_checkpoint)
                != os.path.abspath(save_dir) else orbax_ckpt)
            if src.latest_step() is None:
                # e.g. migrating an msgpack-format checkpoint dir to the
                # orbax backend: whatever the msgpack resume above loaded
                # stands; just warn and continue
                logger.warning("no orbax checkpoint under %s; resume used "
                               "msgpack files only", cfg.resume_from_checkpoint)
            else:
                step0 = step0 or src.latest_step()
                restored = src.restore(step0, {
                    "params": state.params, "opt_state": state.opt_state,
                })
                state = state.replace(
                    params=restored["params"], opt_state=restored["opt_state"],
                    step=jnp.asarray(step0, jnp.int32))
                logger.info("orbax resume from step %d", step0)

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    global_step = step0
    max_steps = cfg.solver.max_train_steps
    from humanvid_tpu.utils.profiling import StepTimers
    from humanvid_tpu.utils.tracker import Tracker
    timers = StepTimers(max_steps, log_every=20, log=logger)
    tracker = Tracker(os.path.join(save_dir, "run"), config=dict(cfg))
    val_steps = cfg.get_path("val.validation_steps", 0) or 0
    val_pipe = None
    profiling = False
    prev_aux = None  # delayed-fetch loss pipeline (see the step loop)
    # Exact-resume data order: the sampler's shuffle is a pure function of
    # (seed, epoch) and every epoch yields len(sampler) batches, so the
    # epoch/offset at interruption is derivable from step0 alone — fast-forward
    # to it instead of replaying already-consumed batches from epoch 0
    # (ADVICE r1; the reference restarts its dataloader on resume).
    steps_per_epoch = len(sampler)
    epoch = step0 // steps_per_epoch
    resume_skip = step0 % steps_per_epoch
    if step0:
        logger.info("resume fast-forward: epoch %d, skipping %d batches",
                    epoch, resume_skip)

    while global_step < max_steps:
        sampler.set_epoch(epoch)
        batches = list(sampler)[resume_skip:]
        resume_skip = 0
        loader = Loader(
            dataset, batches, num_workers=cfg.data.get("num_workers", 4),
            device_put=lambda b: {k: jax.device_put(v, shard) for k, v in b.items()},
        )
        t_data = time.time()
        for batch in loader:
            batch = to_train_batch(batch, stage)
            timers.acc["data"] += time.time() - t_data
            if args.profile_dir and global_step - step0 == 10 and not profiling:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            with timers.segment("step"):
                state, aux = train_step(state, batch, rng)
                # one-step-delayed fetch: read step N-1's loss while step N
                # runs on device — the ~35 ms scalar-fetch RPC of this
                # backend (PERF.md) overlaps compute instead of serializing
                # every step; the fetch still backpressures dispatch to at
                # most one step ahead
                loss = float(prev_aux["loss"]) if prev_aux is not None else float("nan")
            if profiling and global_step - step0 >= 12:
                jax.profiler.stop_trace()
                profiling = False
                logger.info("device trace written to %s", args.profile_dir)
            global_step += 1
            # loss is one step delayed (see above); label it as such so the
            # progress line and tracker.log agree on which step it belongs to
            timers.step(global_step, loss_prev_step=loss)
            if global_step % 20 == 0 and prev_aux is not None:
                tracker.log(global_step - 1, loss=loss,
                            grad_norm=float(prev_aux["grad_norm"]))
            prev_aux = aux
            if val_steps and global_step % val_steps == 0:
                from humanvid_tpu.pipelines import (
                    Pose2ImagePipeline, Pose2VideoPipeline)
                # read from the live state: the jitted step donates its input
                # state, so earlier host-side param dicts point at deleted
                # device buffers
                live = {**state.params, **state.frozen}
                val_dir = os.path.join(save_dir, "validation")
                if stage == 2:
                    if val_pipe is None:
                        val_pipe = Pose2VideoPipeline(system, None)
                    log_validation_video(val_pipe, live, batch, val_dir,
                                         global_step)
                else:
                    if val_pipe is None:
                        val_pipe = Pose2ImagePipeline(system, None)
                    log_validation(val_pipe, live, batch, val_dir, global_step)
                logger.info("validation render at step %d", global_step)
            if global_step % cfg.get("checkpointing_steps", 5000) == 0:
                if orbax_ckpt is not None:
                    orbax_ckpt.save(global_step, {
                        "params": state.params, "opt_state": state.opt_state})
                else:
                    save_train_checkpoint(
                        save_dir, jax.device_get(state.params), global_step,
                        opt_state=jax.device_get(state.opt_state),
                        motion_only=(stage == 2),
                        total_limit=3 if stage == 1 else 10,
                    )
                logger.info("checkpointed at step %d", global_step)
            if global_step >= max_steps:
                break
            t_data = time.time()
        epoch += 1

    if orbax_ckpt is not None:
        orbax_ckpt.save(global_step, {
            "params": state.params, "opt_state": state.opt_state})
        orbax_ckpt.close()
    else:
        save_train_checkpoint(
            save_dir, jax.device_get(state.params), global_step,
            opt_state=jax.device_get(state.opt_state),
            motion_only=(stage == 2), total_limit=None,
        )
    if prev_aux is not None:
        tracker.log(global_step, loss=float(prev_aux["loss"]),
                    grad_norm=float(prev_aux["grad_norm"]))
    tracker.close()
    logger.info("training done at step %d", global_step)


if __name__ == "__main__":
    run_training(STAGE)
