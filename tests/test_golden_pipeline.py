"""End-to-end sampling-TRAJECTORY golden: the reference Pose2VideoPipeline
(long path) executed verbatim under torch vs our jitted pipeline, shared
random weights, shared initial noise (VERDICT r2 "what's missing" #4).

One test covers the glue every piece-wise golden misses simultaneously:
ReferenceNet forward at step 0 (``pipeline_pose2vid_long.py:469-480``),
window slicing + overlap scatter-add averaging (``:514-556``), CFG split
AFTER averaging (``:554-559``), DDIM step sequencing (``:561-563``) and
per-frame VAE decode (``:114-127``) — and gives our DDIM implementation its
first two-implementation cross-check (the stub twin mirrors diffusers v0.24
float32 table math, not our float64-then-cast tables).

Geometry is chosen so every PIL/processor resize is an identity (H = W = 224
= the CLIP processor size; pose/ref images pre-sized), isolating the
trajectory math from resampling-kernel differences, which are covered by
``test_golden_metrics.py``/dataset tests.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")

from PIL import Image  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusers_stub import install_stub  # noqa: E402

install_stub()

from test_golden_torch import (  # noqa: E402
    TINY, TINY_VIDEO, _convert, _randomize, _torch_denoising_unet,
    _torch_reference_unet)
from test_golden_vae import CH as VAE_CH  # noqa: E402
from test_golden_vae import GROUPS as VAE_GROUPS  # noqa: E402
from test_golden_vae import LATENT as VAE_LATENT  # noqa: E402
from test_golden_vae import TAutoencoderKL  # noqa: E402

from humanvid_tpu.models.configs import (CameraEncoderConfig,  # noqa: E402
                                         CLIPVisionConfig, PoseGuiderConfig,
                                         VAEConfig)
from humanvid_tpu.utils.convert import convert_state_dict  # noqa: E402

H = W = 224  # = CLIP processor size -> every preprocess resize is identity
F_CLIP = 6   # video frames
CTX_FRAMES, CTX_OVERLAP = 4, 2
STEPS = 3
CFG = 3.5


class _TorchVAEForPipeline(torch.nn.Module):
    """diffusers AutoencoderKL facade over the golden VAE twin: exactly the
    surface pipeline_pose2vid_long.py touches (encode().latent_dist.mean,
    decode().sample, config.block_out_channels, dtype/device)."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        from diffusers_stub import _AttrDict

        self.config = _AttrDict(block_out_channels=list(VAE_CH))

    @property
    def dtype(self):
        return torch.float32

    @property
    def device(self):
        return torch.device("cpu")

    def encode(self, x):
        from diffusers_stub import _AttrDict

        moments = self.inner.quant_conv(self.inner.encoder(x))
        mean, _ = torch.chunk(moments, 2, dim=1)
        return _AttrDict(latent_dist=_AttrDict(mean=mean))

    def decode(self, z):
        from diffusers_stub import _AttrDict

        return _AttrDict(sample=self.inner.decoder(self.inner.post_quant_conv(z)))


def _tiny_clip_torch():
    import transformers

    cfg = transformers.CLIPVisionConfig(
        image_size=224, patch_size=32, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, projection_dim=32,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(cfg)
    model.eval()
    return model


def _our_system(max_len):
    import dataclasses

    from humanvid_tpu.pipelines.system import CamAnimate, tiny_config

    cfg = tiny_config(motion_max_len=max_len)
    cfg = dataclasses.replace(
        cfg,
        vae=VAEConfig(block_out_channels=VAE_CH, norm_num_groups=VAE_GROUPS,
                      latent_channels=VAE_LATENT),
        clip=CLIPVisionConfig(
            image_size=224, patch_size=32, hidden_size=16, num_layers=2,
            num_heads=2, intermediate_size=32, projection_dim=32,
        ),
    )
    return CamAnimate(cfg)


def test_golden_pose2vid_long_trajectory():
    import src.pipelines.pipeline_pose2vid_long as ref_mod
    from src.cameractrl.pose_adaptor import CameraPoseEncoder as TorchCamEnc
    from src.models.pose_guider import PoseGuider as TorchPoseGuider

    import diffusers as stub_diffusers

    # --- shared torch models (randomized like the per-module goldens) ---
    ref2d = _torch_reference_unet()
    den3d = _torch_denoising_unet()
    pose_g = _randomize(
        TorchPoseGuider(32, block_out_channels=(4, 8, 12, 16)), 0)
    cam_enc = _randomize(TorchCamEnc(
        downscale_factor=8, channels=[32], nums_rb=1, cin=384, ksize=1,
        sk=True, use_conv=False, compression_factor=1,
        temporal_attention_nhead=4, attention_block_types=("Temporal_Self",),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=8), 1)
    vae_inner = _randomize(TAutoencoderKL(), 11)
    clip_t = _tiny_clip_torch()

    # inference_v2.yaml:24-33 scheduler
    sched_t = stub_diffusers.DDIMScheduler(
        num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
        beta_schedule="linear", clip_sample=False, steps_offset=1,
        prediction_type="v_prediction", rescale_betas_zero_snr=True,
        timestep_spacing="trailing")

    pipe_t = ref_mod.Pose2VideoPipeline(
        vae=_TorchVAEForPipeline(vae_inner), image_encoder=clip_t,
        reference_unet=ref2d, denoising_unet=den3d, pose_guider=pose_g,
        camera_pose_encoder=cam_enc, scheduler=sched_t)

    # --- shared inputs (identity-resize geometry) ---
    rng = np.random.default_rng(0)
    ref_u8 = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    pose_u8 = rng.integers(0, 256, (F_CLIP, H, W, 3), dtype=np.uint8)
    plucker = rng.normal(size=(F_CLIP, H, W, 6)).astype(np.float32)
    noise = rng.normal(
        size=(1, 4, F_CLIP, H // 8, W // 8)).astype(np.float32)

    ref_mod.randn_tensor = (  # zero-egress determinism: fixed initial noise
        lambda shape, **k: torch.from_numpy(noise))

    ref_pil = Image.fromarray(ref_u8)
    pose_pils = [Image.fromarray(p) for p in pose_u8]
    cam_t = torch.from_numpy(
        np.transpose(plucker, (3, 0, 1, 2)).copy())[None]  # (1, 6, f, H, W)

    with torch.no_grad():
        theirs = pipe_t(
            ref_pil, pose_pils, cam_t, W, H, F_CLIP,
            num_inference_steps=STEPS, guidance_scale=CFG,
            context_frames=CTX_FRAMES, context_stride=1,
            context_overlap=CTX_OVERLAP, context_batch_size=1,
            interpolation_factor=1,
        ).videos  # (1, 3, f, H, W) float numpy in [0, 1]
    theirs = np.transpose(np.asarray(theirs), (0, 2, 3, 4, 1))  # (1,f,H,W,3)

    # --- ours: same weights via the converters ---
    system = _our_system(max_len=8)
    params = system.init_params(jax.random.PRNGKey(0), H, W, frames=2)

    params["reference_unet"] = _convert(
        params["reference_unet"], ref2d, "unet",
        allow_missing=("conv_norm_out.", "conv_out."))
    params["denoising_unet"] = _convert(
        params["denoising_unet"], den3d, "unet", allow_unused=(".pe",))
    params["pose_guider"] = _convert(params["pose_guider"], pose_g,
                                     "pose_guider")
    params["camera_encoder"] = _convert(params["camera_encoder"], cam_enc,
                                        "camera_encoder",
                                        allow_unused=(".pe",))
    vae_sd = {k: v.numpy() for k, v in vae_inner.state_dict().items()}
    params["vae_encoder"], _, _ = convert_state_dict(
        params["vae_encoder"], vae_sd, "vae_encoder", strict=True)
    params["vae_decoder"], _, _ = convert_state_dict(
        params["vae_decoder"], vae_sd, "vae_decoder", strict=True)
    clip_sd = {k: v.detach().numpy() for k, v in clip_t.state_dict().items()}
    params["clip"], missing, _ = convert_state_dict(
        params["clip"], clip_sd, "clip", strict=False)
    assert not missing, f"clip conversion missing {missing[:4]}"

    from humanvid_tpu.pipelines import Pose2VideoPipeline

    pipe = Pose2VideoPipeline(system, params)
    ours = pipe(
        ref_image=np.asarray(ref_u8, np.float32) / 255.0,
        pose_video=np.asarray(pose_u8, np.float32) / 255.0,
        plucker=plucker,
        clip_image=np.asarray(ref_u8, np.float32) / 255.0,  # identity resize
        num_inference_steps=STEPS, guidance_scale=CFG,
        context_frames=CTX_FRAMES, context_stride=1,
        context_overlap=CTX_OVERLAP,
        init_latents=np.transpose(noise[0], (1, 2, 3, 0)),  # (f, h8, w8, 4)
    )

    got = np.asarray(ours.videos)  # (1, f, H, W, 3)
    assert got.shape == theirs.shape == (1, F_CLIP, H, W, 3)
    assert np.isfinite(got).all() and np.isfinite(theirs).all()
    # decoded [0,1] videos after 3 full denoise steps: fp32-accumulated
    # trajectory divergence stays well under a pixel quantum
    np.testing.assert_allclose(got, theirs, atol=2e-3)
