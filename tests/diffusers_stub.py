"""Minimal torch ``diffusers`` stand-in so the REFERENCE's vendored model code
(`/root/reference/src/models/*`, `/root/reference/src/cameractrl/*`) can be
executed under the installed CPU torch without the diffusers package.

Purpose: activation-level golden parity (VERDICT r1 "what's missing" #1). The
reference vendors ~5.7k LoC of UNet/attention/motion wiring but imports leaf
primitives (Attention, FeedForward, ResnetBlock2D, Timesteps, ...) from
diffusers, which is not installed here (no network). This module implements
exactly those leaves — standard, publicly-documented Stable Diffusion
primitives whose parameter naming is pinned by the SD1.5 checkpoint format —
and installs them as ``sys.modules['diffusers*']`` so the reference's own
block topology, bank plumbing (mutual_self_attention.py), motion modules and
camera encoder run unmodified and can be compared against our JAX port.

Only code paths reachable from the shipped HumanVid configs are implemented;
everything else raises ``NotImplementedError`` loudly.

Leaf semantics follow diffusers v0.24 (the version pinned by the reference's
environment.yml): classic AttnProcessor (fp32 softmax via upcast flags off),
GEGLU FeedForward (net.0.proj / net.2 naming), ResnetBlock2D
(norm1/conv1/time_emb_proj/norm2/conv2/conv_shortcut), Downsample2D stride-2
conv named ``conv``, Upsample2D nearest-2x + conv, sinusoidal Timesteps with
flip_sin_to_cos, TimestepEmbedding linear_1/linear_2.
"""

import inspect
import logging as _pylogging
import math
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# configuration_utils
# ---------------------------------------------------------------------------

class _AttrDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


def register_to_config(init):
    def inner(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items()
               if k != "self" and not k.startswith("_")}
        self._internal_dict = _AttrDict(cfg)
        init(self, *args, **kwargs)

    return inner


class ConfigMixin:
    @property
    def config(self):
        return getattr(self, "_internal_dict", _AttrDict())


class FrozenDict(_AttrDict):
    pass


# ---------------------------------------------------------------------------
# models.modeling_utils / loaders / utils
# ---------------------------------------------------------------------------

class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    @property
    def dtype(self):
        return next(self.parameters()).dtype

    @property
    def device(self):
        return next(self.parameters()).device

    def __getattr__(self, name):
        # diffusers ModelMixin/ConfigMixin legacy fallback: attributes of the
        # registered config are readable on the model (e.g.
        # `denoising_unet.in_channels`, pipeline_pose2vid_long.py:408)
        try:
            return super().__getattr__(name)
        except AttributeError:
            d = self.__dict__.get("_internal_dict")
            if d is not None and name in d:
                return d[name]
            raise


class UNet2DConditionLoadersMixin:
    pass


class BaseOutput:
    """dataclass base: attribute + index access like diffusers BaseOutput."""

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.__dict__.values())[k]
        return self.__dict__[k]


class _Logging:
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers_stub")


def deprecate(*args, **kwargs):
    return None


def is_torch_version(op, version):
    # only used to pick gradient-checkpointing kwargs; eval-mode forwards
    # never reach those branches, and newer-API kwargs are fine anyway
    return True


def is_xformers_available():
    return False


def apply_freeu(*args, **kwargs):
    raise NotImplementedError("freeu is not used by any shipped HumanVid config")


def scale_lora_layers(*a, **k):
    return None


def unscale_lora_layers(*a, **k):
    return None


USE_PEFT_BACKEND = False
SAFETENSORS_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
WEIGHTS_NAME = "diffusion_pytorch_model.bin"


# ---------------------------------------------------------------------------
# models.activations / embeddings
# ---------------------------------------------------------------------------

def get_activation(name):
    return {"silu": nn.SiLU(), "swish": nn.SiLU(), "mish": nn.Mish(),
            "gelu": nn.GELU(), "relu": nn.ReLU()}[name]


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        half_dim = self.num_channels // 2
        exponent = -math.log(10000) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device)
        exponent = exponent / (half_dim - self.downscale_freq_shift)
        emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
        return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None,
                 post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        assert cond_proj_dim is None and post_act_fn is None
        self.act = get_activation(act_fn)
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample, condition=None):
        assert condition is None
        return self.linear_2(self.act(self.linear_1(sample)))


class _Unused(nn.Module):
    """Placeholder for diffusers symbols no shipped config instantiates."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            f"{type(self).__name__} is not used by any shipped HumanVid config")


class GaussianFourierProjection(_Unused):
    pass


class ImageHintTimeEmbedding(_Unused):
    pass


class ImageProjection(_Unused):
    pass


class ImageTimeEmbedding(_Unused):
    pass


class PositionNet(_Unused):
    pass


class TextImageProjection(_Unused):
    pass


class TextImageTimeEmbedding(_Unused):
    pass


class TextTimeEmbedding(_Unused):
    pass


class CaptionProjection(_Unused):
    pass


class SinusoidalPositionalEmbedding(_Unused):
    pass


class AdaLayerNorm(_Unused):
    pass


class AdaLayerNormZero(_Unused):
    pass


class AdaLayerNormSingle(_Unused):
    pass


class AdaGroupNorm(_Unused):
    pass


class SpatialNorm(_Unused):
    pass


class DualTransformer2DModel(_Unused):
    pass


class LoRALinearLayer(_Unused):
    pass


# lora "compatible" layers are plain layers when PEFT/lora scale is unused;
# forward(x, scale) must tolerate the extra arg some callers pass
class LoRACompatibleConv(nn.Conv2d):
    def forward(self, x, scale=1.0):
        return super().forward(x)


class LoRACompatibleLinear(nn.Linear):
    def forward(self, x, scale=1.0):
        return super().forward(x)


# ---------------------------------------------------------------------------
# models.resnet (2D primitives used by the vendored unet_2d_blocks)
# ---------------------------------------------------------------------------

class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        assert use_conv and not use_conv_transpose
        self.channels = channels
        self.out_channels = out_channels or channels
        self.conv = LoRACompatibleConv(self.channels, self.out_channels, 3, padding=1)

    def forward(self, hidden_states, output_size=None, scale=1.0):
        assert output_size is None
        hidden_states = F.interpolate(hidden_states, scale_factor=2.0, mode="nearest")
        return self.conv(hidden_states)


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None, padding=1,
                 name="conv"):
        super().__init__()
        assert use_conv
        self.channels = channels
        self.out_channels = out_channels or channels
        self.padding = padding
        self.conv = LoRACompatibleConv(
            self.channels, self.out_channels, 3, stride=2, padding=padding)

    def forward(self, hidden_states, scale=1.0):
        if self.padding == 0:
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(hidden_states)


class ResnetBlock2D(nn.Module):
    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 skip_time_act=False, time_embedding_norm="default",
                 kernel=None, output_scale_factor=1.0, use_in_shortcut=None,
                 up=False, down=False, conv_shortcut_bias=True,
                 conv_2d_out_channels=None):
        super().__init__()
        assert pre_norm and not up and not down and kernel is None
        assert time_embedding_norm == "default" and not skip_time_act
        out_channels = out_channels or in_channels
        self.output_scale_factor = output_scale_factor
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = LoRACompatibleConv(in_channels, out_channels, 3, padding=1)
        self.time_emb_proj = (
            LoRACompatibleLinear(temb_channels, out_channels)
            if temb_channels is not None else None)
        self.norm2 = nn.GroupNorm(groups_out or groups, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = LoRACompatibleConv(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = get_activation(non_linearity)
        if use_in_shortcut is None:
            use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = (
            LoRACompatibleConv(in_channels, out_channels, 1, bias=conv_shortcut_bias)
            if use_in_shortcut else None)

    def forward(self, input_tensor, temb, scale=1.0):
        h = self.nonlinearity(self.norm1(input_tensor))
        h = self.conv1(h)
        if self.time_emb_proj is not None and temb is not None:
            h = h + self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
        h = self.nonlinearity(self.norm2(h))
        h = self.conv2(self.dropout(h))
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + h) / self.output_scale_factor


# ---------------------------------------------------------------------------
# models.attention: Attention / AttnProcessor / FeedForward
# ---------------------------------------------------------------------------

class AttnProcessor:
    """Classic (pre-sdpa) diffusers attention processor."""

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, temb=None, scale=1.0):
        assert attn.group_norm is None and attn.spatial_norm is None
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            b, c, hgt, wid = hidden_states.shape
            hidden_states = hidden_states.view(b, c, hgt * wid).transpose(1, 2)
        batch_size, seq_len, _ = (
            hidden_states if encoder_hidden_states is None
            else encoder_hidden_states).shape
        attention_mask = attn.prepare_attention_mask(
            attention_mask, seq_len, batch_size)
        query = attn.to_q(hidden_states)
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        else:
            assert not attn.norm_cross
        key = attn.to_k(encoder_hidden_states)
        value = attn.to_v(encoder_hidden_states)
        query = attn.head_to_batch_dim(query)
        key = attn.head_to_batch_dim(key)
        value = attn.head_to_batch_dim(value)
        probs = attn.get_attention_scores(query, key, attention_mask)
        hidden_states = torch.bmm(probs, value)
        hidden_states = attn.batch_to_head_dim(hidden_states)
        hidden_states = attn.to_out[0](hidden_states)
        hidden_states = attn.to_out[1](hidden_states)
        if input_ndim == 4:
            hidden_states = hidden_states.transpose(-1, -2).reshape(b, c, hgt, wid)
        if attn.residual_connection:
            raise NotImplementedError
        return hidden_states / attn.rescale_output_factor


class Attention(nn.Module):
    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, upcast_attention=False,
                 upcast_softmax=False, cross_attention_norm=None,
                 cross_attention_norm_num_groups=32, added_kv_proj_dim=None,
                 norm_num_groups=None, spatial_norm_dim=None,
                 out_bias=True, scale_qk=True, only_cross_attention=False,
                 eps=1e-5, rescale_output_factor=1.0, residual_connection=False,
                 _from_deprecated_attn_block=False, processor=None,
                 out_dim=None):
        super().__init__()
        assert added_kv_proj_dim is None and norm_num_groups is None
        assert spatial_norm_dim is None and cross_attention_norm is None
        assert not only_cross_attention and out_dim is None
        inner_dim = dim_head * heads
        self.heads = heads
        self.scale = dim_head**-0.5 if scale_qk else 1.0
        self.upcast_attention = upcast_attention
        self.upcast_softmax = upcast_softmax
        self.rescale_output_factor = rescale_output_factor
        self.residual_connection = residual_connection
        self.group_norm = None
        self.spatial_norm = None
        self.norm_cross = None
        self.cross_attention_dim = cross_attention_dim or query_dim
        self.to_q = LoRACompatibleLinear(query_dim, inner_dim, bias=bias)
        self.to_k = LoRACompatibleLinear(self.cross_attention_dim, inner_dim, bias=bias)
        self.to_v = LoRACompatibleLinear(self.cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            LoRACompatibleLinear(inner_dim, query_dim, bias=out_bias),
            nn.Dropout(dropout),
        ])
        self.processor = processor if processor is not None else AttnProcessor()

    def set_processor(self, processor):
        self.processor = processor

    def set_use_memory_efficient_attention_xformers(self, *a, **k):
        pass

    def prepare_attention_mask(self, attention_mask, target_length, batch_size,
                               out_dim=3):
        if attention_mask is None:
            return None
        head_size = self.heads
        if attention_mask.shape[-1] != target_length:
            attention_mask = F.pad(
                attention_mask, (0, target_length - attention_mask.shape[-1]),
                value=0.0)
        if out_dim == 3 and attention_mask.shape[0] < batch_size * head_size:
            attention_mask = attention_mask.repeat_interleave(head_size, dim=0)
        return attention_mask

    def head_to_batch_dim(self, tensor, out_dim=3):
        b, seq, dim = tensor.shape
        tensor = tensor.reshape(b, seq, self.heads, dim // self.heads)
        tensor = tensor.permute(0, 2, 1, 3)
        if out_dim == 3:
            tensor = tensor.reshape(b * self.heads, seq, dim // self.heads)
        return tensor

    def batch_to_head_dim(self, tensor):
        bh, seq, d = tensor.shape
        tensor = tensor.reshape(bh // self.heads, self.heads, seq, d)
        return tensor.permute(0, 2, 1, 3).reshape(bh // self.heads, seq, self.heads * d)

    def get_attention_scores(self, query, key, attention_mask=None):
        dtype = query.dtype
        if self.upcast_attention:
            query, key = query.float(), key.float()
        if attention_mask is None:
            scores = torch.baddbmm(
                torch.empty(query.shape[0], query.shape[1], key.shape[1],
                            dtype=query.dtype, device=query.device),
                query, key.transpose(-1, -2), beta=0, alpha=self.scale)
        else:
            scores = torch.baddbmm(
                attention_mask, query, key.transpose(-1, -2), beta=1,
                alpha=self.scale)
        if self.upcast_softmax:
            scores = scores.float()
        probs = scores.softmax(dim=-1).to(dtype)
        return probs

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        return self.processor(
            self, hidden_states, encoder_hidden_states=encoder_hidden_states,
            attention_mask=attention_mask, **cross_attention_kwargs)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

    def forward(self, x, scale=1.0):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False):
        super().__init__()
        assert activation_fn == "geglu" and not final_dropout
        inner_dim = int(dim * mult)
        dim_out = dim_out or dim
        self.net = nn.ModuleList([
            GEGLU(dim, inner_dim),
            nn.Dropout(dropout),
            LoRACompatibleLinear(inner_dim, dim_out),
        ])

    def forward(self, hidden_states, scale=1.0):
        for layer in self.net:
            hidden_states = layer(hidden_states)
        return hidden_states


ADDED_KV_ATTENTION_PROCESSORS = ()
CROSS_ATTENTION_PROCESSORS = (AttnProcessor,)
AttentionProcessor = AttnProcessor


class AttnAddedKVProcessor(_Unused):
    pass


# ---------------------------------------------------------------------------
# pipeline-level leaves (diffusers v0.24): DiffusionPipeline shell,
# VaeImageProcessor, DDIMScheduler, randn_tensor — everything
# pipeline_pose2vid_long.py imports beyond the model leaves above, so the
# reference's full sampling loop can run under torch for trajectory goldens.
# ---------------------------------------------------------------------------


def is_accelerate_available():
    return False


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """diffusers.utils.torch_utils.randn_tensor (v0.24) for the single-
    generator CPU case the goldens use."""
    if isinstance(generator, list):
        raise NotImplementedError("stub randn_tensor: generator lists")
    return torch.randn(shape, generator=generator, dtype=dtype,
                       layout=layout or torch.strided)


class DiffusionPipeline(ConfigMixin):
    """Attribute-bag pipeline base: register_modules + progress_bar are the
    only behaviors the reference pipelines rely on."""

    config_name = "model_index.json"

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)

    @property
    def device(self):
        return torch.device("cpu")

    def progress_bar(self, total=None, iterable=None):
        class _Bar:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def update(self, n=1):
                pass

        if iterable is not None:
            return iterable
        return _Bar()

    def enable_xformers_memory_efficient_attention(self):
        raise NotImplementedError("stub pipeline: xformers")


class VaeImageProcessor(ConfigMixin):
    """v0.24 preprocess path for PIL inputs: optional LANCZOS resize ->
    [0,1] float tensor (1, c, h, w) -> optional [-1,1] normalize."""

    @register_to_config
    def __init__(self, do_resize=True, vae_scale_factor=8, resample="lanczos",
                 do_normalize=True, do_binarize=False, do_convert_rgb=False,
                 do_convert_grayscale=False):
        pass

    def preprocess(self, image, height=None, width=None):
        import PIL.Image
        import numpy as np_

        if not isinstance(image, PIL.Image.Image):
            raise NotImplementedError("stub VaeImageProcessor: PIL only")
        if self.config.do_convert_rgb:
            image = image.convert("RGB")
        if self.config.do_resize and height is not None and width is not None:
            resample = {"lanczos": PIL.Image.LANCZOS,
                        "bilinear": PIL.Image.BILINEAR,
                        "bicubic": PIL.Image.BICUBIC}[self.config.resample]
            image = image.resize((width, height), resample=resample)
        arr = np_.asarray(image).astype(np_.float32) / 255.0
        tensor = torch.from_numpy(arr).permute(2, 0, 1)[None]
        if self.config.do_normalize:
            tensor = 2.0 * tensor - 1.0
        if self.config.do_binarize:
            raise NotImplementedError("stub VaeImageProcessor: binarize")
        return tensor


class _SchedulerOutput(BaseOutput):
    def __init__(self, prev_sample, pred_original_sample=None):
        self.prev_sample = prev_sample
        self.pred_original_sample = pred_original_sample


def _rescale_zero_terminal_snr(betas):
    """diffusers.schedulers.scheduling_ddim.rescale_zero_terminal_snr (v0.24),
    float32 torch math exactly as shipped."""
    alphas = 1.0 - betas
    alphas_cumprod = torch.cumprod(alphas, dim=0)
    alphas_bar_sqrt = alphas_cumprod.sqrt()

    alphas_bar_sqrt_0 = alphas_bar_sqrt[0].clone()
    alphas_bar_sqrt_T = alphas_bar_sqrt[-1].clone()
    alphas_bar_sqrt -= alphas_bar_sqrt_T
    alphas_bar_sqrt *= alphas_bar_sqrt_0 / (alphas_bar_sqrt_0 - alphas_bar_sqrt_T)

    alphas_bar = alphas_bar_sqrt**2
    alphas = alphas_bar[1:] / alphas_bar[:-1]
    alphas = torch.cat([alphas_bar[0:1], alphas])
    return 1.0 - alphas


class DDIMScheduler(ConfigMixin):
    """diffusers v0.24 DDIMScheduler twin: float32 torch beta tables,
    zero-SNR rescale, leading/trailing/linspace spacing, steps_offset,
    epsilon/v/sample prediction, deterministic + eta-noise step. Thresholding
    is not implemented (off in every HumanVid config)."""

    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps=1000, beta_start=0.0001,
                 beta_end=0.02, beta_schedule="linear", trained_betas=None,
                 clip_sample=True, set_alpha_to_one=True, steps_offset=0,
                 prediction_type="epsilon", thresholding=False,
                 dynamic_thresholding_ratio=0.995, clip_sample_range=1.0,
                 sample_max_value=1.0, timestep_spacing="leading",
                 rescale_betas_zero_snr=False):
        if trained_betas is not None:
            betas = torch.tensor(trained_betas, dtype=torch.float32)
        elif beta_schedule == "linear":
            betas = torch.linspace(beta_start, beta_end, num_train_timesteps,
                                   dtype=torch.float32)
        elif beta_schedule == "scaled_linear":
            betas = torch.linspace(beta_start**0.5, beta_end**0.5,
                                   num_train_timesteps,
                                   dtype=torch.float32) ** 2
        else:
            raise NotImplementedError(f"stub DDIM: {beta_schedule}")
        if thresholding:
            raise NotImplementedError("stub DDIM: thresholding")
        if rescale_betas_zero_snr:
            betas = _rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.final_alpha_cumprod = (torch.tensor(1.0) if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.init_noise_sigma = 1.0
        self.num_inference_steps = None
        self.timesteps = torch.from_numpy(
            np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int64))

    def scale_model_input(self, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps, device=None):
        cfg = self.config
        T = cfg.num_train_timesteps
        if num_inference_steps > T:
            raise ValueError("num_inference_steps > num_train_timesteps")
        self.num_inference_steps = num_inference_steps
        if cfg.timestep_spacing == "linspace":
            ts = (np.linspace(0, T - 1, num_inference_steps).round()[::-1]
                  .copy().astype(np.int64))
        elif cfg.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            ts = ((np.arange(0, num_inference_steps) * step_ratio).round()
                  [::-1].copy().astype(np.int64))
            ts += cfg.steps_offset
        elif cfg.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            ts = np.round(np.arange(T, 0, -step_ratio)).astype(np.int64) - 1
        else:
            raise ValueError(f"unknown spacing {cfg.timestep_spacing}")
        self.timesteps = torch.from_numpy(ts).to(device)

    def _get_variance(self, timestep, prev_timestep):
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0 else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (
            1 - alpha_prod_t / alpha_prod_t_prev)

    def step(self, model_output, timestep, sample, eta=0.0,
             use_clipped_model_output=False, generator=None,
             variance_noise=None, return_dict=True):
        if self.num_inference_steps is None:
            raise ValueError("call set_timesteps first")
        cfg = self.config
        prev_timestep = (timestep
                         - cfg.num_train_timesteps // self.num_inference_steps)
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (self.alphas_cumprod[prev_timestep]
                             if prev_timestep >= 0 else self.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t

        if cfg.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
            pred_epsilon = model_output
        elif cfg.prediction_type == "sample":
            pred_original_sample = model_output
            pred_epsilon = (
                sample - alpha_prod_t ** 0.5 * pred_original_sample
            ) / beta_prod_t ** 0.5
        elif cfg.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t ** 0.5) * sample - (
                beta_prod_t ** 0.5) * model_output
            pred_epsilon = (alpha_prod_t ** 0.5) * model_output + (
                beta_prod_t ** 0.5) * sample
        else:
            raise ValueError(cfg.prediction_type)

        if cfg.clip_sample:
            pred_original_sample = pred_original_sample.clamp(
                -cfg.clip_sample_range, cfg.clip_sample_range)

        variance = self._get_variance(timestep, prev_timestep)
        std_dev_t = eta * variance ** 0.5

        if use_clipped_model_output:
            pred_epsilon = (
                sample - alpha_prod_t ** 0.5 * pred_original_sample
            ) / beta_prod_t ** 0.5

        pred_sample_direction = (
            1 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * pred_epsilon
        prev_sample = (alpha_prod_t_prev ** 0.5 * pred_original_sample
                       + pred_sample_direction)

        if eta > 0:
            if variance_noise is None:
                variance_noise = randn_tensor(
                    model_output.shape, generator=generator,
                    dtype=model_output.dtype)
            prev_sample = prev_sample + std_dev_t * variance_noise

        if not return_dict:
            return (prev_sample,)
        return _SchedulerOutput(prev_sample=prev_sample,
                                pred_original_sample=pred_original_sample)


class PNDMScheduler(_Unused):
    pass


class LMSDiscreteScheduler(_Unused):
    pass


class EulerDiscreteScheduler(_Unused):
    pass


class EulerAncestralDiscreteScheduler(_Unused):
    pass


class DPMSolverMultistepScheduler(_Unused):
    pass


# ---------------------------------------------------------------------------
# module assembly + installation
# ---------------------------------------------------------------------------

def _module(name, **symbols):
    import importlib.machinery

    mod = types.ModuleType(name)
    # real ModuleSpec: torch._dynamo's trace rules call find_spec on
    # installed module names and raise if __spec__ is None
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in symbols.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stub():
    """Install fake diffusers modules and put /root/reference on sys.path.

    Idempotent; returns after the reference's ``src`` package is importable.
    """
    if "diffusers" in sys.modules and not getattr(
            sys.modules["diffusers"], "_IS_HVT_STUB", False):
        raise RuntimeError("a real diffusers is installed; stub not needed")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "diffusers" in sys.modules:
        return

    logging_mod = _module(
        "diffusers.utils.logging", get_logger=_Logging.get_logger)
    _module(
        "diffusers.utils",
        BaseOutput=BaseOutput, logging=logging_mod, deprecate=deprecate,
        is_torch_version=is_torch_version, USE_PEFT_BACKEND=USE_PEFT_BACKEND,
        SAFETENSORS_WEIGHTS_NAME=SAFETENSORS_WEIGHTS_NAME,
        WEIGHTS_NAME=WEIGHTS_NAME, scale_lora_layers=scale_lora_layers,
        unscale_lora_layers=unscale_lora_layers,
        is_accelerate_available=is_accelerate_available)
    _module("diffusers.utils.torch_utils", apply_freeu=apply_freeu,
            randn_tensor=randn_tensor)
    _module("diffusers.image_processor", VaeImageProcessor=VaeImageProcessor)
    _module(
        "diffusers.schedulers",
        DDIMScheduler=DDIMScheduler, PNDMScheduler=PNDMScheduler,
        LMSDiscreteScheduler=LMSDiscreteScheduler,
        EulerDiscreteScheduler=EulerDiscreteScheduler,
        EulerAncestralDiscreteScheduler=EulerAncestralDiscreteScheduler,
        DPMSolverMultistepScheduler=DPMSolverMultistepScheduler)
    _module("diffusers.utils.import_utils",
            is_xformers_available=is_xformers_available)
    _module("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
            register_to_config=register_to_config, FrozenDict=FrozenDict)
    _module("diffusers.loaders",
            UNet2DConditionLoadersMixin=UNet2DConditionLoadersMixin)
    _module("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    _module("diffusers.models.activations", get_activation=get_activation)
    _module(
        "diffusers.models.attention_processor",
        Attention=Attention, AttnProcessor=AttnProcessor,
        AttentionProcessor=AttentionProcessor,
        AttnAddedKVProcessor=AttnAddedKVProcessor,
        SpatialNorm=SpatialNorm,
        ADDED_KV_ATTENTION_PROCESSORS=ADDED_KV_ATTENTION_PROCESSORS,
        CROSS_ATTENTION_PROCESSORS=CROSS_ATTENTION_PROCESSORS)
    _module(
        "diffusers.models.attention",
        Attention=Attention, FeedForward=FeedForward, GEGLU=GEGLU,
        AdaLayerNorm=AdaLayerNorm, AdaLayerNormZero=AdaLayerNormZero)
    _module(
        "diffusers.models.embeddings",
        TimestepEmbedding=TimestepEmbedding, Timesteps=Timesteps,
        GaussianFourierProjection=GaussianFourierProjection,
        ImageHintTimeEmbedding=ImageHintTimeEmbedding,
        ImageProjection=ImageProjection, ImageTimeEmbedding=ImageTimeEmbedding,
        PositionNet=PositionNet, TextImageProjection=TextImageProjection,
        TextImageTimeEmbedding=TextImageTimeEmbedding,
        TextTimeEmbedding=TextTimeEmbedding, CaptionProjection=CaptionProjection,
        SinusoidalPositionalEmbedding=SinusoidalPositionalEmbedding)
    _module(
        "diffusers.models.resnet",
        ResnetBlock2D=ResnetBlock2D, Downsample2D=Downsample2D,
        Upsample2D=Upsample2D)
    _module("diffusers.models.dual_transformer_2d",
            DualTransformer2DModel=DualTransformer2DModel)
    _module("diffusers.models.lora", LoRACompatibleConv=LoRACompatibleConv,
            LoRACompatibleLinear=LoRACompatibleLinear,
            LoRALinearLayer=LoRALinearLayer)
    _module("diffusers.models.normalization",
            AdaLayerNormSingle=AdaLayerNormSingle, AdaGroupNorm=AdaGroupNorm)
    models_mod = _module("diffusers.models", ModelMixin=ModelMixin)
    models_mod.attention = sys.modules["diffusers.models.attention"]
    models_mod.attention_processor = sys.modules["diffusers.models.attention_processor"]
    utils_mod = sys.modules["diffusers.utils"]
    utils_mod.logging = logging_mod
    top = _module("diffusers", _IS_HVT_STUB=True,
                  DiffusionPipeline=DiffusionPipeline,
                  DDIMScheduler=DDIMScheduler)
    top.utils = utils_mod
    top.models = models_mod
    top.configuration_utils = sys.modules["diffusers.configuration_utils"]
    top.schedulers = sys.modules["diffusers.schedulers"]
    top.image_processor = sys.modules["diffusers.image_processor"]
