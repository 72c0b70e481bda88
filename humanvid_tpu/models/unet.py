"""The conditional diffusion UNet (serves both the ReferenceNet and the video UNet).

One module, two roles:

- **ReferenceNet** (``UNetConditionModel(config=SD15_UNET)``, ``frames=1``,
  ``collect_ref_features=True``): runs the SD1.5 2D UNet forward on the
  reference-image latent and returns the pre-self-attention LayerNorm output of
  each of its 16 transformer blocks — the functional replacement for the
  reference's monkey-patched ``bank`` lists
  (reference ``src/models/mutual_self_attention.py:19-363``).

- **Video (denoising) UNet** (``config=SD15_VIDEO_UNET``): same backbone
  inflated over frames (spatial convs run on ``((b f), h, w, c)``), AnimateDiff
  motion modules after every spatial stage, ``cond_fea`` (pose-guider + camera
  features) added right after ``conv_in``
  (reference ``src/models/unet_3d.py:482-484``), and the reference features
  consumed positionally as extra self-attention KV.

Bank pairing note: the reference pairs writer/reader transformer blocks by
sorting a module-tree DFS on hidden width descending
(``mutual_self_attention.py:284-286,331-336``). Both reference UNets register
submodules in the same order (down_blocks, up_blocks, mid_block — verified at
``unet_2d_condition.py:455-531`` / ``unet_3d.py:108-157``), so that stable sort
pairs structurally identical positions. Here features are simply collected and
consumed in forward order (down → mid → up), which is the same pairing.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.embeddings import sinusoidal_timestep_embedding
from .configs import UNetConfig
from .layers import (
    Downsample,
    FusedGroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TemporalTransformer,
    Upsample,
)

RefFeatures = Tuple[jnp.ndarray, ...]


class UNetConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _motion(self, dim: int, name: str) -> TemporalTransformer:
        cfg = self.config
        # nn.remat static_argnums count self as 0; frames is arg 2
        cls = (nn.remat(TemporalTransformer, static_argnums=(2,))
               if cfg.gradient_checkpointing else TemporalTransformer)
        return cls(
            dim=dim,
            heads=cfg.motion_num_heads,
            depth=cfg.motion_transformer_blocks,
            attention_blocks_per_layer=len(cfg.motion_attention_types),
            max_len=cfg.motion_max_len,
            use_pe=cfg.motion_position_encoding,
            ff_chunk_tokens=cfg.ff_chunk_tokens,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _spatial(self, dim: int, name: str) -> SpatialTransformer:
        cfg = self.config
        cls = (nn.remat(SpatialTransformer, static_argnums=(3,))
               if cfg.gradient_checkpointing else SpatialTransformer)
        return cls(
            dim=dim,
            heads=cfg.attention_heads,
            depth=cfg.transformer_layers,
            context_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups,
            ff_chunk_tokens=cfg.ff_chunk_tokens,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _resnet(self, dim: int, name: str) -> ResnetBlock:
        cfg = self.config
        cls = nn.remat(ResnetBlock) if cfg.gradient_checkpointing else ResnetBlock
        return cls(
            out_channels=dim,
            norm_eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                      # ((b f), h, w, in_channels)
        timesteps: jnp.ndarray,                   # (b,) or scalar
        context: jnp.ndarray,                     # (b, s, cross_attention_dim)
        cond_fea: Optional[jnp.ndarray] = None,   # ((b f), h, w, c0)
        ref_features: Optional[Sequence[jnp.ndarray]] = None,
        ref_disable: Optional[jnp.ndarray] = None,  # (b,) bool, CFG uncond rows
        frames: int = 1,
        collect_ref_features: bool = False,
    ) -> Tuple[jnp.ndarray, RefFeatures]:
        cfg = self.config
        chans = cfg.block_out_channels

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        b = context.shape[0]
        if timesteps.shape[0] == 1 and b > 1:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # --- time embedding: sinusoidal -> MLP, repeated per frame ---
        temb = sinusoidal_timestep_embedding(
            timesteps, chans[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
            dtype=self.dtype,
        )
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(cfg.time_embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="time_embedding_linear_2")(temb)
        if frames > 1:
            temb = jnp.repeat(temb, frames, axis=0)

        collected: List[jnp.ndarray] = []
        consume_idx = [0]

        def run_spatial(st: SpatialTransformer, x: jnp.ndarray) -> jnp.ndarray:
            ref_in = None
            if ref_features is not None:
                ref_in = ref_features[consume_idx[0]]
                consume_idx[0] += 1
            # positional call: nn.remat static_argnums needs positional args
            x, bank = st(x, context, frames, ref_in, ref_disable)
            if collect_ref_features:
                collected.append(bank)
            return x

        sample = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv_in")(sample)
        if cond_fea is not None:
            sample = sample + cond_fea.astype(sample.dtype)

        # --- down ---
        res_stack: List[jnp.ndarray] = [sample]
        for i, btype in enumerate(cfg.down_block_types):
            ch = chans[i]
            has_attn = btype == "CrossAttnDownBlock"
            for j in range(cfg.layers_per_block):
                sample = self._resnet(ch, f"down_{i}_resnets_{j}")(sample, temb)
                if has_attn:
                    sample = run_spatial(self._spatial(ch, f"down_{i}_attentions_{j}"), sample)
                if cfg.use_motion_module:
                    sample = self._motion(ch, f"down_{i}_motion_{j}")(sample, frames)
                res_stack.append(sample)
            if i < len(cfg.down_block_types) - 1:
                sample = Downsample(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                                    name=f"down_{i}_downsample")(sample)
                res_stack.append(sample)

        # --- mid ---
        mid_ch = chans[-1]
        sample = self._resnet(mid_ch, "mid_resnets_0")(sample, temb)
        sample = run_spatial(self._spatial(mid_ch, "mid_attentions_0"), sample)
        if cfg.use_motion_module and cfg.motion_mid_block:
            sample = self._motion(mid_ch, "mid_motion_0")(sample, frames)
        sample = self._resnet(mid_ch, "mid_resnets_1")(sample, temb)

        # --- up ---
        rev = list(reversed(chans))
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev[i]
            has_attn = btype == "CrossAttnUpBlock"
            for j in range(cfg.layers_per_block + 1):
                res = res_stack.pop()
                sample = jnp.concatenate([sample, res], axis=-1)
                sample = self._resnet(ch, f"up_{i}_resnets_{j}")(sample, temb)
                if has_attn:
                    sample = run_spatial(self._spatial(ch, f"up_{i}_attentions_{j}"), sample)
                if cfg.use_motion_module:
                    sample = self._motion(ch, f"up_{i}_motion_{j}")(sample, frames)
            if i < len(cfg.up_block_types) - 1:
                sample = Upsample(ch, dtype=self.dtype, param_dtype=self.param_dtype,
                                  name=f"up_{i}_upsample")(sample)

        sample = FusedGroupNorm(num_groups=cfg.norm_num_groups,
                                epsilon=cfg.norm_eps, dtype=self.dtype,
                                param_dtype=self.param_dtype,
                                name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        sample = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="conv_out")(sample)

        if ref_features is not None:
            assert consume_idx[0] == len(ref_features), (
                f"consumed {consume_idx[0]} of {len(ref_features)} reference features"
            )
        return sample, tuple(collected)

    @property
    def num_ref_features(self) -> int:
        cfg = self.config
        n = 0
        n += sum(cfg.layers_per_block for t in cfg.down_block_types if t == "CrossAttnDownBlock")
        n += 1  # mid
        n += sum(cfg.layers_per_block + 1 for t in cfg.up_block_types if t == "CrossAttnUpBlock")
        return n
