"""Core UNet layers: resnet blocks, spatial transformers, temporal transformers.

Layout convention: all spatial tensors are NHWC with batch and frame axes
flattened together, i.e. ``((b f), h, w, c)``; the static frame count is passed
alongside. This keeps every conv a plain 2D NHWC conv (XLA:TPU's native conv
layout — the reference's ``InflatedConv3d`` rearrange dance,
``src/models/resnet.py:9-15``, becomes a no-op) and makes temporal modules the
only places that ever reshape between the spatial token layout ``((b f), l, c)``
and the temporal token layout ``((b l), f, c)``.

Behavioral parity targets (reference file:line):
- ResnetBlock         -> src/models/resnet.py:121-250 (ResnetBlock3D)
- SpatialTransformer  -> src/models/transformer_3d.py:27-169 / transformer_2d.py:32
- TransformerBlock    -> src/models/attention.py:12-443 + the hooked forward in
                         src/models/mutual_self_attention.py:93-265 (write/read)
- TemporalTransformer -> src/models/motion_module.py:94-387 (AnimateDiff)
- Upsample/Downsample -> src/models/resnet.py:29-118
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..ops.attention import MultiHeadAttention
from ..ops.embeddings import sinusoidal_positional_encoding


class GEGLUFeedForward(nn.Module):
    """diffusers ``FeedForward(activation_fn="geglu")``: Dense(d->8d) split-gate, Dense(4d->d).

    ``chunk_tokens > 0`` scans the FF over token-axis chunks with per-chunk
    rematerialization: the (B, L, 8d) GEGLU inner activation — 840 MB per
    level-0 block at the stage-2 op-point, the largest HLO temps in the
    single-chip training step — never materializes beyond one chunk. Param
    structure and numerics are identical to the unchunked path (the FF is
    pointwise over tokens); leave 0 for inference, where one big MXU
    contraction is fastest.
    """

    dim: int
    mult: int = 4
    chunk_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _core(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)

    @nn.compact
    def __call__(self, x):
        l = x.shape[1]
        ct = self.chunk_tokens
        if not ct or l <= ct:
            return self._core(x)
        n = -(-l // ct)
        xp = jnp.pad(x, ((0, 0), (0, n * ct - l), (0, 0))) if n * ct != l else x
        xs = jnp.moveaxis(xp.reshape(x.shape[0], n, ct, x.shape[-1]), 1, 0)

        def body(mdl, carry, xc):
            return carry, GEGLUFeedForward._core(mdl, xc)

        scanned = nn.scan(
            nn.remat(body, prevent_cse=False),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )
        _, ys = scanned(self, None, xs)
        y = jnp.moveaxis(ys, 0, 1).reshape(x.shape[0], n * ct, self.dim)
        return y[:, :l] if n * ct != l else y


class ResnetBlock(nn.Module):
    """SD resnet block: GN-SiLU-conv, time-embedding inject, GN-SiLU-conv, +skip."""

    out_channels: int
    norm_eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: ((b f), h, w, c); temb: ((b f), time_embed_dim)
        in_channels = x.shape[-1]
        # FusedGroupNorm routes through ops.group_norm: the default impl is
        # selected by HVT_GN_IMPL (flax order / lane-friendly two-stage
        # stats / r4 Pallas kernel — the Pallas arm measured SLOWER end to
        # end on v5e, r4 traces; the two-stage order is pure XLA so the
        # mega-fusions survive). Param tree identical to nn.GroupNorm.
        gn = lambda name: FusedGroupNorm(
            num_groups=self.groups, epsilon=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        conv = lambda name: nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

        h = conv("conv1")(nn.silu(gn("norm1")(x)))
        if temb is not None:
            temb = nn.Dense(
                self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype,
                name="time_emb_proj",
            )(nn.silu(temb))
            h = h + temb[:, None, None, :]
        h = conv("conv2")(nn.silu(gn("norm2")(h)))

        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 3x3 conv with symmetric padding=1: the SD1.5 *UNet* downsample
    convention (reference ``src/models/resnet.py:91-109``, built with
    padding=1; padding=0 raises NotImplementedError there). The VAE encoder's
    asymmetric (0,1) padding lives separately in ``models/vae.py``."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class FusedGroupNorm(nn.Module):
    """Drop-in ``nn.GroupNorm`` (+ optional fused SiLU) with the same param
    tree ({scale, bias}); routes through ``ops.group_norm.group_norm_act``
    (single-read Pallas stats on TPU, pure-XLA reference elsewhere)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    act: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.group_norm import group_norm_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          self.param_dtype)
        return group_norm_act(x.astype(self.dtype), scale, bias,
                              self.num_groups, self.epsilon, self.act)


class Conv3x3Params(nn.Module):
    """Declares the (kernel, bias) of a 3x3 ``nn.Conv`` without running it —
    identical param tree/inits, so fused consumers (``nearest_up2_conv3x3``)
    swap in with zero checkpoint-conversion changes."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_features, self.features),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return kernel, bias


class Upsample(nn.Module):
    """Nearest x2 then 3x3 conv — computed as ONE low-res subpixel conv
    (``ops.conv.nearest_up2_conv3x3``): exact same math, but the 4x nearest
    repeat is never materialized in HBM (it was ~half the VAE-decode
    elementwise budget, PERF.md r3)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.conv import nearest_up2_conv3x3

        kernel, bias = Conv3x3Params(self.channels, self.param_dtype,
                                     name="conv")(x.shape[-1])
        # tap combination in param dtype (fp32 masters), conv in self.dtype
        return nearest_up2_conv3x3(x, kernel, bias, dtype=self.dtype)


class TransformerBlock(nn.Module):
    """Spatial transformer block (self-attn, cross-attn, FF) with reference plumbing.

    - As the ReferenceNet ("write" side) it returns its pre-attention LayerNorm
      output so the caller can collect it into the reference-feature pytree
      (the reference appends exactly this tensor to ``bank``,
      ``mutual_self_attention.py:137-146``).
    - As the video UNet ("read" side) it takes ``ref_feature`` — the matching
      writer activation, already repeated per frame — and appends it to the
      self-attention KV. ``ref_disable`` rows (CFG uncond) see an additive
      ``-inf`` bias on those keys, reproducing the uncond-self-reattention
      semantics (``mutual_self_attention.py:166-186``) in a single fused call.
    """

    dim: int
    heads: int
    context_dim: int = 768
    ff_chunk_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # (B, L, C)
        context: jnp.ndarray,                # (B, S, Cc) CLIP image tokens
        ref_feature: Optional[jnp.ndarray] = None,   # (B, Lr, C)
        ref_disable: Optional[jnp.ndarray] = None,   # (B,) bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        head_dim = self.dim // self.heads

        norm1 = ln("norm1")(x)
        x = x + MultiHeadAttention(
            query_dim=self.dim, heads=self.heads, head_dim=head_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn1",
        )(norm1, extra_kv=ref_feature, extra_kv_disable=ref_disable)

        x = x + MultiHeadAttention(
            query_dim=self.dim, heads=self.heads, head_dim=head_dim,
            context_dim=self.context_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn2",
        )(ln("norm2")(x), context=context)

        x = x + GEGLUFeedForward(
            dim=self.dim, chunk_tokens=self.ff_chunk_tokens,
            dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(ln("norm3")(x))
        return x, norm1


class SpatialTransformer(nn.Module):
    """Transformer2D/3D wrapper: GN + 1x1-conv proj in/out around N transformer blocks.

    Operates on ``((b f), h, w, c)``; the CLIP context ``(b, s, cc)`` is repeated
    per frame (reference ``src/models/transformer_3d.py:116-119``).
    """

    dim: int
    heads: int
    depth: int = 1
    context_dim: int = 768
    norm_eps: float = 1e-6
    # the reference's Transformer2D/3D GroupNorm uses the UNet's
    # norm_num_groups (transformer_2d.py:143, transformer_3d.py:58-59 pass
    # resnet_groups), unlike the motion modules whose GN is always 32
    groups: int = 32
    ff_chunk_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        frames: int = 1,
        ref_feature: Optional[jnp.ndarray] = None,
        ref_disable: Optional[jnp.ndarray] = None,
    ):
        bf, h, w, c = x.shape
        residual = x
        x = FusedGroupNorm(
            num_groups=self.groups, epsilon=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm",
        )(x)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)
        x = x.reshape(bf, h * w, self.dim)

        if context.shape[0] != bf:
            context = jnp.repeat(context, frames, axis=0)
        if ref_feature is not None and ref_feature.shape[0] != bf:
            ref_feature = jnp.repeat(ref_feature, frames, axis=0)
        if ref_disable is not None and ref_disable.shape[0] != bf:
            ref_disable = jnp.repeat(ref_disable, frames, axis=0)

        norm1_outs = []
        for i in range(self.depth):
            x, norm1 = TransformerBlock(
                dim=self.dim, heads=self.heads, context_dim=self.context_dim,
                ff_chunk_tokens=self.ff_chunk_tokens,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(x, context, ref_feature=ref_feature, ref_disable=ref_disable)
            norm1_outs.append(norm1)

        x = x.reshape(bf, h, w, self.dim)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(x)
        # depth==1 for SD1.5; expose the single bank tensor.
        return x + residual, norm1_outs[0]


class TemporalAttention(nn.Module):
    """Self-attention over the frame axis with sinusoidal position encoding.

    Input ``((b l), f, c)``. The position encoding is added to the *input*
    (so it shapes Q, K and V), matching AnimateDiff's VersatileAttention
    (``motion_module.py:360-368``) and CameraCtrl's TemporalSelfAttention.
    """

    dim: int
    heads: int
    max_len: int = 32
    use_pe: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, frames: Optional[int] = None) -> jnp.ndarray:
        attn = MultiHeadAttention(
            query_dim=self.dim, heads=self.heads, head_dim=self.dim // self.heads,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attn",
        )
        if frames is not None:
            # Fused path: x is ((b f), l, c) (spatial layout); PE broadcasts
            # per frame and attention runs over the frame axis in-kernel.
            bf, l, c = x.shape
            if self.use_pe:
                pe = sinusoidal_positional_encoding(self.max_len, self.dim, dtype=self.dtype)
                x = (x.reshape(bf // frames, frames, l, c)
                     + pe[None, :frames, None, :]).reshape(bf, l, c)
            return attn(x, temporal_frames=frames)
        f = x.shape[1]
        if self.use_pe:
            pe = sinusoidal_positional_encoding(self.max_len, self.dim, dtype=self.dtype)
            x = x + pe[None, :f, :]
        return attn(x)


class TemporalTransformerBlock(nn.Module):
    """N x (LN -> temporal self-attn -> +res) then LN -> FF -> +res.

    Shared by the AnimateDiff motion module (2 attentions) and the CameraCtrl
    camera encoder (1 attention).
    """

    dim: int
    heads: int
    num_attention_blocks: int = 2
    max_len: int = 32
    use_pe: bool = True
    ff_chunk_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, frames: Optional[int] = None) -> jnp.ndarray:
        # x: ((b l), f, c) — or ((b f), l, c) when ``frames`` is given (the
        # fused Pallas temporal-attention path; LN/FF act on the channel axis
        # so they are layout-independent)
        for i in range(self.num_attention_blocks):
            n = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"norms_{i}",
            )(x)
            x = x + TemporalAttention(
                dim=self.dim, heads=self.heads, max_len=self.max_len,
                use_pe=self.use_pe, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"attention_blocks_{i}",
            )(n, frames=frames)
        n = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="ff_norm"
        )(x)
        return x + GEGLUFeedForward(
            dim=self.dim, chunk_tokens=self.ff_chunk_tokens,
            dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(n)


class TemporalTransformer(nn.Module):
    """AnimateDiff motion module (VanillaTemporalModule + TemporalTransformer3DModel).

    ``((b f), h, w, c)`` -> GN -> linear proj_in -> temporal blocks over
    ``((b h w), f, c)`` -> zero-init linear proj_out -> +residual.
    """

    dim: int
    heads: int = 8
    depth: int = 1
    attention_blocks_per_layer: int = 2
    max_len: int = 32
    use_pe: bool = True
    norm_eps: float = 1e-6
    ff_chunk_tokens: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, frames: int) -> jnp.ndarray:
        # frames == 1: a single frame attends only to itself, so the module
        # reduces to a residual no-op at init (zero-init proj_out) — it still
        # runs so stage-1 and stage-2 parameter structures stay distinct.
        from ..ops.attention import use_fused_temporal

        bf, h, w, c = x.shape
        b = bf // frames
        residual = x
        x = FusedGroupNorm(
            num_groups=32, epsilon=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm",
        )(x)
        x = x.reshape(bf, h * w, c)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)

        # With the Pallas backends, stay in the spatial ((b f), l, c) layout
        # and attend over frames in-kernel: this removes the two full-tensor
        # HBM rearranges below AND the padded fp32 (.., f, f) logits that
        # dominate the XLA path's cost (PERF.md motion-module findings).
        if use_fused_temporal(frames):
            for i in range(self.depth):
                x = TemporalTransformerBlock(
                    dim=self.dim, heads=self.heads,
                    num_attention_blocks=self.attention_blocks_per_layer,
                    max_len=self.max_len, use_pe=self.use_pe,
                    ff_chunk_tokens=self.ff_chunk_tokens,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"blocks_{i}",
                )(x, frames=frames)
        else:
            # ((b f), l, c) -> ((b l), f, c)
            x = rearrange(x, "(b f) l c -> (b l) f c", b=b, f=frames)
            for i in range(self.depth):
                x = TemporalTransformerBlock(
                    dim=self.dim, heads=self.heads,
                    num_attention_blocks=self.attention_blocks_per_layer,
                    max_len=self.max_len, use_pe=self.use_pe,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"blocks_{i}",
                )(x)
            x = rearrange(x, "(b l) f c -> (b f) l c", b=b, f=frames)

        x = nn.Dense(
            c, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros, name="proj_out",
        )(x)
        return residual + x.reshape(bf, h, w, c)
