"""CLIP ViT-L/14 vision tower with projection head.

Behavioral parity: HF ``CLIPVisionModelWithProjection`` as used by the
reference to embed the reference image into the UNets' cross-attention context
(``train_stage_1.py:303,600-606``; the sd-image-variations image encoder is a
CLIP ViT-L/14 with quick_gelu and a 768-d projection). Output is
``image_embeds`` of shape (b, projection_dim); callers unsqueeze to (b, 1, d).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiHeadAttention
from .configs import CLIPVisionConfig

# OpenAI CLIP normalization (applied by CLIPImageProcessor in the reference)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class _CLIPLayer(nn.Module):
    """One pre-LN ViT block, written as a ``(carry, None) -> (carry, None)``
    step so the 24 identical layers run under ``nn.scan`` — one compiled
    layer body instead of a 24x-unrolled HLO (the unrolled form made the
    remote-compile path pathologically slow for a net this small)."""

    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, _=None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="layer_norm1")(x)
        # CLIP attention has biases on q/k/v; reuse MultiHeadAttention's layout
        # but with bias via separate Dense layers.
        B, L, _ = h.shape
        heads, hd = c.num_heads, c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_size, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("q_proj")(h).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        k = dense("k_proj")(h).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        v = dense("v_proj")(h).reshape(B, L, heads, hd).transpose(0, 2, 1, 3)
        from ..ops.attention import dot_product_attention

        o = dot_product_attention(q, k, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)
        x = x + dense("out_proj")(o)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(h)
        return x + h, None


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(b, 224, 224, 3) normalized pixels -> image_embeds (b, projection_dim)."""
        c = self.config
        b = pixel_values.shape[0]
        n_patches = (c.image_size // c.patch_size) ** 2

        patches = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, n_patches, c.hidden_size)

        class_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_emb.astype(self.dtype), (b, 1, c.hidden_size)), patches],
            axis=1,
        )
        pos_emb = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_patches + 1, c.hidden_size), self.param_dtype,
        )
        x = x + pos_emb.astype(self.dtype)[None]

        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="pre_layrnorm")(x)
        # stacked homogeneous layers under one scanned body: params live at
        # ``layers/<sub>`` with a leading (num_layers,) axis (the converter
        # stacks the per-layer torch keys, utils/convert.py)
        scan_layers = nn.scan(
            _CLIPLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.num_layers,
        )
        x, _ = scan_layers(cfg=c, dtype=self.dtype,
                           param_dtype=self.param_dtype, name="layers")(x, None)
        pooled = x[:, 0]
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="post_layernorm")(pooled)
        return nn.Dense(c.projection_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="visual_projection")(pooled)


def clip_preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """Normalize (b, 224, 224, 3) images in [0, 1] with CLIP mean/std."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=images.dtype)
    return (images - mean) / std
