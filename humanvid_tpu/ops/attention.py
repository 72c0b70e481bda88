"""Multi-head attention for the diffusion UNets.

TPU-first design notes:

- One attention module serves all four attention flavors of the reference stack
  (spatial self-attn with concatenated reference KV, CFG-masked reference reads,
  cross-attn to CLIP image embeddings, and tiny-sequence temporal attention).
- The reference implements "uncond rows must not see the reference features"
  by *re-running* attention on the uncond half of the CFG batch
  (reference ``src/models/mutual_self_attention.py:166-186``). Here the same
  semantics are a single attention call with an additive ``-inf`` bias on the
  extra-KV keys for masked rows — softmax over the masked support is identical
  to softmax over the subset, so results match bit-for-bit in exact arithmetic
  while keeping one fused kernel and no data-dependent control flow.
- Computation runs through a swappable backend: an einsum path (XLA fuses this
  well for the modest sequence lengths here) and a Pallas flash-attention path
  for the long spatial sequences (H/8*W/8 up to ~6k tokens, KV up to 2x that).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import NEG_INF  # noqa: F401

# Module-level switch: "xla" | "flash" | "auto". Tests pin "xla"; TPU entry
# points use "auto": the Pallas flash kernel for long spatial sequences (where
# materialized logits would blow HBM — e.g. f32[48,8,6144,12288] ≈ 116 GB at
# 768x512x24f), einsum for the tiny temporal/cross sequences where kernel
# padding to the 128-lane tile would dominate.
_DEFAULT_BACKEND = "xla"
_FLASH_MIN_QLEN = 1024


def set_default_attention_backend(backend: str) -> None:
    global _DEFAULT_BACKEND
    assert backend in ("xla", "flash", "auto"), backend
    _DEFAULT_BACKEND = backend


def get_default_attention_backend() -> str:
    return _DEFAULT_BACKEND


def use_fused_temporal(frames: int) -> bool:
    """Whether motion modules should run the Pallas frame-axis attention
    kernel (spatial layout, no rearranges) instead of the XLA token-layout
    path. Trace-time decision: on by default whenever a Pallas backend is
    selected and we're not on the CPU backend (where only the TPU interpreter
    could run it). ``HVT_TEMPORAL_FUSED=1/0`` forces it (1 is used by CPU
    tests under ``force_tpu_interpret_mode``)."""
    import os

    if frames <= 1:
        return False
    mode = os.environ.get("HVT_TEMPORAL_FUSED", "auto")
    if mode != "auto":
        return mode == "1"
    import jax

    return _DEFAULT_BACKEND != "xla" and jax.default_backend() != "cpu"


def _xla_attention(q, k, v, bias):
    """Reference einsum attention. q:(B,H,Lq,D) k,v:(B,H,Lk,D) bias:(B,1,Lq,Lk)|None."""
    dtype = q.dtype
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(dtype)


def _chunked_xla_attention(q, k, v, bias, chunk: Optional[int] = None,
                           logits_budget_bytes: int = 1 << 30):
    """Memory-bounded einsum attention: a lax.scan over q chunks keeps live
    logits at O(B*H*chunk*Lk) instead of O(B*H*Lq*Lk). Pure-XLA fallback for
    long sequences when the Pallas kernel is unavailable/untrusted."""
    b, h, lq, d = q.shape
    if chunk is None:
        # keep the fp32 logits block under the budget (default 1 GB)
        lk = k.shape[2]
        chunk = max(128, min(lq, logits_budget_bytes // max(b * h * lk * 4, 1)))
    if lq <= chunk:
        return _xla_attention(q, k, v, bias)
    # the scan body reuses one bias for every q chunk, which is only correct
    # when the bias is q-independent; per-query biases would need slicing
    assert bias is None or bias.shape[2] == 1, (
        "chunked attention requires a query-independent bias; got "
        f"bias.shape={bias.shape}")
    pad = (-lq) % chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n = qp.shape[2] // chunk
    q_chunks = jnp.moveaxis(qp.reshape(b, h, n, chunk, d), 2, 0)

    def step(_, qc):
        return None, _xla_attention(qc, k, v, bias)

    _, out = jax.lax.scan(step, None, q_chunks)  # (n, b, h, chunk, d)
    out = jnp.moveaxis(out, 0, 2).reshape(b, h, n * chunk, d)
    return out[:, :, :lq]


def resolve_attention_backend(backend: Optional[str], lq: int,
                              head_dim: int) -> str:
    """Resolve "auto" to a concrete backend for a (Lq, head_dim) shape."""
    backend = backend or _DEFAULT_BACKEND
    if backend == "auto":
        import os

        long_backend = os.environ.get("HVT_LONG_ATTENTION", "flash")
        # r4: huge head dims (the VAE's single 512-wide head) also route to
        # the flash kernel — measured 60 TF/s vs 3.9 for the chunked-XLA
        # path at the decode shape (8, 6144, d=512), 15x per call, and the
        # old VMEM-fault concern did not reproduce at the (1024, 1024)
        # blocks (tools/microbench.py vaeattn). HVT_LONG_ATTENTION=chunked
        # restores the old route if ever needed.
        backend = long_backend if lq >= _FLASH_MIN_QLEN else "xla"
    return backend


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, L, D) tensors."""
    backend = resolve_attention_backend(backend, q.shape[2], q.shape[-1])
    if backend == "flash":
        from .flash_attention import flash_attention  # local import: pallas optional

        return flash_attention(q, k, v, bias)
    if backend == "chunked":
        return _chunked_xla_attention(q, k, v, bias)
    return _xla_attention(q, k, v, bias)


class MultiHeadAttention(nn.Module):
    """Multi-head attention matching diffusers' ``Attention`` parameterization.

    Parameters are named ``to_q / to_k / to_v / to_out`` so that converted
    torch checkpoints map 1:1 (q/k/v have no bias in SD1.5; out has bias).

    Call signature supports the reference-feature read: ``extra_kv`` is a
    second sequence appended to the self-attention KV, and ``extra_kv_disable``
    is a per-row boolean that hides the extra keys from that row (the CFG
    uncond rows in the reference read path).
    """

    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None  # None => self-attention
    out_bias: bool = True
    # SD1.5 UNet attention has no q/k/v biases; the VAE mid-block attention
    # (diffusers AutoencoderKL) DOES — converted sd-vae-ft-mse checkpoints
    # carry to_{q,k,v}.bias that must have somewhere to land
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        extra_kv: Optional[jnp.ndarray] = None,
        extra_kv_disable: Optional[jnp.ndarray] = None,
        backend: Optional[str] = None,
        temporal_frames: Optional[int] = None,
    ) -> jnp.ndarray:
        B, Lq, _ = x.shape
        inner = self.heads * self.head_dim
        kv_src = x if context is None else context
        dense = partial(
            nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype
        )

        if temporal_frames is not None:
            # Fused frame-axis attention: x is ((b f), l, c) — the UNet's
            # native spatial layout — and attention runs over the frame axis
            # via the Pallas temporal kernel, with NO rearrange to the
            # ((b l), f, c) token layout and no head split/merge transposes.
            assert context is None and extra_kv is None, \
                "temporal attention is self-attention"
            from .temporal_attention import temporal_attention

            q = dense(inner, use_bias=self.qkv_bias, name="to_q")(x)
            k = dense(inner, use_bias=self.qkv_bias, name="to_k")(x)
            v = dense(inner, use_bias=self.qkv_bias, name="to_v")(x)
            b = B // temporal_frames
            out = temporal_attention(
                q.reshape(b, temporal_frames, Lq, inner),
                k.reshape(b, temporal_frames, Lq, inner),
                v.reshape(b, temporal_frames, Lq, inner),
                self.heads,
            ).reshape(B, Lq, inner)
            return dense(self.query_dim, use_bias=self.out_bias, name="to_out")(out)

        q = dense(inner, use_bias=self.qkv_bias, name="to_q")(x)
        kv_in = kv_src
        if extra_kv is not None:
            kv_in = jnp.concatenate([kv_src, extra_kv.astype(kv_src.dtype)], axis=1)
        k = dense(inner, use_bias=self.qkv_bias, name="to_k")(kv_in)
        v = dense(inner, use_bias=self.qkv_bias, name="to_v")(kv_in)

        key_bias = None  # (B, Lk) additive, NEG_INF hides a key from a row
        if extra_kv is not None and extra_kv_disable is not None:
            # CFG reference-KV disable: hide the appended keys from the
            # uncond rows. Broadcasts over heads and query positions.
            n_extra = extra_kv.shape[1]
            n_self = kv_src.shape[1]
            key_is_extra = jnp.concatenate(
                [jnp.zeros((n_self,), bool), jnp.ones((n_extra,), bool)]
            )
            key_bias = jnp.where(
                extra_kv_disable[:, None] & key_is_extra[None, :],
                NEG_INF,
                0.0,
            ).astype(jnp.float32)

        resolved = resolve_attention_backend(backend, Lq, self.head_dim)
        if resolved == "flash":
            # Packed path: the kernel slices heads from the channel axis
            # internally, so no head split/merge relayout (whose D=40 lane
            # padding cost 3.2x HBM copies) exists in the program at all.
            from .flash_attention import flash_attention_packed

            out = flash_attention_packed(q, k, v, self.heads, key_bias)
        else:
            def split_heads(t):
                return t.reshape(
                    B, t.shape[1], self.heads, self.head_dim).transpose(0, 2, 1, 3)

            bias4 = (None if key_bias is None
                     else key_bias[:, None, None, :])
            out = dot_product_attention(
                split_heads(q), split_heads(k), split_heads(v), bias4,
                backend=resolved)
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, inner)
        return dense(self.query_dim, use_bias=self.out_bias, name="to_out")(out)
