"""Attention dispatch: XLA reference path + Pallas flash path.

This is the framework's replacement for the reference's xformers
`memory_efficient_attention` dependency (ref: Emu1/models/eva_vit_model.py:22,
Emu2/emu/eva_vit.py:19) — the one piece of "native" kernel surface the
reference outsources to CUDA. On TPU the flash kernel lives in
`emu_tpu.ops.flash_attention` (Pallas); the XLA einsum path below is the
always-correct fallback (CPU tests, tiny shapes, and shapes the kernel does
not cover).

Layout: q [B, Sq, H, D], k/v [B, Skv, H, D] (BSHD — avoids the transpose
churn of torch's BHSD and matches how XLA wants to tile the MXU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free
                  # for fully-masked rows (left-padded batches)


def _xla_attention(q, k, v, bias, mask, scale, causal):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        causal_mask = (ki <= qi + (skv - sq))[None, None]
        logits = jnp.where(causal_mask, logits, _NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    backend: Optional[str] = None,
) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax.

    mask: broadcastable to [B, H, Sq, Skv]; True = attend.
    bias: additive, broadcastable to [B, H, Sq, Skv] (e.g. T5 rel-pos bias).
    causal: apply a causal mask aligned to the *end* of the kv sequence
      (correct for single-token decode against a prefix cache).
    backend: "xla" | "flash" | None (auto).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if backend is None:
        backend = _auto_backend(q, bias, mask)
    if backend == "flash":
        from emu_tpu.ops import flash_attention as fa
        return fa.flash_attention(q, k, v, bias=bias, mask=mask, scale=scale,
                                  causal=causal)
    return _xla_attention(q, k, v, bias, mask, scale, causal)


def _auto_backend(q, bias, mask) -> str:
    # Flash kernel only pays off for long sequences on real TPU hardware;
    # biasful/short/CPU cases stay on the fused XLA path.
    if jax.default_backend() != "tpu":
        return "xla"
    if bias is not None:
        return "xla"
    sq = q.shape[1]
    if sq < 512 or q.shape[-1] > 256:
        return "xla"
    return "flash"
