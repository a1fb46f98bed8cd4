"""Shared transformer utilities (ref Emu1/models/transformer.py:16-311):
AttentionalPooler (learned-query cross-attention pooling over ViT tokens),
PatchDropout (training-time token dropping), and generic attention with the
scaled-cosine option — the remaining pieces of the reference's shared
component layer (SURVEY §2.1 #9). These sit outside the Emu composites'
inference path (the released models pool via cls/avg instead) but are part
of the EVA-CLIP checkpoint surface.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from emu_tpu.ops import layers as L


def attentional_pooler_init(key, d_model: int, context_dim: int,
                            n_head: int = 8, n_queries: int = 256,
                            dtype=jnp.float32) -> dict:
    """≙ AttentionalPooler (transformer.py:257-280): n learned queries
    cross-attend the encoder tokens through a standard MHA."""
    ks = jax.random.split(key, 6)
    return {
        "query": L._trunc_normal(ks[0], (n_queries, d_model), 0.02, dtype),
        "ln_q": L.layer_norm_init(d_model, dtype),
        "ln_k": L.layer_norm_init(context_dim, dtype),
        "q_proj": L.dense_init(ks[1], d_model, d_model, dtype=dtype),
        "k_proj": L.dense_init(ks[2], context_dim, d_model, dtype=dtype),
        "v_proj": L.dense_init(ks[3], context_dim, d_model, dtype=dtype),
        "out_proj": L.dense_init(ks[4], d_model, d_model, dtype=dtype),
    }


def attentional_pooler(params: dict, tokens: jax.Array,
                       n_head: int = 8) -> jax.Array:
    """[B, S, C_ctx] → [B, n_queries, d_model]."""
    b = tokens.shape[0]
    q_in = L.layer_norm(params["ln_q"], params["query"].astype(tokens.dtype))
    k_in = L.layer_norm(params["ln_k"], tokens)
    d = q_in.shape[-1]
    hd = d // n_head
    q = L.dense(params["q_proj"], jnp.broadcast_to(
        q_in[None], (b,) + q_in.shape)).reshape(b, -1, n_head, hd)
    k = L.dense(params["k_proj"], k_in).reshape(b, -1, n_head, hd)
    v = L.dense(params["v_proj"], k_in).reshape(b, -1, n_head, hd)
    from emu_tpu.ops.attention import dot_product_attention
    o = dot_product_attention(q, k, v, scale=hd ** -0.5)
    return L.dense(params["out_proj"], o.reshape(b, -1, d))


def patch_dropout(key: jax.Array, tokens: jax.Array, prob: float,
                  exclude_first: bool = True
                  ) -> Tuple[jax.Array, jax.Array]:
    """Training-time patch dropout (transformer.py:34-107 / eva_vit
    PatchDropout): keep a random (1-prob) subset of patch tokens, always
    keeping the cls token. Returns (kept_tokens, kept_indices)."""
    b, s, c = tokens.shape
    start = 1 if exclude_first else 0
    n_patch = s - start
    n_keep = max(1, int(n_patch * (1 - prob)))
    noise = jax.random.uniform(key, (b, n_patch))
    keep_idx = jnp.argsort(noise, axis=-1)[:, :n_keep] + start  # [B, K]
    kept = jnp.take_along_axis(tokens, keep_idx[:, :, None], axis=1)
    if exclude_first:
        kept = jnp.concatenate([tokens[:, :1], kept], axis=1)
        keep_idx = jnp.concatenate(
            [jnp.zeros((b, 1), keep_idx.dtype), keep_idx], axis=1)
    return kept, keep_idx


def scaled_cosine_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            logit_scale: jax.Array,
                            mask: Optional[jax.Array] = None,
                            max_scale: float = 100.0) -> jax.Array:
    """Cosine-similarity attention with learned per-head temperature
    (transformer.py:110-180, scale_cosine_attn option). q/k/v: [B, S, H, D];
    logit_scale: [H] log-temperature."""
    qn = q / jnp.maximum(jnp.linalg.norm(
        q.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
    kn = k / jnp.maximum(jnp.linalg.norm(
        k.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qn, kn,
                        preferred_element_type=jnp.float32)
    scale = jnp.minimum(jnp.exp(logit_scale.astype(jnp.float32)), max_scale)
    logits = logits * scale[None, :, None, None]
    if mask is not None:
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
