"""Causal Former: Emu1's BLIP2-QFormer-style vision→language adapter.

32 learned "causal tokens" run through a T5-base decoder stack whose
cross-attention reads the ViT features, then project to the LLM width.
Ref: Emu1/models/causal_former.py:15-62.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emu_tpu.config import T5Config
from emu_tpu.models import t5
from emu_tpu.ops import layers as L


def init(key: jax.Array, cfg: T5Config, n_causal: int, output_dim: int,
         dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "cformer": t5.init(k1, cfg, dtype),
        # normal(0, 0.02), ref causal_former.py:36-39
        "causal_tokens": 0.02 * jax.random.normal(
            k2, (1, n_causal, cfg.d_model), dtype),
        "projection": L.dense_init(k3, cfg.d_model, output_dim, dtype=dtype),
    }


def forward(params: dict, cfg: T5Config, img_embeds: jax.Array) -> jax.Array:
    """[B, n_patch, C_vis] → [B, n_causal, output_dim]."""
    b = img_embeds.shape[0]
    tokens = jnp.broadcast_to(
        params["causal_tokens"],
        (b,) + params["causal_tokens"].shape[1:]).astype(img_embeds.dtype)
    out = t5.decoder_forward(params["cformer"], cfg, tokens, img_embeds)
    return L.dense(params["projection"], out)


sharding_rules = [("cformer/" + pat, spec) for pat, spec in t5.sharding_rules]
