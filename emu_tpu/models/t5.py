"""T5 decoder stack — the core of Emu1's Causal Former adapter.

Behavioral model: the reference's vendored HF T5 fork
(Emu1/models/modeling_t5.py), whose single functional change is that
cross-attention K/V project from `config.encoder_width` (the ViT width,
1408) instead of d_model (modeling_t5.py:423-424). Only the decoder stack is
used, driven with `inputs_embeds` = 32 learned causal tokens and
`encoder_hidden_states` = ViT features (causal_former.py:43-62).

T5 numerics preserved: RMS layer norm (no bias, eps 1e-6), *unscaled*
attention (no 1/sqrt(d) — folded into init by T5 convention), relative
position bias computed from layer 0's bucket embedding and shared by all
self-attention layers, ReLU feed-forward, all linears bias-free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from emu_tpu.config import T5Config
from emu_tpu.ops import layers as L


def init(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> dict:
    inner = cfg.num_heads * cfg.d_kv
    keys = iter(jax.random.split(key, 4))

    def layer_init(k):
        ks = iter(jax.random.split(k, 12))

        def lin(kk, i, o):
            return L.dense_init(kk, i, o, use_bias=False, dtype=dtype)

        return {
            "self_attn": {
                "ln": jnp.ones((cfg.d_model,), dtype),
                "q": lin(next(ks), cfg.d_model, inner),
                "k": lin(next(ks), cfg.d_model, inner),
                "v": lin(next(ks), cfg.d_model, inner),
                "o": lin(next(ks), inner, cfg.d_model),
            },
            "cross_attn": {
                "ln": jnp.ones((cfg.d_model,), dtype),
                "q": lin(next(ks), cfg.d_model, inner),
                # K/V read the vision width (the fork's one change).
                "k": lin(next(ks), cfg.encoder_width, inner),
                "v": lin(next(ks), cfg.encoder_width, inner),
                "o": lin(next(ks), inner, cfg.d_model),
            },
            "ff": {
                "ln": jnp.ones((cfg.d_model,), dtype),
                "wi": lin(next(ks), cfg.d_model, cfg.d_ff),
                "wo": lin(next(ks), cfg.d_ff, cfg.d_model),
            },
        }

    return {
        "layers": jax.vmap(layer_init)(
            jax.random.split(next(keys), cfg.num_layers)),
        "rel_bias": L._trunc_normal(
            next(keys),
            (cfg.relative_attention_num_buckets, cfg.num_heads), 0.02, dtype),
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }


def _relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """Causal (bidirectional=False) T5 bucketing, ref modeling_t5.py:345-390."""
    rb = np.zeros_like(rel_pos)
    rel_pos = -np.minimum(rel_pos, 0)
    max_exact = num_buckets // 2
    is_small = rel_pos < max_exact
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    rb += np.where(is_small, rel_pos, large)
    return rb


def position_bias(params: dict, cfg: T5Config, q_len: int, k_len: int
                  ) -> jax.Array:
    """[1, H, q_len, k_len] additive bias from layer-0's bucket embedding."""
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    bias = params["rel_bias"][jnp.asarray(buckets)]       # [q, k, H]
    return bias.transpose(2, 0, 1)[None]


def _t5_attention(p, x_q, x_kv, n_heads, d_kv, bias=None):
    """Unscaled T5 attention. x_q: [B, Q, *], x_kv: [B, K, *]."""
    b, q_len, _ = x_q.shape
    k_len = x_kv.shape[1]
    q = L.dense(p["q"], x_q).reshape(b, q_len, n_heads, d_kv)
    k = L.dense(p["k"], x_kv).reshape(b, k_len, n_heads, d_kv)
    v = L.dense(p["v"], x_kv).reshape(b, k_len, n_heads, d_kv)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                   preferred_element_type=jnp.float32).astype(x_q.dtype)
    return L.dense(p["o"], o.reshape(b, q_len, n_heads * d_kv))


def decoder_forward(params: dict, cfg: T5Config, inputs_embeds: jax.Array,
                    encoder_hidden: jax.Array) -> jax.Array:
    """Causal decoder over `inputs_embeds`, cross-attending `encoder_hidden`.

    Returns last_hidden_state [B, Q, d_model] (post final RMS norm),
    matching T5Stack with is_decoder=True in eval mode.
    """
    b, q_len, _ = inputs_embeds.shape
    eps = cfg.layer_norm_epsilon

    # causal mask folded into the bias (T5 adds -inf mask + position bias)
    qi = np.arange(q_len)[:, None]
    ki = np.arange(q_len)[None, :]
    causal = jnp.asarray(np.where(ki <= qi, 0.0, -1e30), jnp.float32)
    self_bias = position_bias(params, cfg, q_len, q_len) + causal[None, None]

    def body(x, p):
        h = L.rms_norm(p["self_attn"]["ln"], x, eps)
        x = x + _t5_attention(p["self_attn"], h, h, cfg.num_heads, cfg.d_kv,
                              bias=self_bias)
        h = L.rms_norm(p["cross_attn"]["ln"], x, eps)
        x = x + _t5_attention(p["cross_attn"], h, encoder_hidden,
                              cfg.num_heads, cfg.d_kv)
        h = L.rms_norm(p["ff"]["ln"], x, eps)
        h = jax.nn.relu(L.dense(p["ff"]["wi"], h))
        x = x + L.dense(p["ff"]["wo"], h)
        return x, None

    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    return L.rms_norm(params["final_ln"], x, eps)


sharding_rules = [
    (r"layers/(self|cross)_attn/[qkv]/kernel", P(None, None, "model")),
    (r"layers/(self|cross)_attn/o/kernel", P(None, "model", None)),
    (r"layers/ff/wi/kernel", P(None, None, "model")),
    (r"layers/ff/wo/kernel", P(None, "model", None)),
]
