"""Shared conv/norm/attention building blocks for the diffusion models.

NHWC layout throughout (TPU-native; diffusers is NCHW — the checkpoint
converter transposes conv kernels [O,I,kh,kw] → [kh,kw,I,O]).
Parameter names mirror diffusers module names so conversion is mechanical.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from emu_tpu.ops import layers as L


def conv_init(key, kh, kw, in_ch, out_ch, dtype=jnp.float32) -> dict:
    fan_in = kh * kw * in_ch
    bound = 1 / math.sqrt(fan_in)
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), dtype,
                                     -bound, bound),
        "bias": jax.random.uniform(k2, (out_ch,), dtype, -bound, bound),
    }


def conv2d(p: dict, x: jax.Array, stride: int = 1, padding: int = 1
           ) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def group_norm(p: dict, x: jax.Array, groups: int, eps: float) -> jax.Array:
    """GroupNorm over channels (last axis), computed in fp32."""
    dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(dtype)


def group_norm_init(ch: int, dtype=jnp.float32) -> dict:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def timestep_embedding(timesteps: jax.Array, dim: int,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, diffusers get_timestep_embedding semantics."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                           axis=-1)


def attention(p: dict, x: jax.Array, ctx: Optional[jax.Array],
              n_heads: int) -> jax.Array:
    """Diffusers-style attention: to_q/k/v bias-free, to_out with bias.

    x: [B, N, C]; ctx: [B, M, C_ctx] (None → self-attention). Routed
    through the shared dispatcher so the 1024-4096-token latent
    self-attention of the 128² SDXL UNet runs on the Pallas flash kernel
    instead of materializing the N² logits in HBM."""
    from emu_tpu.ops.attention import dot_product_attention
    b, n, c = x.shape
    kv = x if ctx is None else ctx
    hd = c // n_heads
    q = L.dense(p["to_q"], x).reshape(b, n, n_heads, hd)
    k = L.dense(p["to_k"], kv).reshape(b, kv.shape[1], n_heads, hd)
    v = L.dense(p["to_v"], kv).reshape(b, kv.shape[1], n_heads, hd)
    o = dot_product_attention(q, k, v, scale=hd ** -0.5)
    return L.dense(p["to_out"], o.reshape(b, n, c))


def attention_init(key, ch: int, ctx_dim: Optional[int], dtype=jnp.float32
                   ) -> dict:
    ks = jax.random.split(key, 4)
    kv_dim = ctx_dim if ctx_dim is not None else ch
    return {
        "to_q": L.dense_init(ks[0], ch, ch, use_bias=False, dtype=dtype),
        "to_k": L.dense_init(ks[1], kv_dim, ch, use_bias=False, dtype=dtype),
        "to_v": L.dense_init(ks[2], kv_dim, ch, use_bias=False, dtype=dtype),
        "to_out": L.dense_init(ks[3], ch, ch, dtype=dtype),
    }


def resnet_block_init(key, in_ch: int, out_ch: int,
                      temb_dim: Optional[int], dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "norm1": group_norm_init(in_ch, dtype),
        "conv1": conv_init(ks[0], 3, 3, in_ch, out_ch, dtype),
        "norm2": group_norm_init(out_ch, dtype),
        "conv2": conv_init(ks[2], 3, 3, out_ch, out_ch, dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = L.dense_init(ks[1], temb_dim, out_ch,
                                          dtype=dtype)
    if in_ch != out_ch:
        p["conv_shortcut"] = conv_init(ks[3], 1, 1, in_ch, out_ch, dtype)
    return p


def resnet_block(p: dict, x: jax.Array, temb: Optional[jax.Array],
                 groups: int, eps: float) -> jax.Array:
    """Diffusers ResnetBlock2D (time_scale_shift="default")."""
    h = group_norm(p["norm1"], x, groups, eps)
    h = jax.nn.silu(h)
    h = conv2d(p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        t = L.dense(p["time_emb_proj"], jax.nn.silu(temb))
        h = h + t[:, None, None, :]
    h = group_norm(p["norm2"], h, groups, eps)
    h = jax.nn.silu(h)
    h = conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h
