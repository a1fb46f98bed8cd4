"""AutoencoderKL: latent encoder/decoder for the diffusion pipelines.

Config-driven re-implementation of the diffusers VAE the reference loads
(Emu2/emu/conf/diffusion_config/vae/config.json — SDXL VAE, scaling 0.13025;
Emu1 uses the SD-1.5 VAE, scaling 0.18215). Decoder path is the hot one
(`vae.decode(latents / scaling_factor)`, ref Emu2/emu/diffusion.py:214-219,
Emu1/models/pipeline.py:180-186); the encoder serves Emu2's autoencoding
mode and image-prompt conditioning.

Structure: encoder = conv_in → down blocks (2 resnets + downsample) → mid
(resnet, single-head attention, resnet) → norm/silu/conv_out → 2*latent
channels (mean ‖ logvar) → quant_conv. decoder = post_quant_conv → conv_in
→ mid → up blocks (3 resnets + upsample) → norm/silu/conv_out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from emu_tpu.config import VAEConfig
from emu_tpu.diffusion import layers as D


def _mid_init(key, ch, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnets": [D.resnet_block_init(k1, ch, ch, None, dtype),
                    D.resnet_block_init(k2, ch, ch, None, dtype)],
        "attention": {
            "group_norm": D.group_norm_init(ch, dtype),
            **D.attention_init(k3, ch, None, dtype),
        },
    }


def _mid(p, x, groups):
    x = D.resnet_block(p["resnets"][0], x, None, groups, 1e-6)
    b, h, w, c = x.shape
    res = x
    a = D.group_norm(p["attention"]["group_norm"], x, groups, 1e-6)
    a = _vae_attention(p["attention"], a.reshape(b, h * w, c))
    x = res + a.reshape(b, h, w, c)
    return D.resnet_block(p["resnets"][1], x, None, groups, 1e-6)


def _vae_attention(p, x, chunk: int = 4096):
    """Single-head mid-block attention, Q-chunked above `chunk` tokens.

    At 1024² generation the decoder's mid block attends over 128²=16384
    tokens with 512 channels; materializing the full 16384² logits costs
    1 GB fp32 — chunking queries bounds it to chunk×N while staying exact.
    (The head dim of 512 exceeds the flash kernel's VMEM budget at this
    length, so this stays on XLA.)
    """
    import jax
    b, n, c = x.shape
    if n <= chunk:
        return D.attention(p, x, None, 1)
    from emu_tpu.ops import layers as L
    q = L.dense(p["to_q"], x)
    k = L.dense(p["to_k"], x)
    v = L.dense(p["to_v"], x)
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    qc = qp.reshape(b, -1, chunk, c)

    def one_chunk(q_blk):
        logits = jnp.einsum("bqc,bkc->bqk", q_blk, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1)
        return jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    o = jax.lax.map(one_chunk, qc.transpose(1, 0, 2, 3))
    o = o.transpose(1, 0, 2, 3).reshape(b, -1, c)[:, :n]
    return L.dense(p["to_out"], o)


def init(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> dict:
    chs = cfg.block_out_channels
    keys = iter(jax.random.split(key, 64))
    lat = cfg.latent_channels

    # encoder
    enc = {"conv_in": D.conv_init(next(keys), 3, 3, cfg.in_channels, chs[0],
                                  dtype), "down_blocks": []}
    out_ch = chs[0]
    for i in range(len(chs)):
        in_ch, out_ch = out_ch, chs[i]
        blk = {"resnets": [
            D.resnet_block_init(next(keys), in_ch if j == 0 else out_ch,
                                out_ch, None, dtype)
            for j in range(cfg.layers_per_block)]}
        if i < len(chs) - 1:
            blk["downsamplers"] = D.conv_init(next(keys), 3, 3, out_ch,
                                              out_ch, dtype)
        enc["down_blocks"].append(blk)
    enc["mid_block"] = _mid_init(next(keys), chs[-1], dtype)
    enc["conv_norm_out"] = D.group_norm_init(chs[-1], dtype)
    enc["conv_out"] = D.conv_init(next(keys), 3, 3, chs[-1], 2 * lat, dtype)

    # decoder
    dec = {"conv_in": D.conv_init(next(keys), 3, 3, lat, chs[-1], dtype),
           "mid_block": _mid_init(next(keys), chs[-1], dtype),
           "up_blocks": []}
    rev = list(reversed(chs))
    prev = chs[-1]
    for i in range(len(chs)):
        out_ch = rev[i]
        blk = {"resnets": [
            D.resnet_block_init(next(keys), prev if j == 0 else out_ch,
                                out_ch, None, dtype)
            for j in range(cfg.layers_per_block + 1)]}
        if i < len(chs) - 1:
            blk["upsamplers"] = D.conv_init(next(keys), 3, 3, out_ch, out_ch,
                                            dtype)
        dec["up_blocks"].append(blk)
        prev = out_ch
    dec["conv_norm_out"] = D.group_norm_init(chs[0], dtype)
    dec["conv_out"] = D.conv_init(next(keys), 3, 3, chs[0], cfg.out_channels,
                                  dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": D.conv_init(next(keys), 1, 1, 2 * lat, 2 * lat, dtype),
        "post_quant_conv": D.conv_init(next(keys), 1, 1, lat, lat, dtype),
    }


def encode(params: dict, cfg: VAEConfig, images: jax.Array) -> jax.Array:
    """[B, H, W, 3] in [-1, 1] → (mean, logvar) each [B, H/8, W/8, lat]."""
    groups = cfg.norm_num_groups
    p = params["encoder"]
    x = D.conv2d(p["conv_in"], images)
    for blk in p["down_blocks"]:
        for res in blk["resnets"]:
            x = D.resnet_block(res, x, None, groups, 1e-6)
        if "downsamplers" in blk:
            # diffusers encoder downsample uses asymmetric (0,1) padding
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                x, blk["downsamplers"]["kernel"].astype(x.dtype),
                (2, 2), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = (y + blk["downsamplers"]["bias"].astype(jnp.float32)
                 ).astype(images.dtype)
    x = _mid(p["mid_block"], x, groups)
    x = jax.nn.silu(D.group_norm(p["conv_norm_out"], x, groups, 1e-6))
    x = D.conv2d(p["conv_out"], x)
    moments = D.conv2d(params["quant_conv"], x, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def decode(params: dict, cfg: VAEConfig, latents: jax.Array) -> jax.Array:
    """[B, h, w, lat] (already divided by scaling_factor) → [B, H, W, 3]."""
    groups = cfg.norm_num_groups
    z = D.conv2d(params["post_quant_conv"], latents, padding=0)
    p = params["decoder"]
    x = D.conv2d(p["conv_in"], z)
    x = _mid(p["mid_block"], x, groups)
    for blk in p["up_blocks"]:
        for res in blk["resnets"]:
            x = D.resnet_block(res, x, None, groups, 1e-6)
        if "upsamplers" in blk:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = D.conv2d(blk["upsamplers"], x)
    x = jax.nn.silu(D.group_norm(p["conv_norm_out"], x, groups, 1e-6))
    return D.conv2d(p["conv_out"], x)
