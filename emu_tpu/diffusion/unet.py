"""UNet2DConditionModel: the diffusion denoiser for both Emu generations.

Config-driven re-implementation of the diffusers UNet the reference loads:
- Emu2: SDXL-class, cross_attention_dim=1792 (conditioned directly on the
  visual-embedding space), `addition_embed_type="text_time"` with
  text_embeds = mean(prompt_embeds) and 6 SDXL time_ids
  (ref Emu2/emu/diffusion.py:107-113, conf/diffusion_config/unet/config.json);
- Emu1: SD-v1.5-class with cross_attention_dim = LLM width
  (ref Emu1/models/pipeline.py:246-249).

Structure (diffusers UNet2DConditionModel semantics):
conv_in → time embedding (+ SDXL additional embedding) → down blocks
(ResNet [+ Transformer2D] ×L, downsample) → mid (ResNet, Transformer2D,
ResNet) → up blocks (skip-concat ResNet [+ Transformer2D] ×(L+1), upsample)
→ GroupNorm/silu/conv_out. Transformer2D = GroupNorm(eps 1e-6) → proj →
N×(self-attn, cross-attn, GEGLU FF) → proj → residual.

`attention_head_dim` follows the diffusers config convention where the
per-block value is the *head count* (SDXL: [5,10,20] heads of dim 64).

TPU notes: NHWC activations, attention over flattened HW tokens runs on the
MXU via the shared attention op; the whole step jits into one program that
the CFG loop batches (cond+uncond in one [2B] pass).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from emu_tpu.config import UNetConfig
from emu_tpu.diffusion import layers as D
from emu_tpu.ops import layers as L


# ---------------------------------------------------------------------------
# Transformer2D
# ---------------------------------------------------------------------------


def _tf_block_init(key, ch, ctx_dim, dtype):
    ks = jax.random.split(key, 5)
    return {
        "norm1": L.layer_norm_init(ch, dtype),
        "attn1": D.attention_init(ks[0], ch, None, dtype),
        "norm2": L.layer_norm_init(ch, dtype),
        "attn2": D.attention_init(ks[1], ch, ctx_dim, dtype),
        "norm3": L.layer_norm_init(ch, dtype),
        "ff": {
            "proj_in": L.dense_init(ks[2], ch, ch * 8, dtype=dtype),
            "proj_out": L.dense_init(ks[3], ch * 4, ch, dtype=dtype),
        },
    }


def _tf_block(p, x, ctx, n_heads):
    x = x + D.attention(p["attn1"], L.layer_norm(p["norm1"], x, 1e-5), None,
                        n_heads)
    x = x + D.attention(p["attn2"], L.layer_norm(p["norm2"], x, 1e-5), ctx,
                        n_heads)
    h = L.dense(p["ff"]["proj_in"], L.layer_norm(p["norm3"], x, 1e-5))
    a, gate = jnp.split(h, 2, axis=-1)
    x = x + L.dense(p["ff"]["proj_out"],
                    a * jax.nn.gelu(gate, approximate=False))
    return x


def _transformer2d_init(key, ch, n_layers, ctx_dim, cfg: UNetConfig, dtype):
    ks = jax.random.split(key, n_layers + 2)
    p = {
        "norm": D.group_norm_init(ch, dtype),
        "blocks": [_tf_block_init(ks[i], ch, ctx_dim, dtype)
                   for i in range(n_layers)],
    }
    if cfg.use_linear_projection:
        p["proj_in"] = L.dense_init(ks[-2], ch, ch, dtype=dtype)
        p["proj_out"] = L.dense_init(ks[-1], ch, ch, dtype=dtype)
    else:
        p["proj_in"] = D.conv_init(ks[-2], 1, 1, ch, ch, dtype)
        p["proj_out"] = D.conv_init(ks[-1], 1, 1, ch, ch, dtype)
    return p


def _transformer2d(p, x, ctx, n_heads, cfg: UNetConfig):
    b, h, w, c = x.shape
    residual = x
    x = D.group_norm(p["norm"], x, cfg.norm_num_groups, 1e-6)
    if cfg.use_linear_projection:
        x = L.dense(p["proj_in"], x.reshape(b, h * w, c))
    else:
        x = D.conv2d(p["proj_in"], x, padding=0).reshape(b, h * w, c)
    for blk in p["blocks"]:
        x = _tf_block(blk, x, ctx, n_heads)
    if cfg.use_linear_projection:
        x = L.dense(p["proj_out"], x).reshape(b, h, w, c)
    else:
        x = D.conv2d(p["proj_out"], x.reshape(b, h, w, c), padding=0)
    return x + residual


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: UNetConfig, dtype=jnp.float32) -> dict:
    chs = cfg.block_out_channels
    temb_dim = chs[0] * 4
    keys = iter(jax.random.split(key, 64))
    params = {
        "conv_in": D.conv_init(next(keys), 3, 3, cfg.in_channels, chs[0],
                               dtype),
        "time_embedding": {
            "linear_1": L.dense_init(next(keys), chs[0], temb_dim,
                                     dtype=dtype),
            "linear_2": L.dense_init(next(keys), temb_dim, temb_dim,
                                     dtype=dtype),
        },
        "conv_norm_out": D.group_norm_init(chs[0], dtype),
        "conv_out": D.conv_init(next(keys), 3, 3, chs[0], cfg.out_channels,
                                dtype),
    }
    if cfg.addition_embed_type == "text_time":
        params["add_embedding"] = {
            "linear_1": L.dense_init(
                next(keys), cfg.projection_class_embeddings_input_dim,
                temb_dim, dtype=dtype),
            "linear_2": L.dense_init(next(keys), temb_dim, temb_dim,
                                     dtype=dtype),
        }

    # down blocks
    down = []
    out_ch = chs[0]
    for i, block_type in enumerate(cfg.down_block_types):
        in_ch, out_ch = out_ch, chs[i]
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(D.resnet_block_init(
                next(keys), in_ch if j == 0 else out_ch, out_ch, temb_dim,
                dtype))
            if block_type == "CrossAttnDownBlock2D":
                blk["attentions"].append(_transformer2d_init(
                    next(keys), out_ch, cfg.transformer_layers_per_block[i],
                    cfg.cross_attention_dim, cfg, dtype))
        if i < len(cfg.down_block_types) - 1:
            blk["downsamplers"] = D.conv_init(next(keys), 3, 3, out_ch,
                                              out_ch, dtype)
        down.append(blk)
    params["down_blocks"] = down

    # mid
    mid_ch = chs[-1]
    params["mid_block"] = {
        "resnets": [D.resnet_block_init(next(keys), mid_ch, mid_ch, temb_dim,
                                        dtype) for _ in range(2)],
        "attentions": [_transformer2d_init(
            next(keys), mid_ch, cfg.transformer_layers_per_block[-1],
            cfg.cross_attention_dim, cfg, dtype)],
    }

    # up blocks (reversed channels)
    up = []
    rev_chs = list(reversed(chs))
    rev_tf = list(reversed(cfg.transformer_layers_per_block))
    prev_out = mid_ch
    for i, block_type in enumerate(cfg.up_block_types):
        out_ch = rev_chs[i]
        skip_in_ch = rev_chs[min(i + 1, len(chs) - 1)]
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            res_skip = skip_in_ch if j == cfg.layers_per_block else out_ch
            res_in = prev_out if j == 0 else out_ch
            blk["resnets"].append(D.resnet_block_init(
                next(keys), res_in + res_skip, out_ch, temb_dim, dtype))
            if block_type == "CrossAttnUpBlock2D":
                blk["attentions"].append(_transformer2d_init(
                    next(keys), out_ch, rev_tf[i], cfg.cross_attention_dim,
                    cfg, dtype))
        if i < len(cfg.up_block_types) - 1:
            blk["upsamplers"] = D.conv_init(next(keys), 3, 3, out_ch, out_ch,
                                            dtype)
        up.append(blk)
        prev_out = out_ch
    params["up_blocks"] = up
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _heads(cfg: UNetConfig, block_idx: int) -> int:
    return cfg.attention_head_dim[block_idx]


def forward(params: dict, cfg: UNetConfig, sample: jax.Array,
            timesteps: jax.Array, encoder_hidden: jax.Array,
            added_text_embeds: Optional[jax.Array] = None,
            added_time_ids: Optional[jax.Array] = None,
            deep_cache: Optional[jax.Array] = None,
            return_cache: bool = False):
    """Predict noise. sample [B, H, W, C_lat]; timesteps [B];
    encoder_hidden [B, M, cross_attention_dim].

    Block caching (DeepCache-style, arXiv:2312.03209 "Cache Me if You
    Can" / 2310.01407): adjacent denoise steps change the deep UNet
    features slowly, so a pipeline may reuse them. With
    `return_cache=True` the full pass also returns the feature entering
    the LAST up block (everything below it — down blocks 1.., mid, up
    blocks ..-2 — is the expensive transformer-heavy interior). With
    `deep_cache=<that feature>` only the shallow path reruns: conv_in +
    down block 0 (whose skips feed the last up block) + the last up
    block + output head. Exact contract: cached(x, t, cache_of(x, t))
    == full(x, t). Returns `out` or `(out, cache)` when either flag/arg
    is used."""
    chs = cfg.block_out_channels
    groups = cfg.norm_num_groups

    # 1. time (+ SDXL additional) embedding
    temb = D.timestep_embedding(timesteps, chs[0], cfg.flip_sin_to_cos,
                                cfg.freq_shift)
    temb = temb.astype(sample.dtype)
    temb = L.dense(params["time_embedding"]["linear_2"],
                   jax.nn.silu(L.dense(params["time_embedding"]["linear_1"],
                                       temb)))
    if cfg.addition_embed_type == "text_time":
        b = sample.shape[0]
        tids = D.timestep_embedding(added_time_ids.reshape(-1),
                                    cfg.addition_time_embed_dim,
                                    cfg.flip_sin_to_cos, cfg.freq_shift)
        tids = tids.reshape(b, -1)
        add = jnp.concatenate(
            [added_text_embeds.astype(jnp.float32), tids], axis=-1)
        add = add.astype(sample.dtype)
        aug = L.dense(params["add_embedding"]["linear_2"],
                      jax.nn.silu(L.dense(params["add_embedding"]["linear_1"],
                                          add)))
        temb = temb + aug

    # 2. down — block 0 (the shallow path; its skips feed the last up
    # block, so it reruns even for cached steps)
    x = D.conv2d(params["conv_in"], sample)
    skips = [x]
    blk0 = params["down_blocks"][0]
    for j, res in enumerate(blk0["resnets"]):
        x = D.resnet_block(res, x, temb, groups, cfg.norm_eps)
        if blk0["attentions"]:
            x = _transformer2d(blk0["attentions"][j], x, encoder_hidden,
                               _heads(cfg, 0), cfg)
        skips.append(x)

    n_blocks = len(cfg.up_block_types)
    if deep_cache is None:
        # 2b. deep down blocks
        if "downsamplers" in blk0:
            x = D.conv2d(blk0["downsamplers"], x, stride=2)
            skips.append(x)
        for i, blk in enumerate(params["down_blocks"][1:], start=1):
            has_attn = len(blk["attentions"]) > 0
            for j, res in enumerate(blk["resnets"]):
                x = D.resnet_block(res, x, temb, groups, cfg.norm_eps)
                if has_attn:
                    x = _transformer2d(blk["attentions"][j], x,
                                       encoder_hidden, _heads(cfg, i), cfg)
                skips.append(x)
            if "downsamplers" in blk:
                x = D.conv2d(blk["downsamplers"], x, stride=2)
                skips.append(x)

        # 3. mid
        mid = params["mid_block"]
        x = D.resnet_block(mid["resnets"][0], x, temb, groups, cfg.norm_eps)
        x = _transformer2d(mid["attentions"][0], x, encoder_hidden,
                           _heads(cfg, len(chs) - 1), cfg)
        x = D.resnet_block(mid["resnets"][1], x, temb, groups, cfg.norm_eps)

        # 4. deep up blocks (all but the last)
        for i, blk in enumerate(params["up_blocks"][:-1]):
            has_attn = len(blk["attentions"]) > 0
            head_idx = n_blocks - 1 - i
            for j, res in enumerate(blk["resnets"]):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = D.resnet_block(res, x, temb, groups, cfg.norm_eps)
                if has_attn:
                    x = _transformer2d(blk["attentions"][j], x,
                                       encoder_hidden, _heads(cfg, head_idx),
                                       cfg)
            if "upsamplers" in blk:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = D.conv2d(blk["upsamplers"], x)
        cache = x
    else:
        cache = deep_cache
        x = cache

    # 4b. last up block — consumes the shallow skips
    blk = params["up_blocks"][-1]
    for j, res in enumerate(blk["resnets"]):
        skip = skips.pop()
        x = jnp.concatenate([x, skip], axis=-1)
        x = D.resnet_block(res, x, temb, groups, cfg.norm_eps)
        if blk["attentions"]:
            x = _transformer2d(blk["attentions"][j], x, encoder_hidden,
                               _heads(cfg, 0), cfg)
    if "upsamplers" in blk:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        x = D.conv2d(blk["upsamplers"], x)

    # 5. out
    x = D.group_norm(params["conv_norm_out"], x, groups, cfg.norm_eps)
    x = jax.nn.silu(x)
    out = D.conv2d(params["conv_out"], x)
    if return_cache or deep_cache is not None:
        return out, cache
    return out
