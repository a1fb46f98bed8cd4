"""EVA-CLIP Vision Transformer (Emu1's ViT-g and Emu2's ViT-4B).

Behavioral model (ref: Emu1/models/eva_vit_model.py:491-688,
Emu2/emu/eva_vit.py:255-445):

- patchify (conv k=p=s → here a patchify-matmul on the MXU), prepend cls,
  add absolute position embeddings;
- N transformer blocks, pre-norm (Emu1) or post-norm (Emu2), fused QKV
  projection with q/v biases only (k bias is zero, ref eva_vit_model.py:293),
  exact-GELU MLP with `int(width*mlp_ratio)` hidden, optional SwiGLU /
  sub-LN / layerscale / 2D-RoPE variants;
- `forward_features` returns raw block output, [B, n_patch+1, width] —
  the Emu composites consume this (Emu1/models/modeling_emu.py:92,
  Emu2/emu/emu.py:80); Emu1's classifier norm+head exist only for
  checkpoint-shape parity.

TPU design: layers are stacked along a leading axis and executed with
`lax.scan` — one compiled block body regardless of depth (40/64 layers),
weights TP-shardable with a single PartitionSpec per stacked tensor.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from emu_tpu.config import VisionConfig
from emu_tpu.ops import layers as L
from emu_tpu.ops import rope as R
from emu_tpu.ops.attention import dot_product_attention


def relative_position_index(grid: int) -> np.ndarray:
    """2D relative-position bucket index over (cls + grid²) tokens.

    Ref: eva_vit_model.py RelativePositionBias (:454-489) / Attention window
    tables (:233-258): per-axis offsets shifted to [0, 2g-2], row offset
    scaled by (2g-1); three extra buckets for cls→token, token→cls, cls→cls.
    """
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]          # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    num_rel = (2 * grid - 1) ** 2 + 3
    n = grid * grid
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    w, depth = cfg.width, cfg.layers
    ahd = cfg.num_heads * cfg.head_width          # all_head_dim
    hidden = cfg.mlp_hidden

    def stack(fn):
        return jax.vmap(fn)(jax.random.split(next(keys), depth))

    def block_init(k):
        ks = iter(jax.random.split(k, 8))
        p = {
            "norm1": L.layer_norm_init(w, dtype),
            "norm2": L.layer_norm_init(w, dtype),
            "attn": {
                "qkv": {"kernel": L._trunc_normal(next(ks), (w, 3 * ahd),
                                                  0.02, dtype)},
                "q_bias": jnp.zeros((ahd,), dtype),
                "v_bias": jnp.zeros((ahd,), dtype),
                "proj": L.dense_init(next(ks), ahd, w, dtype=dtype),
            },
        }
        if cfg.subln:
            p["attn"]["inner_ln"] = L.layer_norm_init(ahd, dtype)
        if cfg.naiveswiglu:
            p["mlp"] = {
                "w1": L.dense_init(next(ks), w, hidden, dtype=dtype),
                "w2": L.dense_init(next(ks), w, hidden, dtype=dtype),
                "w3": L.dense_init(next(ks), hidden, w, dtype=dtype),
            }
            if cfg.subln:
                p["mlp"]["ffn_ln"] = L.layer_norm_init(hidden, dtype)
        else:
            p["mlp"] = {
                "fc1": L.dense_init(next(ks), w, hidden, dtype=dtype),
                "fc2": L.dense_init(next(ks), hidden, w, dtype=dtype),
            }
        if cfg.ls_init_value is not None:
            p["gamma_1"] = jnp.full((w,), cfg.ls_init_value, dtype)
            p["gamma_2"] = jnp.full((w,), cfg.ls_init_value, dtype)
        return p

    params = {
        "patch_embed": L.patch_embed_init(next(keys), cfg.patch_size, 3, w,
                                          dtype),
        "cls_token": jnp.zeros((1, 1, w), dtype),
        "blocks": stack(block_init),
    }
    if cfg.use_abs_pos_emb:
        params["pos_embed"] = L._trunc_normal(next(keys),
                                              (1, cfg.seq_len, w), 0.02, dtype)
    if cfg.use_shared_rel_pos_bias:
        num_rel = (2 * cfg.grid_size - 1) ** 2 + 3
        params["rel_pos_bias"] = jnp.zeros((num_rel, cfg.num_heads), dtype)
    if cfg.num_classes > 0:
        params["norm"] = L.layer_norm_init(w, dtype)
        params["head"] = L.dense_init(next(keys), w, cfg.num_classes,
                                      dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fused_attn_branch(cfg: VisionConfig, p: dict, x: jax.Array,
                       g1) -> Optional[jax.Array]:
    """Whole attention residual branch in head-major (BHSD) form.

    pre-norm:  x + [g1 *] proj(MHA(qkv(LN(x))));
    post-norm: x + [g1 *] LN(proj(MHA(qkv(x)))).

    The q/k/v projections are einsums with head-major *output* layout
    ("bsm,mhd->bhsd") — XLA fuses the transpose into the matmul epilogue —
    and the proj consumes the kernel's BHSD output the same way
    ("bhsd,hdw->bsw"), so the branch has no standalone HBM transposes and
    the pallas kernel slices heads on a major block axis (free, unlike
    lane-offset slices of a packed [B,S,3HD] tile at D=88: measured
    ~0.45 ms/layer faster at ViT-g batch 32 on v5e-1). q/v biases ride
    inside the kernel. Returns None when ineligible (CPU, fp32, sub-LN,
    quantized, no VMEM plan); caller falls back. EMU_TPU_FUSED_ATTN=0
    disables (snapshotted at import — ops/flags.py)."""
    from emu_tpu.ops.flags import flag
    if flag("EMU_TPU_FUSED_ATTN") == "0":
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    if x.dtype.itemsize > 2 or cfg.subln:
        return None
    pa = p["attn"]
    qkv_q = "kernel_w8a8" in pa["qkv"]
    proj_q = "kernel_w8a8" in pa["proj"]
    if not (qkv_q or "kernel" in pa["qkv"]):
        return None                       # weight-only/int4 forms: fall back
    if not (proj_q or "kernel" in pa["proj"]):
        return None
    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd
    b, s, _ = x.shape
    h, d, w = cfg.num_heads, cfg.head_width, cfg.width
    plan = bhsd_plan(h, d, s, x.dtype.itemsize)
    if s < 64 or plan is None:
        return None
    s_pad = plan[2]
    scale = d ** -0.5

    def qkv_to_bhsd(src):
        src = jnp.pad(src, ((0, 0), (0, s_pad - s), (0, 0)))
        # three head-major-output matmuls (measured faster than one fused
        # "mthd->tbhsd" einsum: XLA schedules the epilogue better per-plane)
        if qkv_q:
            from emu_tpu.ops.quant import einsum_w8a8
            wq4 = pa["qkv"]["kernel_w8a8"].reshape(w, 3, h, d)
            sq4 = pa["qkv"]["scale"].reshape(3, h, d)
            return (einsum_w8a8("bsm,mhd->bhsd", src, wq4[:, t],
                                sq4[t][None, :, None, :]) for t in range(3))
        wqkv = pa["qkv"]["kernel"].reshape(w, 3, h, d)
        return (jnp.einsum("bsm,mhd->bhsd", src,
                           wqkv[:, t].astype(src.dtype),
                           preferred_element_type=jnp.float32
                           ).astype(src.dtype) for t in range(3))

    # EMU_TPU_VIT_STATIC_MAX=<float>: opt-in max-pass elimination (see
    # _bhsd_kernel safety contract; default bf16 row-max). Snapshotted at
    # import (ops/flags.py).
    sm = flag("EMU_TPU_VIT_STATIC_MAX")
    static_max = float(sm) if sm else None

    def attn_out(src):
        q, k, v = qkv_to_bhsd(src)
        o = mha_bhsd(q, k, v, pa["q_bias"], pa["v_bias"], scale=scale,
                     s_real=s, static_max=static_max)
        if proj_q:
            from emu_tpu.ops.quant import einsum_w8a8
            y = einsum_w8a8("bhsd,hdw->bsw", o,
                            pa["proj"]["kernel_w8a8"].reshape(h, d, w),
                            pa["proj"]["scale"], token_axes=(1, 3)
                            ).astype(jnp.float32)
        else:
            y = jnp.einsum("bhsd,hdw->bsw", o,
                           pa["proj"]["kernel"].reshape(h, d, w
                                                        ).astype(o.dtype),
                           preferred_element_type=jnp.float32)
        if "bias" in pa["proj"]:
            y = y + pa["proj"]["bias"].astype(jnp.float32)
        return y.astype(x.dtype)[:, :s]

    if cfg.postnorm:
        y = L.layer_norm(p["norm1"], attn_out(x), cfg.ln_eps)
    else:
        y = attn_out(L.layer_norm(p["norm1"], x, cfg.ln_eps))
    if g1 is not None:
        y = y * g1.astype(y.dtype)
    return x + y


def _block(cfg: VisionConfig, p: dict, x: jax.Array,
           rope_tables=None, rel_pos_bias=None) -> jax.Array:
    def attn(h):
        b, s, _ = h.shape
        ahd = cfg.num_heads * cfg.head_width
        k_bias = jnp.zeros_like(p["attn"]["q_bias"])
        qkv_bias = jnp.concatenate([p["attn"]["q_bias"], k_bias,
                                    p["attn"]["v_bias"]])
        qkv = L.dense(dict(p["attn"]["qkv"], bias=qkv_bias), h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_width)
        k = k.reshape(b, s, cfg.num_heads, cfg.head_width)
        v = v.reshape(b, s, cfg.num_heads, cfg.head_width)
        if rope_tables is not None:
            cos, sin = rope_tables
            # rotate patch tokens only, cls passes through
            # (ref eva_vit_model.py:305-321)
            q = jnp.concatenate(
                [q[:, :1], R.apply_vision_rope(q[:, 1:], cos, sin)], axis=1)
            k = jnp.concatenate(
                [k[:, :1], R.apply_vision_rope(k[:, 1:], cos, sin)], axis=1)
        o = dot_product_attention(q, k, v, scale=cfg.head_width ** -0.5,
                                  bias=rel_pos_bias)
        o = o.reshape(b, s, ahd)
        if "inner_ln" in p["attn"]:
            o = L.layer_norm(p["attn"]["inner_ln"], o, cfg.ln_eps)
        return L.dense(p["attn"]["proj"], o)

    def mlp(h):
        if cfg.naiveswiglu:
            return L.swiglu_mlp(p["mlp"], h, cfg.ln_eps)
        return L.gelu_mlp(p["mlp"], h, cfg.ln_eps)

    g1 = p.get("gamma_1")
    g2 = p.get("gamma_2")

    def scaled(y, g):
        return y if g is None else y * g.astype(y.dtype)

    def fused_mlp_branch(h):
        # LN + MLP + residual in one pallas kernel (layerscale blocks it)
        if g2 is not None:
            return None
        return L.fused_block_mlp(p["norm2"], p["mlp"], h, cfg.ln_eps,
                                 cfg.postnorm)

    fused_attn = None
    if rope_tables is None and rel_pos_bias is None:
        fused_attn = _fused_attn_branch(cfg, p, x, g1)
    if fused_attn is not None:
        x = fused_attn
    elif cfg.postnorm:
        x = x + scaled(L.layer_norm(p["norm1"], attn(x), cfg.ln_eps), g1)
    else:
        x = x + scaled(attn(L.layer_norm(p["norm1"], x, cfg.ln_eps)), g1)

    y = fused_mlp_branch(x)
    if y is not None:
        return y
    if cfg.postnorm:
        return x + scaled(L.layer_norm(p["norm2"], mlp(x), cfg.ln_eps), g2)
    return x + scaled(mlp(L.layer_norm(p["norm2"], x, cfg.ln_eps)), g2)


def forward_features(params: dict, cfg: VisionConfig, images: jax.Array,
                     compute_dtype=None, remat: bool = False) -> jax.Array:
    """[B, H, W, 3] normalized images → [B, n_patch+1, width] raw features.

    remat=True rematerializes each block under grad (jax.checkpoint) —
    the training-time equivalent of the reference's
    `set_grad_checkpointing` (eva_vit_model.py:620-623)."""
    if compute_dtype is not None:
        images = images.astype(compute_dtype)
    x = L.patch_embed(params["patch_embed"], images, cfg.patch_size)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    if "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)

    rope_tables = None
    if cfg.rope:
        cos, sin = R.vision_rope_tables(
            cfg.head_width // 2, cfg.pt_hw_seq_len,
            cfg.grid_size if cfg.intp_freq else None)
        rope_tables = (jnp.asarray(cos), jnp.asarray(sin))

    rel_bias = None
    if "rel_pos_bias" in params:
        idx = jnp.asarray(relative_position_index(cfg.grid_size))
        # [S, S, H] → [1, H, S, S] additive bias shared by all blocks
        rel_bias = params["rel_pos_bias"][idx].transpose(2, 0, 1)[None]

    def body(h, blk):
        return _block(cfg, blk, h, rope_tables, rel_bias), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x


def forward_head(params: dict, cfg: VisionConfig, features: jax.Array
                 ) -> jax.Array:
    """Classifier path (cls token → norm → head); unused by Emu composites."""
    x = L.layer_norm(params["norm"], features, cfg.ln_eps)
    return L.dense(params["head"], x[:, 0])


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules (over the "model" mesh axis)
# ---------------------------------------------------------------------------

# Stacked block tensors carry a leading layer dim → shard dim 1/2.
sharding_rules = [
    (r"blocks/attn/qkv/kernel$", P(None, None, "model")),
    (r"blocks/attn/(q|v)_bias", P(None, "model")),
    (r"blocks/attn/proj/kernel$", P(None, "model", None)),
    (r"blocks/mlp/(fc1|w1|w2)/kernel$", P(None, None, "model")),
    (r"blocks/mlp/(fc1|w1|w2)/bias", P(None, "model")),
    (r"blocks/mlp/(fc2|w3)/kernel$", P(None, "model", None)),
    (r"patch_embed/kernel", P(None, "model")),
    # W8A8 tower (quantize_model_params): int8 kernels keep the float
    # rank; per-out-channel scales shard where the kernel's out dim does
    (r"blocks/attn/qkv/kernel_w8a8$", P(None, None, "model")),
    (r"blocks/attn/qkv/scale$", P(None, "model")),
    (r"blocks/attn/proj/kernel_w8a8$", P(None, "model", None)),
    (r"blocks/mlp/(fc1|w1|w2)/kernel_w8a8$", P(None, None, "model")),
    (r"blocks/mlp/(fc1|w1|w2)/scale$", P(None, "model")),
    (r"blocks/mlp/(fc2|w3)/kernel_w8a8$", P(None, "model", None)),
]
