"""Attention dispatch: XLA reference path + Pallas flash path.

This is the framework's replacement for the reference's xformers
`memory_efficient_attention` dependency (ref: Emu1/models/eva_vit_model.py:22,
Emu2/emu/eva_vit.py:19) — the one piece of "native" kernel surface the
reference outsources to CUDA. On TPU the flash kernel lives in
`emu_tpu.ops.flash_attention` (Pallas); the XLA einsum path below is the
always-correct fallback (CPU tests, tiny/biasful shapes).

Layout: q [B, Sq, H, D], k/v [B, Skv, H, D] (BSHD — avoids the transpose
churn of torch's BHSD and matches how XLA wants to tile the MXU).

Masking vocabulary (shared by both backends):
- `causal`: causal mask aligned to the *end* of the kv sequence;
- `kv_valid`: [B, Skv] padding mask (True/1 = attend) — covers every mask
  the Emu models need (left-padded prefill, cache-slot validity);
- `mask`/`bias`: arbitrary dense [B, H, Sq, Skv] forms (XLA path only).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free
                  # for fully-masked rows (left-padded batches)


def _xla_attention(q, k, v, bias, mask, kv_valid, scale, causal):
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
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, :].astype(bool), logits,
                           _NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _grouped_attention(q, k, v, bias, mask, kv_valid, scale, causal,
                       kv_spec, skv, k_new=None, v_new=None):
    """Shared grouped-attention body for both K/V layouts.

    Query heads reshape to [.., Hkv, rep, D] and contract against the
    Hkv key heads directly (no repeated-K/V materialization — the point
    of GQA's smaller cache). kv_spec is the k/v einsum operand layout:
    "bkgd" (token-major) or "bgkd" (head-major cache planes).

    k_new/v_new [B, Hkv, Sq, D]: the current chunk's k/v as extra
    columns appended to the logits (deferred-cache-write decode, see
    llama.decode_step); requires masks that EXCLUDE the chunk's slots.
    For Sq > 1 (speculative verify chunk) query i sees extra column j
    iff j <= i (intra-chunk causality)."""
    b, sq, h, d = q.shape
    hkv = k.shape[2] if kv_spec == "bkgd" else k.shape[1]
    rep = h // hkv
    q5 = q.reshape(b, sq, hkv, rep, d)
    logits = jnp.einsum(f"bqgrd,{kv_spec}->bgrqk", q5, k,
                        preferred_element_type=jnp.float32)
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.reshape(b, hkv, rep, sq, skv).astype(
            jnp.float32)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        causal_mask = (ki <= qi + (skv - sq))[None, None, None]
        logits = jnp.where(causal_mask, logits, _NEG_INF)
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, None, :].astype(bool),
                           logits, _NEG_INF)
    if mask is not None:
        # dense masks may be [B,1,Sq,Skv] (broadcast over all heads) or
        # per-head [B,H,Sq,Skv] (reshaped onto the [B,Hkv,rep,..] grid)
        if mask.shape[1] == 1:
            m5 = mask[:, :, None]
        else:
            m5 = mask.reshape(b, hkv, rep, sq, skv)
        logits = jnp.where(m5, logits, _NEG_INF)
    if k_new is not None:                      # extras are head-major
        ln = jnp.einsum("bqgrd,bgkd->bgrqk", q5, k_new.astype(q.dtype),
                        preferred_element_type=jnp.float32)
        ln = ln * jnp.float32(scale)
        qn = k_new.shape[2]
        if qn > 1:
            qi = jax.lax.broadcasted_iota(jnp.int32, (sq, qn), 0)
            cj = jax.lax.broadcasted_iota(jnp.int32, (sq, qn), 1)
            ln = jnp.where((cj <= qi)[None, None, None], ln, _NEG_INF)
        logits = jnp.concatenate([logits, ln], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(f"bgrqk,{kv_spec}->bqgrd",
                     probs[..., :skv].astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    if k_new is not None:
        out = out + jnp.einsum("bgrqk,bgkd->bqgrd",
                               probs[..., skv:].astype(q.dtype),
                               v_new.astype(q.dtype),
                               preferred_element_type=jnp.float32)
    return out.reshape(b, sq, h, d).astype(q.dtype)


def _xla_attention_gqa(q, k, v, bias, mask, kv_valid, scale, causal):
    """Grouped-query attention over token-major [B, Skv, Hkv, D] k/v."""
    return _grouped_attention(q, k, v, bias, mask, kv_valid, scale, causal,
                              "bkgd", k.shape[1])


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    kv_valid: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    causal: bool = False,
    backend: Optional[str] = None,
) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax.

    k/v may carry fewer heads than q (GQA): handled grouped, without
    materializing repeated K/V."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if k.shape[2] != q.shape[2]:
        # GQA: long causal self-attention (prefill) repeats K/V to full
        # heads and STREAMS through the flash kernel. The grouped einsum
        # materializes [B, Hkv, rep, Sq, Skv] fp32 logits — 4.8 GB at
        # 2k-b8 13B / 9.8 GB at 4k-b4, which is what OOMed every GQA
        # long-context lane; the repeat is a transient 2×[B, S, H, D]
        # bf16 (168 MB at 2k-b8) and prefill is FLOP-bound anyway.
        # Decode/short shapes keep the no-repeat grouped path (the point
        # of GQA's lean cache).
        if (causal and bias is None and mask is None
                and q.shape[1] == k.shape[1] and q.shape[1] >= 512
                and q.shape[-1] <= 256
                and jax.default_backend() in ("tpu", "axon")):
            rep = q.shape[2] // k.shape[2]
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            # fall through to the standard dispatch (flash at these
            # shapes)
        else:
            return _xla_attention_gqa(q, k, v, bias, mask, kv_valid,
                                      scale, causal)
    if backend is None:
        backend = _auto_backend(q, k, bias, mask, kv_valid, causal)
    if backend == "flash":
        from emu_tpu.ops import flash_attention as fa
        return fa.flash_attention(q, k, v, kv_valid=kv_valid,
                                  scale=float(scale), causal=causal)
    if backend == "batched_mha":
        from emu_tpu.ops import flash_attention as fa
        return fa.batched_mha(q, k, v, scale=float(scale))
    return _xla_attention(q, k, v, bias, mask, kv_valid, scale, causal)


def _xla_attention_bhsd(q, k, v, mask, kv_valid, scale, causal,
                        k_new=None, v_new=None):
    """Attention against HEAD-MAJOR k/v [B, Hkv, Skv, D] (the cache-
    resident layout) without materializing a layout change; GQA handled
    grouped. q [B, Sq, H, D] → [B, Sq, H, D]. See _grouped_attention for
    the k_new/v_new (deferred-cache-write) contract."""
    return _grouped_attention(q, k, v, None, mask, kv_valid, scale, causal,
                              "bgkd", k.shape[2], k_new=k_new, v_new=v_new)


def cache_attention(q, kv: dict, *, kv_valid=None, mask=None,
                    scale: Optional[float] = None, causal: bool = False):
    """Attention against a cache-resident KV (llama._cache_kv dict):
    head-major [B, Hkv, S, D] planes, optionally int8 with per-(head,
    token) scales. Single-query steps route to the Pallas decode kernel
    (which consumes int8 natively — scales fold into the score/PV
    epilogue, no dequantized HBM copy); other shapes dequantize and run
    the head-major XLA einsum chain.

    When kv carries a "layer" index the k/v planes are the FULL stacked
    cache [L, B, Hkv, S, D]: the kernel path threads the index through
    scalar prefetch (no per-layer slice is materialized); the XLA path
    slices here.

    When kv carries "k_new"/"v_new" [B, Hkv, 1, D] (deferred cache
    writes — llama.decode_step), the current token's k/v attend as one
    extra always-valid column; kv_valid must exclude the current slot."""
    k, v = kv["k"], kv["v"]
    dt = kv.get("dtype", q.dtype)
    ks, vs = kv.get("k_scale"), kv.get("v_scale")
    layer = kv.get("layer")
    kn, vn = kv.get("k_new"), kv.get("v_new")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sq = q.shape[1]
    from emu_tpu.ops.flags import flag
    pt = kv.get("page_table")
    if pt is not None:
        # paged pool [L, n_pages, Hkv, page, D] + table [B, P]: kernel
        # path pages in-kernel via scalar prefetch; fallback gathers the
        # head-major per-slot view (generation/paged_kv._gather_slot_kv
        # semantics) and reuses the dense chain below
        page = k.shape[3]
        s_total = pt.shape[1] * page
        if ((sq == 1 or (kn is not None and sq <= 32))
                and mask is None and not causal
                and kv_valid is not None
                and jax.default_backend() in ("tpu", "axon")
                and flag("EMU_TPU_DECODE_KERNEL") != "0"):
            from emu_tpu.ops.decode_attention import (
                paged_decode_attention, paged_decode_attention_fits)
            if paged_decode_attention_fits(q.shape[2], k.shape[2], page,
                                           s_total, k.shape[-1],
                                           k.dtype.itemsize, qn=sq):
                return paged_decode_attention(q, k, v, pt, kv_valid,
                                              scale=float(scale),
                                              k_scale=ks, v_scale=vs,
                                              layer=layer, k_new=kn,
                                              v_new=vn)
        if layer is not None:
            k = jax.lax.dynamic_index_in_dim(k, layer, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
            if ks is not None:
                # scale planes are the PRE-GATHERED logical views
                # [L, B, Hkv, S] (paged_kv._gather_slot_scales)
                ks = jax.lax.dynamic_index_in_dim(ks, layer, 0,
                                                  keepdims=False)
                vs = jax.lax.dynamic_index_in_dim(vs, layer, 0,
                                                  keepdims=False)
            layer = None
        kk = k[pt].transpose(0, 2, 1, 3, 4)   # [B, Hkv, P, page, D]
        vv = v[pt].transpose(0, 2, 1, 3, 4)
        k = kk.reshape(pt.shape[0], k.shape[1], s_total, k.shape[3])
        v = vv.reshape(pt.shape[0], v.shape[1], s_total, v.shape[3])
    if ((sq == 1 or (kn is not None and sq <= 32))
            and mask is None and not causal
            and kv_valid is not None
            and jax.default_backend() in ("tpu", "axon")
            and flag("EMU_TPU_DECODE_KERNEL") != "0"):
        from emu_tpu.ops.decode_attention import (decode_attention,
                                                  decode_attention_fits)
        if decode_attention_fits(q.shape[0], q.shape[2], k.shape[-3],
                                 k.shape[-2], k.shape[-1],
                                 k.dtype.itemsize, qn=sq):
            return decode_attention(q, k, v, kv_valid, k_scale=ks,
                                    v_scale=vs, scale=float(scale),
                                    layer=layer, k_new=kn, v_new=vn)
    if layer is not None:
        sl = lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0,
                                                    keepdims=False)
        k, v = sl(k), sl(v)
        if ks is not None:
            ks, vs = sl(ks), sl(vs)
    if ks is not None:
        k = k.astype(dt) * ks.astype(dt)[..., None]
        v = v.astype(dt) * vs.astype(dt)[..., None]
    else:
        k = k.astype(dt)
        v = v.astype(dt)
    return _xla_attention_bhsd(q, k, v, mask, kv_valid, scale, causal,
                               k_new=kn, v_new=vn)


def _auto_backend(q, k, bias, mask, kv_valid, causal) -> str:
    # Measured on v5e-1: the per-(batch, head) Pallas kernel wins 1.36x at
    # the Emu2 ViT shape (1025 tokens) and 2.79x at 2048-token causal LM
    # prefill; below 512 tokens its 512 tiny programs lose to MXU
    # weight-load latency, and the per-batch all-heads kernel (batched_mha,
    # 785 vs 1167 us/layer at ViT-g 257 tokens) takes over for the
    # unmasked self-attention case. EMU_TPU_FLASH=1/0 forces flash/xla
    # (snapshotted at import — ops/flags.py).
    from emu_tpu.ops.flags import flag
    force = flag("EMU_TPU_FLASH")
    if force == "0":
        return "xla"
    if jax.default_backend() not in ("tpu", "axon"):
        return "xla"
    if bias is not None or mask is not None:
        return "xla"
    if force == "1":
        return "flash"
    # (single-query decode no longer reaches this dispatcher — cache-
    # resident attention goes through cache_attention / decode_attention)
    from emu_tpu.ops.flash_attention import mha_fits
    if (not causal and kv_valid is None and q.shape[1] == k.shape[1]
            and 64 <= q.shape[1] and q.shape[-1] <= 256
            and mha_fits(q.shape[1], q.shape[-1], q.dtype.itemsize)):
        return "batched_mha"
    if q.shape[1] < 512 or q.shape[-1] > 256:
        return "xla"
    if k.shape[1] < 512:
        # short-KV cross attention (e.g. the UNet's 64-token conditioning
        # against 1024-4096 latents): the flash kernel pads Skv to a full
        # 1024 block and launches per-(batch, head); the plain einsum is
        # measured faster at every such shape (r5: 148 vs 183 us at 32^2,
        # 177 vs 232 at 64^2 — tools/probe_unet_attn.py)
        return "xla"
    return "flash"
