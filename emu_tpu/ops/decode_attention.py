"""Pallas single-query (decode) attention over a HEAD-MAJOR KV cache.

Why: at decode the XLA attention chain is several op launches per layer
(~20 us each on the tunneled backend) and, for int8 caches, XLA
materializes a dequantized HBM copy (read S, write 2S, read 2S — the
source of the int8-KV throughput regression). This kernel does the whole
masked-softmax attention in ONE call with a flash-style running softmax
over cache chunks: K and V stream exactly once, and int8 caches are
consumed NATIVELY — values cast in-register, the per-(head, token)
scales folded into the score multiply and the PV operand (no dequantized
copy ever exists).

Layout: the cache is head-major [B, Hkv, S, D] (llama.init_cache), so
each head's (S, D) plane is a dense tile — per-head work is two real
MXU matmuls (scores = q_g Kᵀ, out = p V) instead of the lane-segment
VPU math the old [B, S, H, D] layout forced (which capped effective
bandwidth at ~260 GB/s). GQA runs grouped: the rep query heads of a KV
head form the M dimension of both matmuls.

Ref behavior: equals attention.cache_attention's XLA path for Sq == 1
with a kv_valid mask, which is what llama.decode_step needs (ref HF
LlamaAttention with past_key_values, single new position).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(l_ref, q_ref, k_ref, v_ref, m_ref, *rest, scale, hb, rep,
            qn, quant, extra):
    del l_ref                # scalar-prefetch layer index: index_maps only
    rest = list(rest)
    kn_ref = vn_ref = ks_ref = vs_ref = None
    if extra:                # current chunk's k/v, not yet in the cache
        kn_ref, vn_ref = rest[:2]
        rest = rest[2:]
    if quant:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    o_ref, acc, mx, lse = rest
    rep = rep * qn           # M rows per kv head: rep query heads × qn queries
    c = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        mx[:] = jnp.full_like(mx, _NEG_INF)
        lse[:] = jnp.zeros_like(lse)

    # mask/scales ride as WHOLE [.., nc, cs] rows (resident across the
    # chunk loop — their index_maps are constant in c) and the current
    # chunk is sliced here: keeps their lane dim Mosaic-legal (== array
    # dim) for any cs, unlike per-chunk (1, cs) blocks which need
    # cs % 128 == 0
    valid = m_ref[0, pl.ds(c, 1)]                      # [1, cs]
    # ALL hb heads per op: the scores/PV dots run with hb as a dot batch
    # dim, and every softmax-state update is one [hb*rep, cs] VPU tile.
    # The old per-head unroll issued [rep, cs]-row VPU ops — at rep==1
    # (MHA) that used 1 of 8 sublanes and its ~1 µs/head/chunk fixed cost
    # dominated the kernel (measured 393 µs vs a 240 µs bf16 roofline at
    # B=4/S=2048; int8 saw no bandwidth win at all).
    q = q_ref[0]                                       # [hb, rep, D]
    k = k_ref[0]                                       # [hb, cs, D]
    if k.dtype != q.dtype:
        k = k.astype(q.dtype)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if ks_ref is not None:                             # fold int8 scale
        s = s * ks_ref[0, :, pl.ds(c, 1)]              # [hb, 1, cs]
    s = s * scale
    s = jnp.where(valid[None] > 0, s, _NEG_INF)        # [hb, rep, cs]
    s2 = s.reshape(hb * rep, s.shape[-1])

    m_old = mx[:, :1]                                  # [hb*rep, 1]
    m_new = jnp.maximum(m_old, jnp.max(s2, axis=-1, keepdims=True))
    p = jnp.exp(s2 - m_new)
    corr = jnp.exp(m_old - m_new)
    lse[:] = jnp.broadcast_to(
        lse[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True),
        lse.shape)
    mx[:] = jnp.broadcast_to(m_new, mx.shape)

    pb = p.reshape(hb, rep, -1)
    if vs_ref is not None:                             # fold int8 scale
        pb = pb * vs_ref[0, :, pl.ds(c, 1)]
    v = v_ref[0]                                       # [hb, cs, D]
    if v.dtype != q.dtype:
        v = v.astype(q.dtype)
    pv = jax.lax.dot_general(pb.astype(v.dtype), v,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    acc[:] = acc[:] * corr + pv.reshape(hb * rep, -1)

    @pl.when(c == nc - 1)
    def _():
        a, l = acc[:], lse[:, :1]
        if kn_ref is not None:
            # fold the current chunk's columns: its k/v ride as separate
            # unquantized operands, so the cache write can be deferred out
            # of the layer scan (llama._cache_write_all) and this step
            # attends the exact bf16 rows. qn == 1 is the decode step;
            # qn > 1 is the speculative verify chunk, where query i sees
            # chunk column j iff j <= i (intra-chunk causality).
            kn = kn_ref[0]                         # [hb, qn, D]
            if kn.dtype != q.dtype:
                kn = kn.astype(q.dtype)
            s_n = jax.lax.dot_general(q, kn, (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            s_n = s_n * scale                      # [hb, rep*qn, qn]
            if qn > 1:
                row_q = jax.lax.broadcasted_iota(jnp.int32, s_n.shape, 1) % qn
                col = jax.lax.broadcasted_iota(jnp.int32, s_n.shape, 2)
                s_n = jnp.where(col <= row_q, s_n, _NEG_INF)
            s_n = s_n.reshape(hb * rep, qn)
            m_new = jnp.maximum(mx[:, :1],
                                jnp.max(s_n, axis=-1, keepdims=True))
            p_n = jnp.exp(s_n - m_new)
            corr = jnp.exp(mx[:, :1] - m_new)
            l = l * corr + jnp.sum(p_n, axis=-1, keepdims=True)
            vn = vn_ref[0].astype(jnp.float32)     # [hb, qn, D]
            if qn == 1:
                pv = p_n.reshape(hb, rep, 1) * vn  # broadcast: K==1 "matmul"
            else:
                pv = jax.lax.dot_general(
                    p_n.reshape(hb, rep, qn), vn,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            a = a * corr + pv.reshape(hb * rep, -1)
        o_ref[0] = (a.reshape(hb, rep, -1)
                    / (l.reshape(hb, rep, 1) + 1e-30)
                    ).astype(o_ref.dtype)


def _plan(hkv: int, rep: int, s: int, d: int, itemsize: int):
    """(hb, cs) or None. Budget: double-buffered k/v blocks + whole-row
    resident mask/scales + q/out + ~6 fp32 temps per in-flight [rep, cs]
    tile. cs needs only 8-alignment (the k/v block sublane dim) — the
    mask/scale rows stay whole in VMEM so their lane dims are always
    Mosaic-legal."""
    for hb in [h for h in range(hkv, 0, -1) if hkv % h == 0]:
        for cs in range(min(s, 512), 7, -8):
            if s % cs:
                continue
            kv = 2 * 2 * hb * cs * d * itemsize
            scales = 2 * hb * s * 4 + s * 4
            qo = 2 * 2 * hb * rep * d * 4
            tmp = 6 * max(rep, 8) * cs * 4
            if kv + scales + qo + tmp <= 14e6:
                return hb, cs
            break                       # smaller cs won't help this hb much
    return None


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret"))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     kv_valid: jax.Array,
                     k_scale: Optional[jax.Array] = None,
                     v_scale: Optional[jax.Array] = None, *, scale: float,
                     layer: Optional[jax.Array] = None,
                     k_new: Optional[jax.Array] = None,
                     v_new: Optional[jax.Array] = None,
                     interpret: bool = False) -> jax.Array:
    """q [B, Sq, H, D] (already roped, Sq small); k/v head-major cache
    planes [B, Hkv, S, D] (bf16, or int8 with k_scale/v_scale
    [B, Hkv, S]); kv_valid [B, S] (1 = attend). → [B, Sq, H, D].

    k_new/v_new [B, Hkv, Sq, D] (compute dtype): the current chunk's k/v,
    folded as extra softmax columns — the rows need not be in the cache
    yet (deferred cache writes), so kv_valid must then EXCLUDE the
    chunk's slots. Sq == 1 is the decode step (one always-valid column);
    Sq > 1 is the speculative verify chunk: query i additionally sees
    chunk column j iff j <= i, while every query sees all kv_valid cache
    columns. Sq > 1 REQUIRES k_new/v_new (the cache part has no causal
    masking).

    layer (traced scalar) selects a layer of a STACKED cache
    [L, B, Hkv, S, D]: the index rides scalar prefetch and the kernel's
    index_maps DMA blocks of layer `layer` straight out of the full HBM
    cache — no [B, Hkv, S, D] slice is ever materialized. Inside the
    decoder's layer scan that slice was 2×25 MB of pure copy traffic per
    layer per step (the single largest decode dispatch cost)."""
    b, qn, h, d = q.shape
    assert qn == 1 or k_new is not None, \
        "decode_attention: Sq > 1 requires k_new/v_new (verify chunk)"
    if layer is None:
        k, v = k[None], v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = 0
    hkv, s = k.shape[2], k.shape[3]
    rep = h // hkv
    m = rep * qn                      # M rows per kv head in the kernel
    plan = _plan(hkv, m, s, d, k.dtype.itemsize)
    assert plan is not None, "decode_attention: no (hb, cs) fits VMEM"
    hb, cs = plan
    quant = k_scale is not None
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    nc = s // cs

    if qn == 1:
        qg = q.reshape(b, hkv, rep, d)             # free: Sq == 1
    else:
        # [B, Sq, H, D] → [B, Hkv, rep·Sq, D], queries innermost (the
        # kernel's intra-chunk triangle indexes row % Sq)
        qg = q.reshape(b, qn, hkv, rep, d).transpose(0, 2, 3, 1, 4
                                                     ).reshape(b, hkv, m, d)
    mask = kv_valid.astype(jnp.float32).reshape(b, nc, cs)

    grid = (b, hkv // hb, nc)
    kv_map = lambda i, g, c, l: (l[0], i, g, c, 0)
    in_specs = [
        pl.BlockSpec((1, hb, m, d), lambda i, g, c, l: (i, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, hb, cs, d), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, hb, cs, d), kv_map,
                     memory_space=pltpu.VMEM),
        # mask/scales: whole [nc, cs] rows, constant in c → stay resident
        # across the chunk loop; the kernel slices chunk c itself
        pl.BlockSpec((1, nc, cs), lambda i, g, c, l: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qg, k, v, mask]
    extra = k_new is not None
    if extra:
        in_specs += [pl.BlockSpec((1, hb, qn, d),
                                  lambda i, g, c, l: (i, g, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_new, v_new]
    if quant:
        l_, b_, hkv_, _ = k_scale.shape
        in_specs += [pl.BlockSpec((None, 1, hb, nc, cs),
                                  lambda i, g, c, l: (l[0], i, g, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale.astype(jnp.float32).reshape(l_, b_, hkv_, nc, cs),
                 v_scale.astype(jnp.float32).reshape(l_, b_, hkv_, nc, cs)]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, hb=hb, rep=rep, qn=qn,
                          quant=quant, extra=extra),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, m, d),
                                   lambda i, g, c, l: (i, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((hb * m, d), jnp.float32),
                            pltpu.VMEM((hb * m, 128), jnp.float32),
                            pltpu.VMEM((hb * m, 128), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((b, hkv, m, d), q.dtype),
        interpret=interpret,
    )(lidx, *args)
    if qn == 1:
        return out.reshape(b, 1, h, d)
    return out.reshape(b, hkv, rep, qn, d).transpose(0, 3, 1, 2, 4
                                                     ).reshape(b, qn, h, d)


def decode_attention_fits(b: int, h: int, hkv: int, s: int, d: int,
                          itemsize: int, qn: int = 1) -> bool:
    """Tiling + VMEM feasibility for the head-major decode kernel."""
    if d % 128 or s % 8 or h % hkv:
        return False
    return _plan(hkv, (h // hkv) * qn, s, d, itemsize) is not None


# ---------------------------------------------------------------------------
# Paged variant: KV lives in a shared page pool, chunks indexed through a
# page table in scalar prefetch
# ---------------------------------------------------------------------------


def _kernel_paged(l_ref, t_ref, *rest, **kw):
    """Same math as _kernel; the extra page-table scalar-prefetch ref is
    consumed by the index_maps only."""
    del t_ref
    _kernel(l_ref, *rest, **kw)


def _plan_paged(hkv: int, rep: int, page: int, s_total: int, d: int,
                itemsize: int):
    """(hb, cs) with cs | page (a k/v block never straddles two physical
    pages — the index_map maps one (page, offset) pair per block). Mask
    rides whole [nc_total, cs] rows, so its budget uses the LOGICAL
    context length."""
    for hb in [h for h in range(hkv, 0, -1) if hkv % h == 0]:
        for cs in range(min(page, 512), 7, -8):
            if page % cs:
                continue
            kv = 2 * 2 * hb * cs * d * itemsize
            scales = 2 * hb * s_total * 4 + s_total * 4
            qo = 2 * 2 * hb * rep * d * 4
            tmp = 6 * max(rep, 8) * cs * 4
            if kv + scales + qo + tmp <= 14e6:
                return hb, cs
            break
    return None


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           page_table: jax.Array, kv_valid: jax.Array, *,
                           scale: float,
                           k_scale: Optional[jax.Array] = None,
                           v_scale: Optional[jax.Array] = None,
                           layer: Optional[jax.Array] = None,
                           k_new: Optional[jax.Array] = None,
                           v_new: Optional[jax.Array] = None,
                           interpret: bool = False) -> jax.Array:
    """Single-query/verify-chunk attention straight out of a HEAD-MAJOR
    page pool — the vLLM idea in pallas terms: no contiguous per-slot KV
    copy ever exists. q [B, Sq, H, D]; k/v pools
    [L, n_pages, Hkv, page, D] (bf16); page_table [B, P] physical page
    per logical page (unmapped entries must be clamped to 0 by the
    caller and masked via kv_valid [B, P*page]).

    The page table rides SCALAR PREFETCH next to the layer index: the
    kernel's k/v index_maps translate (row, chunk) -> (layer,
    table[row, chunk//ppc], head block, chunk%ppc) at DMA issue time,
    so blocks stream from scattered pages exactly like the dense
    kernel's contiguous planes (same body: _kernel). k_new/v_new
    [B, Hkv, Sq, D]: deferred-write extra columns, as decode_attention.

    int8 pools: values page in-kernel like bf16; k_scale/v_scale are the
    PRE-GATHERED logical-view planes [L, B, Hkv, P*page] (f32 — the
    caller gathers them through the table once per step outside the
    layer scan: for the whole 13B cache that is a few MB, negligible
    next to the weight stream, and it keeps the kernel's whole-row
    resident scale layout identical to the dense kernel's)."""
    b, qn, h, d = q.shape
    assert qn == 1 or k_new is not None, \
        "paged_decode_attention: Sq > 1 requires k_new/v_new"
    if layer is None:
        k, v = k[None], v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = 0
    hkv, page = k.shape[2], k.shape[3]
    p_count = page_table.shape[1]
    s = p_count * page
    rep = h // hkv
    m = rep * qn
    plan = _plan_paged(hkv, m, page, s, d, k.dtype.itemsize)
    assert plan is not None, "paged_decode_attention: no (hb, cs) fits VMEM"
    hb, cs = plan
    ppc = page // cs
    nc = s // cs
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    table = page_table.astype(jnp.int32)

    if qn == 1:
        qg = q.reshape(b, hkv, rep, d)
    else:
        qg = q.reshape(b, qn, hkv, rep, d).transpose(0, 2, 3, 1, 4
                                                     ).reshape(b, hkv, m, d)
    mask = kv_valid.astype(jnp.float32).reshape(b, nc, cs)

    grid = (b, hkv // hb, nc)
    kv_map = lambda i, g, c, l, t: (l[0], t[i, c // ppc], g, c % ppc, 0)
    in_specs = [
        pl.BlockSpec((1, hb, m, d), lambda i, g, c, l, t: (i, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, hb, cs, d), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, 1, hb, cs, d), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nc, cs), lambda i, g, c, l, t: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qg, k, v, mask]
    extra = k_new is not None
    if extra:
        in_specs += [pl.BlockSpec((1, hb, qn, d),
                                  lambda i, g, c, l, t: (i, g, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_new, v_new]
    quant = k_scale is not None
    if quant:
        l_, b_, hkv_, _ = k_scale.shape
        in_specs += [pl.BlockSpec((None, 1, hb, nc, cs),
                                  lambda i, g, c, l, t: (l[0], i, g, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale.astype(jnp.float32).reshape(l_, b_, hkv_, nc, cs),
                 v_scale.astype(jnp.float32).reshape(l_, b_, hkv_, nc, cs)]

    out = pl.pallas_call(
        functools.partial(_kernel_paged, scale=scale, hb=hb, rep=rep, qn=qn,
                          quant=quant, extra=extra),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, m, d),
                                   lambda i, g, c, l, t: (i, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((hb * m, d), jnp.float32),
                            pltpu.VMEM((hb * m, 128), jnp.float32),
                            pltpu.VMEM((hb * m, 128), jnp.float32)]),
        out_shape=jax.ShapeDtypeStruct((b, hkv, m, d), q.dtype),
        interpret=interpret,
    )(lidx, table, *args)
    if qn == 1:
        return out.reshape(b, 1, h, d)
    return out.reshape(b, hkv, rep, qn, d).transpose(0, 3, 1, 2, 4
                                                     ).reshape(b, qn, h, d)


def paged_decode_attention_fits(h: int, hkv: int, page: int, s_total: int,
                                d: int, itemsize: int, qn: int = 1) -> bool:
    """Tiling + VMEM feasibility for the paged decode kernel."""
    if d % 128 or page % 8 or h % hkv:
        return False
    return _plan_paged(hkv, (h // hkv) * qn, page, s_total, d,
                       itemsize) is not None
