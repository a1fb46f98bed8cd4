"""Paged KV cache: a shared page pool instead of per-slot max_len rows.

The dense cache (llama.init_cache) reserves [B, max_len] per slot, so a
pool sized for worst-case length wastes HBM on short requests. Here KV
lives in a global pool of fixed-size pages and each slot owns an int32
page table; admission allocates pages from a host-side free list as the
sequence grows, retirement returns them. The attainable concurrency is
then bound by TOTAL tokens in flight, not by max_slots × max_len.
(Reference comparator: vLLM-style paged attention — the reference
serving stack, Emu2/demo/backend/pytorch_model/backend.py, has only
whole-batch generate; paging is beyond-reference capability.)

TPU design: shapes stay static. Pages are HEAD-MAJOR
[L, n_pages, Hkv, page, D] — the same per-head dense-tile property as
llama.init_cache, which lets single-query steps run the pallas paged
decode kernel (ops/decode_attention.paged_decode_attention): the page
table rides scalar prefetch and the kernel's index_maps translate
(row, chunk) -> physical page at DMA issue time, so NO contiguous
per-slot KV copy is ever materialized (the r5 token-major design
gathered the whole pool view every step — measured x1.17 over the
dense cache; head-major + in-kernel paging closes that gap). Cache
writes are DEFERRED out of the layer scan exactly like
llama.decode_step: each layer's new k/v row exits as scan ys
(attention folds it as an exact extra column) and one dual-index
scatter per plane commits all layers. Page allocation is host
bookkeeping between jitted steps, where the continuous-batching
scheduler already sits.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from emu_tpu.config import LlamaConfig
from emu_tpu.models import llama
from emu_tpu.models.llama import _layer, rope_tables  # shared layer body
from emu_tpu.ops import layers as L


def init_paged_cache(cfg: LlamaConfig, n_pages: int, page_size: int,
                     max_slots: int, pages_per_slot: int,
                     dtype=jnp.bfloat16, quant: bool = False) -> dict:
    """Pool + page tables. Entry -1 in a table = unmapped (reads page 0,
    masked out by the caller's slot mask).

    quant=True stores int8 values with per-(head, token) f32 scale pages
    [L, n_pages, Hkv, page] — 2x the tokens-in-flight per pool byte; the
    paged kernel consumes the int8 pages natively (the scale planes are
    gathered to the logical view once per step and fold into the
    score/PV epilogue exactly like the dense quantized cache)."""
    shape = (cfg.num_hidden_layers, n_pages, cfg.kv_heads, page_size,
             cfg.head_dim)
    out = {
        "page_table": jnp.full((max_slots, pages_per_slot), -1, jnp.int32),
    }
    if quant:
        out["k"] = jnp.zeros(shape, jnp.int8)
        out["v"] = jnp.zeros(shape, jnp.int8)
        out["k_scale"] = jnp.zeros(shape[:-1], jnp.float32)
        out["v_scale"] = jnp.zeros(shape[:-1], jnp.float32)
    else:
        out["k"] = jnp.zeros(shape, dtype)
        out["v"] = jnp.zeros(shape, dtype)
    return out


class PageAllocator:
    """Host-side free list over the pool's page indices."""

    def __init__(self, n_pages: int):
        self.free: List[int] = list(range(n_pages - 1, -1, -1))

    def alloc(self, n: int) -> List[int]:
        if n > len(self.free):
            raise MemoryError(f"paged KV pool exhausted ({n} pages wanted, "
                              f"{len(self.free)} free)")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages) -> None:
        self.free.extend(int(p) for p in pages if int(p) >= 0)


def _gather_slot_kv(cache: dict) -> Tuple[jax.Array, ...]:
    """Materialize per-slot contiguous HEAD-MAJOR views
    [L, B, Hkv, P*page, D] — the XLA-fallback path only (the kernel
    path never calls this). int8 pools come back DEQUANTIZED (bf16).
    Unmapped (-1) table entries read page 0; callers mask those
    positions via their slot-validity mask."""
    table = jnp.maximum(cache["page_table"], 0)          # [B, P]
    k = cache["k"][:, table]                     # [L, B, P, H, pg, D]
    v = cache["v"][:, table]
    lyr, b, p, h, pg, d = k.shape
    k = k.transpose(0, 1, 3, 2, 4, 5).reshape(lyr, b, h, p * pg, d)
    v = v.transpose(0, 1, 3, 2, 4, 5).reshape(lyr, b, h, p * pg, d)
    if "k_scale" in cache:
        ks, vs = _gather_slot_scales(cache, table)
        k = k.astype(jnp.bfloat16) * ks.astype(jnp.bfloat16)[..., None]
        v = v.astype(jnp.bfloat16) * vs.astype(jnp.bfloat16)[..., None]
    return k, v


def _gather_slot_scales(cache: dict, table: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """Logical-view scale planes [L, B, Hkv, P*page] (f32) gathered
    through the page table — a few MB even at 13B/2k, done ONCE per
    decode step outside the layer scan."""
    ks = cache["k_scale"][:, table]              # [L, B, P, H, pg]
    vs = cache["v_scale"][:, table]
    lyr, b, p, h, pg = ks.shape
    ks = ks.transpose(0, 1, 3, 2, 4).reshape(lyr, b, h, p * pg)
    vs = vs.transpose(0, 1, 3, 2, 4).reshape(lyr, b, h, p * pg)
    return ks, vs


def paged_decode_step(params: dict, cfg: LlamaConfig, cache: dict,
                      token_embeds: jax.Array, slots: jax.Array,
                      slot_mask: jax.Array, positions: jax.Array
                      ) -> Tuple[jax.Array, dict]:
    """One decode step over the paged pool, per-row write indices.

    token_embeds [B, 1, D]; slots [B]: logical position to write (the
    page table rows must already map page slots[b] // page_size);
    slot_mask [B, P*page] validity incl. each row's new slot;
    positions [B] rope positions. Returns (hidden [B, 1, D], cache).

    The layer scan reads the pool as a closure constant and attention
    consumes it through a paged cache descriptor (format "paged"):
    single-query steps route to the pallas paged decode kernel, other
    shapes/backends gather the head-major view (cache_attention). The
    in-flight token attends as a deferred k_new/v_new column and all
    layers' rows commit in ONE dual-index scatter per plane after the
    scan."""
    b = token_embeds.shape[0]
    page = cache["k"].shape[3]
    table = jnp.maximum(cache["page_table"], 0)          # [B, P]
    bidx = jnp.arange(b)
    page_ix = table[bidx, slots // page]                 # [B] physical page
    off = slots % page
    max_pos = cache["page_table"].shape[1] * page
    from emu_tpu.ops import rope as R
    rows = R.gather_rope_rows(*rope_tables(cfg, max_pos), positions[:, None])
    cache_dtype = cache["k"].dtype
    quant = "k_scale" in cache
    if quant:  # logical-view scale planes, gathered once per step
        ks_view, vs_view = _gather_slot_scales(cache, table)
    # the in-flight slot is attended via k_new/v_new, not the pool
    cache_mask = jnp.logical_and(slot_mask,
                                 jnp.arange(max_pos)[None] != slots[:, None])

    def body(x, xs):
        p, i = xs

        def defer(k_new, v_new):
            kv = {"format": "paged", "k": cache["k"], "v": cache["v"],
                  "page_table": table, "layer": i, "dtype": x.dtype,
                  "k_new": k_new.transpose(0, 2, 1, 3),   # [B, Hkv, 1, D]
                  "v_new": v_new.transpose(0, 2, 1, 3)}
            if quant:
                kv["k_scale"] = ks_view
                kv["v_scale"] = vs_view
            return kv, jnp.stack([kv["k_new"], kv["v_new"]])

        x, rows_new = _layer(p, cfg, x, rows, defer, cache_mask, False)
        return x, rows_new

    x, new_rows = jax.lax.scan(
        body, token_embeds,
        (params["layers"], jnp.arange(cfg.num_hidden_layers)))
    # new_rows [L, 2, B, Hkv, 1, D] → pool[l, page_ix[b], :, off[b]]
    kv = jnp.swapaxes(new_rows, 0, 1)                    # [2, L, B, Hkv, 1, D]
    out = {"page_table": cache["page_table"]}
    if quant:
        vals, scale = llama.kv_quantize(kv)              # [2, L, B, Hkv, 1]
        for t, key in enumerate(("k", "v")):
            rows_t = jnp.moveaxis(vals[t][:, :, :, 0], 1, 0)  # [B, L, Hkv, D]
            srows = jnp.moveaxis(scale[t][:, :, :, 0], 1, 0)  # [B, L, Hkv]
            out[key] = cache[key].at[:, page_ix, :, off].set(rows_t)
            out[key + "_scale"] = cache[key + "_scale"].at[
                :, page_ix, :, off].set(srows)
    else:
        k_rows = jnp.moveaxis(kv[0][:, :, :, 0], 1, 0)   # [B, L, Hkv, D]
        v_rows = jnp.moveaxis(kv[1][:, :, :, 0], 1, 0)
        out["k"] = cache["k"].at[:, page_ix, :, off].set(
            k_rows.astype(cache_dtype))
        out["v"] = cache["v"].at[:, page_ix, :, off].set(
            v_rows.astype(cache_dtype))
    hidden = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return hidden, out


def paged_prefill_insert(params: dict, cfg: LlamaConfig, cache: dict,
                         inputs_embeds: jax.Array, attention_mask: jax.Array,
                         pages: jax.Array, slot: int) -> Tuple[jax.Array, dict]:
    """Prefill one prompt ([1, S, D], S a multiple of page_size is NOT
    required) into freshly allocated pages and install the page table row.

    pages: [n] physical page indices covering ceil(S / page) pages.
    Returns (last-token hidden [1, D] post-norm, cache)."""
    s = inputs_embeds.shape[1]
    page = cache["k"].shape[3]
    n = pages.shape[0]
    quant = "k_scale" in cache
    small = llama.init_cache(cfg, 1, n * page, dtype=cache["k"].dtype,
                             quant=quant)
    hidden, small = llama.prefill(params, cfg, inputs_embeds,
                                  attention_mask, small)
    # scatter the contiguous prefill kv into the pool pages (both are
    # head-major: dense scratch [L, 1, H, S, D] → pages [L, n, H, page, D])
    def to_pages(plane):
        sd = plane[:, 0, :, :n * page]                   # [L, H, S, D]
        return sd.reshape(cfg.num_hidden_layers, cfg.kv_heads, n, page,
                          cfg.head_dim).transpose(0, 2, 1, 3, 4)

    out = {}
    out["k"] = cache["k"].at[:, pages].set(to_pages(small["k"]))
    out["v"] = cache["v"].at[:, pages].set(to_pages(small["v"]))
    if quant:
        def to_scale_pages(plane):
            sd = plane[:, 0, :, :n * page]               # [L, H, S]
            return sd.reshape(cfg.num_hidden_layers, cfg.kv_heads, n,
                              page).transpose(0, 2, 1, 3)
        out["k_scale"] = cache["k_scale"].at[:, pages].set(
            to_scale_pages(small["k_scale"]))
        out["v_scale"] = cache["v_scale"].at[:, pages].set(
            to_scale_pages(small["v_scale"]))
    pt = cache["page_table"].at[slot].set(-1)
    out["page_table"] = pt.at[slot, :n].set(pages)
    return hidden[:, -1], out
