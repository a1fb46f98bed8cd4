"""Paged KV cache: a shared page pool instead of per-slot max_len rows.

The dense cache (llama.init_cache) reserves [B, max_len] per slot, so a
pool sized for worst-case length wastes HBM on short requests. Here KV
lives in a global pool of fixed-size pages [L, n_pages, page, H, D] and
each slot owns an int32 page table; admission allocates pages from a
host-side free list as the sequence grows, retirement returns them. The
attainable concurrency is then bound by TOTAL tokens in flight, not by
max_slots × max_len.

TPU design: shapes stay static — the per-slot view is materialized by a
pages gather (XLA fuses it into the attention read; attention has to
stream that KV from HBM anyway), writes are one dual-index scatter into
(page, offset). Everything the device sees is fixed-size; page
allocation is host bookkeeping between jitted steps, exactly where the
continuous-batching scheduler already sits.
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
                     dtype=jnp.bfloat16) -> dict:
    """Pool + page tables. Entry -1 in a table = unmapped (reads page 0,
    masked out by the caller's slot mask)."""
    shape = (cfg.num_hidden_layers, n_pages, page_size, cfg.kv_heads,
             cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "page_table": jnp.full((max_slots, pages_per_slot), -1, jnp.int32),
    }


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
    """Materialize per-slot contiguous KV views [L, B, P*page, H, D].

    Unmapped (-1) table entries read page 0; callers mask those positions
    via their slot-validity mask, so the garbage never enters softmax."""
    table = jnp.maximum(cache["page_table"], 0)          # [B, P]
    k = cache["k"][:, table]                             # [L, B, P, pg, H, D]
    v = cache["v"][:, table]
    lyr, b, p, pg, h, d = k.shape
    return k.reshape(lyr, b, p * pg, h, d), v.reshape(lyr, b, p * pg, h, d)


def paged_decode_step(params: dict, cfg: LlamaConfig, cache: dict,
                      token_embeds: jax.Array, slots: jax.Array,
                      slot_mask: jax.Array, positions: jax.Array
                      ) -> Tuple[jax.Array, dict]:
    """One decode step over the paged pool, per-row write indices.

    token_embeds [B, 1, D]; slots [B]: logical position to write (the
    page table rows must already map page slots[b] // page_size);
    slot_mask [B, P*page] validity incl. each row's new slot;
    positions [B] rope positions. Returns (hidden [B, 1, D], cache)."""
    b = token_embeds.shape[0]
    page = cache["k"].shape[2]
    table = jnp.maximum(cache["page_table"], 0)          # [B, P]
    bidx = jnp.arange(b)
    page_ix = table[bidx, slots // page]                 # [B] physical page
    off = slots % page
    max_pos = cache["page_table"].shape[1] * page
    from emu_tpu.ops import rope as R
    rows = R.gather_rope_rows(*rope_tables(cfg, max_pos), positions[:, None])
    cache_dtype = cache["k"].dtype

    k_view, v_view = _gather_slot_kv(cache)

    # Pool writes are DEFERRED out of the layer scan (same design as
    # llama.decode_step): routing the pool planes through scan xs/ys
    # copied the ENTIRE page pool twice per step; now the scan only
    # emits each layer's new row as ys and one dual-index scatter per
    # plane commits all layers below.
    def body(x, xs):
        p, k_vw, v_vw = xs

        def write(k_new, v_new):
            # attention reads the pre-gathered view + the fresh token
            k_full = k_vw.at[bidx, slots].set(k_new[:, 0].astype(k_vw.dtype))
            v_full = v_vw.at[bidx, slots].set(v_new[:, 0].astype(v_vw.dtype))
            return ((k_full.astype(x.dtype), v_full.astype(x.dtype)),
                    (k_new[:, 0], v_new[:, 0]))

        x, rows_new = _layer(p, cfg, x, rows, write, slot_mask,
                             False)
        return x, rows_new

    x, (k_rows, v_rows) = jax.lax.scan(
        body, token_embeds, (params["layers"], k_view, v_view))
    # k_rows/v_rows [L, B, Hkv, D] → pool[l, page_ix[b], off[b]]
    k_all = cache["k"].at[:, page_ix, off].set(k_rows.astype(cache_dtype))
    v_all = cache["v"].at[:, page_ix, off].set(v_rows.astype(cache_dtype))
    hidden = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return hidden, {"k": k_all, "v": v_all,
                    "page_table": cache["page_table"]}


def paged_prefill_insert(params: dict, cfg: LlamaConfig, cache: dict,
                         inputs_embeds: jax.Array, attention_mask: jax.Array,
                         pages: jax.Array, slot: int) -> Tuple[jax.Array, dict]:
    """Prefill one prompt ([1, S, D], S a multiple of page_size is NOT
    required) into freshly allocated pages and install the page table row.

    pages: [n] physical page indices covering ceil(S / page) pages.
    Returns (last-token hidden [1, D] post-norm, cache)."""
    s = inputs_embeds.shape[1]
    page = cache["k"].shape[2]
    n = pages.shape[0]
    small = llama.init_cache(cfg, 1, n * page, dtype=cache["k"].dtype)
    hidden, small = llama.prefill(params, cfg, inputs_embeds,
                                  attention_mask, small)
    # scatter the contiguous prefill kv into the pool pages (the dense
    # scratch cache is head-major [L, 1, H, S, D]; the pool pages keep
    # [page, H, D] token-major entries)
    def to_pages(plane):
        sd = plane[:, 0].transpose(0, 2, 1, 3)           # [L, S, H, D]
        return sd[:, :n * page].reshape(
            cfg.num_hidden_layers, n, page, cfg.kv_heads, cfg.head_dim)

    k_pages = to_pages(small["k"])
    v_pages = to_pages(small["v"])
    k = cache["k"].at[:, pages].set(k_pages)
    v = cache["v"].at[:, pages].set(v_pages)
    pt = cache["page_table"].at[slot].set(-1)
    pt = pt.at[slot, :n].set(pages)
    return hidden[:, -1], {"k": k, "v": v, "page_table": pt}
