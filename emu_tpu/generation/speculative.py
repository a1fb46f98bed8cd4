"""Speculative decoding: draft-model proposal + single-pass verification.

A small draft model proposes k tokens autoregressively; the target model
scores all of them in ONE chunked forward (llama.decode_chunk) and the
longest prefix agreeing with the target's own greedy choices is
accepted, plus the target's correction token on the first mismatch.
Greedy acceptance makes the output PROVABLY identical to target-only
greedy decoding — the draft only changes how many target forward passes
are needed, not what comes out. Decode is HBM-bound on the target's
weights (BASELINE.md), so accepting a tokens per round divides the
weight traffic by ~a.

The whole generate loop is one jitted lax.while_loop: fixed-shape
caches, a fixed k-token proposal fori_loop, one verify chunk, masked
scatter into the output buffer. The reference has no speculative path
(HF `generate` one token at a time, SURVEY §3.1).

Bookkeeping (B=1): `committed` = tokens whose KV both caches hold.
When all k proposals are accepted the round emits exactly k tokens
(skipping the "bonus" token keeps the draft cache's valid prefix
aligned — the last proposal's KV is in neither cache and gets written
when it is fed as the next round's first token).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu.models import llama


@functools.partial(jax.jit, static_argnums=(1, 3, 5, 6, 7, 8))
def _spec_jit(t_params, t_cfg, d_params, d_cfg, prompt_ids, max_new: int,
              k: int, eos: int, kv_quant: bool = False):
    s = prompt_ids.shape[0]
    max_len = -(-(s + max_new + k + 2) // 8) * 8       # kernel-legal
    ids = prompt_ids[None]
    mask = jnp.ones((1, s), jnp.int32)

    cdt = t_params["norm"].dtype
    t_cache = llama.init_cache(t_cfg, 1, max_len, dtype=cdt,
                               quant=kv_quant)
    d_cache = llama.init_cache(d_cfg, 1, max_len, dtype=cdt,
                               quant=kv_quant)
    t_hidden, t_cache = llama.prefill(t_params, t_cfg,
                                      llama.embed(t_params, ids), mask,
                                      t_cache)
    _, d_cache = llama.prefill(d_params, d_cfg,
                               llama.embed(d_params, ids), mask, d_cache)
    last = jnp.argmax(llama.logits(t_params, t_hidden[0, -1])).astype(
        jnp.int32)

    out0 = jnp.zeros((max_new,), jnp.int32)
    out0 = out0.at[0].set(last)
    arange_len = jnp.arange(max_len)

    def round_body(st):
        t_cache, d_cache, committed, last, out, n, rounds, done = st

        # -- draft proposes k tokens (chunk[0] = last, chunk[i+1] = p_i)
        def propose(i, carry):
            d_cache, tok, chunk = carry
            slot = committed + i
            emb = llama.embed(d_params, tok[None, None])
            sm = (arange_len <= slot)[None]
            hid, d_cache = llama.decode_step(d_params, d_cfg, d_cache, emb,
                                             slot, sm, slot[None])
            nxt = jnp.argmax(llama.logits(d_params, hid[0, 0])).astype(
                jnp.int32)
            return d_cache, nxt, chunk.at[i + 1].set(nxt)

        chunk0 = jnp.zeros((k + 1,), jnp.int32).at[0].set(last)
        d_cache, _, chunk = jax.lax.fori_loop(
            0, k, propose, (d_cache, last, chunk0))

        # -- target verifies the whole chunk in one forward
        emb = llama.embed(t_params, chunk[None])
        pos = committed + jnp.arange(k + 1)
        hid, t_cache = llama.decode_chunk(t_params, t_cfg, t_cache, emb,
                                          committed, committed[None],
                                          pos[None])
        g = jnp.argmax(llama.logits(t_params, hid[0]), axis=-1).astype(
            jnp.int32)                                   # [k+1]

        # -- longest accepted prefix
        agree = g[:k] == chunk[1:]
        a = jnp.sum(jnp.cumprod(agree.astype(jnp.int32)))   # 0..k
        count = jnp.where(a < k, a + 1, k)
        idx = jnp.arange(k)
        emitted = jnp.where(idx < a, chunk[1:], g[jnp.minimum(idx, a)])
        new_last = jnp.where(a < k, g[a], chunk[k])

        # -- eos / budget truncation
        is_eos = (emitted == eos) & (idx < count)
        hit_eos = jnp.any(is_eos)
        count = jnp.where(hit_eos, jnp.argmax(is_eos) + 1, count)
        count = jnp.minimum(count, max_new - n)
        write = (idx < count) & (n + idx < max_new)
        out = out.at[jnp.where(write, n + idx, max_new)].set(
            emitted, mode="drop")
        n = n + count
        committed = committed + count
        done = hit_eos | (n >= max_new)
        return (t_cache, d_cache, committed, new_last, out, n, rounds + 1,
                done)

    def cond(st):
        return ~st[-1]

    committed0 = jnp.int32(s)
    done0 = (last == eos) | (max_new <= 1)
    st = (t_cache, d_cache, committed0, last, out0, jnp.int32(1),
          jnp.int32(0), done0)
    st = jax.lax.while_loop(cond, round_body, st)
    return st[4], st[5], st[6]


@functools.partial(jax.jit, static_argnums=(1, 3, 6, 7, 8, 9))
def _spec_batch_jit(t_params, t_cfg, d_params, d_cfg, prompt_ids, mask,
                    max_new: int, k: int, eos: int,
                    kv_quant: bool = False):
    """Batched greedy speculative decode: per-row acceptance over the
    per-row-slot decode machinery.

    Draft proposals run k `decode_step_rows` (each row writes its own
    draft-cache slot at committed_b + i); the target verifies every
    row's (k+1)-chunk in ONE `decode_mixed_rows` forward (per-row chunk
    scatter + intra-chunk causal triangle — the same program the
    chunked-prefill engine uses). Rows accept independently, so
    `committed` is per-row; rejected proposal slots stay invalid in the
    running validity mask and are overwritten by the next round's chunk
    (which starts at the new committed index). Finished rows freeze
    (count forced 0) and ride along masked."""
    b, s = prompt_ids.shape
    max_len = -(-(s + max_new + k + 2) // 8) * 8
    bidx = jnp.arange(b)
    arange_len = jnp.arange(max_len)

    cdt = t_params["norm"].dtype
    t_cache = llama.init_cache(t_cfg, b, max_len, dtype=cdt,
                               quant=kv_quant)
    d_cache = llama.init_cache(d_cfg, b, max_len, dtype=cdt,
                               quant=kv_quant)
    t_hidden, t_cache = llama.prefill(t_params, t_cfg,
                                      llama.embed(t_params, prompt_ids),
                                      mask, t_cache)
    _, d_cache = llama.prefill(d_params, d_cfg,
                               llama.embed(d_params, prompt_ids), mask,
                               d_cache)
    last = jnp.argmax(llama.logits(t_params, t_hidden[:, -1]),
                      axis=-1).astype(jnp.int32)               # [B]

    valid0 = jnp.zeros((b, max_len), bool).at[:, :s].set(mask.astype(bool))
    committed0 = jnp.full((b,), s, jnp.int32)
    pos0 = jnp.sum(mask.astype(jnp.int32), axis=1)             # [B]
    out0 = jnp.zeros((b, max_new), jnp.int32).at[:, 0].set(last)
    n0 = jnp.ones((b,), jnp.int32)
    done0 = (last == eos) | (max_new <= 1)

    def round_body(st):
        (t_cache, d_cache, valid, committed, pos, last, out, n, rounds,
         done) = st

        def propose(i, carry):
            d_cache, tok, chunk = carry
            slots = committed + i
            sm = valid | ((arange_len[None] >= committed[:, None])
                          & (arange_len[None] <= slots[:, None]))
            emb = llama.embed(d_params, tok[:, None])
            hid, d_cache = llama.decode_step_rows(d_params, d_cfg,
                                                  d_cache, emb, slots, sm,
                                                  pos + i)
            nxt = jnp.argmax(llama.logits(d_params, hid[:, 0]),
                             axis=-1).astype(jnp.int32)
            return d_cache, nxt, chunk.at[:, i + 1].set(nxt)

        chunk0 = jnp.zeros((b, k + 1), jnp.int32).at[:, 0].set(last)
        d_cache, _, chunk = jax.lax.fori_loop(
            0, k, propose, (d_cache, last, chunk0))

        emb = llama.embed(t_params, chunk)                     # [B,k+1,D]
        hid, t_cache = llama.decode_mixed_rows(t_params, t_cfg, t_cache,
                                               emb, committed, valid, pos)
        g = jnp.argmax(llama.logits(t_params, hid),
                       axis=-1).astype(jnp.int32)              # [B,k+1]

        agree = g[:, :k] == chunk[:, 1:]
        a = jnp.sum(jnp.cumprod(agree.astype(jnp.int32), axis=1), axis=1)
        count = jnp.where(a < k, a + 1, k)                     # [B]
        idx = jnp.arange(k)[None]
        emitted = jnp.where(idx < a[:, None], chunk[:, 1:],
                            g[bidx[:, None], jnp.minimum(idx, a[:, None])])
        new_last = jnp.where(a < k, g[bidx, jnp.minimum(a, k)],
                             chunk[:, k])

        is_eos = (emitted == eos) & (idx < count[:, None])
        hit_eos = jnp.any(is_eos, axis=1)
        count = jnp.where(hit_eos, jnp.argmax(is_eos, axis=1) + 1, count)
        count = jnp.minimum(count, max_new - n)
        count = jnp.where(done, 0, count)
        write = idx < count[:, None]
        out = out.at[bidx[:, None],
                     jnp.where(write, n[:, None] + idx, max_new)].set(
            emitted, mode="drop")
        newly = ((arange_len[None] >= committed[:, None])
                 & (arange_len[None] < (committed + count)[:, None]))
        valid = valid | newly
        n = n + count
        committed = committed + count
        pos = pos + count
        last = jnp.where(done, last, new_last)
        done = done | hit_eos | (n >= max_new)
        return (t_cache, d_cache, valid, committed, pos, last, out, n,
                rounds + 1, done)

    def cond(st):
        return ~jnp.all(st[-1])

    st = (t_cache, d_cache, valid0, committed0, pos0, last, out0, n0,
          jnp.int32(0), done0)
    st = jax.lax.while_loop(cond, round_body, st)
    return st[6], st[7], st[8]


def speculative_generate_batch(t_params, t_cfg, d_params, d_cfg,
                               prompt_ids, attention_mask=None, *,
                               max_new: int, k: int = 4, eos: int = 2,
                               kv_quant: bool = False,
                               return_rounds: bool = False):
    """Batched greedy speculative decode. prompt_ids [B, S] (left-pad
    with attention_mask like llama_generate). Returns a list of B token
    lists, each provably identical to target-only greedy decoding for
    that row; with return_rounds, also the shared round count (rows
    accept independently — a slow row does not block others' tokens,
    only the loop's trip count)."""
    ids = jnp.asarray(prompt_ids, jnp.int32)
    if attention_mask is None:
        attention_mask = jnp.ones_like(ids)
    out, n, rounds = _spec_batch_jit(t_params, t_cfg, d_params, d_cfg,
                                     ids, jnp.asarray(attention_mask,
                                                      jnp.int32),
                                     max_new, k, eos, kv_quant)
    out, n = np.asarray(out), np.asarray(n)
    res = []
    for row, cnt in zip(out, n):
        toks = list(row[:int(cnt)])
        if eos in toks:
            toks = toks[:toks.index(eos) + 1]
        res.append(toks)
    return (res, int(rounds)) if return_rounds else res


def speculative_generate(t_params, t_cfg, d_params, d_cfg, prompt_ids,
                         *, max_new: int, k: int = 4, eos: int = 2,
                         kv_quant: bool = False,
                         return_rounds: bool = False):
    """Greedy speculative decode (B=1). Returns generated token ids.

    Output is token-identical to `llama_generate` greedy on the target
    model alone; the draft only accelerates. Both models must share a
    tokenizer. k = proposal length per round. With return_rounds, also
    returns the number of draft/verify rounds taken — tokens/rounds is
    the measured mean acceptance (+1 correction token) per round."""
    out, n, rounds = _spec_jit(t_params, t_cfg, d_params, d_cfg,
                               jnp.asarray(prompt_ids, jnp.int32),
                               max_new, k, eos, kv_quant)
    toks = list(np.asarray(out)[:int(n)])
    if eos in toks:
        toks = toks[:toks.index(eos) + 1]
    return (toks, int(rounds)) if return_rounds else toks
