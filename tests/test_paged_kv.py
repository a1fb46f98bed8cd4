"""Paged KV pool decode == dense-cache decode, page reuse correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from emu_tpu.config import LlamaConfig
from emu_tpu.generation.paged_kv import (PageAllocator, init_paged_cache,
                                         paged_decode_step,
                                         paged_prefill_insert)
from emu_tpu.models import llama

CFG = LlamaConfig(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  vocab_size=97, extended_vocab_size=97,
                  max_position_embeddings=128)
PAGE = 4


def _dense_decode(params, prompt, n_steps):
    """Greedy tokens via the dense cache, one request alone."""
    max_len = 32
    cache = llama.init_cache(CFG, 1, max_len, dtype=jnp.float32)
    emb = llama.embed(params, jnp.asarray(prompt)[None])
    mask = jnp.ones((1, len(prompt)), jnp.int32)
    hid, cache = llama.prefill(params, CFG, emb, mask, cache)
    tok = int(jnp.argmax(llama.logits(params, hid[0, -1])))
    toks = [tok]
    pos = len(prompt)
    for i in range(n_steps - 1):
        emb = llama.embed(params, jnp.asarray([[tok]]))
        sm = (jnp.arange(max_len) <= pos)[None]
        hid, cache = llama.decode_step(params, CFG, cache, emb,
                                       jnp.int32(pos), sm,
                                       jnp.asarray([pos]))
        tok = int(jnp.argmax(llama.logits(params, hid[0, 0])))
        toks.append(tok)
        pos += 1
    return toks


def test_paged_matches_dense_two_rows():
    params = llama.init(jax.random.PRNGKey(0), CFG)
    prompts = [[5, 17, 3, 42, 8], [9, 2, 71, 4, 33, 12, 60, 7, 25]]
    n_steps = 6
    want = [_dense_decode(params, p, n_steps) for p in prompts]

    alloc = PageAllocator(n_pages=16)
    cache = init_paged_cache(CFG, 16, PAGE, max_slots=2, pages_per_slot=6,
                             dtype=jnp.float32)
    max_pos = 6 * PAGE
    lengths, lasts, pages_held = [], [], []
    for slot, p in enumerate(prompts):
        need = -(-(len(p) + n_steps) // PAGE)   # pages for prompt + decode
        pages = alloc.alloc(need)
        pages_held.append(pages)
        emb = llama.embed(params, jnp.asarray(p)[None])
        hid, cache = paged_prefill_insert(
            params, CFG, cache, emb, jnp.ones((1, len(p)), jnp.int32),
            jnp.asarray(pages, jnp.int32), slot)
        lasts.append(int(jnp.argmax(llama.logits(params, hid[0]))))
        lengths.append(len(p))
    got = [[t] for t in lasts]

    for _ in range(n_steps - 1):
        slots = jnp.asarray(lengths, jnp.int32)
        sm = (jnp.arange(max_pos)[None] <= slots[:, None])
        emb = llama.embed(params, jnp.asarray(lasts)[:, None])
        hid, cache = paged_decode_step(params, CFG, cache, emb, slots, sm,
                                       slots)
        nxt = np.asarray(jnp.argmax(
            llama.logits(params, hid[:, 0]), axis=-1))
        for i in range(2):
            lasts[i] = int(nxt[i])
            got[i].append(lasts[i])
            lengths[i] += 1

    assert got == want, (got, want)


def test_page_reuse_is_clean():
    """Pages released by one request and reused by another must not leak
    stale kv (the fresh prefill overwrites them; table remaps)."""
    params = llama.init(jax.random.PRNGKey(1), CFG)
    alloc = PageAllocator(n_pages=4)
    cache = init_paged_cache(CFG, 4, PAGE, max_slots=1, pages_per_slot=4,
                             dtype=jnp.float32)
    p1 = [5, 17, 3, 42, 8, 11, 2]
    pages = alloc.alloc(2)
    emb = llama.embed(params, jnp.asarray(p1)[None])
    _, cache = paged_prefill_insert(params, CFG, cache, emb,
                                    jnp.ones((1, 7), jnp.int32),
                                    jnp.asarray(pages, jnp.int32), 0)
    alloc.release(pages)

    p2 = [9, 2, 71]
    want = _dense_decode(params, p2, 4)
    pages2 = alloc.alloc(2)
    emb = llama.embed(params, jnp.asarray(p2)[None])
    hid, cache = paged_prefill_insert(params, CFG, cache, emb,
                                      jnp.ones((1, 3), jnp.int32),
                                      jnp.asarray(pages2, jnp.int32), 0)
    got = [int(jnp.argmax(llama.logits(params, hid[0])))]
    length = 3
    for _ in range(3):
        slots = jnp.asarray([length], jnp.int32)
        sm = (jnp.arange(4 * PAGE)[None] <= slots[:, None])
        emb = llama.embed(params, jnp.asarray([got[-1]])[:, None])
        hid, cache = paged_decode_step(params, CFG, cache, emb, slots, sm,
                                       slots)
        got.append(int(jnp.argmax(llama.logits(params, hid[0, 0]))))
        length += 1
    assert got == want, (got, want)


def test_allocator_exhaustion():
    alloc = PageAllocator(2)
    alloc.alloc(2)
    try:
        alloc.alloc(1)
        assert False
    except MemoryError:
        pass


def test_paged_quant_matches_dense_quant():
    """int8 paged pool ≡ the dense int8 KV cache (identical
    quantization machinery: prefill via a quant scratch cache, decode
    rows via llama.kv_quantize) — token-exact for the same request."""
    params = llama.init(jax.random.PRNGKey(0), CFG)
    prompt = [9, 2, 71, 4, 33, 12, 60, 7, 25]
    n_steps = 6

    # dense int8 oracle
    max_len = 32
    cache = llama.init_cache(CFG, 1, max_len, quant=True)
    emb = llama.embed(params, jnp.asarray(prompt)[None])
    mask = jnp.ones((1, len(prompt)), jnp.int32)
    hid, cache = llama.prefill(params, CFG, emb, mask, cache)
    tok = int(jnp.argmax(llama.logits(params, hid[0, -1])))
    want = [tok]
    pos = len(prompt)
    for _ in range(n_steps - 1):
        emb = llama.embed(params, jnp.asarray([[tok]]))
        sm = (jnp.arange(max_len) <= pos)[None]
        hid, cache = llama.decode_step(params, CFG, cache, emb,
                                       jnp.int32(pos), sm,
                                       jnp.asarray([pos]))
        tok = int(jnp.argmax(llama.logits(params, hid[0, 0])))
        want.append(tok)
        pos += 1

    # paged int8
    alloc = PageAllocator(8)
    pcache = init_paged_cache(CFG, 8, PAGE, max_slots=1, pages_per_slot=6,
                              quant=True)
    assert pcache["k"].dtype == jnp.int8
    pages = jnp.asarray(alloc.alloc(-(-(len(prompt) + n_steps) // PAGE)),
                        jnp.int32)
    emb = llama.embed(params, jnp.asarray(prompt)[None])
    hid, pcache = paged_prefill_insert(
        params, CFG, pcache, emb, jnp.ones((1, len(prompt)), jnp.int32),
        pages, 0)
    tok = int(jnp.argmax(llama.logits(params, hid[0])))
    got = [tok]
    length = len(prompt)
    max_pos = 6 * PAGE
    for _ in range(n_steps - 1):
        slots = jnp.asarray([length], jnp.int32)
        sm = (jnp.arange(max_pos)[None] <= length)
        emb = llama.embed(params, jnp.asarray([[tok]]))
        hid, pcache = paged_decode_step(params, CFG, pcache, emb, slots,
                                        sm, slots)
        tok = int(jnp.argmax(llama.logits(params, hid[0, 0])))
        got.append(tok)
        length += 1
    assert got == want, (got, want)
