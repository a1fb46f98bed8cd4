"""Speculative decoding == target-only greedy decoding, token for token."""

import numpy as np
import jax
import jax.numpy as jnp

from emu_tpu.config import LlamaConfig
from emu_tpu.generation.engine import GenerationConfig, llama_generate
from emu_tpu.generation.speculative import (speculative_generate,
                                            speculative_generate_batch)
from emu_tpu.models import llama

CFG = LlamaConfig(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  vocab_size=97, extended_vocab_size=97,
                  max_position_embeddings=256)
DRAFT_CFG = LlamaConfig(hidden_size=16, intermediate_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        vocab_size=97, extended_vocab_size=97,
                        max_position_embeddings=256)


def _oracle(params, prompt, max_new, eos):
    embeds = llama.embed(params, jnp.asarray(prompt)[None])
    mask = jnp.ones((1, len(prompt)), jnp.int32)
    g = GenerationConfig(max_new_tokens=max_new, eos_token_id=eos)
    toks = list(np.asarray(llama_generate(params, CFG, embeds, mask, g))[0])
    if eos in toks:
        toks = toks[:toks.index(eos) + 1]
    return toks


def test_spec_equals_greedy_weak_draft():
    """An unrelated random draft (mostly rejected proposals) must still
    yield the target's exact greedy output."""
    tparams = llama.init(jax.random.PRNGKey(0), CFG)
    dparams = llama.init(jax.random.PRNGKey(99), DRAFT_CFG)
    prompt = [5, 17, 3, 42, 8]
    for max_new, kk in ((13, 4), (7, 2)):
        want = _oracle(tparams, prompt, max_new, eos=96)
        got = speculative_generate(tparams, CFG, dparams, DRAFT_CFG, prompt,
                                   max_new=max_new, k=kk, eos=96)
        assert got == want, (got, want)


def test_spec_equals_greedy_perfect_draft():
    """Draft == target: every proposal accepted, same output, exercises
    the all-accepted (a == k) cache-alignment path."""
    tparams = llama.init(jax.random.PRNGKey(1), CFG)
    prompt = [9, 2, 71]
    want = _oracle(tparams, prompt, 11, eos=96)
    got = speculative_generate(tparams, CFG, tparams, CFG, prompt,
                               max_new=11, k=3, eos=96)
    assert got == want, (got, want)


def test_spec_passthrough_target_full_acceptance():
    """A deep target whose extra layers have zeroed o_proj/down_proj
    computes the same function as its depth-truncated draft, so every
    proposal is accepted: rounds == ceil((max_new-1)/k). This is the
    construction bench.py's speculative upper-bound lane measures at 13B
    scale (real 40-layer weight traffic, best-case acceptance)."""
    deep_cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=4, num_attention_heads=4,
                           vocab_size=97, extended_vocab_size=97,
                           max_position_embeddings=256)
    tparams = llama.init(jax.random.PRNGKey(3), deep_cfg)
    keep = 2
    for name in ("self_attn/o_proj", "mlp/down"):
        node = tparams["layers"]
        for part in name.split("/"):
            node = node[part]
        node["kernel"] = node["kernel"].at[keep:].set(0.0)
    dparams = dict(tparams, layers=jax.tree_util.tree_map(
        lambda x: x[:keep], tparams["layers"]))
    d_cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=keep, num_attention_heads=4,
                        vocab_size=97, extended_vocab_size=97,
                        max_position_embeddings=256)
    prompt = [5, 17, 3, 42, 8]
    max_new, kk = 13, 4
    embeds = llama.embed(tparams, jnp.asarray(prompt)[None])
    mask = jnp.ones((1, len(prompt)), jnp.int32)
    g = GenerationConfig(max_new_tokens=max_new, eos_token_id=96)
    want = list(np.asarray(llama_generate(tparams, deep_cfg, embeds, mask,
                                          g))[0])
    if 96 in want:
        want = want[:want.index(96) + 1]
    got, rounds = speculative_generate(tparams, deep_cfg, dparams, d_cfg,
                                       prompt, max_new=max_new, k=kk,
                                       eos=96, return_rounds=True)
    assert got == want, (got, want)
    # all proposals accepted -> k tokens per round after the prefill token
    assert rounds == -(-(len(got) - 1) // kk), (rounds, len(got))


def test_spec_batch_matches_per_row_greedy():
    """Batched speculative decode (per-row acceptance over
    decode_mixed_rows): three left-padded rows of different lengths each
    produce exactly the tokens they'd get alone under target greedy, with
    a weak draft (rows reject at different points every round)."""
    tparams = llama.init(jax.random.PRNGKey(0), CFG)
    dparams = llama.init(jax.random.PRNGKey(99), DRAFT_CFG)
    rng = np.random.RandomState(5)
    prompts = [list(rng.randint(1, 90, n)) for n in (3, 7, 5)]
    eos = 96
    want = [_oracle(tparams, p, 11, eos) for p in prompts]

    s = max(len(p) for p in prompts)
    ids = np.zeros((3, s), np.int32)
    mask = np.zeros((3, s), np.int32)
    for i, p in enumerate(prompts):          # left padding
        ids[i, s - len(p):] = p
        mask[i, s - len(p):] = 1
    got = speculative_generate_batch(tparams, CFG, dparams, DRAFT_CFG,
                                     ids, mask, max_new=11, k=4, eos=eos)
    assert got == want, (got, want)


def test_spec_batch_full_acceptance_rounds():
    """Passthrough deep target + truncated draft at batch 2: every row
    accepts every proposal, so the loop takes ceil((max_new-1)/k)
    rounds."""
    deep_cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=4, num_attention_heads=4,
                           vocab_size=97, extended_vocab_size=97,
                           max_position_embeddings=256)
    tparams = llama.init(jax.random.PRNGKey(3), deep_cfg)
    keep = 2
    for name in ("self_attn/o_proj", "mlp/down"):
        node = tparams["layers"]
        for part in name.split("/"):
            node = node[part]
        node["kernel"] = node["kernel"].at[keep:].set(0.0)
    dparams = dict(tparams, layers=jax.tree_util.tree_map(
        lambda x: x[:keep], tparams["layers"]))
    d_cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=keep, num_attention_heads=4,
                        vocab_size=97, extended_vocab_size=97,
                        max_position_embeddings=256)
    ids = np.asarray([[5, 17, 3, 42], [9, 2, 71, 30]], np.int32)
    got, rounds = speculative_generate_batch(
        tparams, deep_cfg, dparams, d_cfg, ids, max_new=13, k=4, eos=-1,
        return_rounds=True)
    assert all(len(t) == 13 for t in got), [len(t) for t in got]
    assert rounds == 3, rounds               # ceil(12/4)
    # cross-check row 0 against the B=1 engine
    solo = speculative_generate(tparams, deep_cfg, dparams, d_cfg,
                                list(ids[0]), max_new=13, k=4, eos=-1)
    assert got[0] == solo, (got[0], solo)


def test_spec_int8_kv_matches():
    """kv_quant=True (int8 caches in both engines, consumed natively by
    the decode paths) decodes the same greedy tokens on a tiny model —
    B=1 and batched."""
    tparams = llama.init(jax.random.PRNGKey(0), CFG)
    dparams = llama.init(jax.random.PRNGKey(99), DRAFT_CFG)
    prompt = [5, 17, 3, 42, 8]
    base = speculative_generate(tparams, CFG, dparams, DRAFT_CFG, prompt,
                                max_new=9, k=3, eos=96)
    q = speculative_generate(tparams, CFG, dparams, DRAFT_CFG, prompt,
                             max_new=9, k=3, eos=96, kv_quant=True)
    assert q == base, (q, base)
    ids = np.asarray([prompt, prompt], np.int32)
    bq = speculative_generate_batch(tparams, CFG, dparams, DRAFT_CFG, ids,
                                    max_new=9, k=3, eos=96, kv_quant=True)
    assert bq == [base, base], (bq, base)


def test_decode_chunk_matches_steps():
    """decode_chunk over q tokens == q sequential decode_steps."""
    params = llama.init(jax.random.PRNGKey(2), CFG)
    prompt = jnp.asarray([[4, 8, 15, 16]])
    mask = jnp.ones((1, 4), jnp.int32)
    max_len = 16
    cache = llama.init_cache(CFG, 1, max_len, dtype=jnp.float32)
    _, cache0 = llama.prefill(params, CFG, llama.embed(params, prompt),
                              mask, cache)
    toks = jnp.asarray([[23, 42, 7]])

    # sequential
    cache_a = cache0
    hs = []
    for i in range(3):
        emb = llama.embed(params, toks[:, i:i + 1])
        sm = (jnp.arange(max_len) <= 4 + i)[None]
        h, cache_a = llama.decode_step(params, CFG, cache_a, emb,
                                       jnp.int32(4 + i), sm,
                                       jnp.asarray([4 + i]))
        hs.append(h[:, 0])
    ref = jnp.stack(hs, axis=1)

    # chunked
    emb = llama.embed(params, toks)
    h_chunk, cache_b = llama.decode_chunk(
        params, CFG, cache_b_in := cache0, emb, jnp.int32(4),
        jnp.asarray([4]), (4 + jnp.arange(3))[None])
    np.testing.assert_allclose(np.asarray(h_chunk), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache_b["k"][:, :, :7]),
                               np.asarray(cache_a["k"][:, :, :7]),
                               rtol=2e-5, atol=2e-5)
