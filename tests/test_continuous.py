"""Continuous batching engine vs single-request llama_generate (greedy)."""

import numpy as np
import jax
import jax.numpy as jnp

from emu_tpu.config import LlamaConfig
from emu_tpu.generation.continuous import ContinuousEngine
from emu_tpu.generation.engine import GenerationConfig, llama_generate
from emu_tpu.models import llama

CFG = LlamaConfig(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  vocab_size=97, extended_vocab_size=97,
                  max_position_embeddings=128)


def _setup():
    params = llama.init(jax.random.PRNGKey(0), CFG)
    def embeds_for(ids):
        return llama.embed(params, jnp.asarray(ids)[None])
    return params, embeds_for


def _oracle(params, embeds, max_new, eos):
    g = GenerationConfig(max_new_tokens=max_new, eos_token_id=eos)
    mask = jnp.ones(embeds.shape[:2], jnp.int32)
    out = llama_generate(params, CFG, embeds, mask, g)
    toks = list(np.asarray(out)[0])
    # llama_generate pads after eos; cut at first eos (inclusive)
    if eos in toks:
        toks = toks[:toks.index(eos) + 1]
    return toks


def test_matches_single_request_greedy():
    """Three staggered requests of different lengths decode exactly the
    tokens each would get alone (bucketed left-padding included)."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 11, 23)]
    oracle = [_oracle(params, embeds_for(p), 12, eos) for p in prompts]

    eng = ContinuousEngine(params, CFG, max_slots=4, max_len=64,
                           prefill_buckets=(8, 16, 32), eos_token_id=eos)
    ids = [eng.submit(embeds_for(prompts[0]),
                      jnp.ones((1, 5), jnp.int32), 12)]
    eng.step()                         # request 0 runs alone for 2 steps
    eng.step()
    ids.append(eng.submit(embeds_for(prompts[1]),
                          jnp.ones((1, 11), jnp.int32), 12))
    eng.step()
    ids.append(eng.submit(embeds_for(prompts[2]),
                          jnp.ones((1, 23), jnp.int32), 12))
    results = eng.run_until_drained()
    assert set(results) == set(ids)
    for rid, want in zip(ids, oracle):
        assert results[rid] == want, (results[rid], want)


def test_step_block_matches_step_loop():
    """step_block(n) (the one-dispatch-per-n-tokens serving path) emits
    exactly the tokens the per-step loop does, including mid-block EOS
    retirement and between-block admission into a freed slot — with the
    deferred double-buffered record (record block i after dispatching
    block i+1)."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(2)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 11, 23)]
    oracle = [_oracle(params, embeds_for(p), 9, eos) for p in prompts]

    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16, 32), eos_token_id=eos)
    ids = [eng.submit(embeds_for(prompts[i]),
                      jnp.ones((1, len(prompts[i])), jnp.int32), 9)
           for i in (0, 1)]
    pending = eng.step_block(4)
    # double buffering: dispatch the next block before recording the first
    pending2 = eng.step_block(4)
    eng.record_block(pending)
    eng.record_block(pending2)
    # both requests hit max_new=9 (1 prefill token + 8 block tokens) or
    # EOS'd; admit the third into whatever freed
    if eng.free_slots():
        ids.append(eng.submit(embeds_for(prompts[2]),
                              jnp.ones((1, 23), jnp.int32), 9))
    for _ in range(6):
        eng.record_block(eng.step_block(4))
        if all(r is None for r in eng.slot_req):
            break
    results = eng.finished()
    assert set(results) == set(ids)
    for rid, want in zip(ids, oracle[:len(ids)]):
        assert results[rid] == want, (results[rid], want)


def test_slot_reuse():
    """A freed slot admits a new request with clean state."""
    params, embeds_for = _setup()
    eng = ContinuousEngine(params, CFG, max_slots=1, max_len=48,
                           prefill_buckets=(8,), eos_token_id=None)
    p1 = [3, 5, 7]
    r1 = eng.submit(embeds_for(p1), jnp.ones((1, 3), jnp.int32), 4)
    out1 = eng.run_until_drained()
    assert len(out1[r1]) == 4
    p2 = [11, 13]
    r2 = eng.submit(embeds_for(p2), jnp.ones((1, 2), jnp.int32), 4)
    out2 = eng.run_until_drained()
    assert len(out2[r2]) == 4
    want = _oracle(params, embeds_for(p2), 4, eos=-1)
    assert out2[r2] == want


def test_full_pool_raises():
    params, embeds_for = _setup()
    eng = ContinuousEngine(params, CFG, max_slots=1, max_len=32,
                           prefill_buckets=(8,), eos_token_id=None)
    eng.submit(embeds_for([1, 2]), jnp.ones((1, 2), jnp.int32), 8)
    try:
        eng.submit(embeds_for([3]), jnp.ones((1, 1), jnp.int32), 8)
        assert False, "expected ValueError when pool is full"
    except ValueError:
        pass


def test_int8_kv_cache_matches():
    """kv_cache_quant=True engine decodes the same greedy tokens as the
    bf16-cache engine (int8 KV on a tiny model: quantization noise below
    argmax ties), including the prefill small-cache scale-plane merge."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(1)
    prompts = [list(rng.randint(1, 90, n)) for n in (7, 19)]

    def run(quant):
        eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                               prefill_buckets=(8, 32), eos_token_id=eos,
                               kv_cache_quant=quant)
        ids = [eng.submit(embeds_for(p),
                          jnp.ones((1, len(p)), jnp.int32), 10)
               for p in prompts]
        res = eng.run_until_drained()
        return [res[i] for i in ids]

    assert run(False) == run(True)


def test_tp_sharded_params_match_replicated():
    """Continuous batching over TENSOR-PARALLEL params: the engine's
    jitted prefill/step programs run with the decoder sharded over a
    (1, 4) mesh ("model" axis) and produce the same token streams as
    replicated params — the serving-on-a-mesh-slice configuration."""
    from emu_tpu.parallel import make_mesh, shard_params
    from emu_tpu.models.llama import sharding_rules

    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(3)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 13)]

    def run(p):
        eng = ContinuousEngine(p, CFG, max_slots=2, max_len=64,
                               prefill_buckets=(8, 16), eos_token_id=eos)
        ids = [eng.submit(embeds_for(pr), jnp.ones((1, len(pr)), jnp.int32),
                          10) for pr in prompts]
        res = eng.run_until_drained()
        return [res[i] for i in ids]

    want = run(params)
    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    sharded = shard_params(params, mesh, sharding_rules)
    got = run(sharded)
    assert got == want, (got, want)


def test_chunked_prefill_matches_oracle():
    """Chunked (Sarathi-style) admission: a prompt longer than every
    prefill bucket streams into its slot chunk_size tokens per mixed
    step. Tokens must equal the single-request oracle, and other slots
    must keep advancing during the admission (no prefill stall)."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(7)
    short = list(rng.randint(1, 90, 5))
    long = list(rng.randint(1, 90, 37))           # > largest bucket (16)
    want_short = _oracle(params, embeds_for(short), 12, eos)
    want_long = _oracle(params, embeds_for(long), 8, eos)

    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=eos,
                           chunk_size=8)
    rid_s = eng.submit(embeds_for(short), jnp.ones((1, 5), jnp.int32), 12)
    rid_l = eng.submit(embeds_for(long), jnp.ones((1, 37), jnp.int32), 8)
    assert eng._admissions, "long prompt should park as chunked admission"
    # during the 5 admission steps (ceil(37/8)), the short request decodes
    short_before = len(eng.requests[rid_s].tokens)
    n_mixed = 0
    while eng._admissions:
        eng.step()
        n_mixed += 1
    assert n_mixed == 5
    assert len(eng.requests[rid_s].tokens) > short_before, (
        "short request stalled during chunked admission")
    res = eng.run_until_drained()
    assert res[rid_s] == want_short, (res[rid_s], want_short)
    assert res[rid_l] == want_long, (res[rid_l], want_long)


def test_chunked_prefill_first_token_eos():
    """A chunked admission whose first generated token is EOS (or
    max_new == 1) completes at the final chunk without occupying the
    slot further."""
    params, embeds_for = _setup()
    rng = np.random.RandomState(9)
    long = list(rng.randint(1, 90, 20))
    want = _oracle(params, embeds_for(long), 1, eos=96)
    eng = ContinuousEngine(params, CFG, max_slots=1, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=96,
                           chunk_size=8)
    rid = eng.submit(embeds_for(long), jnp.ones((1, 20), jnp.int32), 1)
    res = eng.run_until_drained()
    assert res[rid] == want
    assert eng.slot_req == [None]


def test_chunked_prefill_int8_kv():
    """Chunked admission composes with the int8 KV cache (the q>1
    per-row quantized scatter commit path)."""
    params, embeds_for = _setup()
    rng = np.random.RandomState(11)
    long = list(rng.randint(1, 90, 21))
    want = _oracle(params, embeds_for(long), 6, eos=96)
    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=96,
                           chunk_size=8, kv_cache_quant=True)
    rid = eng.submit(embeds_for(long), jnp.ones((1, 21), jnp.int32), 6)
    res = eng.run_until_drained()
    # int8 quantization can in principle flip near-ties, but on this
    # model the stream matches the full-precision oracle exactly
    assert res[rid] == want, (res[rid], want)


def test_per_request_temperature():
    """per_request_sampling=True: a temperature=0 row in a mixed pool
    still decodes the exact greedy oracle while a sampled row shares the
    same jitted step; a greedy-only engine rejects sampled submits."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(13)
    g_prompt = list(rng.randint(1, 90, 7))
    s_prompt = list(rng.randint(1, 90, 9))
    want_greedy = _oracle(params, embeds_for(g_prompt), 10, eos)

    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=eos,
                           per_request_sampling=True)
    rid_g = eng.submit(embeds_for(g_prompt), jnp.ones((1, 7), jnp.int32),
                       10, temperature=0.0)
    rid_s = eng.submit(embeds_for(s_prompt), jnp.ones((1, 9), jnp.int32),
                       10, temperature=1.0)
    res = eng.run_until_drained()
    assert res[rid_g] == want_greedy, (res[rid_g], want_greedy)
    assert 1 <= len(res[rid_s]) <= 10

    greedy_eng = ContinuousEngine(params, CFG, max_slots=1, max_len=64,
                                  prefill_buckets=(8,), eos_token_id=eos)
    try:
        greedy_eng.submit(embeds_for(g_prompt), jnp.ones((1, 7), jnp.int32),
                          4, temperature=0.7)
        assert False, "greedy-only engine must reject sampled submits"
    except ValueError:
        pass


def test_per_request_temperature_chunked():
    """A sampled request admitted through the CHUNKED path carries its
    temperature into the mixed step, and a greedy chunked admission in a
    sampling-capable engine still matches the oracle."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(17)
    long = list(rng.randint(1, 90, 21))
    want = _oracle(params, embeds_for(long), 6, eos)
    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=eos,
                           chunk_size=8, per_request_sampling=True)
    rid = eng.submit(embeds_for(long), jnp.ones((1, 21), jnp.int32), 6,
                     temperature=0.0)
    res = eng.run_until_drained()
    assert res[rid] == want, (res[rid], want)


def test_engine_frees_on_close():
    """Dropping a closed engine must release it: with the old class-level
    @jax.jit(static self) programs, the GLOBAL jit cache pinned every
    engine instance (and its donated KV state) forever — the r5
    serving-lane OOM. Per-instance jits + close() scope executables to
    the engine's lifetime."""
    import gc
    import weakref

    params, embeds_for = _setup()
    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=32,
                           prefill_buckets=(8,), eos_token_id=None)
    eng.submit(embeds_for([3, 5]), jnp.ones((1, 2), jnp.int32), 3)
    eng.run_until_drained()
    ref = weakref.ref(eng)
    eng.close()
    del eng
    gc.collect()
    assert ref() is None, "engine still referenced after close()+del"


def test_submit_many_matches_oracle():
    """Batched admission (one prefill program per bucket, padded to a
    power of two by duplicating row 0, first-token fetch deferred)
    decodes exactly what each request would get alone — including a
    group of 3 (pad row exercised) spanning two prompt buckets."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(21)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 7, 19)]
    oracle = [_oracle(params, embeds_for(p), 10, eos) for p in prompts]

    eng = ContinuousEngine(params, CFG, max_slots=4, max_len=64,
                           prefill_buckets=(8, 32), eos_token_id=eos)
    ids = eng.submit_many([(embeds_for(p),
                            jnp.ones((1, len(p)), jnp.int32), 10)
                           for p in prompts])
    res = eng.run_until_drained()
    assert set(res) == set(ids)
    for rid, want in zip(ids, oracle):
        assert res[rid] == want, (res[rid], want)


def test_submit_many_block_path_and_refill():
    """submit_many + step_block double buffering: deferred first tokens,
    gen-snapshot gating (slot retired and readmitted between a block's
    dispatch and its record must not be touched by the stale block)."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(23)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 6, 7, 21)]
    budgets = [4, 12, 12, 9]
    oracle = [_oracle(params, embeds_for(p), b, eos)
              for p, b in zip(prompts, budgets)]

    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 32), eos_token_id=eos)
    queue = list(zip(prompts, budgets))
    ids, pending = [], None
    for _ in range(100):
        while queue and eng.free_slots():
            p, b = queue.pop(0)
            ids += eng.submit_many([(embeds_for(p),
                                     jnp.ones((1, len(p)), jnp.int32), b)])
        busy = any(r is not None for r in eng.slot_req)
        if busy:
            blk = eng.step_block(4)
            if pending is not None:
                eng.record_block(pending)
            pending = blk
        elif pending is not None:
            eng.record_block(pending)
            pending = None
        if not queue and not busy and pending is None:
            break
    res = eng.finished()
    assert set(res) == set(ids)
    for rid, want in zip(ids, oracle):
        assert res[rid] == want, (res[rid], want)


def test_submit_many_first_token_done():
    """A deferred admission with max_new=1 (and one whose first token
    can't continue) retires via the record path without ever decoding."""
    params, embeds_for = _setup()
    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=32,
                           prefill_buckets=(8,), eos_token_id=None)
    want = _oracle(params, embeds_for([3, 5]), 1, eos=-1)
    ids = eng.submit_many([(embeds_for([3, 5]),
                            jnp.ones((1, 2), jnp.int32), 1)])
    res = eng.run_until_drained()
    assert res[ids[0]] == want
    assert eng.slot_req == [None, None]


def test_suggested_block_sizing():
    """suggested_block returns steps-to-next-budget-retirement clamped
    to [floor, max], and the variable-size block path still decodes the
    exact oracle streams."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(29)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 9)]
    budgets = [5, 11]
    oracle = [_oracle(params, embeds_for(p), b, eos)
              for p, b in zip(prompts, budgets)]
    eng = ContinuousEngine(params, CFG, max_slots=2, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=eos)
    ids = eng.submit_many([
        (embeds_for(p), jnp.ones((1, len(p)), jnp.int32), b)
        for p, b in zip(prompts, budgets)])
    # after admission both rows hold 1 token: remaining 4 and 10
    assert eng.suggested_block(16) == 4
    assert eng.suggested_block(16, floor=8) == 8
    pending = None
    for _ in range(50):
        if any(r is not None for r in eng.slot_req):
            blk = eng.step_block(eng.suggested_block(6, floor=2))
            if pending is not None:
                eng.record_block(pending)
            pending = blk
        elif pending is not None:
            eng.record_block(pending)
            pending = None
        else:
            break
    res = eng.finished()
    for rid, want in zip(ids, oracle):
        assert res[rid] == want, (res[rid], want)


def test_max_prefill_rows_split():
    """max_prefill_rows splits an admission burst into several prefill
    programs (the HBM guard for edge-sized pools) with identical
    decoded streams."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(31)
    prompts = [list(rng.randint(1, 90, n)) for n in (5, 6, 7)]
    oracle = [_oracle(params, embeds_for(p), 8, eos) for p in prompts]
    eng = ContinuousEngine(params, CFG, max_slots=4, max_len=64,
                           prefill_buckets=(8,), eos_token_id=eos,
                           max_prefill_rows=2)
    ids = eng.submit_many([(embeds_for(p),
                            jnp.ones((1, len(p)), jnp.int32), 8)
                           for p in prompts])
    res = eng.run_until_drained()
    for rid, want in zip(ids, oracle):
        assert res[rid] == want, (res[rid], want)


def test_submit_many_chunked_fallthrough():
    """A submit_many batch mixing bucketed prompts with one beyond the
    buckets (chunk_size set): the long prompt parks as a CHUNKED
    admission, the rest admit batched, ids return in request order, and
    every stream matches its oracle."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(37)
    short = list(rng.randint(1, 90, 5))
    long = list(rng.randint(1, 90, 37))            # > largest bucket
    want_s = _oracle(params, embeds_for(short), 8, eos)
    want_l = _oracle(params, embeds_for(long), 6, eos)
    eng = ContinuousEngine(params, CFG, max_slots=3, max_len=64,
                           prefill_buckets=(8, 16), eos_token_id=eos,
                           chunk_size=8)
    ids = eng.submit_many([
        (embeds_for(short), jnp.ones((1, 5), jnp.int32), 8),
        (embeds_for(long), jnp.ones((1, 37), jnp.int32), 6),
    ])
    assert eng._admissions, "long prompt should park as chunked"
    res = eng.run_until_drained()
    assert res[ids[0]] == want_s, (res[ids[0]], want_s)
    assert res[ids[1]] == want_l, (res[ids[1]], want_l)

def test_drain_admissions_matches_step_loop():
    """drain_admissions (N mixed dispatches + ONE combined fetch) must
    produce the exact token streams of the per-chunk step() loop — for
    the admitting request AND the already-decoding slots, including an
    admission whose first token retires it immediately (max_new=1)."""
    params, embeds_for = _setup()
    eos = 96
    rng = np.random.RandomState(13)
    short = list(rng.randint(1, 90, 5))
    long_a = list(rng.randint(1, 90, 37))
    long_b = list(rng.randint(1, 90, 20))

    def run(drain):
        eng = ContinuousEngine(params, CFG, max_slots=3, max_len=64,
                               prefill_buckets=(8, 16), eos_token_id=eos,
                               chunk_size=8)
        rid_s = eng.submit(embeds_for(short),
                           jnp.ones((1, 5), jnp.int32), 12)
        rid_a = eng.submit(embeds_for(long_a),
                           jnp.ones((1, 37), jnp.int32), 8)
        rid_b = eng.submit(embeds_for(long_b),
                           jnp.ones((1, 20), jnp.int32), 1)
        if drain:
            n = eng.drain_admissions()
            assert n == 5 + 3      # ceil(37/8) + ceil(20/8)
        else:
            while eng._admissions:
                eng.step()
        res = eng.run_until_drained()
        return [res[r] for r in (rid_s, rid_a, rid_b)]

    want = run(False)
    got = run(True)
    assert got == want, (got, want)
    # max_new=1 request must have exactly its first token
    assert len(got[2]) == 1
