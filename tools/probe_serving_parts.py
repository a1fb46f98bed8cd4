"""Decompose the continuous-serving lane's wall time on chip.

The r5 lane reads 6.0s for 24x128-prompt requests (1032 tokens) vs the
static convoy's 4.18s. This probe attributes the gap:

  1. batched prefill burst (8 rows, one program)       -> admission cost
  2. step_block(16) at FULL 8-slot occupancy           -> engine per-step
  3. raw b8 `llama_generate` 64 new tokens             -> comparator per-step
  4. block count the scheduler actually dispatches     -> occupancy waste

If (2)/16 is much worse than (3)/64-per-step, the engine's decode path
is the problem (e.g. the slot row step missing the pallas decode
kernel). If they match, the gap is block-granularity idle steps and the
fix is budget-aware block sizing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_serving_parts.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import (_llama_13b_cfg, chip_health_tflops,  # noqa: E402
                   init_llama_quant_full)
from emu_tpu.generation.continuous import ContinuousEngine  # noqa: E402
from emu_tpu.models import llama  # noqa: E402


def main():
    print(f"chip: {chip_health_tflops():.0f} TFLOP/s", flush=True)
    cfg = _llama_13b_cfg(40)
    params = init_llama_quant_full(cfg, "int8")
    prompt, new_max, slots, block = 128, 64, 8, 16
    ids = jnp.full((1, prompt), 7, jnp.int32)
    embeds = llama.embed(params, ids)
    mask = jnp.ones((1, prompt), jnp.int32)

    eng = ContinuousEngine(params, cfg, max_slots=slots,
                           max_len=prompt + new_max,
                           prefill_buckets=(prompt,),
                           eos_token_id=None, kv_cache_quant=True)

    def admit_burst(n):
        t0 = time.perf_counter()
        rids = eng.submit_many([(embeds, mask, new_max)] * n)
        # force completion: fetch one deferred first
        _ = int(eng.requests[rids[0]].tokens[0])
        return time.perf_counter() - t0

    # warm compiles
    admit_burst(slots)
    blk = eng.step_block(block)
    eng.record_block(blk)

    # 2) full-occupancy block timing (all 8 rows active, min-of-3)
    best_blk = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        blk = eng.step_block(block)
        eng.record_block(blk)           # includes the host fetch
        best_blk = min(best_blk, time.perf_counter() - t0)
    print(f"step_block({block}) full occupancy: {best_blk*1e3:.1f} ms "
          f"({best_blk/block*1e3:.2f} ms/step, "
          f"{slots*block/best_blk:.0f} tok/s)", flush=True)

    # drain, then measure a fresh admission burst (prefill program warm)
    eng.run_until_drained()
    t_admit = 1e9
    for _ in range(2):
        t_admit = min(t_admit, admit_burst(slots))
        eng.run_until_drained()
    print(f"batched prefill burst ({slots} rows x {prompt}): "
          f"{t_admit*1e3:.0f} ms", flush=True)
    eng.close()

    # -- commit-scatter microbench: the per-row KV commit is the only
    # structural difference vs the uniform-slot generate path. 500
    # chained writes per fetch (launch overhead floor ~20us/op).
    L, B, H, S, D = 40, slots, 40, prompt + new_max, 128
    plane = jnp.zeros((L, B, H, S, D), jnp.int8)
    rows8 = jnp.ones((B, L, H, D), jnp.int8)
    bidx = jnp.arange(B)
    slots_v = jnp.asarray([17, 33, 49, 65, 81, 97, 113, 129], jnp.int32)

    def timed(name, fn):
        g = jax.jit(lambda p: jax.lax.fori_loop(
            0, 500, lambda i, a: fn(a, i), p))
        g(plane)                     # compile
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(jnp.sum(g(plane)[0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        print(f"  {name}: {best/500*1e6:.0f} us/write", flush=True)

    timed("scatter .at[:, b, :, s].set (current)",
          lambda p, i: p.at[:, bidx, :, slots_v + (i % 8)].set(rows8))

    def dus_loop(p, i):
        def body(b, acc):
            row = jax.lax.dynamic_slice_in_dim(rows8, b, 1, 0)  # [1,L,H,D]
            upd = jnp.moveaxis(row, 0, 1)[:, :, :, None]  # [L,1,H,1,D]
            return jax.lax.dynamic_update_slice(
                acc, upd, (0, b, 0, slots_v[b] + (i % 8), 0))
        return jax.lax.fori_loop(0, B, body, p)

    timed("per-row DUS fori_loop", dus_loop)

    def onehot_blend(p, i):
        hot = jax.nn.one_hot(slots_v + (i % 8), S, dtype=jnp.int8)  # [B,S]
        upd = rows8.transpose(1, 0, 2, 3)[:, :, :, None, :]  # [L,B,H,1,D]
        sel = hot[None, :, None, :, None]
        return p * (1 - sel) + upd * sel

    timed("one-hot full-plane blend", onehot_blend)

    # 3) raw generate comparator (the static convoy's unit)
    from emu_tpu.generation import GenerationConfig, llama_generate
    gcfg = GenerationConfig(max_new_tokens=new_max, min_length=new_max,
                            eos_token_id=-1, pad_token_id=32000,
                            kv_cache_quant=True)
    bids = jnp.full((slots, prompt), 7, jnp.int32)
    bembeds = llama.embed(params, bids)
    bmask = jnp.ones_like(bids)

    def gen():
        return llama_generate(params, cfg, bembeds, bmask, gcfg)

    jax.block_until_ready(gen())
    best_gen = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen()
        _ = int(out[0, 0])
        best_gen = min(best_gen, time.perf_counter() - t0)
    print(f"raw b8 generate {new_max} tok (incl. prefill): "
          f"{best_gen*1e3:.0f} ms ({best_gen/new_max*1e3:.2f} ms/step "
          f"upper bound, {slots*new_max/best_gen:.0f} tok/s)", flush=True)

    # 4) scheduler block count for the lane's request mix
    budgets = [new_max * f // 8 for f in (2, 3, 4, 5, 6, 7, 8, 8)] * 3
    eng = ContinuousEngine(params, cfg, max_slots=slots,
                           max_len=prompt + new_max,
                           prefill_buckets=(prompt,),
                           eos_token_id=None, kv_cache_quant=True)
    queue = list(budgets)
    pending = None
    n_blocks = 0
    t0 = time.perf_counter()
    while queue or any(r is not None for r in eng.slot_req) \
            or pending is not None:
        if queue and eng.free_slots():
            n = min(eng.free_slots(), len(queue))
            eng.submit_many([(embeds, mask, queue.pop(0))
                             for _ in range(n)])
        if any(r is not None for r in eng.slot_req):
            blk = eng.step_block(block)
            n_blocks += 1
            if pending is not None:
                eng.record_block(pending)
            pending = blk
        elif pending is not None:
            eng.record_block(pending)
            pending = None
    wall = time.perf_counter() - t0
    got = sum(len(v) for v in eng.finished().values())
    ideal = -(-sum(budgets) // (slots * block))
    print(f"lane mix: {n_blocks} blocks dispatched (ideal {ideal}), "
          f"{got} tokens, wall {wall:.2f}s -> occupancy "
          f"{got/(n_blocks*slots*block)*100:.0f}%", flush=True)
    eng.close()


if __name__ == "__main__":
    main()
