"""VERDICT r2 weak-7: re-check the fused-projection prefill cost at
Emu2-33B width (6656/17920/52 heads) — the 13B measurement was -2.5%
(split copies); the split-copy cost scales with width so the question
is whether generate paths should stay fused at 33B too.

Run on chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/probe_prefill_fused_33b.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench

B, S, L = 4, 2048, 4


def step_time(fused: bool, k=5):
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama
    cfg = LlamaConfig(hidden_size=6656, intermediate_size=17920,
                      num_hidden_layers=L, num_attention_heads=52,
                      vocab_size=32000, extended_vocab_size=32272,
                      max_position_embeddings=S)
    params = llama.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if fused:
        params = llama.fuse_projections(params)
    ids = jnp.full((B, S), 7, jnp.int32)
    mask = jnp.ones_like(ids)
    embeds = llama.embed(params, ids)

    @jax.jit
    def loop(p, e):
        def body(i, acc):
            h = llama.forward_hidden(p, cfg, e + (acc * 1e-8).astype(e.dtype),
                                     mask)
            return acc + jnp.sum(h[0, 0, :4].astype(jnp.float32))
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    return bench._time_call(loop, params, embeds) / k


if __name__ == "__main__":
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
    t_plain = step_time(False)
    print(f"prefill 33B-width L{L} unfused: {t_plain * 1e3:.1f} ms",
          flush=True)
    t_fused = step_time(True)
    print(f"prefill 33B-width L{L} fused  : {t_fused * 1e3:.1f} ms "
          f"({(t_fused / t_plain - 1) * 100:+.1f}%)", flush=True)
