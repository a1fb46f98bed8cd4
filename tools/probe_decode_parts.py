"""Decode-step launch-cost attribution probe (r4).

The tunneled backend charges ~20 us of dispatch latency per executed op
(CLAUDE.md), so decode throughput is first-order set by the number of op
launches per step. This probe attributes that cost: it times a b8 int8
generate at reduced depth under surgical monkeypatches (identity rope,
identity norms) — numerically WRONG programs, timing-only — and prints
the compiled per-step op count of a single decode_step program so the
per-layer launch budget is visible.

Usage (chip must be otherwise idle — single host core):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_decode_parts.py

Interpreting: (baseline - variant) / layers = per-layer cost of the
patched piece INCLUDING its launch overhead. The HLO count section lists
post-fusion ops in one decode step body; each non-fused op is one ~20 us
launch on this backend.
"""

from __future__ import annotations

import collections
import re
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _llama_13b_cfg, _time_call, init_llama_quant_full  # noqa: E402


LAYERS = 8
BATCH = 8
PROMPT = 128
NEW = 64


def _decode_time(params, cfg, kv_quant=False):
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.models import llama

    ids = jnp.full((BATCH, PROMPT), 7, jnp.int32)
    mask = jnp.ones_like(ids)
    embeds = llama.embed(params, ids)
    gcfg = GenerationConfig(max_new_tokens=NEW, min_length=NEW,
                            eos_token_id=-1, pad_token_id=32000,
                            kv_cache_quant=kv_quant)
    return _time_call(lambda: llama_generate(params, cfg, embeds, mask,
                                             gcfg))


def hlo_op_count(params, cfg):
    """Compile ONE decode_step and bucket the post-optimization HLO ops.

    Everything in the step program launches once per decode token, so
    this is the per-step launch budget (modulo backend thunk merging)."""
    from emu_tpu.models import llama

    cache = llama.init_cache(cfg, BATCH, PROMPT + NEW, dtype=jnp.bfloat16)
    emb = jnp.zeros((BATCH, 1, cfg.hidden_size), jnp.bfloat16)
    slot = jnp.int32(PROMPT)
    slot_mask = jnp.zeros((BATCH, PROMPT + NEW), bool).at[:, :PROMPT].set(True)
    pos = jnp.full((BATCH,), PROMPT, jnp.int32)

    def step(p, c, e):
        return llama.decode_step(p, cfg, c, e, slot, slot_mask, pos)

    try:
        txt = jax.jit(step).lower(params, cache, emb).compile().as_text()
    except Exception as e:  # noqa: BLE001
        print(f"  compile/as_text failed ({e}); skipping HLO count")
        return
    # Two-pass: (1) find the computations that are FUSION BODIES (the
    # `calls=%name` operand of fusion ops — their ops execute inside the
    # fusion's single launch), (2) count ops in every OTHER computation,
    # per computation. The layer scan compiles to a while loop whose body
    # computation holds the per-layer launches — the first version of
    # this probe skipped every `region_*` computation and so skipped the
    # scan body entirely (VERDICT-grade bug: reported 18 ops total).
    fusion_bodies = set()
    for m in re.finditer(r"fusion\([^)]*\)[^\n]*calls=%?([\w.\-]+)", txt):
        fusion_bodies.add(m.group(1))
    per_comp = collections.defaultdict(collections.Counter)
    comp = None
    for line in txt.splitlines():
        hdr = re.match(r"^(ENTRY )?%?([\w.\-]+) \(.*\) -> ", line)
        if hdr:
            comp = hdr.group(2)
            continue
        m = re.match(r"^\s+(%?[\w.\-]+) = \S+ ([\w\-]+)\(", line)
        if not m or comp is None or comp in fusion_bodies:
            continue
        op = m.group(2)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        per_comp[comp][op] += 1
    if not per_comp:
        print("  no computations parsed from compiled HLO (format change?)")
        return
    # the while body is the biggest non-fusion computation (the layer scan)
    body_name = max(per_comp, key=lambda c: sum(per_comp[c].values()))
    body = per_comp[body_name]
    launches = sum(n for op, n in body.items()
                   if op not in ("while", "copy-start", "copy-done"))
    print(f"  scan-body computation: {body_name} — "
          f"{sum(body.values())} ops, ~{launches} launch-class "
          f"(runs once per LAYER per step)")
    for op, n in body.most_common(20):
        print(f"    {op:30s} {n}")
    rest = collections.Counter()
    for c, cnt in per_comp.items():
        if c != body_name:
            rest.update(cnt)
    print(f"  all other non-fusion computations: {sum(rest.values())} ops "
          f"(fixed per step)")
    for op, n in rest.most_common(12):
        print(f"    {op:30s} {n}")


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    cfg = _llama_13b_cfg(LAYERS)
    params = init_llama_quant_full(cfg, "int8")

    print("== HLO op count (one decode_step, bf16 KV) ==")
    hlo_op_count(params, cfg)
    if "hlo" in sys.argv[1:]:
        return

    results = {}

    def run(name):
        # _llama_generate_jit is a module-level @jax.jit and every variant
        # uses identical arg shapes/statics, so without a cache clear the
        # patched variants re-time the UNPATCHED baseline executable
        # (ADVICE r4, high). Clearing forces a retrace that picks up the
        # monkeypatched rope/norm module attributes.
        jax.clear_caches()
        dt = _decode_time(params, cfg)
        results[name] = dt
        tput = BATCH * NEW / dt
        print(f"  {name:24s} {dt * 1e3:8.1f} ms  {tput:7.1f} tok/s", flush=True)

    print(f"== generate timing, int8 {LAYERS}L b{BATCH} (min-of-3) ==")
    run("baseline")

    import emu_tpu.ops.rope as rope_mod
    orig_rope = rope_mod.apply_rope_rows
    rope_mod.apply_rope_rows = lambda q, k, c, s: (q, k)
    try:
        run("rope=identity")
    finally:
        rope_mod.apply_rope_rows = orig_rope

    import emu_tpu.ops.fused_norm as fn
    orig_rnf, orig_arn = fn.rms_norm_fused, fn.add_rmsnorm
    fn.rms_norm_fused = lambda w, x, eps=1e-6, interpret=False: x
    fn.add_rmsnorm = lambda w, x, r, eps=1e-6, interpret=False: (x + r,
                                                                 x + r)
    try:
        run("norms=identity")
    finally:
        fn.rms_norm_fused, fn.add_rmsnorm = orig_rnf, orig_arn

    # re-time the baseline AFTER the variants: on a shared chip the
    # attribution is only meaningful if the chip didn't drift across the
    # run — report against the better (min) of the two baseline samples
    run("baseline-recheck")
    base = min(results["baseline"], results["baseline-recheck"])
    drift = abs(results["baseline"] - results["baseline-recheck"]) / base
    print(f"  baseline drift across run: {drift * 100:.1f}%"
          + (" (HIGH — attribution unreliable this run)"
             if drift > 0.05 else ""))
    steps = NEW
    for name, dt in results.items():
        if name.startswith("baseline"):
            continue
        d_layer = (base - dt) / steps / LAYERS * 1e6
        print(f"  {name}: {d_layer:+.1f} us/layer/step attributed")


if __name__ == "__main__":
    main()
