"""Autoregressive generation engine: greedy / sampling / beam search.

This is the framework's replacement for HF `model.generate(...)` as driven
by the reference (Emu1/models/modeling_emu.py:162-179, Emu2/emu/emu.py:
213-229): decoder-only generation from `inputs_embeds` (the multimodal
prompt), left-padded batches, beam search with HF's BeamSearchScorer
semantics (length penalty, per-rank EOS handling, early_stopping=False
done-rule), sampling warpers (temperature/top-k/top-p), repetition penalty,
min-length EOS masking and no-repeat-ngram.

TPU design: the whole decode loop is a single `lax.while_loop` under jit —
static shapes everywhere (fixed max_new_tokens buffer, fixed beam count),
KV cache threaded and donated, beam reordering as gathers. HF's dynamic
Python loop + growing tensors would recompile or re-allocate per step on
XLA; this formulation compiles once and streams on-device.

Conventions (matching HF's `inputs_embeds`-only mode):
- generation starts *after* the prompt; returned ids contain only new
  tokens; repetition/no-repeat-ngram contexts cover generated tokens only;
- `cur_len` for min-length / length-penalty counts generated tokens;
- finished hypotheses store the sequence *without* the terminating EOS and
  are length-normalized by `len ** length_penalty` (BeamHypotheses.add);
  the done-rule compares against `best_sum / (t+1) ** length_penalty`.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from emu_tpu.generation import logits_process as lp


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 50
    min_length: int = 1                 # min generated tokens before EOS
    num_beams: int = 1
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0                      # 0 = off
    top_p: float = 1.0                  # 1.0 = off
    repetition_penalty: float = 1.0
    length_penalty: float = 0.0
    no_repeat_ngram_size: int = 0
    num_return_sequences: int = 1
    penalty_alpha: float = 0.0          # >0 + top_k>1 → contrastive search
    eos_token_id: int = 2
    pad_token_id: int = 32000
    kv_cache_quant: bool = False        # int8 KV cache (2x context/chip)


# step_fn(cache, tokens [N], slot, slot_mask [N, max_len], positions [N])
#   -> (logits [N, V], cache)
StepFn = Callable[..., Tuple[jax.Array, dict]]


def _apply_common_processors(scores, seqs, t, gcfg: GenerationConfig):
    valid = jnp.arange(seqs.shape[1])[None, :] < t
    if gcfg.repetition_penalty != 1.0:
        scores = lp.repetition_penalty(scores, seqs, valid,
                                       gcfg.repetition_penalty)
    if gcfg.no_repeat_ngram_size > 0:
        scores = lp.no_repeat_ngram(scores, seqs, t,
                                    gcfg.no_repeat_ngram_size)
    scores = lp.min_length_eos_mask(scores, t, gcfg.min_length,
                                    gcfg.eos_token_id)
    return scores


# ---------------------------------------------------------------------------
# Greedy / sampling
# ---------------------------------------------------------------------------


def _greedy_or_sample(step_fn: StepFn, last_logits, cache, slot_mask,
                      positions, prompt_len: int, gcfg: GenerationConfig,
                      rng: Optional[jax.Array], trie: Optional[dict] = None):
    b = last_logits.shape[0]
    t_max = gcfg.max_new_tokens
    seqs0 = jnp.full((b, t_max), gcfg.pad_token_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    state0 = jnp.zeros((b,), jnp.int32)            # trie state
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def cond(state):
        t, _, _, _, _, finished, _, _, _ = state
        return jnp.logical_and(t < t_max, ~jnp.all(finished))

    def body(state):
        (t, cache, slot_mask, positions, seqs, finished, logits, rng,
         tstate) = state
        scores = logits.astype(jnp.float32)
        scores = _apply_common_processors(scores, seqs, t, gcfg)
        if trie is not None:
            # prefix-constrained decoding (HF prefix_allowed_tokens_fn /
            # the reference's VizWiz Trie, mm_eval/models/emu.py:97-109)
            scores = lp.allowed_tokens_mask(scores, trie["allowed"][tstate])
        if gcfg.do_sample:
            if gcfg.temperature != 1.0:
                scores = lp.temperature(scores, gcfg.temperature)
            if gcfg.top_k > 0:
                scores = lp.top_k_filter(scores, gcfg.top_k)
            if gcfg.top_p < 1.0:
                scores = lp.top_p_filter(scores, gcfg.top_p)
            rng, sub = jax.random.split(rng)
            token = jax.random.categorical(sub, scores, axis=-1)
        else:
            token = jnp.argmax(scores, axis=-1)
        token = jnp.where(finished, gcfg.pad_token_id, token).astype(jnp.int32)
        seqs = seqs.at[:, t].set(token)
        finished = jnp.logical_or(finished,
                                  token == gcfg.eos_token_id)
        if trie is not None:
            tstate = trie["next"][tstate, token]
        slot = prompt_len + t
        # new slot always attended (HF extends attention_mask with ones,
        # even for pad continuations of finished rows)
        slot_mask = slot_mask.at[:, slot].set(True)
        # skip the model call when its logits could never be consumed
        # (final step / all rows finished) — saves one full forward
        logits, cache = jax.lax.cond(
            jnp.logical_and(t + 1 < t_max, ~jnp.all(finished)),
            lambda c: step_fn(c, token, slot, slot_mask, positions),
            lambda c: (logits, c),
            cache)
        return (t + 1, cache, slot_mask, positions + 1, seqs, finished,
                logits, rng, tstate)

    state = (jnp.int32(0), cache, slot_mask, positions, seqs0, finished0,
             last_logits, rng, state0)
    state = jax.lax.while_loop(cond, body, state)
    return state[4]  # seqs


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _beam_search(step_fn: StepFn, last_logits, cache, slot_mask, positions,
                 prompt_len: int, gcfg: GenerationConfig,
                 rng: Optional[jax.Array] = None):
    """Vectorized beam search matching HF transformers' `_beam_search`
    (generation/utils.py, v4.5x vectorized implementation):

    - 2K candidate continuations per batch; only the top-K ranks may finish;
    - a candidate finishes when it emits EOS or reaches max length;
    - finished hypotheses *include* the terminal token and are normalized by
      `(generated_len) ** length_penalty` (length includes that token);
    - non-finished candidates are suppressed with an additive -1e9 (not a
      hard mask), exactly as HF does;
    - early_stopping=False heuristic: a batch stops improving when all K
      finished slots are filled and `best_running / cur_len**lp` can no
      longer beat the worst finished score;
    - do_sample=True uses sampling-without-replacement over accumulated
      scores (Gumbel top-k; HF uses torch.multinomial — same distribution,
      different RNG stream).

    last_logits: [B, V] prompt-final logits; cache at batch B (expanded to
    B*K internally).
    """
    b, v = last_logits.shape
    k = gcfg.num_beams
    t_max = gcfg.max_new_tokens
    lp_pow = jnp.float32(gcfg.length_penalty)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def expand(x, axis):
        return jnp.repeat(x, k, axis=axis)

    cache = jax.tree_util.tree_map(lambda c: expand(c, 1), cache)
    slot_mask = expand(slot_mask, 0)
    positions = expand(positions, 0)
    logits0 = expand(last_logits, 0)                  # [B*K, V]

    run_scores0 = jnp.tile(
        jnp.array([0.0] + [-1e9] * (k - 1), jnp.float32), (b, 1))
    run_seqs0 = jnp.full((b, k, t_max), gcfg.pad_token_id, jnp.int32)
    fin_seqs0 = jnp.full((b, k, t_max), gcfg.pad_token_id, jnp.int32)
    fin_scores0 = jnp.full((b, k), -1e9, jnp.float32)
    fin_mask0 = jnp.zeros((b, k), bool)
    unsat0 = jnp.ones((b,), bool)       # early-stop heuristic unsatisfied
    batch_offset = (jnp.arange(b) * k)[:, None]       # [B, 1]

    def cond(st):
        return (st["t"] < t_max) & jnp.any(st["unsat"]) & st["cont"]

    def body(st):
        t = st["t"]
        flat_seqs = st["run_seqs"].reshape(b * k, t_max)
        logprobs = jax.nn.log_softmax(st["logits"].astype(jnp.float32), -1)
        # HF applies the processor list on log-softmaxed scores in beam mode
        logprobs = _apply_common_processors(logprobs, flat_seqs, t, gcfg)
        cand = logprobs + st["run_scores"].reshape(b * k, 1)
        cand = cand.reshape(b, k * v)
        if gcfg.do_sample:
            # sampling without replacement == Gumbel top-k
            g = jax.random.gumbel(
                jax.random.fold_in(st["rng"], 0), cand.shape, jnp.float32)
            _, top_idx = jax.lax.top_k(cand + g, 2 * k)
            top_scores = jnp.take_along_axis(cand, top_idx, 1)
        else:
            top_scores, top_idx = jax.lax.top_k(cand, 2 * k)  # sorted desc
        top_tokens = (top_idx % v).astype(jnp.int32)
        top_beams = (top_idx // v).astype(jnp.int32)

        # candidate sequences including the new token
        gather_rows = (batch_offset + top_beams).reshape(-1)   # [B*2K]
        cand_seqs = flat_seqs[gather_rows].reshape(b, 2 * k, t_max)
        cand_seqs = cand_seqs.at[:, :, t].set(top_tokens)

        # a continuation "hits stopping criteria" on EOS or max length
        hits = (top_tokens == gcfg.eos_token_id) | (t + 1 >= t_max)
        rank = jnp.arange(2 * k)[None, :]

        # --- finished set update (HF _update_finished_beams) -------------
        gen_len = (t + 1).astype(jnp.float32)
        norm = top_scores / gen_len ** lp_pow
        qual = hits & (rank < k)
        fin_cand_scores = (norm
                           + jnp.where(qual, 0.0, -1e9)
                           + jnp.where(st["unsat"][:, None], 0.0, -1e9))
        all_scores = jnp.concatenate([st["fin_scores"], fin_cand_scores], 1)
        all_seqs = jnp.concatenate([st["fin_seqs"], cand_seqs], 1)
        all_mask = jnp.concatenate(
            [st["fin_mask"], qual & st["unsat"][:, None]], 1)
        keep_scores, keep_idx = jax.lax.top_k(all_scores, k)
        fin_seqs = jnp.take_along_axis(all_seqs, keep_idx[:, :, None], 1)
        fin_mask = jnp.take_along_axis(all_mask, keep_idx, 1)

        # --- running beams (HF _get_running_beams_for_next_iteration) ----
        run_cand = top_scores + hits.astype(jnp.float32) * -1e9
        new_run_scores, sel = jax.lax.top_k(run_cand, k)
        sel_tokens = jnp.take_along_axis(top_tokens, sel, 1)     # [B, K]
        sel_beams = jnp.take_along_axis(top_beams, sel, 1)
        run_seqs = jnp.take_along_axis(cand_seqs, sel[:, :, None], 1)

        # --- early-stop heuristic at cur_len = t+1 ------------------------
        best_possible = new_run_scores[:, 0] / gen_len ** lp_pow
        worst = jnp.where(fin_mask, jnp.min(keep_scores, axis=1,
                                            keepdims=True), -1e9)
        unsat = st["unsat"] & jnp.any(best_possible[:, None] > worst, axis=1)
        cont = ~jnp.all(hits)

        # --- reorder cache / step -----------------------------------------
        sel_rows = (batch_offset + sel_beams).reshape(-1)        # [B*K]
        cache = jax.tree_util.tree_map(lambda c: c[:, sel_rows], st["cache"])
        pos = st["positions"][sel_rows]
        slot = prompt_len + t
        sm = st["slot_mask"][sel_rows].at[:, slot].set(True)
        # skip the final model call whose logits the loop can never use
        logits, cache = jax.lax.cond(
            (t + 1 < t_max) & jnp.any(unsat) & cont,
            lambda c: step_fn(c, sel_tokens.reshape(-1), slot, sm, pos),
            lambda c: (st["logits"], c),
            cache)
        return {"t": t + 1, "cache": cache, "slot_mask": sm,
                "positions": pos + 1, "run_seqs": run_seqs,
                "run_scores": new_run_scores, "fin_seqs": fin_seqs,
                "fin_scores": keep_scores, "fin_mask": fin_mask,
                "unsat": unsat, "cont": cont, "logits": logits,
                "rng": jax.random.fold_in(st["rng"], 1)}

    st = {"t": jnp.int32(0), "cache": cache, "slot_mask": slot_mask,
          "positions": positions, "run_seqs": run_seqs0,
          "run_scores": run_scores0, "fin_seqs": fin_seqs0,
          "fin_scores": fin_scores0, "fin_mask": fin_mask0, "unsat": unsat0,
          "cont": jnp.bool_(True), "logits": logits0, "rng": rng}
    st = jax.lax.while_loop(cond, body, st)

    # fin_scores are already sorted desc by the top_k merge
    r = gcfg.num_return_sequences
    return st["fin_seqs"][:, :r], st["fin_scores"][:, :r]


# ---------------------------------------------------------------------------
# Contrastive search (model-aware: needs per-token hidden states)
# ---------------------------------------------------------------------------


def _contrastive_search(params, cfg, inputs_embeds, attention_mask,
                        gcfg: GenerationConfig):
    """HF contrastive search (penalty_alpha > 0, top_k > 1), exposed by the
    reference's generate signature (Emu1/modeling_emu.py:113, Emu2/emu.py:
    172): each step scores the top-k continuations by
    (1-α)·p(token) − α·max cosine-sim(candidate hidden, context hiddens)
    and keeps the least-degenerate one. Costs k model calls per step,
    batched as one [B*k] decode.
    """
    from emu_tpu.models import llama
    b, s, d = inputs_embeds.shape
    k = gcfg.top_k
    alpha = jnp.float32(gcfg.penalty_alpha)
    t_max = gcfg.max_new_tokens
    total = -(-(s + t_max) // 8) * 8         # see generate(): kernel-legal


    cache = llama.init_cache(cfg, b, total, dtype=inputs_embeds.dtype,
                             quant=gcfg.kv_cache_quant)
    hidden, cache = llama.prefill(params, cfg, inputs_embeds,
                                  attention_mask, cache)
    logits0 = llama.logits(params, hidden[:, -1])
    # context hidden history (pad slots masked out of the cosine max)
    hist = jnp.zeros((b, total, d), hidden.dtype)
    hist = jax.lax.dynamic_update_slice(hist, hidden, (0, 0, 0))
    hist_mask0 = jnp.zeros((b, total), bool).at[:, :s].set(
        attention_mask.astype(bool))

    slot_mask0 = jnp.zeros((b, total), bool).at[:, :s].set(
        attention_mask.astype(bool))
    positions0 = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
    seqs0 = jnp.full((b, t_max), gcfg.pad_token_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    rows = jnp.arange(b)

    def cond(st):
        return (st["t"] < t_max) & ~jnp.all(st["finished"])

    def body(st):
        t = st["t"]
        scores = st["logits"].astype(jnp.float32)
        scores = _apply_common_processors(scores, st["seqs"], t, gcfg)
        probs = jax.nn.softmax(scores, axis=-1)
        top_p, top_tok = jax.lax.top_k(probs, k)            # [B, k]

        # run all k candidates as one expanded batch against a shared cache
        slot = s + t
        cache_k = jax.tree_util.tree_map(
            lambda c: jnp.repeat(c, k, axis=1), st["cache"])
        sm = jnp.repeat(st["slot_mask"].at[:, slot].set(True), k, 0)
        pos = jnp.repeat(st["positions"], k, 0)
        emb = llama.embed(params, top_tok.reshape(-1))[:, None, :]
        h, cache_k = llama.decode_step(params, cfg, cache_k, emb,
                                       slot, sm, pos)
        h = h[:, 0].reshape(b, k, d)                        # candidates

        # degeneration penalty: max cosine sim vs context hiddens
        hn = h / jnp.linalg.norm(h.astype(jnp.float32), axis=-1,
                                 keepdims=True)
        ctxn = st["hist"].astype(jnp.float32)
        ctxn = ctxn / jnp.maximum(
            jnp.linalg.norm(ctxn, axis=-1, keepdims=True), 1e-9)
        cos = jnp.einsum("bkd,btd->bkt", hn.astype(jnp.float32), ctxn)
        cos = jnp.where(st["hist_mask"][:, None, :], cos, -1.0)
        penalty = jnp.max(cos, axis=-1)                     # [B, k]

        cs = (1.0 - alpha) * top_p - alpha * penalty
        sel = jnp.argmax(cs, axis=-1)                       # [B]
        token = top_tok[rows, sel]
        token = jnp.where(st["finished"], gcfg.pad_token_id,
                          token).astype(jnp.int32)
        seqs = st["seqs"].at[:, t].set(token)
        finished = st["finished"] | (token == gcfg.eos_token_id)

        # keep the selected candidate's cache rows + hidden
        flat_sel = rows * k + sel
        cache = jax.tree_util.tree_map(lambda c: c[:, flat_sel], cache_k)
        h_sel = h[rows, sel]
        hist = jax.lax.dynamic_update_slice(
            st["hist"], h_sel[:, None, :], (0, slot, 0))
        hist_mask = st["hist_mask"].at[:, slot].set(True)
        slot_mask = st["slot_mask"].at[:, slot].set(True)
        logits = llama.logits(params, h_sel)
        return {"t": t + 1, "cache": cache, "slot_mask": slot_mask,
                "positions": st["positions"] + 1, "seqs": seqs,
                "finished": finished, "logits": logits, "hist": hist,
                "hist_mask": hist_mask}

    st = {"t": jnp.int32(0), "cache": cache, "slot_mask": slot_mask0,
          "positions": positions0, "seqs": seqs0, "finished": finished0,
          "logits": logits0, "hist": hist, "hist_mask": hist_mask0}
    st = jax.lax.while_loop(cond, body, st)
    return st["seqs"]


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def generate(prefill_fn, step_fn, inputs_embeds, attention_mask,
             gcfg: GenerationConfig, rng: Optional[jax.Array] = None,
             trie: Optional[dict] = None):
    """Generic engine: runs prefill then the configured decode loop.

    prefill_fn(embeds, mask, total_len) -> (last_logits [B, V], cache,
    slot_mask [B, total_len] bool, positions [B]).
    trie: optional {"allowed": [n_states, V] bool, "next": [n_states, V]
    int32} for prefix-constrained (greedy/sampling) decoding.
    Returns generated ids [B, max_new] (greedy/sample) or
    [B, num_return_sequences, max_new] (+ scores) for beams.
    """
    b, s, _ = inputs_embeds.shape
    # cache capacity rounds up to a multiple of 8 (the Pallas decode
    # kernel's chunk sublane rule); the surplus slots stay masked
    # invalid forever
    total = -(-(s + gcfg.max_new_tokens) // 8) * 8
    assert gcfg.num_return_sequences <= max(gcfg.num_beams, 1), \
        "num_return_sequences must be <= num_beams (tile the batch to " \
        "draw multiple samples without beams)"
    last_logits, cache, slot_mask, positions = prefill_fn(
        inputs_embeds, attention_mask, total)
    if gcfg.num_beams <= 1:
        return _greedy_or_sample(step_fn, last_logits, cache, slot_mask,
                                 positions, s, gcfg, rng, trie)
    seqs, scores = _beam_search(step_fn, last_logits, cache, slot_mask,
                                positions, s, gcfg, rng)
    if gcfg.num_return_sequences == 1:
        return seqs[:, 0]
    return seqs.reshape(b * gcfg.num_return_sequences, gcfg.max_new_tokens)


def _llama_prefill_fn(params, cfg, cache_dtype, quant: bool = False):
    from emu_tpu.models import llama

    def prefill(embeds, mask, total_len):
        bsz = embeds.shape[0]
        cache = llama.init_cache(cfg, bsz, total_len, dtype=cache_dtype,
                                 quant=quant)
        hidden, cache = llama.prefill(params, cfg, embeds, mask, cache)
        last_logits = llama.logits(params, hidden[:, -1])
        s = embeds.shape[1]
        slot_mask = jnp.zeros((bsz, total_len), bool)
        slot_mask = slot_mask.at[:, :s].set(mask.astype(bool))
        positions = jnp.sum(mask.astype(jnp.int32), axis=-1)
        return last_logits, cache, slot_mask, positions

    return prefill


def _llama_step_fn(params, cfg):
    from emu_tpu.models import llama

    def step(cache, tokens, slot, slot_mask, positions):
        embeds = llama.embed(params, tokens[:, None])
        hidden, cache = llama.decode_step(params, cfg, cache, embeds, slot,
                                          slot_mask, positions)
        return llama.logits(params, hidden[:, 0]), cache

    return step


@functools.partial(jax.jit, static_argnums=(1, 4, 7))
def _llama_generate_jit(params, cfg, inputs_embeds, attention_mask, gcfg,
                        rng, trie, s4_mode="0"):
    if s4_mode != "0":
        # int4 planes → materialized native-s4 buffers, once per generate
        # program (quant.materialize_s4: XLA streams s4 24% faster than
        # the pallas W4A8 GEMV; costs a second in-program weight copy).
        # "1" converts every plane; "mlp" only gate_up/down (when the
        # full 2x residency doesn't fit next to the KV cache).
        from emu_tpu.ops.quant import materialize_s4_tree
        params = materialize_s4_tree(
            params, only="mlp/" if s4_mode == "mlp" else "")
    if gcfg.penalty_alpha > 0 and gcfg.top_k > 1 and gcfg.num_beams <= 1 \
            and not gcfg.do_sample:
        return _contrastive_search(params, cfg, inputs_embeds,
                                   attention_mask, gcfg)
    return generate(_llama_prefill_fn(params, cfg, inputs_embeds.dtype,
                                      quant=gcfg.kv_cache_quant),
                    _llama_step_fn(params, cfg),
                    inputs_embeds, attention_mask, gcfg, rng, trie)


def llama_generate(params, cfg, inputs_embeds, attention_mask,
                   gcfg: GenerationConfig, rng: Optional[jax.Array] = None,
                   trie: Optional[dict] = None):
    """HF-`generate`-equivalent over our LLaMA: one jitted program.

    inputs_embeds [B, S, D] (multimodal prompt, left-padded),
    attention_mask [B, S]. Returns new token ids only.
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # The s4 flag is read HERE (outside jit) and passed as a static
    # argument so flipping it after a trace exists keys a fresh program
    # instead of silently reusing the stale one (ADVICE r2).
    s4_mode = os.environ.get("EMU_TPU_DECODE_S4", "0")
    return _llama_generate_jit(params, cfg, inputs_embeds, attention_mask,
                               gcfg, rng, trie, s4_mode)
