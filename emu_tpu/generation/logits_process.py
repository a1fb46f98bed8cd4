"""Logits processors, vectorized over [N, V] score tensors.

Behavioral spec: HF transformers' LogitsProcessor zoo as invoked by the
reference's generate calls (Emu1/models/modeling_emu.py:162-179,
Emu2/emu/emu.py:213-229): temperature, top-k, top-p, repetition penalty,
min-length EOS masking, no-repeat-ngram and prefix-constrained (trie)
filtering. All are pure [N, V] → [N, V] functions usable under jit; the
"generated so far" context arrives as a fixed-size [N, T] buffer + length.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def temperature(scores: jax.Array, t: float) -> jax.Array:
    return scores / jnp.float32(t)


def repetition_penalty(scores: jax.Array, seqs: jax.Array,
                       seq_valid: jax.Array, penalty: float) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor over previously generated tokens.

    seqs: [N, T] token buffer; seq_valid: [N, T] bool validity mask.
    score<0 → score*penalty else score/penalty, for present tokens.
    """
    n, v = scores.shape
    presence = jnp.zeros((n, v), bool)
    rows = jnp.arange(n)[:, None]
    presence = presence.at[rows, seqs].max(seq_valid)
    penalized = jnp.where(scores < 0, scores * penalty, scores / penalty)
    return jnp.where(presence, penalized, scores)


def min_length_eos_mask(scores: jax.Array, cur_len: jax.Array,
                        min_length: int, eos_token_id: int) -> jax.Array:
    """Block EOS while fewer than min_length tokens were generated.

    A negative eos_token_id means "no EOS" (open-ended decoding) — no
    masking, rather than silently banning the last vocab token."""
    if eos_token_id < 0:
        return scores
    blocked = scores.at[:, eos_token_id].set(NEG_INF)
    return jnp.where(cur_len < min_length, blocked, scores)


def top_k_filter(scores: jax.Array, k: int) -> jax.Array:
    """Keep top-k logits, others → -inf. k is static."""
    if k <= 0:
        return scores
    kth = jax.lax.top_k(scores, k)[0][:, -1:]
    return jnp.where(scores < kth, NEG_INF, scores)


def top_p_filter(scores: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering, HF semantics: keep the smallest set of tokens with
    cumulative probability > p (the first token crossing p is kept)."""
    sorted_scores = jnp.sort(scores, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_scores, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # number of tokens kept = first index where cum > p, inclusive
    keep_sorted = cum - probs < p          # True for kept ranks
    kth_idx = jnp.maximum(jnp.sum(keep_sorted, axis=-1) - 1, 0)
    cutoff = jnp.take_along_axis(sorted_scores, kth_idx[:, None], axis=-1)
    return jnp.where(scores < cutoff, NEG_INF, scores)


def no_repeat_ngram(scores: jax.Array, seqs: jax.Array, cur_len: jax.Array,
                    ngram_size: int) -> jax.Array:
    """Ban tokens that would complete an already-seen n-gram.

    seqs: [N, T] generated buffer (entries ≥ cur_len are ignored).
    Static ngram_size; vectorized window comparison (no python loops over
    data-dependent bounds).
    """
    n, t = seqs.shape
    if ngram_size <= 0 or t < ngram_size:
        return scores
    m = ngram_size - 1
    # current suffix of length m (positions cur_len-m .. cur_len-1)
    suffix_idx = cur_len - m + jnp.arange(m)            # [m]
    suffix = seqs[jnp.arange(n)[:, None], jnp.clip(suffix_idx, 0, t - 1)[None, :]]
    # all windows of length m starting at w (completed token at w+m)
    starts = jnp.arange(t - m)
    windows = seqs[:, starts[:, None] + jnp.arange(m)[None, :]]  # [N, W, m]
    match = jnp.all(windows == suffix[:, None, :], axis=-1)      # [N, W]
    window_ok = (starts + m <= cur_len - 1)[None, :]             # completed
    match = match & window_ok & (cur_len >= ngram_size)[..., None]
    banned = seqs[:, starts + m]                                  # [N, W]
    ban_onehot = jax.nn.one_hot(banned, scores.shape[-1],
                                dtype=bool) & match[..., None]
    return jnp.where(ban_onehot.any(axis=1), NEG_INF, scores)


def allowed_tokens_mask(scores: jax.Array, allowed: jax.Array) -> jax.Array:
    """Constrain to an allowed-token boolean mask [N, V] (trie decoding)."""
    return jnp.where(allowed, scores, NEG_INF)
