"""LLaMA decoder (13B for Emu1, 33B for Emu2) with explicit KV-cache state.

Behavioral model: HF `LlamaForCausalLM` as wrapped by the reference
(Emu1/models/modeling_llama.py:127-257, Emu2/emu/lm.py:30-149) — RMSNorm
(eps 1e-6), rotary attention (theta 10000), SwiGLU MLP, no biases, untied
lm_head, token embeddings resized for the multimodal special tokens, and
(Emu1) the `stu_regress_head` Linear(hidden→hidden, bias=False) that
regresses visual embeddings (modeling_llama.py:169).

TPU design:
- layers stacked on a leading axis, executed via `lax.scan` (one compiled
  block for 40/60 layers);
- the KV cache is an explicit pytree `{k, v: [L, B, Hkv, max_len, Dh]}`
  (HEAD-MAJOR: each head's (S, D) plane contiguous, the layout the Pallas
  decode-attention kernel streams densely) threaded through `prefill` /
  `decode_step` and donated by the generation loop — the replacement for
  HF's dynamic `past_key_values` lists, with fully static shapes for XLA;
- left-padded batches: positions derive from the attention mask, matching
  HF generate's position_ids handling;
- tensor parallelism: attention heads and MLP hidden sharded over the
  "model" mesh axis (rule table at the bottom); GSPMD inserts the
  all-reduces after o_proj / down_proj.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from emu_tpu.config import LlamaConfig
from emu_tpu.ops import layers as L
from emu_tpu.ops import rope as R
from emu_tpu.ops.attention import dot_product_attention


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32,
         with_regress_head: bool = False) -> dict:
    d, v = cfg.hidden_size, cfg.extended_vocab_size
    keys = iter(jax.random.split(key, 8))

    def layer_init(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
            "self_attn": {
                "q_proj": L.dense_init(next(ks), d, d, use_bias=False,
                                       dtype=dtype),
                "k_proj": L.dense_init(next(ks), d,
                                       cfg.kv_heads * cfg.head_dim,
                                       use_bias=False, dtype=dtype),
                "v_proj": L.dense_init(next(ks), d,
                                       cfg.kv_heads * cfg.head_dim,
                                       use_bias=False, dtype=dtype),
                "o_proj": L.dense_init(next(ks), d, d, use_bias=False,
                                       dtype=dtype),
            },
            "mlp": {
                "gate": L.dense_init(next(ks), d, cfg.intermediate_size,
                                     use_bias=False, dtype=dtype),
                "up": L.dense_init(next(ks), d, cfg.intermediate_size,
                                   use_bias=False, dtype=dtype),
                "down": L.dense_init(next(ks), cfg.intermediate_size, d,
                                     use_bias=False, dtype=dtype),
            },
        }

    params = {
        "embed_tokens": L._trunc_normal(next(keys), (v, d), 0.02, dtype),
        "layers": jax.vmap(layer_init)(
            jax.random.split(next(keys), cfg.num_hidden_layers)),
        "norm": jnp.ones((d,), dtype),
        "lm_head": L.dense_init(next(keys), d, v, use_bias=False, dtype=dtype),
    }
    if with_regress_head:
        params["stu_regress_head"] = L.dense_init(next(keys), d, d,
                                                  use_bias=False, dtype=dtype)
    return params


def rope_tables(cfg: LlamaConfig, max_len: Optional[int] = None):
    cos, sin = R.llama_rope_tables(
        cfg.head_dim, max_len or cfg.max_position_embeddings, cfg.rope_theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def fuse_projections(params: dict) -> dict:
    """Load-time transform: q/k/v → one `qkv_proj` matmul and gate/up →
    one `gate_up`, per layer. Column-block concatenation is numerically
    exact; the win is op count — each decode step launches one projection
    kernel instead of three (launch overhead is a first-order decode cost,
    and quantized forms also share one activation-quantization pass).
    Works on plain, int8 ({kernel_q8, scale}), W8A8 and int4
    ({kernel_q4, scale4}) param dicts — every form concatenates on the
    output axis. The unfused layout stays supported (HF parity tests).
    """
    keysets = (("kernel",), ("kernel_q8", "scale"), ("kernel_w8a8", "scale"),
               ("kernel_q4", "scale4"))

    def cat(parts):
        for keys in keysets:
            if keys[0] in parts[0]:
                # bias (e.g. Qwen-style attention bias under GQA) also
                # concatenates on the output axis; any OTHER extra entry is
                # unknown and silently dropping it would corrupt outputs.
                if "bias" in parts[0]:
                    keys = keys + ("bias",)
                extra = set(parts[0]) - set(keys)
                if extra:
                    raise ValueError(
                        f"fuse_projections: unfusable extra entries {extra}")
                return {k: jnp.concatenate([p[k] for p in parts], axis=-1)
                        for k in keys}
        raise ValueError(f"unrecognized dense params: {list(parts[0])}")

    layers = dict(params["layers"])
    sa = dict(layers["self_attn"])
    sa["qkv_proj"] = cat([sa.pop("q_proj"), sa.pop("k_proj"),
                          sa.pop("v_proj")])
    mlp = dict(layers["mlp"])
    mlp["gate_up"] = cat([mlp.pop("gate"), mlp.pop("up")])
    layers["self_attn"] = sa
    layers["mlp"] = mlp
    return dict(params, layers=layers)


# ---------------------------------------------------------------------------
# Layer body
# ---------------------------------------------------------------------------


def _split_heads(x, n_heads, head_dim):
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, head_dim)


def _qkv(p, cfg: LlamaConfig, x, rope_rows):
    """Project x → roped (q, k_new, v_new). One matmul on the fused
    `qkv_proj` layout (see fuse_projections), three on the HF layout.
    rope_rows: pre-gathered (cos, sin) rows [B, S, 1, D] — the gather is
    hoisted out of the layer scan by the caller (R.gather_rope_rows)."""
    h, hd = cfg.num_attention_heads, cfg.head_dim
    hkv = cfg.kv_heads
    if "qkv_proj" in p:
        qkv = L.dense(p["qkv_proj"], x)
        q, k, v = jnp.split(qkv, [h * hd, (h + hkv) * hd], axis=-1)
    else:
        q = L.dense(p["q_proj"], x)
        k = L.dense(p["k_proj"], x)
        v = L.dense(p["v_proj"], x)
    q = _split_heads(q, h, hd)
    k = _split_heads(k, hkv, hd)
    v = _split_heads(v, hkv, hd)
    q, k = R.apply_rope_rows(q, k, *rope_rows)
    return q, k, v


def _attn(p, cfg: LlamaConfig, q, kv, kv_valid, causal, mask=None):
    """q: roped [B, S, H, Dh]; kv: either a (k, v) pair in [B, Skv, Hkv,
    Dh] (current-chunk projections, prefill/training) or a cache dict
    from _cache_kv (head-major [B, Hkv, S, D], optionally int8+scales);
    kv_valid: [B, Skv] padding/slot-validity mask; mask: optional dense
    [B, 1, S, Skv] (chunked verify: per-query causality in a cache)."""
    b, s, h, hd = q.shape
    if isinstance(kv, dict):
        from emu_tpu.ops.attention import cache_attention
        o = cache_attention(q, kv, kv_valid=kv_valid, causal=causal,
                            mask=mask, scale=hd ** -0.5)
    else:
        k_full, v_full = kv
        # GQA (kv_heads < h) stays grouped — dot_product_attention
        # contracts query-head groups against the narrow K/V directly, so
        # the cache read keeps its 1/rep size advantage
        o = dot_product_attention(q, k_full, v_full, kv_valid=kv_valid,
                                  causal=causal, mask=mask,
                                  scale=hd ** -0.5)
    return L.dense(p["o_proj"], o.reshape(b, s, h * hd))


def _layer(p, cfg, x, rope_rows, new_kv_fn, kv_valid, causal,
           mask=None):
    """One decoder layer; `new_kv_fn(k_new, v_new) -> (kv, updated_cache)`
    lets prefill/decode share this body — kv is a (k, v) pair (current
    chunk) or a _cache_kv dict (cache-resident decode). rope_rows:
    pre-gathered (cos, sin) rows, hoisted out of the layer scan."""
    from emu_tpu.ops.fused_norm import add_rmsnorm, rms_norm_fused
    h = rms_norm_fused(p["input_layernorm"], x, cfg.rms_norm_eps)
    q, k_new, v_new = _qkv(p["self_attn"], cfg, h, rope_rows)
    kv, cache_out = new_kv_fn(k_new, v_new)
    attn_out = _attn(p["self_attn"], cfg, q, kv, kv_valid, causal, mask)
    # named so the "dots+attn" remat policy can keep it resident: the
    # attention kernel is a pallas call, which dots_-policies can't save,
    # so plain "dots" remat re-runs the whole flash forward in backward
    from jax.ad_checkpoint import checkpoint_name
    attn_out = checkpoint_name(attn_out, "attn_out")
    from emu_tpu.ops.q4_matmul import fused_swiglu_q4, swiglu_q4_plan
    if swiglu_q4_plan(p["post_attention_layernorm"], p["mlp"], x):
        x = x + attn_out
        gu, dn = p["mlp"]["gate_up"], p["mlp"]["down"]
        x = fused_swiglu_q4(x, p["post_attention_layernorm"],
                            gu["kernel_q4"], gu["scale4"],
                            dn["kernel_q4"], dn["scale4"],
                            eps=cfg.rms_norm_eps)
    else:
        # residual add + post-attention norm in one fused kernel (the
        # training hot path); falls back to add + rms_norm off-TPU
        x, h = add_rmsnorm(p["post_attention_layernorm"], x, attn_out,
                           cfg.rms_norm_eps)
        x = x + L.llama_mlp(p["mlp"], h)
    return x, cache_out


# ---------------------------------------------------------------------------
# Full-sequence forward (no cache) — training loss / fidelity mode
# ---------------------------------------------------------------------------


def forward_hidden(params: dict, cfg: LlamaConfig, inputs_embeds: jax.Array,
                   attention_mask: jax.Array, remat: bool = False,
                   scan_unroll: int = 1) -> jax.Array:
    """Causal forward over the whole sequence → final-norm hidden states.

    Matches HF `LlamaModel(...).hidden_states[-1]` (post final norm), the
    tensor the visual-regression loops read (Emu1 modeling_emu.py:240-243,
    Emu2 emu.py:139-147). remat=True checkpoints each layer under grad
    (training memory/compute trade, ≙ gradient_checkpointing_enable);
    remat="dots" keeps non-batch matmul outputs resident instead of
    recomputing them (jax dots_with_no_batch_dims_saveable — measured
    +10% train step over full remat at the 13B shapes).
    """
    b, s, _ = inputs_embeds.shape
    positions = _positions_from_mask(attention_mask)
    rows = R.gather_rope_rows(*rope_tables(cfg, s), positions)

    def body(x, p):
        x, _ = _layer(p, cfg, x, rows,
                      lambda k, v: ((k, v), 0.0), attention_mask, True)
        return x, None

    if remat == "dots":
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat == "named":
        # save the BF16 dense outputs (named in ops/layers.dense) + the
        # flash-attention output: same recompute set as "dots" but the
        # stacked per-layer residuals are bf16, not the f32 dot results —
        # half the activation memory per layer. Measured speed-neutral at
        # the 13B train shapes (130.3 vs dots 130.6 ms/layer marginal):
        # a memory lever, not a throughput one.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "dense_out", "attn_out"))
    elif remat == "dots+attn":
        # dots + the named attention output (a pallas-call result the
        # dots policy can't see): backward skips the flash-fwd re-run at
        # the cost of one [B, S, H*D] resident per layer
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names("attn_out")))
    elif remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"],
                        unroll=max(1, scan_unroll))
    return L.rms_norm(params["norm"], x, cfg.rms_norm_eps)


def logits(params: dict, hidden: jax.Array) -> jax.Array:
    return L.dense(params["lm_head"], hidden)


def masked_ce_loss(params: dict, hidden: jax.Array, labels: jax.Array,
                   valid: jax.Array, chunk: int = 1024) -> jax.Array:
    """Masked CE over lm_head logits WITHOUT materializing [B, T, V].

    hidden [B, T, D] (already shifted by the caller), labels/valid
    [B, T]. Rows stream through the lm_head matmul in `chunk`-sized
    slabs under jax.checkpoint: the fp32 logits exist only one chunk at
    a time (131 MB at V=32k/chunk=1024 instead of 1.05 GB + its
    cotangent), the backward recomputes each chunk's logits, and the
    lm_head weight grad accumulates across the scan. Math is exactly
    the full-logits logsumexp CE (row chunking is exact).
    """
    b, t, d = hidden.shape
    hf = hidden.reshape(-1, d)
    tg = labels.reshape(-1)
    vl = valid.reshape(-1).astype(jnp.float32)
    n = b * t
    pad = (-n) % chunk
    if pad:
        hf = jnp.pad(hf, ((0, pad), (0, 0)))
        tg = jnp.pad(tg, (0, pad))
        vl = jnp.pad(vl, (0, pad))
    nchunks = hf.shape[0] // chunk

    @jax.checkpoint
    def chunk_ll(h, tgt, v):
        lg = L.dense(params["lm_head"], h).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(lg, axis=-1)
        picked = jnp.take_along_axis(lg, tgt[:, None], axis=-1)[..., 0]
        return jnp.sum((picked - lse) * v)

    def body(acc, xs):
        h, tgt, v = xs
        return acc + chunk_ll(h, tgt, v), None

    total, _ = jax.lax.scan(
        body, jnp.float32(0.0),
        (hf.reshape(nchunks, chunk, d), tg.reshape(nchunks, chunk),
         vl.reshape(nchunks, chunk)))
    return -total / jnp.maximum(jnp.sum(vl), 1.0)


def embed(params: dict, token_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][token_ids]


def _positions_from_mask(attention_mask: jax.Array) -> jax.Array:
    """HF-style position ids for (left-)padded batches: cumsum-1, clipped."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)


# ---------------------------------------------------------------------------
# KV-cached decode
# ---------------------------------------------------------------------------


def init_cache(cfg: LlamaConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, quant: bool = False) -> dict:
    """KV cache pytree, HEAD-MAJOR: [L, B, Hkv, S, D].

    Head-major puts each head's (S, D) plane contiguous in HBM, so the
    decode-attention kernel's per-head DMAs are dense tiles (the
    [.., S, H, D] layout forced lane-segment math that capped the kernel
    at ~260 GB/s — see ops/decode_attention.py).

    quant=True stores int8 values with per-(head, token) fp32 scales —
    2x the context per chip vs bf16 (the serving lever for Emu2-33B chat
    histories); the decode kernel consumes the int8 planes natively
    (scale folded into the score/PV epilogue, no dequantized copy).
    Prefill attention still uses the exact pre-quantization k/v of the
    current chunk."""
    shape = (cfg.num_hidden_layers, batch, cfg.kv_heads, max_len,
             cfg.head_dim)
    if quant:
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(shape[:-1], jnp.float32),
                "v_scale": jnp.zeros(shape[:-1], jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def kv_quantize(x: jax.Array):
    """[..., D] → (int8 values, f32 per-vector scale [...])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _cache_kv(c: dict, layer, dtype) -> dict:
    """Layer `layer`'s cache view for the attention dispatcher: the FULL
    stacked planes [L, B, Hkv, S, D] plus the (traced) layer index — the
    decode kernel slices the layer inside its index_map via scalar
    prefetch, so no per-layer [B, Hkv, S, D] copy is materialized (XLA
    cannot fuse a dynamic-slice into a pallas_call operand; the slices
    were 2×25 MB of copy traffic per layer per step at 13B/2k). Raw
    int8 + scales when quantized (consumed natively in-kernel), bf16
    otherwise. format "bhsd" = head-major."""
    kv = {"format": "bhsd", "k": c["k"], "v": c["v"], "layer": layer,
          "dtype": dtype}
    if "k_scale" in c:
        kv["k_scale"] = c["k_scale"]
        kv["v_scale"] = c["v_scale"]
    return kv


def _cache_write_both(c: dict, k_new: jax.Array, v_new: jax.Array, layer,
                      idx) -> dict:
    """Write layer `layer`'s k AND v planes (and their scale planes) IN
    the full stacked cache, in one pass: the new projections stack on a
    leading [2] axis so the int8 KV quantization (abs-max/div/round/clip
    chain) runs ONCE over both. Used by prefill, whose cache lives in
    the layer scan's CARRY (in-place while-loop state); the decode paths
    defer their writes to _cache_write_all instead.

    k_new/v_new: [B, S_new, Hkv, D] (projection layout; stored
    head-major). idx: scalar slot start."""
    quant = "k_scale" in c
    kv = jnp.stack([k_new.transpose(0, 2, 1, 3),
                    v_new.transpose(0, 2, 1, 3)])   # [2, B, Hkv, S_new, D]
    if quant:
        vals, scale = kv_quantize(kv)               # scale [2, B, Hkv, S_new]
    else:
        vals, scale = kv.astype(c["k"].dtype), None
    out = {}
    for i, key in enumerate(("k", "v")):
        out[key] = jax.lax.dynamic_update_slice(
            c[key], vals[i][None], (layer, 0, 0, idx, 0))
        if scale is not None:
            out[key + "_scale"] = jax.lax.dynamic_update_slice(
                c[key + "_scale"], scale[i][None], (layer, 0, 0, idx))
    return out


def _cache_write_all(c: dict, new_rows: jax.Array, idx) -> dict:
    """Write ONE new position for EVERY layer in one pass.

    Deferred from the decode layer scan: the per-layer dynamic updates
    were 2 (bf16) to 4 (int8+scales) extra op launches per layer per
    step on the dispatch-latency-bound decode path (~20 µs each on the
    tunneled backend); deferring batches them into one update per cache
    plane, and the int8 quantization chain runs once over all layers.

    new_rows: [L, 2, B, Hkv, q, D] — k then v on axis 1, head-major.
    idx: scalar slot start (rows land at [idx, idx+q)), or a
    (bidx, slots) pair for per-row scatter (continuous batching; row b's
    q rows land at [slots[b], slots[b]+q))."""
    kv = jnp.swapaxes(new_rows, 0, 1)            # [2, L, B, Hkv, q, D]
    q = kv.shape[4]
    if "k_scale" in c:
        vals, scale = kv_quantize(kv)            # scale [2, L, B, Hkv, q]
    else:
        vals, scale = kv.astype(c["k"].dtype), None
    out = dict(c)
    for t, key in enumerate(("k", "v")):
        if not isinstance(idx, tuple):
            out[key] = jax.lax.dynamic_update_slice(
                c[key], vals[t], (0, 0, 0, idx, 0))
            if scale is not None:
                out[key + "_scale"] = jax.lax.dynamic_update_slice(
                    c[key + "_scale"], scale[t], (0, 0, 0, idx))
        elif q == 1:
            bidx, slots = idx
            # advanced indices on dims 1 and 3 (split by a slice) move to
            # the front: the update operand is [B, L, Hkv, D] / [B, L, Hkv]
            rows = jnp.moveaxis(vals[t][:, :, :, 0], 1, 0)
            out[key] = c[key].at[:, bidx, :, slots].set(rows)
            if scale is not None:
                srows = jnp.moveaxis(scale[t][:, :, :, 0], 1, 0)
                out[key + "_scale"] = c[key + "_scale"].at[
                    :, bidx, :, slots].set(srows)
        else:
            # per-row CHUNK scatter (mixed decode+prefill steps): row b's
            # q new positions land at [slots[b], slots[b]+q); advanced
            # index grids [B, 1] x [B, q] broadcast, update [B, q, L, Hkv, ..]
            bidx, slots = idx
            grid = slots[:, None] + jnp.arange(q)[None, :]
            # [L, B, Hkv, q, D] → [B, q, L, Hkv, D]
            rows = jnp.moveaxis(vals[t], (1, 3), (0, 1))
            out[key] = c[key].at[:, bidx[:, None], :, grid].set(rows)
            if scale is not None:
                # [L, B, Hkv, q] → [B, q, L, Hkv]
                srows = jnp.moveaxis(scale[t], (1, 3), (0, 1))
                out[key + "_scale"] = c[key + "_scale"].at[
                    :, bidx[:, None], :, grid].set(srows)
    return out


def prefill(params: dict, cfg: LlamaConfig, inputs_embeds: jax.Array,
            attention_mask: jax.Array, cache: dict
            ) -> Tuple[jax.Array, dict]:
    """Run the prompt, filling cache slots [0, S). Returns (hidden, cache).

    hidden is post-final-norm [B, S, D]; attention_mask is [B, S] (left
    padding supported).
    """
    b, s, _ = inputs_embeds.shape
    max_len = cache["k"].shape[3]
    positions = _positions_from_mask(attention_mask)
    rows = R.gather_rope_rows(*rope_tables(cfg, max_len), positions)

    def body(carry, xs):
        x, c = carry
        p, i = xs

        def write(k_new, v_new):
            c_out = dict(c)
            c_out.update(_cache_write_both(c, k_new, v_new, i, 0))
            return (k_new, v_new), c_out

        x, c = _layer(p, cfg, x, rows, write,
                      attention_mask, True)
        return (x, c), None

    nl = cfg.num_hidden_layers
    (x, cache), _ = jax.lax.scan(body, (inputs_embeds, cache),
                                 (params["layers"], jnp.arange(nl)))
    hidden = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return hidden, cache


def _deferred_decode(params: dict, cfg: LlamaConfig, cache: dict,
                     token_embeds: jax.Array, rows, cache_mask: jax.Array,
                     commit_idx) -> Tuple[jax.Array, dict]:
    """Shared deferred-write decode body.

    The layer scan reads the cache as a closure constant; each layer's
    new k/v rows ride out as scan ys (attention folds them as exact
    extra columns — see cache_attention k_new/v_new), and
    _cache_write_all commits all layers in one update per plane after
    the scan. cache_mask must EXCLUDE the in-flight slots; commit_idx is
    a scalar slot or a (bidx, slots) pair."""
    def body(x, xs):
        p, i = xs

        def defer(k_new, v_new):
            kv = _cache_kv(cache, i, x.dtype)
            kv["k_new"] = k_new.transpose(0, 2, 1, 3)    # [B, Hkv, q, D]
            kv["v_new"] = v_new.transpose(0, 2, 1, 3)
            return kv, jnp.stack([kv["k_new"], kv["v_new"]])

        x, rows_new = _layer(p, cfg, x, rows, defer, cache_mask, False)
        return x, rows_new

    # EMU_TPU_DECODE_UNROLL=n unrolls the layer scan n-way: per-layer
    # dynamic-slices of the stacked weights/cache become static slices XLA
    # can fold into their consumers. Measured NEUTRAL on v5e-1 (int8 b8
    # full-depth: 358.6 vs 357.1 tok/s at unroll=40) — XLA's
    # dynamic-slice-fusion already hides the scan slicing; kept as an
    # opt-in experiment knob. Default 1 (plain scan); snapshotted at
    # import (ops/flags.py).
    from emu_tpu.ops.flags import flag
    unroll = int(flag("EMU_TPU_DECODE_UNROLL") or "1")
    x, new_rows = jax.lax.scan(
        body, token_embeds,
        (params["layers"], jnp.arange(cfg.num_hidden_layers)),
        unroll=max(1, unroll))
    cache = _cache_write_all(cache, new_rows, commit_idx)
    hidden = L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
    return hidden, cache


def decode_step(params: dict, cfg: LlamaConfig, cache: dict,
                token_embeds: jax.Array, slot: jax.Array,
                slot_mask: jax.Array, positions: jax.Array
                ) -> Tuple[jax.Array, dict]:
    """One decode step.

    token_embeds: [B, 1, D]; slot: scalar cache index to write; slot_mask:
    [B, max_len] bool validity of cache slots up to and including `slot`;
    positions: [B] rope positions of the new token. Returns
    (post-norm hidden [B, 1, D], updated cache).

    Cache writes are DEFERRED out of the layer scan (_deferred_decode)."""
    max_len = cache["k"].shape[3]
    rows = R.gather_rope_rows(*rope_tables(cfg, max_len),
                              positions[:, None])
    # the current token's row is not in the cache during the scan
    cache_mask = jnp.logical_and(slot_mask,
                                 jnp.arange(max_len)[None] != slot)
    return _deferred_decode(params, cfg, cache, token_embeds, rows,
                            cache_mask, slot)


def decode_chunk(params: dict, cfg: LlamaConfig, cache: dict,
                 token_embeds: jax.Array, slot: jax.Array,
                 valid_len: jax.Array, positions: jax.Array
                 ) -> Tuple[jax.Array, dict]:
    """Decode a CHUNK of q tokens against the cache in one forward.

    The speculative-decoding verify step: token_embeds [B, q, D] occupy
    cache slots [slot, slot+q); query i attends the committed cache
    positions (all j < valid_len) plus chunk columns <= i. valid_len [B]:
    count of valid slots before the chunk (== slot when there is no
    padding). Returns (post-norm hidden [B, q, D], cache).

    Deferred writes (_deferred_decode) keep the verify chunk on the
    single-launch Pallas decode kernel (intra-chunk causal triangle
    applied by the attention backend; int8 caches consumed natively)
    instead of the dense-mask XLA path."""
    max_len = cache["k"].shape[3]
    rows = R.gather_rope_rows(*rope_tables(cfg, max_len), positions)
    cache_mask = jnp.arange(max_len)[None] < valid_len[:, None]
    return _deferred_decode(params, cfg, cache, token_embeds, rows,
                            cache_mask, slot)


def decode_step_rows(params: dict, cfg: LlamaConfig, cache: dict,
                     token_embeds: jax.Array, slots: jax.Array,
                     slot_mask: jax.Array, positions: jax.Array
                     ) -> Tuple[jax.Array, dict]:
    """One decode step with PER-ROW cache write indices.

    The continuous-batching variant of decode_step: each batch row sits at
    its own sequence length, so `slots` is [B] (scatter write) instead of
    one shared scalar. slot_mask [B, max_len] must already include each
    row's own new slot. Returns (post-norm hidden [B, 1, D], cache).

    Cache writes are deferred out of the layer scan exactly as in
    decode_step (_deferred_decode)."""
    b = token_embeds.shape[0]
    max_len = cache["k"].shape[3]
    rows = R.gather_rope_rows(*rope_tables(cfg, max_len),
                              positions[:, None])
    cache_mask = jnp.logical_and(
        slot_mask, jnp.arange(max_len)[None] != slots[:, None])
    return _deferred_decode(params, cfg, cache, token_embeds, rows,
                            cache_mask, (jnp.arange(b), slots))


def decode_mixed_rows(params: dict, cfg: LlamaConfig, cache: dict,
                      token_embeds: jax.Array, slots: jax.Array,
                      slot_mask: jax.Array, positions: jax.Array
                      ) -> Tuple[jax.Array, dict]:
    """Mixed decode+prefill step: q tokens per row, PER-ROW write slots.

    The chunked-prefill (Sarathi-style) engine step: token_embeds
    [B, q, D] — decode rows carry their one new token at column 0 (rest
    padding), an admitting row carries a prompt chunk. Row b's tokens
    occupy cache slots [slots[b], slots[b]+q); every query sees the
    committed cache (slot_mask must NOT include any in-flight slot) plus
    its own chunk prefix (column j iff j <= i, applied by the attention
    backend). positions [B]: rope position of each row's FIRST token.
    Returns (post-norm hidden [B, q, D], cache).

    Rows with fewer than q real tokens are safe by construction: a valid
    query (i < qlen) only attends chunk columns j <= i < qlen, and the
    garbage rows committed at [slots+qlen, slots+q) stay invalid in
    slot_mask until real tokens overwrite them."""
    b, qn, _ = token_embeds.shape
    max_len = cache["k"].shape[3]
    # clamp to the table (overhang rows are padding whose output and
    # cache rows are never validated)
    pos_grid = jnp.minimum(positions[:, None] + jnp.arange(qn)[None, :],
                           max_len - 1)
    rows = R.gather_rope_rows(*rope_tables(cfg, max_len), pos_grid)
    return _deferred_decode(params, cfg, cache, token_embeds, rows,
                            slot_mask, (jnp.arange(b), slots))


def reorder_cache(cache: dict, beam_indices: jax.Array) -> dict:
    """Gather cache rows on beam-search reorder. beam_indices: [B]."""
    return jax.tree_util.tree_map(lambda c: c[:, beam_indices], cache)


# ---------------------------------------------------------------------------
# Tensor-parallel sharding rules (stacked tensors: leading layer dim)
# ---------------------------------------------------------------------------

sharding_rules = [
    (r"layers/self_attn/(q|k|v|qkv)_proj/kernel$", P(None, None, "model")),
    (r"layers/self_attn/o_proj/kernel$", P(None, "model", None)),
    (r"layers/mlp/(gate|up|gate_up)/kernel$", P(None, None, "model")),
    (r"layers/mlp/down/kernel$", P(None, "model", None)),
    (r"embed_tokens", P("model", None)),
    (r"lm_head/kernel$", P(None, "model")),
    # Quantized-leaf layouts (ops/quant.py). Rules are anchored ($) so a
    # float-kernel spec can never substring-match a quantized leaf whose
    # extra packing dims would misalign the axes (ADVICE r3). int8
    # kernels keep the float kernel's rank, so the same axis layout
    # applies; per-out-channel scales [L, out] shard with the out dim
    # iff the kernel's out dim is model-sharded. int4 packed kernels
    # [L, in/2, out] + scale4 [L, G, out] and materialized s4 buffers
    # [L, G/2, 2, gs, out] shard the out dim on the out-sharded planes;
    # the contraction-sharded planes (o_proj, down) stay REPLICATED in
    # int4 form — a "model" split of the packed in/2 dim would cut
    # through the nibble fold and the group reshape for no layout win.
    (r"layers/self_attn/(q|k|v|qkv)_proj/kernel_(q8|w8a8|q4)$",
     P(None, None, "model")),
    (r"layers/self_attn/(q|k|v|qkv)_proj/kernel_s4$",
     P(None, None, None, None, "model")),
    (r"layers/self_attn/(q|k|v|qkv)_proj/scale$", P(None, "model")),
    (r"layers/self_attn/(q|k|v|qkv)_proj/scale4$", P(None, None, "model")),
    (r"layers/self_attn/o_proj/kernel_(q8|w8a8)$", P(None, "model", None)),
    (r"layers/mlp/(gate|up|gate_up)/kernel_(q8|w8a8|q4)$",
     P(None, None, "model")),
    (r"layers/mlp/(gate|up|gate_up)/kernel_s4$",
     P(None, None, None, None, "model")),
    (r"layers/mlp/(gate|up|gate_up)/scale$", P(None, "model")),
    (r"layers/mlp/(gate|up|gate_up)/scale4$", P(None, None, "model")),
    (r"layers/mlp/down/kernel_(q8|w8a8)$", P(None, "model", None)),
    (r"lm_head/kernel_(q8|w8a8|q4)$", P(None, "model")),
    (r"lm_head/kernel_s4$", P(None, None, None, "model")),
    (r"lm_head/scale$", P("model")),
    (r"lm_head/scale4$", P(None, "model")),
]

cache_sharding_rules = [
    (r"[kv]$", P(None, "data", None, "model", None)),
    (r"[kv]_scale$", P(None, "data", None, "model")),
]
