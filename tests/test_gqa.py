"""GQA (num_key_value_heads < num_attention_heads) vs HF LlamaForCausalLM.

LLaMA-2/3-class checkpoints use grouped-query attention; the Emu
reference models are MHA, so this is a capability extension validated
against the same HF numerical spec as test_llama_parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from emu_tpu.config import LlamaConfig  # noqa: E402
from emu_tpu.models import llama  # noqa: E402

CFG = LlamaConfig(hidden_size=64, intermediate_size=112,
                  num_hidden_layers=2, num_attention_heads=8,
                  num_key_value_heads=2, vocab_size=128,
                  extended_vocab_size=128, max_position_embeddings=64)


def _hf_model():
    hf_cfg = HFLlamaConfig(
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        vocab_size=CFG.vocab_size,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg).eval()


def _port(hf) -> dict:
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    n_layers = CFG.num_hidden_layers

    def stack(fmt, transpose=True):
        arrs = [sd[fmt.format(i)] for i in range(n_layers)]
        arrs = [a.T if transpose else a for a in arrs]
        return jnp.asarray(np.stack(arrs))

    return {
        "embed_tokens": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": {
            "input_layernorm": stack(
                "model.layers.{}.input_layernorm.weight", transpose=False),
            "post_attention_layernorm": stack(
                "model.layers.{}.post_attention_layernorm.weight",
                transpose=False),
            "self_attn": {
                f"{n}_proj": {"kernel": stack(
                    "model.layers.{}.self_attn." + n + "_proj.weight")}
                for n in ("q", "k", "v", "o")
            },
            "mlp": {
                "gate": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight")},
                "up": {"kernel": stack("model.layers.{}.mlp.up_proj.weight")},
                "down": {"kernel": stack("model.layers.{}.mlp.down_proj.weight")},
            },
        },
        "norm": jnp.asarray(sd["model.norm.weight"]),
        "lm_head": {"kernel": jnp.asarray(sd["lm_head.weight"].T)},
    }


@pytest.fixture(scope="module")
def setup():
    hf = _hf_model()
    return hf, _port(hf)


def test_gqa_forward_parity(setup):
    hf, params = setup
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, (2, 9))
    mask = np.ones_like(ids)
    mask[0, :3] = 0                       # left padding
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    embeds = llama.embed(params, jnp.asarray(ids))
    hidden = llama.forward_hidden(params, CFG, embeds, jnp.asarray(mask))
    out = np.asarray(llama.logits(params, hidden))
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_gqa_cached_decode_matches_full_forward(setup):
    """prefill + decode_step produce the same logits as the uncached path
    (also proves the kv-heads cache layout round-trips)."""
    hf, params = setup
    ids = np.array([[5, 17, 3, 42, 8, 11]])
    mask = jnp.ones((1, 6), jnp.int32)
    embeds = llama.embed(params, jnp.asarray(ids))

    hidden_full = llama.forward_hidden(params, CFG, embeds, mask)
    full_logits = np.asarray(llama.logits(params, hidden_full))

    cache = llama.init_cache(CFG, 1, 8, dtype=jnp.float32)
    assert cache["k"].shape[2] == CFG.num_key_value_heads
    h5, cache = llama.prefill(params, CFG, embeds[:, :5], mask[:, :5], cache)
    sm = (jnp.arange(8) <= 5)[None]
    h6, _ = llama.decode_step(params, CFG, cache, embeds[:, 5:6],
                              jnp.int32(5), sm, jnp.asarray([5]))
    np.testing.assert_allclose(
        np.asarray(llama.logits(params, h6[:, 0])), full_logits[:, 5],
        rtol=2e-4, atol=2e-4)


def test_fused_projections_match_unfused():
    """fuse_projections (qkv_proj / gate_up) is numerically exact for
    plain weights and matches the quantized math when fused after
    quantization; generation agrees token-for-token."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.config import LlamaConfig
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.models import llama
    from emu_tpu.ops.quant import quantize_tree

    cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                      num_hidden_layers=3, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=128,
                      extended_vocab_size=128)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 9, 3, 17, 2], [1, 1, 4, 6, 8]], jnp.int32)
    mask = jnp.array([[0, 1, 1, 1, 1], [1, 1, 1, 1, 1]], jnp.int32)
    embeds = llama.embed(params, ids)

    ref = np.asarray(llama.forward_hidden(params, cfg, embeds, mask))
    fused = llama.fuse_projections(params)
    assert "qkv_proj" in fused["layers"]["self_attn"]
    assert "q_proj" not in fused["layers"]["self_attn"]
    out = np.asarray(llama.forward_hidden(fused, cfg, embeds, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # quantize-then-fuse == fuse-then-quantize (int8), and int4 fuses too
    q8 = quantize_tree(params)
    a = np.asarray(llama.forward_hidden(llama.fuse_projections(q8), cfg,
                                        embeds, mask))
    b = np.asarray(llama.forward_hidden(quantize_tree(fused), cfg,
                                        embeds, mask))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    q4f = llama.fuse_projections(quantize_tree(params, bits=4))
    assert "kernel_q4" in q4f["layers"]["self_attn"]["qkv_proj"]
    c = np.asarray(llama.forward_hidden(q4f, cfg, embeds, mask))
    cos = (c * ref).sum() / (np.linalg.norm(c) * np.linalg.norm(ref))
    assert cos > 0.97, cos

    # KV-cached generation: identical streams fused vs unfused
    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                            pad_token_id=0)
    t_ref = np.asarray(llama_generate(params, cfg, embeds, mask, gcfg))
    t_fused = np.asarray(llama_generate(fused, cfg, embeds, mask, gcfg))
    np.testing.assert_array_equal(t_fused, t_ref)


def test_fuse_projections_carries_bias():
    """Qwen-style projection biases concatenate through fuse_projections
    (regression: entries beyond kernel/scale were silently dropped)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama

    cfg = LlamaConfig(hidden_size=128, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=64,
                      extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    sa = params["layers"]["self_attn"]
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 3))
    for name in ("q_proj", "k_proj", "v_proj"):
        out = sa[name]["kernel"].shape[-1]
        sa[name] = dict(sa[name], bias=0.1 * jax.random.normal(
            next(keys), (cfg.num_hidden_layers, out)))

    ids = jnp.array([[5, 9, 3, 17, 2]], jnp.int32)
    mask = jnp.ones_like(ids)
    embeds = llama.embed(params, ids)
    ref = np.asarray(llama.forward_hidden(params, cfg, embeds, mask))
    fused = llama.fuse_projections(params)
    assert "bias" in fused["layers"]["self_attn"]["qkv_proj"]
    out = np.asarray(llama.forward_hidden(fused, cfg, embeds, mask))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # unknown extra entries must raise, not silently drop
    sa2 = dict(params["layers"]["self_attn"])
    sa2["q_proj"] = dict(sa2["q_proj"], lora_a=jnp.zeros((2, 4)))
    bad = dict(params, layers=dict(params["layers"], self_attn=sa2))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unfusable"):
        llama.fuse_projections(bad)


def test_gqa_per_head_dense_mask():
    """dot_product_attention accepts per-head [B,H,Sq,Skv] dense masks on
    the grouped path (regression: broadcast only fit [B,1,Sq,Skv])."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.attention import dot_product_attention

    ks = iter(jax.random.split(jax.random.PRNGKey(3), 4))
    b, sq, skv, h, hkv, d = 2, 4, 6, 8, 2, 16
    q = jax.random.normal(next(ks), (b, sq, h, d))
    k = jax.random.normal(next(ks), (b, skv, hkv, d))
    v = jax.random.normal(next(ks), (b, skv, hkv, d))
    mask = jax.random.bernoulli(next(ks), 0.7, (b, h, sq, skv))
    mask = mask.at[..., 0].set(True)          # no fully-masked rows

    out = dot_product_attention(q, k, v, mask=mask)
    # oracle: repeat K/V to full heads, use the MHA path
    rep = h // hkv
    kf = jnp.repeat(k, rep, axis=2)
    vf = jnp.repeat(v, rep, axis=2)
    ref = dot_product_attention(q, kf, vf, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # broadcast [B,1,Sq,Skv] masks still work
    m1 = mask[:, :1]
    out1 = dot_product_attention(q, k, v, mask=m1)
    ref1 = dot_product_attention(q, kf, vf, mask=m1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)


def test_int8_kv_cache_decode():
    """int8 KV cache: prefill+decode tracks the bf16-cache path closely
    and the engine generates end-to-end with kv_cache_quant=True."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.config import LlamaConfig
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.models import llama

    cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                      num_hidden_layers=3, num_attention_heads=4,
                      vocab_size=128, extended_vocab_size=128)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[5, 9, 3, 17, 2], [1, 1, 4, 6, 8]], jnp.int32)
    mask = jnp.array([[0, 1, 1, 1, 1], [1, 1, 1, 1, 1]], jnp.int32)
    embeds = llama.embed(params, ids)
    total = 9

    def run(quant):
        cache = llama.init_cache(cfg, 2, total, dtype=jnp.float32,
                                 quant=quant)
        hidden, cache = llama.prefill(params, cfg, embeds, mask, cache)
        outs = [hidden[:, -1]]
        slot_mask = jnp.zeros((2, total), bool).at[:, :5].set(
            mask.astype(bool))
        positions = jnp.sum(mask, axis=-1)
        x = hidden[:, -1:]
        for t in range(3):
            slot_mask = slot_mask.at[:, 5 + t].set(True)
            h, cache = llama.decode_step(params, cfg, cache, x, 5 + t,
                                         slot_mask, positions + t)
            outs.append(h[:, 0])
            x = h
        return np.stack([np.asarray(o) for o in outs])

    ref = run(False)
    out = run(True)
    # int8 K/V with per-(token, head) scales: ~1e-2 relative error
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel

    gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=-1,
                            pad_token_id=0, kv_cache_quant=True)
    toks = np.asarray(llama_generate(params, cfg, embeds, mask, gcfg))
    assert toks.shape == (2, 6)
