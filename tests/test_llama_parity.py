"""Golden parity: our LLaMA vs HF transformers LlamaForCausalLM (fp32, CPU).

The reference drives HF LLaMA directly (Emu1/models/modeling_llama.py:133,
Emu2/emu/lm.py:36), so HF *is* the numerical spec for the decoder.
"""

import numpy as np
import pytest
import jax.numpy as jnp
import jax

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from emu_tpu.config import LlamaConfig  # noqa: E402
from emu_tpu.models import llama  # noqa: E402


CFG = LlamaConfig(hidden_size=64, intermediate_size=112,
                  num_hidden_layers=3, num_attention_heads=4,
                  vocab_size=128, extended_vocab_size=128,
                  max_position_embeddings=64)


def _hf_model():
    hf_cfg = HFLlamaConfig(
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_attention_heads,
        vocab_size=CFG.vocab_size,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    m = LlamaForCausalLM(hf_cfg).eval()
    return m


def _port(hf) -> dict:
    """HF state dict → our pytree (linear weights transposed)."""
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def t(name):
        return jnp.asarray(sd[name].T)

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
        "lm_head": {"kernel": t("lm_head.weight")},
    }


@pytest.fixture(scope="module")
def models():
    hf = _hf_model()
    return hf, _port(hf)


def test_full_forward_logits_match(models):
    hf, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(3, CFG.vocab_size, size=(2, 9))
    # left padding on row 0
    mask = np.ones((2, 9), np.int64)
    mask[0, :3] = 0
    ids[0, :3] = 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask))
    hf_logits = out.logits.numpy()

    embeds = llama.embed(params, jnp.asarray(ids))
    hidden = llama.forward_hidden(params, CFG, embeds, jnp.asarray(mask))
    ours = np.asarray(llama.logits(params, hidden))

    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], hf_logits[valid],
                               rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full_forward(models):
    _, params = models
    rng = np.random.default_rng(1)
    b, s_prompt, n_new = 2, 7, 5
    total = s_prompt + n_new
    ids = rng.integers(3, CFG.vocab_size, size=(b, total))
    mask = np.ones((b, total), np.int64)
    mask[0, :2] = 0  # left pad

    # Full-sequence forward (the reference's wasteful re-run semantics)
    embeds = llama.embed(params, jnp.asarray(ids))
    full_hidden = llama.forward_hidden(params, CFG, embeds, jnp.asarray(mask))

    # Prefill + step-by-step decode
    cache = llama.init_cache(CFG, b, total, dtype=jnp.float32)
    hidden, cache = llama.prefill(
        params, CFG, embeds[:, :s_prompt], jnp.asarray(mask[:, :s_prompt]),
        cache)
    valid = mask[:, :s_prompt].astype(bool)  # pad positions hold garbage
    np.testing.assert_allclose(np.asarray(hidden)[valid],
                               np.asarray(full_hidden[:, :s_prompt])[valid],
                               rtol=2e-4, atol=2e-4)

    slot_mask = np.zeros((b, total), np.int64)
    slot_mask[:, :s_prompt] = mask[:, :s_prompt]
    positions = mask[:, :s_prompt].sum(-1)
    for step in range(n_new):
        slot = s_prompt + step
        slot_mask[:, slot] = 1
        tok = llama.embed(params, jnp.asarray(ids[:, slot:slot + 1]))
        h, cache = llama.decode_step(
            params, CFG, cache, tok, jnp.int32(slot),
            jnp.asarray(slot_mask).astype(bool), jnp.asarray(positions))
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full_hidden[:, slot]),
            rtol=2e-4, atol=3e-4)
        positions = positions + 1
