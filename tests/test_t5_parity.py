"""Golden parity: our T5 decoder stack vs HF T5Stack (fp32, CPU).

When encoder_width == d_model, the reference's fork reduces to stock HF T5
(its only change is the cross-attn K/V input width,
Emu1/models/modeling_t5.py:423-424) — so stock HF is the numerical spec for
that case; a separate shape test covers the widened cross-attention.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers.models.t5.configuration_t5 import T5Config as HFT5Config  # noqa: E402
from transformers.models.t5.modeling_t5 import T5Stack  # noqa: E402

from emu_tpu.config import T5Config  # noqa: E402
from emu_tpu.models import t5, causal_former  # noqa: E402

D_MODEL = 48
CFG = T5Config(d_model=D_MODEL, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
               encoder_width=D_MODEL)


def _hf_decoder():
    hf_cfg = HFT5Config(
        d_model=D_MODEL, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
        vocab_size=32, dropout_rate=0.0, feed_forward_proj="relu",
        is_decoder=True, is_encoder_decoder=False, use_cache=False)
    torch.manual_seed(0)
    emb = torch.nn.Embedding(32, D_MODEL)
    return T5Stack(hf_cfg, emb).eval()


def _port(hf, n_layers=2) -> dict:
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def stack(fmt, transpose=True):
        arrs = [sd[fmt.format(i)] for i in range(n_layers)]
        return jnp.asarray(np.stack([a.T if transpose else a for a in arrs]))

    def attn(idx, name):
        base = "block.{}.layer." + str(idx) + "." + name + "."
        return {
            "ln": stack("block.{}.layer." + str(idx) + ".layer_norm.weight",
                        transpose=False),
            "q": {"kernel": stack(base + "q.weight")},
            "k": {"kernel": stack(base + "k.weight")},
            "v": {"kernel": stack(base + "v.weight")},
            "o": {"kernel": stack(base + "o.weight")},
        }

    return {
        "layers": {
            "self_attn": attn(0, "SelfAttention"),
            "cross_attn": attn(1, "EncDecAttention"),
            "ff": {
                "ln": stack("block.{}.layer.2.layer_norm.weight",
                            transpose=False),
                "wi": {"kernel": stack(
                    "block.{}.layer.2.DenseReluDense.wi.weight")},
                "wo": {"kernel": stack(
                    "block.{}.layer.2.DenseReluDense.wo.weight")},
            },
        },
        "rel_bias": jnp.asarray(
            sd["block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "final_ln": jnp.asarray(sd["final_layer_norm.weight"]),
    }


def test_decoder_matches_hf():
    hf = _hf_decoder()
    params = _port(hf)
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((2, 8, D_MODEL)).astype(np.float32)
    enc = rng.standard_normal((2, 11, D_MODEL)).astype(np.float32)

    with torch.no_grad():
        out = hf(inputs_embeds=torch.tensor(tokens),
                 encoder_hidden_states=torch.tensor(enc),
                 ).last_hidden_state.numpy()

    ours = np.asarray(t5.decoder_forward(params, CFG, jnp.asarray(tokens),
                                         jnp.asarray(enc)))
    np.testing.assert_allclose(ours, out, rtol=2e-4, atol=2e-4)


def test_wide_cross_attention_shapes():
    """encoder_width != d_model (the fork's actual configuration)."""
    cfg = T5Config(d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
                   encoder_width=80)
    params = t5.init(jax.random.PRNGKey(0), cfg)
    assert params["layers"]["cross_attn"]["k"]["kernel"].shape == (2, 80, 48)
    out = t5.decoder_forward(
        params, cfg, jnp.zeros((2, 6, 48)), jnp.ones((2, 10, 80)))
    assert out.shape == (2, 6, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_causal_former_end_to_end_shapes():
    cfg = T5Config(d_model=48, d_kv=12, d_ff=96, num_layers=2, num_heads=4,
                   encoder_width=32)
    params = causal_former.init(jax.random.PRNGKey(0), cfg, n_causal=4,
                                output_dim=64)
    img = jax.random.normal(jax.random.PRNGKey(1), (3, 9, 32))
    out = causal_former.forward(params, cfg, img)
    assert out.shape == (3, 4, 64)
    assert np.isfinite(np.asarray(out)).all()
