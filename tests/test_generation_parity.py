"""Generation-engine parity vs HF transformers `generate` (tiny LLaMA, CPU).

The reference's entire text-out surface is HF generate with inputs_embeds
(Emu1/models/modeling_emu.py:162, Emu2/emu/emu.py:213); these tests pin our
jitted engine to HF's behavior: greedy, greedy+repetition penalty, beam
search with length_penalty −1 / min length, and EOS/pad handling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from transformers import LlamaConfig as HFLlamaConfig  # noqa: E402
from transformers import LlamaForCausalLM  # noqa: E402

from emu_tpu.config import LlamaConfig  # noqa: E402
from emu_tpu.generation import GenerationConfig, llama_generate  # noqa: E402
from tests.test_llama_parity import CFG, _hf_model, _port  # noqa: E402

EOS = CFG.eos_token_id
PAD = 0


@pytest.fixture(scope="module")
def models():
    hf = _hf_model()
    return hf, _port(hf)


def _prompt(b=2, s=6, pad_rows=((0, 2),)):
    rng = np.random.default_rng(42)
    ids = rng.integers(3, CFG.vocab_size, size=(b, s))
    mask = np.ones((b, s), np.int64)
    for row, n in pad_rows:
        mask[row, :n] = 0
        ids[row, :n] = PAD
    return ids, mask


def _hf_generate(hf, ids, mask, **kw):
    with torch.no_grad():
        embeds = hf.get_input_embeddings()(torch.tensor(ids))
        out = hf.generate(inputs_embeds=embeds,
                          attention_mask=torch.tensor(mask),
                          pad_token_id=PAD, eos_token_id=EOS, **kw)
    return out.numpy()


def _ours(params, ids, mask, gcfg):
    from emu_tpu.models import llama
    embeds = llama.embed(params, jnp.asarray(ids))
    return np.asarray(llama_generate(params, CFG, embeds,
                                     jnp.asarray(mask), gcfg))


def _compare(ours, hf_out, max_new):
    """Compare up to and including EOS; ours pads after EOS."""
    b = hf_out.shape[0]
    hf_padded = np.full((b, max_new), PAD, np.int64)
    hf_padded[:, :hf_out.shape[1]] = hf_out
    for r in range(b):
        eos_pos = np.where(hf_padded[r] == EOS)[0]
        n = int(eos_pos[0]) + 1 if len(eos_pos) else max_new
        np.testing.assert_array_equal(ours[r, :n], hf_padded[r, :n],
                                      err_msg=f"row {r}")


def test_greedy_matches_hf(models):
    hf, params = models
    ids, mask = _prompt()
    hf_out = _hf_generate(hf, ids, mask, max_new_tokens=12, do_sample=False,
                          num_beams=1)
    ours = _ours(params, ids, mask,
                 GenerationConfig(max_new_tokens=12, eos_token_id=EOS,
                                  pad_token_id=PAD))
    _compare(ours, hf_out, 12)


def test_greedy_with_repetition_penalty(models):
    hf, params = models
    ids, mask = _prompt()
    hf_out = _hf_generate(hf, ids, mask, max_new_tokens=12, do_sample=False,
                          num_beams=1, repetition_penalty=1.7)
    ours = _ours(params, ids, mask,
                 GenerationConfig(max_new_tokens=12, repetition_penalty=1.7,
                                  eos_token_id=EOS, pad_token_id=PAD))
    _compare(ours, hf_out, 12)


@pytest.mark.parametrize("length_penalty", [0.0, -1.0, 1.0])
def test_beam_search_matches_hf(models, length_penalty):
    hf, params = models
    ids, mask = _prompt()
    # note: HF silently ignores min_length in inputs_embeds mode (it is
    # interpreted relative to the embeds length); we pass 0 to both.
    kw = dict(max_new_tokens=10, num_beams=4, do_sample=False,
              length_penalty=length_penalty, min_length=0)
    hf_out = _hf_generate(hf, ids, mask, **kw)
    ours = _ours(params, ids, mask,
                 GenerationConfig(max_new_tokens=10, num_beams=4,
                                  length_penalty=length_penalty,
                                  min_length=0, eos_token_id=EOS,
                                  pad_token_id=PAD))
    _compare(ours, hf_out, 10)


def test_sampling_respects_top_k(models):
    _, params = models
    ids, mask = _prompt()
    gcfg = GenerationConfig(max_new_tokens=8, do_sample=True, top_k=1,
                            eos_token_id=EOS, pad_token_id=PAD)
    # top_k=1 sampling == greedy
    sampled = _ours(params, ids, mask, gcfg)
    greedy = _ours(params, ids, mask,
                   GenerationConfig(max_new_tokens=8, eos_token_id=EOS,
                                    pad_token_id=PAD))
    np.testing.assert_array_equal(sampled, greedy)


def test_contrastive_search_behavior(models):
    """HF 4.5x loads contrastive search via remote code (unavailable
    offline), so no live oracle — validate the defining properties:
    alpha→0 degenerates to greedy; alpha>0 stays within the top-k set and
    penalizes degenerate (self-similar) continuations."""
    _, params = models
    ids, mask = _prompt(b=2, s=6, pad_rows=())

    greedy = _ours(params, ids, mask,
                   GenerationConfig(max_new_tokens=8, eos_token_id=EOS,
                                    pad_token_id=PAD))
    near_greedy = _ours(params, ids, mask,
                        GenerationConfig(max_new_tokens=8,
                                         penalty_alpha=1e-6, top_k=4,
                                         min_length=0, eos_token_id=EOS,
                                         pad_token_id=PAD))
    np.testing.assert_array_equal(near_greedy, greedy)

    contrastive = _ours(params, ids, mask,
                        GenerationConfig(max_new_tokens=8,
                                         penalty_alpha=0.6, top_k=4,
                                         min_length=0, eos_token_id=EOS,
                                         pad_token_id=PAD))
    assert contrastive.shape == greedy.shape
    # with a real penalty the trajectory should diverge from pure greedy
    assert not np.array_equal(contrastive, greedy)

    # kv_cache_quant must reach this path too (regression: it was
    # silently ignored, defeating the advertised 2x-context saving)
    quantized = _ours(params, ids, mask,
                      GenerationConfig(max_new_tokens=8,
                                       penalty_alpha=0.6, top_k=4,
                                       min_length=0, eos_token_id=EOS,
                                       pad_token_id=PAD,
                                       kv_cache_quant=True))
    assert quantized.shape == contrastive.shape
    # int8 KV error is tiny on this model; trajectories should agree
    np.testing.assert_array_equal(quantized, contrastive)


def test_logits_warpers_match_hf():
    """top-k / top-p / repetition-penalty filters vs HF warpers on fixed
    logits (pure tensor transforms, no RNG)."""
    from transformers.generation.logits_process import (
        RepetitionPenaltyLogitsProcessor, TopKLogitsWarper, TopPLogitsWarper)
    from emu_tpu.generation import logits_process as lp

    rng = np.random.default_rng(0)
    scores = rng.standard_normal((3, 50)).astype(np.float32)
    t_scores = torch.tensor(scores)
    dummy_ids = torch.zeros((3, 4), dtype=torch.long)

    def match(ours, theirs):
        ours = np.asarray(ours)
        theirs = theirs.numpy()
        # compare as masks + surviving values (HF uses -inf, we use -1e30)
        np.testing.assert_array_equal(ours < -1e20, np.isinf(theirs))
        keep = ~np.isinf(theirs)
        np.testing.assert_allclose(ours[keep], theirs[keep], rtol=1e-6)

    match(lp.top_k_filter(jnp.asarray(scores), 7),
          TopKLogitsWarper(7)(dummy_ids, t_scores.clone()))
    match(lp.top_p_filter(jnp.asarray(scores), 0.8),
          TopPLogitsWarper(0.8)(dummy_ids, t_scores.clone()))

    # repetition penalty over generated ids
    gen = np.array([[5, 9, 5, 2], [1, 1, 3, 4], [7, 8, 9, 10]])
    ours = lp.repetition_penalty(jnp.asarray(scores), jnp.asarray(gen),
                                 jnp.ones_like(jnp.asarray(gen), bool), 1.6)
    theirs = RepetitionPenaltyLogitsProcessor(1.6)(
        torch.tensor(gen), t_scores.clone())
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-6)
