"""Tokenizer tests against the real reference LLaMA tokenizer assets
(skipped when /root/reference is not mounted)."""

import os

import pytest

REF = "/root/reference/Emu1/models/llama_config"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_real_tokenizer_special_ids_and_roundtrip():
    from emu_tpu.tokenization import EmuTokenizer
    tok = EmuTokenizer.emu1(REF, instruct=True)
    assert tok.pad_token_id == 32000
    assert tok.img_token_id == 32001
    assert tok.image_token_id == 32003        # ref modeling_llama "# 32003"

    text = "a photo of [IMG]" + "<image>" * 3 + "[/IMG] a dog"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_token_id
    assert ids.count(tok.image_token_id) == 3
    decoded = tok.decode(ids, skip_special_tokens=True)
    assert "photo" in decoded and "dog" in decoded
    assert "[IMG]" not in decoded

    # sentencepiece piece-level sanity vs HF fast tokenizer directly
    from transformers import LlamaTokenizerFast
    hf = LlamaTokenizerFast.from_pretrained(REF, legacy=False)
    plain = "the quick brown fox"
    assert tok.encode(plain, add_bos=False) == hf.encode(
        plain, add_special_tokens=False)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_real_tokenizer_batch_left_pad():
    from emu_tpu.tokenization import EmuTokenizer
    tok = EmuTokenizer.emu1(REF)
    ids, mask = tok.encode_batch(["hi", "a much longer sentence here"],
                                 padding_side="left")
    assert (ids[0][mask[0] == 0] == tok.pad_token_id).all()
    assert mask[0].sum() < mask[1].sum()
