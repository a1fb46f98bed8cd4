"""Eval harness tests: metrics golden values, trie decoding, synthetic
end-to-end COCO eval with a tiny model."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu.mm_eval.metrics.caption import bleu, cider_d
from emu_tpu.mm_eval.metrics.vqa import normalize_answer, vqa_accuracy
from emu_tpu.mm_eval.trie import build_trie


def test_vqa_normalization():
    assert normalize_answer("The cat.") == "cat"
    assert normalize_answer("two") == "2"
    assert normalize_answer("isnt") == "isn't"
    assert normalize_answer("A dog;") == "dog"


def test_vqa_accuracy_consensus():
    gts = ["cat"] * 10
    assert vqa_accuracy("the cat", gts) == 1.0
    gts = ["cat"] * 3 + ["dog"] * 7
    acc = vqa_accuracy("cat", gts)
    assert 0 < acc < 1
    assert vqa_accuracy("fish", gts) == 0.0


def test_bleu_perfect_and_zero():
    res = {"1": "a cat sits on the mat"}
    refs = {"1": ["a cat sits on the mat"]}
    scores = bleu(res, refs)
    assert all(abs(s - 1.0) < 1e-6 for s in scores)
    scores = bleu({"1": "zebra"}, {"1": ["completely different words here"]})
    assert scores[3] < 0.01


def test_cider_identical_captions_score_high():
    res = {str(i): f"a photo of object {i}" for i in range(4)}
    refs = {k: [v, v] for k, v in res.items()}
    assert cider_d(res, refs) > 5.0
    worse = dict(res)
    worse["0"] = "nothing in common at all"
    assert cider_d(worse, refs) < cider_d(res, refs)


def test_meteor_against_nltk_oracle():
    """Our METEOR (exact + Porter-stem stages) vs nltk's implementation
    of the same published algorithm, with the wordnet stage disabled on
    both sides (corpus data absent from the image)."""
    nltk_meteor = pytest.importorskip("nltk.translate.meteor_score")
    from nltk.stem.porter import PorterStemmer

    from emu_tpu.mm_eval.metrics.caption import meteor, tokenize

    class NoWordnet:
        def synsets(self, word):
            return []

    cases = [
        ("a cat sits on the mat", ["a cat sits on the mat"]),
        ("the cat sat on a mat", ["a cat sits on the mat",
                                  "there is a cat on the mat"]),
        ("dogs running quickly through fields",
         ["a dog runs quick through the field"]),
        ("completely unrelated words here", ["the president gave a speech"]),
        ("it is a truth universally acknowledged",
         ["it is a truth universally acknowledged that a single man"]),
    ]
    for hyp, refs in cases:
        expected = max(
            nltk_meteor.single_meteor_score(
                tokenize(r), tokenize(hyp), stemmer=PorterStemmer(),
                wordnet=NoWordnet())
            for r in refs)
        ours = meteor({"0": hyp}, {"0": refs})
        assert abs(ours - expected) < 1e-9, (hyp, ours, expected)


def test_meteor_bounds_and_ordering():
    from emu_tpu.mm_eval.metrics.caption import meteor
    refs = {"0": ["a brown dog chases the ball"]}
    perfect = meteor({"0": "a brown dog chases the ball"}, refs)
    partial = meteor({"0": "a dog chases something"}, refs)
    zero = meteor({"0": "quantum flux capacitor"}, refs)
    assert perfect > partial > zero == 0.0
    assert perfect > 0.99


def test_spice_lite_bounds_and_ordering():
    from emu_tpu.mm_eval.metrics.caption import spice_lite
    refs = {"0": ["a brown dog chases the red ball",
                  "the dog runs after a ball"]}
    perfect = spice_lite({"0": "a brown dog chases the red ball"}, refs)
    partial = spice_lite({"0": "a dog with a ball"}, refs)
    zero = spice_lite({"0": "quantum flux capacitor"}, refs)
    assert 1.0 >= perfect > partial > zero == 0.0
    # content words matter, function words don't: adding articles is free
    assert spice_lite({"0": "the brown dog chases a red ball"}, refs) \
        == perfect


def test_spice_lite_merges_references():
    from emu_tpu.mm_eval.metrics.caption import spice_lite
    # a candidate drawing propositions from BOTH references scores higher
    # recall than either reference alone would allow (SPICE merges the
    # reference scene graphs before matching)
    refs = {"0": ["a man rides a horse", "a person wears a hat"]}
    both = spice_lite({"0": "a man rides a horse and wears a hat"}, refs)
    one = spice_lite({"0": "a man rides a horse"}, refs)
    assert both > one > 0.0


def test_trie_tables():
    # candidates: [5, 6, EOS], [5, 7, EOS]
    trie = build_trie([[5, 6, 2], [5, 7, 2]], vocab_size=10, eos_token_id=2,
                      pad_token_id=0)
    assert trie["allowed"][0].sum() == 1 and trie["allowed"][0][5]
    s1 = trie["next"][0, 5]
    assert set(np.where(trie["allowed"][s1])[0]) == {6, 7}
    s2 = trie["next"][s1, 6]
    s_eos = trie["next"][s2, 2]
    assert trie["allowed"][s2][2]          # leaf allows EOS
    assert trie["allowed"][s_eos][2]       # sink keeps allowing EOS/pad


def test_trie_constrained_generation():
    from emu_tpu.config import LlamaConfig
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.models import llama
    cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 3]], np.int32)
    embeds = llama.embed(params, jnp.asarray(ids))
    trie = build_trie([[11, 12, 2], [13, 2]], 64, 2, 0)
    trie = {k: jnp.asarray(v) for k, v in trie.items()}
    out = llama_generate(params, cfg, embeds, jnp.ones_like(ids),
                         GenerationConfig(max_new_tokens=4, min_length=0,
                                          pad_token_id=0),
                         trie=trie)
    seq = np.asarray(out)[0].tolist()
    assert seq[0] in (11, 13)
    if seq[0] == 11:
        assert seq[1] == 12 and seq[2] == 2
    else:
        assert seq[1] == 2


def test_end_to_end_coco_eval_synthetic(tmp_path):
    """Full evaluate_engine pass: synthetic karpathy dir + tiny model."""
    from PIL import Image
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu1Config
    from emu_tpu.mm_eval.engine import EvalArguments, evaluate_engine
    from emu_tpu.mm_eval.model import EmuEvalModel
    from emu_tpu.models import emu1

    root = tmp_path
    os.makedirs(root / "coco/annotations")
    os.makedirs(root / "coco/images")
    samples = []
    for i in range(2):
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.new("RGB", (32, 32), (i * 40, 10, 10)).save(
            root / "coco/images" / name)
        samples.append({"image": name, "caption": ["a test image"]})
    with open(root / "coco/annotations/coco_karpathy_test.json", "w") as f:
        json.dump(samples, f)

    import dataclasses
    base_cfg = Emu1Config.tiny()
    # eval prompts hardcode 32 <image> placeholders and [USER]/[ASSISTANT]
    cfg = Emu1Config(
        vision=base_cfg.vision,
        llama=dataclasses.replace(base_cfg.llama, extended_vocab_size=262),
        t5=base_cfg.t5, n_causal=32, instruct=True)
    params = emu1.init(jax.random.PRNGKey(0), cfg)
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu1_special_tokens(True),
                         base_vocab=cfg.llama.vocab_size)
    model = EmuEvalModel(params, cfg, tok)
    metric = evaluate_engine(model, EvalArguments(
        output_path=str(tmp_path / "out"), dataset_name="coco",
        batch_size=2, root_path=str(root)))
    assert metric["n"] == 2
    out = json.load(open(tmp_path / "out" / "coco_answer.json"))
    assert len(out) == 2 and all("caption" in r for r in out)


def test_mmbench_end_to_end_synthetic(tmp_path):
    """The dataset the reference imports but never shipped — ours works."""
    import base64
    import io
    import pandas as pd
    from PIL import Image
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu1Config
    from emu_tpu.mm_eval.engine import EvalArguments, evaluate_engine
    from emu_tpu.mm_eval.model import EmuEvalModel
    from emu_tpu.models import emu1
    import dataclasses

    os.makedirs(tmp_path / "mmbench")
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (120, 10, 10)).save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    pd.DataFrame([
        {"index": 1, "image": b64, "question": "what color?",
         "hint": None, "A": "red", "B": "blue", "C": "green", "D": "dog"},
        {"index": 2, "image": b64, "question": "what is it?",
         "hint": "a hint", "A": "square", "B": "circle", "C": "line",
         "D": "dot"},
    ]).to_csv(tmp_path / "mmbench/mmbench_dev.tsv", sep="\t", index=False)

    base_cfg = Emu1Config.tiny()
    cfg = Emu1Config(
        vision=base_cfg.vision,
        llama=dataclasses.replace(base_cfg.llama, extended_vocab_size=262),
        t5=base_cfg.t5, n_causal=32, instruct=True)
    params = emu1.init(jax.random.PRNGKey(0), cfg)
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu1_special_tokens(True),
                         base_vocab=cfg.llama.vocab_size)
    model = EmuEvalModel(params, cfg, tok)
    metric = evaluate_engine(model, EvalArguments(
        output_path=str(tmp_path / "out"), dataset_name="mmbench",
        batch_size=2, root_path=str(tmp_path)))
    assert metric["n"] == 2
    out = json.load(open(tmp_path / "out" / "mmbench_answer.json"))
    assert all(r["prediction"] in "ABCD" for r in out)
