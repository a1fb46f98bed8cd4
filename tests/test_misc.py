"""Odds and ends: mesh-sharded chat pipeline, device preprocess parity,
no-repeat-ngram processor."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_chat_pipeline_with_mesh():
    from PIL import Image
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu2Config
    from emu_tpu.models import emu2
    from emu_tpu.parallel import make_mesh
    from emu_tpu.pipelines.chat import EmuChatGeneration
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu2_special_tokens(),
                         base_vocab=cfg.llama.vocab_size)
    ref = EmuChatGeneration(params, cfg, tok)(
        ["hello world"], num_beams=2, max_new_tokens=4)
    sharded = EmuChatGeneration(params, cfg, tok, mesh=make_mesh((1, 8)))(
        ["hello world"], num_beams=2, max_new_tokens=4)
    assert sharded == ref


def test_device_preprocess_close_to_pil():
    from PIL import Image
    from emu_tpu.pipelines.preprocess import (device_preprocess,
                                              preprocess_image)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (64, 80, 3), np.uint8)
    host = preprocess_image(Image.fromarray(raw), 32)
    dev = np.asarray(device_preprocess(jnp.asarray(raw)[None], 32))[0]
    # different bicubic implementations: close but not bit-equal
    assert np.abs(host - dev).mean() < 0.15
    assert np.corrcoef(host.ravel(), dev.ravel())[0, 1] > 0.98


def test_no_repeat_ngram_blocks_repeat():
    from emu_tpu.generation import logits_process as lp
    # generated so far: [5, 6, 5] with cur_len=3, ngram=2:
    # suffix is [5]; window [5]->6 seen -> token 6 banned
    seqs = jnp.asarray([[5, 6, 5, 0, 0]])
    scores = jnp.zeros((1, 10))
    out = np.asarray(lp.no_repeat_ngram(scores, seqs, jnp.int32(3), 2))
    assert out[0, 6] < -1e20
    assert out[0, 7] == 0.0

    # cur_len below ngram size: nothing banned
    out2 = np.asarray(lp.no_repeat_ngram(scores, seqs, jnp.int32(1), 2))
    assert (out2 == 0).all()


def test_greedy_no_repeat_ngram_generation():
    from emu_tpu.config import LlamaConfig
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.models import llama
    cfg = LlamaConfig(hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = np.array([[5, 9, 3]], np.int32)
    emb = llama.embed(params, jnp.asarray(ids))
    out = llama_generate(params, cfg, emb, jnp.ones_like(ids),
                         GenerationConfig(max_new_tokens=12,
                                          no_repeat_ngram_size=2,
                                          pad_token_id=0))
    seq = np.asarray(out)[0].tolist()
    bigrams = [(seq[i], seq[i + 1]) for i in range(len(seq) - 1)
               if seq[i + 1] != 0]
    assert len(bigrams) == len(set(bigrams)), f"repeated bigram in {seq}"


def test_attentional_pooler_shapes():
    from emu_tpu.ops.pooler import attentional_pooler, attentional_pooler_init
    params = attentional_pooler_init(jax.random.PRNGKey(0), d_model=32,
                                     context_dim=48, n_head=4, n_queries=16)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 48))
    out = attentional_pooler(params, tokens, n_head=4)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_dropout_keeps_cls():
    from emu_tpu.ops.pooler import patch_dropout
    tokens = jnp.arange(2 * 11 * 3, dtype=jnp.float32).reshape(2, 11, 3)
    kept, idx = patch_dropout(jax.random.PRNGKey(0), tokens, prob=0.5)
    assert kept.shape[1] == 1 + 5                 # cls + 50% of 10
    np.testing.assert_array_equal(np.asarray(kept[:, 0]),
                                  np.asarray(tokens[:, 0]))
    assert (np.asarray(idx[:, 1:]) >= 1).all()


def test_scaled_cosine_attention_bounded():
    from emu_tpu.ops.pooler import scaled_cosine_attention
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 2, 8)) * 100
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 2, 8)) * 100
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 2, 8))
    out = scaled_cosine_attention(q, k, v, jnp.zeros(2))
    # cosine attention is scale-invariant in q/k magnitude
    out2 = scaled_cosine_attention(q * 0.01, k * 0.01, v, jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4,
                               atol=1e-5)


def test_emu2_chat_instruct_template_end_to_end():
    """Instruct-mode Emu2: role template + n_query=256-style config (tiny
    analogue with instruct specials in vocab)."""
    import dataclasses
    from PIL import Image
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu2Config
    from emu_tpu.models import emu2
    from emu_tpu.pipelines.chat import EmuChatGeneration
    base = Emu2Config.tiny()
    cfg = Emu2Config(
        vision=base.vision,
        llama=dataclasses.replace(base.llama, extended_vocab_size=530),
        n_query=4, v_query=4, instruct=True)
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu2_special_tokens(instruct=True),
                         base_vocab=cfg.llama.vocab_size)
    pipe = EmuChatGeneration(params, cfg, tok)
    img = Image.new("RGB", (56, 56), (50, 80, 20))
    # multi-turn chat with grounding
    out = pipe([[img, "where is the object?"]], is_grounding=True,
               num_beams=1, max_new_tokens=3)
    assert isinstance(out, str)
    # contrastive search path through the pipeline
    out2 = pipe([img, "describe"], penalty_alpha=0.5, top_k=3,
                max_new_tokens=3)
    assert isinstance(out2, str)


def test_rouge_l():
    from emu_tpu.mm_eval.metrics.caption import rouge_l
    res = {"1": "the cat sat on the mat"}
    refs = {"1": ["the cat sat on the mat"]}
    assert abs(rouge_l(res, refs) - 1.0) < 1e-6
    assert rouge_l({"1": "dog"}, {"1": ["entirely different words"]}) == 0.0
    partial = rouge_l({"1": "the cat on mat"}, refs)
    assert 0.4 < partial < 1.0


def test_from_emu1_json_real_reference_config():
    import os
    path = "/root/reference/Emu1/models/Emu-14B.json"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    from emu_tpu.config import Emu1Config
    cfg = Emu1Config.from_emu1_json(path)
    assert cfg.vision.width == 1408 and cfg.vision.layers == 40
    assert cfg.vision.head_width == 88 and cfg.vision.num_heads == 16
    assert abs(cfg.vision.mlp_ratio - 4.3637) < 1e-9
    assert cfg.vision.mlp_hidden == 6144
    assert cfg.n_causal == 32
    assert cfg.t5.encoder_width == 1408
    assert cfg.llama.hidden_size == 5120
    inst = Emu1Config.from_emu1_json(path, instruct=True)
    assert inst.llama.extended_vocab_size == 32006


def test_chat_pipeline_device_preprocess_mode():
    """preprocess_mode="device": host→device transfer is raw uint8; the
    fused resize+normalize runs on device (VERDICT r2 item 3/BASELINE
    north star). Mixed input resolutions batch per shape group."""
    from PIL import Image
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu2Config
    from emu_tpu.models import emu2
    from emu_tpu.pipelines.chat import EmuChatGeneration
    from emu_tpu.pipelines.preprocess import device_preprocess

    cfg = Emu2Config.tiny()
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu2_special_tokens(),
                         base_vocab=cfg.llama.vocab_size)
    params = emu2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    host_pipe = EmuChatGeneration(params, cfg, tok)
    dev_pipe = EmuChatGeneration(params, cfg, tok,
                                 preprocess_mode="device")

    rng = np.random.default_rng(1)
    im_a = Image.fromarray(rng.integers(0, 255, (40, 48, 3), np.uint8))
    im_b = Image.fromarray(rng.integers(0, 255, (56, 56, 3), np.uint8))

    # mechanism: the pipeline's batch equals device_preprocess exactly
    size = cfg.vision.image_size
    arrs = [np.asarray(im_a.convert("RGB"), np.uint8),
            np.asarray(im_b.convert("RGB"), np.uint8)]
    got = np.asarray(dev_pipe._image_batch(arrs))
    want = np.concatenate([
        np.asarray(device_preprocess(jnp.asarray(a)[None], size))
        for a in arrs])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # behavior: generates; pixels track the host path closely enough
    # that the visual embeds correlate (different bicubic kernels)
    out = dev_pipe([im_a, "what is this"], num_beams=1, max_new_tokens=3)
    assert isinstance(out, str)
    h = np.asarray(host_pipe._image_batch(
        [np.asarray(host_pipe._preprocess(im_a))]))
    d = np.asarray(dev_pipe._image_batch(
        [np.asarray(dev_pipe._preprocess(im_a))]))
    assert np.abs(h - d).mean() < 0.15


def test_chat_pipeline_casts_images_to_tower_dtype():
    """Host preprocessing yields fp32; a bf16 tower must see bf16 pixels
    or every ViT matmul silently promotes to fp32."""
    from emu_tpu import tokenization as T
    from emu_tpu.config import Emu2Config
    from emu_tpu.models import emu2
    from emu_tpu.pipelines.chat import EmuChatGeneration
    cfg = Emu2Config.tiny()
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu2_special_tokens(),
                         base_vocab=cfg.llama.vocab_size)
    params = emu2.init(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    pipe = EmuChatGeneration(params, cfg, tok)
    x = pipe._image_batch([np.zeros(
        (cfg.vision.image_size, cfg.vision.image_size, 3), np.float32)])
    assert x.dtype == jnp.bfloat16
