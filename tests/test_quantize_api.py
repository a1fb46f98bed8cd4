"""Product-surface quantization (VERDICT r2 item 4).

The reference serves 4-bit from a backend flag
(Emu2/demo/backend/hf_model/emu/chat.py:59-67); here the equivalent is
`quantize=` on the pipelines and `--quantize` on `python -m
emu_tpu.serving`. These tests pin that the flag produces exactly the
hand-quantized engine configuration (token-identical generations).
"""

import io
import json
import threading
import urllib.request
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emu_tpu import tokenization as T
from emu_tpu.config import Emu2Config
from emu_tpu.models import emu2


def _tiny_tok(cfg):
    return T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                          T.emu2_special_tokens(),
                          base_vocab=cfg.llama.vocab_size)


def _tree_keys(t, out=None):
    out = set() if out is None else out
    if isinstance(t, dict):
        for k, v in t.items():
            out.add(k)
            _tree_keys(v, out)
    elif isinstance(t, list):
        for v in t:
            _tree_keys(v, out)
    return out


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    return cfg, params, _tiny_tok(cfg)


def test_quantize_int8_token_matches_hand_quantized_engine(tiny_setup):
    from emu_tpu.models import llama
    from emu_tpu.ops.quant import quantize_model_params
    from emu_tpu.pipelines.chat import EmuChatGeneration
    cfg, params, tok = tiny_setup

    api = EmuChatGeneration(params, cfg, tok, quantize="int8")
    hand_params = quantize_model_params(
        dict(params, decoder=llama.fuse_projections(params["decoder"])),
        "int8")
    hand = EmuChatGeneration(hand_params, cfg, tok, fuse=False)

    prompt = [["describe the scene"]]
    kw = dict(num_beams=1, max_new_tokens=8, skip_special_tokens=False)
    assert api.generate_batch(prompt, **kw) == hand.generate_batch(prompt,
                                                                   **kw)
    keys = _tree_keys(api.params)
    assert "kernel_q8" in keys        # decoder weight-only int8
    assert "kernel_w8a8" in keys      # vision tower W8A8


def test_quantize_int4_s4_persistent_on_cpu(tiny_setup):
    """int4-s4 materializes persistent native-s4 buffers at load (CPU
    backend supports s4 across jit boundaries) and still generates."""
    from emu_tpu.pipelines.chat import EmuChatGeneration
    cfg, params, tok = tiny_setup
    pipe = EmuChatGeneration(params, cfg, tok, quantize="int4-s4")
    keys = _tree_keys(pipe.params)
    assert "kernel_s4" in keys and "kernel_q4" not in keys
    out = pipe(["hello"], num_beams=1, max_new_tokens=4)
    assert isinstance(out, str)

    # int4 (packed) generates the same tokens as int4-s4 (exact unpack)
    packed = EmuChatGeneration(params, cfg, tok, quantize="int4")
    pkeys = _tree_keys(packed.params)
    assert "kernel_q4" in pkeys and "kernel_s4" not in pkeys
    kw = dict(num_beams=1, max_new_tokens=6, skip_special_tokens=False)
    assert (packed.generate_batch([["hello"]], **kw)
            == pipe.generate_batch([["hello"]], **kw))


def test_quantize_int4_s4mlp_partial_materialization(tiny_setup):
    """int4-s4mlp materializes ONLY the mlp planes (the measured-best
    b32-serving recipe: s4 streaming for ~2/3 of weight bytes without
    doubling attention-weight residency) and token-matches full s4."""
    from emu_tpu.pipelines.chat import EmuChatGeneration
    cfg, params, tok = tiny_setup
    pipe = EmuChatGeneration(params, cfg, tok, quantize="int4-s4mlp")
    dec = pipe.params["decoder"]["layers"]
    assert "kernel_s4" in _tree_keys(dec["mlp"])
    assert "kernel_q4" not in _tree_keys(dec["mlp"])
    assert "kernel_q4" in _tree_keys(dec["self_attn"])
    assert "kernel_s4" not in _tree_keys(dec["self_attn"])
    full = EmuChatGeneration(params, cfg, tok, quantize="int4-s4")
    kw = dict(num_beams=1, max_new_tokens=6, skip_special_tokens=False)
    assert (pipe.generate_batch([["hello"]], **kw)
            == full.generate_batch([["hello"]], **kw))


def test_visual_generation_quantize_smoke():
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration
    pipe = EmuVisualGeneration.from_config(tiny=True, dtype=jnp.float32,
                                           quantize="int8")
    keys = _tree_keys(pipe.emu_params)
    assert "kernel_q8" in keys and "kernel_w8a8" in keys
    out = pipe("a cat", height=32, width=32, num_inference_steps=2)
    assert out.image.size == (32, 32)


def test_emu1_pipeline_quantize_smoke():
    from emu_tpu.pipelines.emu1_pipeline import EmuGenerationPipeline
    pipe = EmuGenerationPipeline.from_config(tiny=True, dtype=jnp.float32,
                                             quantize="int4")
    keys = _tree_keys(pipe.emu_params)
    assert "kernel_q4" in keys        # packed int4 (no s4 materialization)
    img, _ = pipe(["a dog"], height=32, width=32, num_inference_steps=2)
    assert img.size == (32, 32)


def test_quantize_rejects_unknown_mode(tiny_setup):
    from emu_tpu.ops.quant import quantize_model_params
    cfg, params, tok = tiny_setup
    with pytest.raises(ValueError, match="quantize mode"):
        quantize_model_params(params, "fp4")


def _multipart(fields):
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    for k, v in fields.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def test_serving_with_quantize_flag(tiny_setup):
    """≙ `python -m emu_tpu.serving --tiny --quantize int4`: a quantized
    chat pipeline behind the HTTP backend answers /v1/mmc."""
    from emu_tpu.pipelines.chat import EmuChatGeneration
    from emu_tpu.serving.backend import EmuHTTPServer, make_server
    from emu_tpu.serving.helper import Helper
    cfg, params, tok = tiny_setup
    chat = EmuChatGeneration(params, cfg, tok, quantize="int4")
    httpd = make_server(EmuHTTPServer(Helper(lambda i: chat, 1), None),
                        "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body, ctype = _multipart({
            "prompt": json.dumps([["TEXT", "hi there"]]),
            "num_beams": "1", "max_new_tokens": "4"})
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/mmc", data=body,
            headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert out["code"] == 0
    finally:
        httpd.shutdown()
