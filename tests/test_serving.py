"""Serving stack tests: real HTTP round trips against the stdlib server."""

import base64
import io
import json
import threading
import urllib.request
import uuid

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu import tokenization as T
from emu_tpu.config import Emu2Config
from emu_tpu.serving.backend import EmuHTTPServer, make_server
from emu_tpu.serving.helper import Helper


def _tiny_tok(cfg):
    return T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                          T.emu2_special_tokens(),
                          base_vocab=cfg.llama.vocab_size)


def _multipart(fields, files):
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    for k, v in fields.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{k}\"\r\n\r\n{v}\r\n".encode())
    for k, data in files.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{k}\"; filename=\"{k}.png\"\r\n"
                  f"Content-Type: image/png\r\n\r\n".encode())
        out.write(data)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


@pytest.fixture(scope="module")
def server_port():
    cfg = Emu2Config.tiny()
    tok = _tiny_tok(cfg)

    from emu_tpu.models import emu2
    from emu_tpu.pipelines.chat import EmuChatGeneration
    from emu_tpu.pipelines.visual_generation import EmuVisualGeneration
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    chat = EmuChatGeneration(params, cfg, tok)
    gen = EmuVisualGeneration.from_config(tiny=True, dtype=jnp.float32)
    gen.tokenizer = tok

    server = EmuHTTPServer(Helper(lambda i: chat, 1),
                           Helper(lambda i: gen, 1))
    httpd = make_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()


def _png_bytes():
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.full((24, 24, 3), 90, "uint8")).save(buf, "PNG")
    return buf.getvalue()


def _post(port, path, fields, files):
    body, ctype = _multipart(fields, files)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body,
        headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return json.loads(resp.read())


def test_mmc_chat_route(server_port):
    res = _post(server_port, "/v1/mmc",
                {"log_id": "t1",
                 "prompt": json.dumps([["IMAGE", "img0"],
                                       ["TEXT", "describe"]]),
                 "num_beams": "1", "max_new_tokens": "3"},
                {"img0": _png_bytes()})
    assert res["code"] == 0
    assert isinstance(res["data"], str)


def test_mmc_video_prompt(server_port):
    """["VIDEO", [frame keys]] decodes to the chat pipeline's video span
    ([VIDEO] frame1..frameN [/VIDEO] — pipelines/chat._prepare_inputs);
    the UI posts client-sampled filmstrip frames this way."""
    res = _post(server_port, "/v1/mmc",
                {"log_id": "tv",
                 "prompt": json.dumps([["VIDEO", ["vidf0", "vidf1"]],
                                       ["TEXT", "what happens"]]),
                 "num_beams": "1", "max_new_tokens": "3"},
                {"vidf0": _png_bytes(), "vidf1": _png_bytes()})
    assert res["code"] == 0
    assert isinstance(res["data"], str)


def test_frontend_filmstrip_stack():
    """DataMeta video items carry a stacked filmstrip preview (ref
    Emu2/demo/frontend/libs/meta.py:214-220)."""
    from PIL import Image
    from emu_tpu.serving.frontend import DataMeta, DataType
    frames = [Image.new("RGB", (32, 24), (i * 40, 0, 0)) for i in range(3)]
    meta = DataMeta.build(frames=frames, resize=False)
    assert meta.datatype == DataType.VIDEO
    assert meta.stack_frame.size == (96, 24)
    # frame i occupies columns [32i, 32(i+1))
    assert meta.stack_frame.getpixel((33, 5)) == (40, 0, 0)
    assert meta.stack_frame.getpixel((70, 5)) == (80, 0, 0)


def test_mmg_generation_route(server_port):
    res = _post(server_port, "/v1/mmg",
                {"log_id": "t2",
                 "prompt": json.dumps([["TEXT", "a cat"]]),
                 "classifier_free_guidance": "2.0", "steps": "2",
                 "height": "32", "width": "32"},
                {})
    assert res["code"] == 0
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(res["data"])))
    assert img.format == "WEBP"


def test_mmg_cache_interval_field(server_port):
    """UNet block caching reachable over the wire: cache_interval=2
    drives the grouped denoise loop and still returns a WEBP."""
    res = _post(server_port, "/v1/mmg",
                {"log_id": "t2c",
                 "prompt": json.dumps([["TEXT", "a cat"]]),
                 "classifier_free_guidance": "2.0", "steps": "3",
                 "height": "32", "width": "32", "cache_interval": "2"},
                {})
    assert res["code"] == 0
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(res["data"])))
    assert img.size == (32, 32)


def test_unknown_route_404(server_port):
    body, ctype = _multipart({"prompt": "[]"}, {})
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/v1/nope", data=body,
        headers={"Content-Type": ctype})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_bad_image_returns_error_code(server_port):
    res = _post(server_port, "/v1/mmc",
                {"log_id": "t3",
                 "prompt": json.dumps([["IMAGE", "img0"],
                                       ["TEXT", "hi"]]),
                 "num_beams": "1", "max_new_tokens": "2"},
                {"img0": b"not an image"})
    assert res["code"] == -1


def test_frontend_page_drives_both_routes(server_port):
    """Drive the built-in HTML frontend at the HTTP level (no browser in
    this image): fetch GET /, extract the exact form-field contract from
    the page's JavaScript, and replay the multipart turns the page would
    post — asserting the replies the page would render into #chatlog and
    #genout. Breaks if the page's JS and the backend drift apart.
    Ref behavior: Emu2/demo/frontend/frontend.py:35-80."""
    import re

    with urllib.request.urlopen(
            f"http://127.0.0.1:{server_port}/", timeout=60) as resp:
        assert resp.headers["Content-Type"].startswith("text/html")
        html = resp.read().decode()
    for el in ("chatlog", "chattext", "chatimg", "beams", "maxnew",
               "gentext", "cfg", "steps", "genh", "genw", "genout"):
        assert f'id="{el}"' in html, f"missing UI element #{el}"
    assert '"/v1/mmc"' in html and '"/v1/mmg"' in html

    # field names the page's JS appends to its FormData
    appended = set(re.findall(r'fd\.append\("(\w+)"', html))
    assert {"prompt", "log_id", "img0"} <= appended
    for key in ("num_beams", "max_new_tokens", "classifier_free_guidance",
                "steps", "height", "width"):
        assert key in html, f"page never sends {key}"

    # the chat turn the page builds for image+text input
    res = _post(server_port, "/v1/mmc",
                {"log_id": "ui-chat",
                 "prompt": json.dumps([["IMAGE", "img0"],
                                       ["TEXT", "what is shown here"]]),
                 "num_beams": "1", "max_new_tokens": "3"},
                {"img0": _png_bytes()})
    assert res["code"] == 0 and isinstance(res["data"], str)

    # the generation turn (page sets #genout.src to data:image/webp;base64,)
    res = _post(server_port, "/v1/mmg",
                {"log_id": "ui-gen",
                 "prompt": json.dumps([["TEXT", "a sunset"]]),
                 "classifier_free_guidance": "2.0", "steps": "2",
                 "height": "32", "width": "32"},
                {})
    assert res["code"] == 0
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(res["data"])))
    assert img.format == "WEBP"


# -- continuous-batching backend ---------------------------------------------


@pytest.fixture(scope="module")
def continuous_port():
    """Chat route backed by the slot-level ContinuousEngine, with the
    speculative side path armed (1-layer demo draft)."""
    import dataclasses

    cfg = Emu2Config.tiny()
    tok = _tiny_tok(cfg)

    from emu_tpu.models import emu2, llama
    from emu_tpu.pipelines.chat import EmuChatGeneration
    from emu_tpu.serving.continuous_helper import ContinuousChatHelper
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    chat = EmuChatGeneration(params, cfg, tok)
    dcfg = dataclasses.replace(cfg.llama, num_hidden_layers=1)
    draft = (llama.init(jax.random.PRNGKey(7), dcfg), dcfg)
    helper = ContinuousChatHelper(chat, max_slots=4, max_len=256,
                                  draft=draft, per_request_sampling=True)

    server = EmuHTTPServer(helper, None)
    httpd = make_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    helper.shutdown()


def test_continuous_no_head_of_line_blocking(continuous_port):
    """Overlapping requests of very different lengths: the short request
    posted AFTER a long one must complete BEFORE it — only possible if
    they share the decode loop (slot admission mid-flight), i.e. no
    head-of-line blocking over real HTTP."""
    import time

    done = {}

    def post(tag, text, max_new, delay=0.0):
        time.sleep(delay)
        res = _post(continuous_port, "/v1/mmc",
                    {"log_id": tag,
                     "prompt": json.dumps([["TEXT", text]]),
                     "max_new_tokens": str(max_new)},
                    {})
        done[tag] = (time.monotonic(), res)

    # warm the engine's prefill/decode jits so timing reflects steady state
    post("warm", "warm up the engine", 2)

    threads = [
        threading.Thread(target=post,
                         args=("long", "a very long story", 200)),
        threading.Thread(target=post,
                         args=("short", "quick question", 3, 0.05)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert done["long"][1]["code"] == 0
    assert done["short"][1]["code"] == 0
    assert done["short"][0] < done["long"][0], (
        "short request finished after the long one — head-of-line blocked")


def test_continuous_speculative_matches_engine_greedy(continuous_port):
    """speculative=true routes a text-only prompt through draft/verify;
    greedy acceptance guarantees the same text as the engine's stream."""
    fields = {"prompt": json.dumps([["TEXT", "tell me about emus"]]),
              "max_new_tokens": "6"}
    plain = _post(continuous_port, "/v1/mmc",
                  {**fields, "log_id": "plain"}, {})
    spec = _post(continuous_port, "/v1/mmc",
                 {**fields, "log_id": "spec", "speculative": "true"}, {})
    assert plain["code"] == 0 and spec["code"] == 0
    assert spec["data"] == plain["data"]


def test_continuous_speculative_image_falls_back(continuous_port):
    """Prompts with images can't take the text-only speculative path;
    they fall back to the slot engine and still succeed."""
    res = _post(continuous_port, "/v1/mmc",
                {"log_id": "spec-img", "speculative": "true",
                 "prompt": json.dumps([["IMAGE", "img0"],
                                       ["TEXT", "describe"]]),
                 "max_new_tokens": "3"},
                {"img0": _png_bytes()})
    assert res["code"] == 0
    assert isinstance(res["data"], str)


def test_continuous_per_request_sampling(continuous_port):
    """do_sample=true applies this request's temperature to its own slot
    only: the sampled request succeeds, and a concurrent greedy request
    still returns the engine's exact greedy text (per-row temperature
    plane, not pool-global)."""
    fields = {"prompt": json.dumps([["TEXT", "tell me about emus"]]),
              "max_new_tokens": "6"}
    greedy_before = _post(continuous_port, "/v1/mmc",
                          {**fields, "log_id": "g0"}, {})
    sampled = _post(continuous_port, "/v1/mmc",
                    {**fields, "log_id": "s0", "do_sample": "true",
                     "temperature": "1.5"}, {})
    greedy_after = _post(continuous_port, "/v1/mmc",
                         {**fields, "log_id": "g1"}, {})
    assert greedy_before["code"] == sampled["code"] == 0
    assert greedy_after["code"] == 0
    assert isinstance(sampled["data"], str)
    assert greedy_after["data"] == greedy_before["data"]
