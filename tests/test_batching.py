"""Dynamic batching: concurrent same-kwargs requests coalesce into one
batched TPU call; mixed kwargs stay separate; results map back in order."""

import threading

import numpy as np
import pytest
import jax

from emu_tpu import tokenization as T
from emu_tpu.config import Emu2Config
from emu_tpu.models import emu2
from emu_tpu.pipelines.chat import EmuChatGeneration
from emu_tpu.serving.batching import BatchingChatHelper


@pytest.fixture(scope="module")
def pipe():
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(0), cfg)
    tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                         T.emu2_special_tokens(),
                         base_vocab=cfg.llama.vocab_size)
    return EmuChatGeneration(params, cfg, tok)


def test_batched_equals_sequential(pipe):
    prompts = [["tell me about cats"], ["a different prompt"],
               ["third question here"]]
    seq = [pipe(p, num_beams=1, max_new_tokens=4) for p in prompts]
    batched = pipe.generate_batch(prompts, num_beams=1, max_new_tokens=4)
    assert batched == seq


def test_concurrent_requests_coalesce(pipe):
    helper = BatchingChatHelper(pipe, max_batch=4, max_wait_ms=300)
    # warm the [4, S] batch shape so the timed window isn't compile-bound
    pipe.generate_batch([["w1"], ["w2"], ["w3"], ["w4"]], num_beams=1,
                        max_new_tokens=3)

    results = {}

    def worker(i):
        proxy = helper.get()
        results[i] = proxy([f"prompt number {i}"], num_beams=1,
                           max_new_tokens=3)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    assert max(helper.batch_sizes) >= 2          # requests were coalesced
    # order integrity: each result equals its own sequential output
    for i in range(4):
        ref = pipe([f"prompt number {i}"], num_beams=1, max_new_tokens=3)
        assert results[i] == ref
    helper.shutdown()


def test_mixed_kwargs_not_merged(pipe):
    helper = BatchingChatHelper(pipe, max_batch=4, max_wait_ms=100)

    results = {}

    def worker(i, beams):
        proxy = helper.get()
        results[(i, beams)] = proxy([f"q {i}"], num_beams=beams,
                                    max_new_tokens=3)

    threads = [threading.Thread(target=worker, args=(0, 1)),
               threading.Thread(target=worker, args=(1, 2))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 2
    helper.shutdown()
