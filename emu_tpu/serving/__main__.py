"""CLI: `python -m emu_tpu.serving --port 9002 [--tiny]`.

≙ `python backend.py` in the reference demo stack. --tiny serves
random-weight tiny pipelines (smoke/demo mode); real deployments pass
--chat_ckpt/--gen_ckpt safetensors/torch paths.
"""

import argparse
import logging

import jax.numpy as jnp

from emu_tpu.serving.backend import EmuHTTPServer, make_server
from emu_tpu.serving.helper import Helper
from emu_tpu.serving.logging_utils import config_logger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=9002)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--compile_cache", default=None,
                   help="persistent XLA compilation cache dir (first-start "
                        "compiles are reused across restarts)")
    p.add_argument("--warmup", action="store_true",
                   help="run one request per route before serving so no "
                        "client pays the jit compile")
    p.add_argument("--batching", action="store_true",
                   help="coalesce concurrent same-kwargs chat requests "
                        "into one padded TPU batch (max_batch 8, 30ms "
                        "window)")
    p.add_argument("--continuous", action="store_true",
                   help="slot-level continuous batching on the chat "
                        "route: requests share one decode loop, short "
                        "ones never queue behind long ones (greedy "
                        "decode)")
    p.add_argument("--speculative", action="store_true",
                   help="with --continuous: enable the per-request "
                        "speculative side path (form field "
                        "speculative=true; needs a draft model — --tiny "
                        "builds a 1-layer demo draft)")
    p.add_argument("--max_slots", type=int, default=8)
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--chunked_prefill", type=int, default=None,
                   metavar="N",
                   help="with --continuous: admit prompts longer than "
                        "the largest prefill bucket in N-token chunks "
                        "interleaved with decode (Sarathi-style; no "
                        "prefill stall). Keep N <= 32 for the Pallas "
                        "decode kernel.")
    p.add_argument("--quantize", default=None,
                   choices=["int8", "int4", "int4-s4", "int4-s4mlp"],
                   help="serving-grade weight quantization for the chat "
                        "and generation pipelines (decoder weight-only + "
                        "vision tower W8A8; ≙ the reference demo's 4-bit "
                        "flag)")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship raw uint8 images to the TPU and fuse "
                        "resize+normalize on device (host PIL bicubic "
                        "otherwise)")
    p.add_argument("--kv_quant", action="store_true",
                   help="with --continuous: int8 KV cache (2x context "
                        "capacity per chip)")
    p.add_argument("--sampling", action="store_true",
                   help="with --continuous: honor each request's "
                        "do_sample/temperature form fields (per-slot "
                        "temperature plane; greedy rows stay exact)")
    p.add_argument("--block_steps", type=int, default=8,
                   help="with --continuous: decode N steps per compiled "
                        "block with the host fetch double-buffered "
                        "against the next block (one dispatch + one "
                        "overlapped round-trip per N tokens); 1 = "
                        "per-step loop")
    p.add_argument("--tiny", action="store_true",
                   help="serve tiny random-weight pipelines")
    p.add_argument("--chat_ckpt", default=None)
    p.add_argument("--gen_ckpt", default=None)
    p.add_argument("--tokenizer_path", default=None)
    p.add_argument("--chat_concurrency", type=int, default=1)
    p.add_argument("--generate_concurrency", type=int, default=1)
    p.add_argument("--disable_chat", action="store_true")
    p.add_argument("--disable_generate", action="store_true")
    args = p.parse_args()

    config_logger(logging.getLogger("emu_tpu.serving"))
    if args.compile_cache:
        import jax
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    chat_helper = gen_helper = None
    if not args.disable_chat:
        from emu_tpu.pipelines.chat import EmuChatGeneration
        if args.tiny:
            from emu_tpu import tokenization as T
            from emu_tpu.config import Emu2Config
            from emu_tpu.models import emu2
            import jax
            cfg = Emu2Config.tiny()
            tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                                 T.emu2_special_tokens(),
                                 base_vocab=cfg.llama.vocab_size)
            pre = "device" if args.device_preprocess else "host"
            params = emu2.init(jax.random.PRNGKey(0), cfg)
            build = lambda i: EmuChatGeneration(params, cfg, tok,
                                                quantize=args.quantize,
                                                preprocess_mode=pre)
        else:
            build = lambda i: EmuChatGeneration.from_pretrained(
                args.chat_ckpt, instruct=True, dtype=jnp.bfloat16,
                quantize=args.quantize,
                preprocess_mode=("device" if args.device_preprocess
                                 else "host"))
        if args.continuous:
            from emu_tpu.serving.continuous_helper import \
                ContinuousChatHelper
            draft = None
            if args.speculative:
                if not args.tiny:
                    p.error("--speculative needs a draft model; only the "
                            "--tiny demo draft is bundled")
                import dataclasses
                import jax
                from emu_tpu.models import llama as _llama
                dcfg = dataclasses.replace(cfg.llama, num_hidden_layers=1)
                draft = (_llama.init(jax.random.PRNGKey(7), dcfg), dcfg)
            chat_helper = ContinuousChatHelper(
                build(0), max_slots=args.max_slots, max_len=args.max_len,
                draft=draft, kv_cache_quant=args.kv_quant,
                chunk_size=args.chunked_prefill,
                block_steps=args.block_steps,
                per_request_sampling=args.sampling)
        elif args.batching:
            from emu_tpu.serving.batching import BatchingChatHelper
            chat_helper = BatchingChatHelper(build(0))
        else:
            chat_helper = Helper(build, args.chat_concurrency)
    if not args.disable_generate:
        from emu_tpu.pipelines.visual_generation import EmuVisualGeneration
        if args.tiny:
            from emu_tpu import tokenization as T
            from emu_tpu.config import Emu2Config
            cfg = Emu2Config.tiny()
            tok = T.EmuTokenizer(T.SimpleTokenizer(cfg.llama.vocab_size),
                                 T.emu2_special_tokens(),
                                 base_vocab=cfg.llama.vocab_size)

            def build(i):
                pipe = EmuVisualGeneration.from_config(tiny=True,
                                                       dtype=jnp.float32)
                pipe.tokenizer = tok
                return pipe
        else:
            if not args.gen_ckpt:
                p.error("generation route needs --gen_ckpt (an Emu2-Gen "
                        "pipeline state dict, ref diffusion.py:250-267) "
                        "or --tiny / --disable_generate")
            build = lambda i: EmuVisualGeneration.from_pretrained(
                args.gen_ckpt, dtype=jnp.bfloat16)
        gen_helper = Helper(build, args.generate_concurrency)

    if args.warmup:
        import numpy as np
        from PIL import Image
        log = logging.getLogger("emu_tpu.serving")
        img = Image.fromarray(np.zeros((64, 64, 3), "uint8"))
        if chat_helper is not None:
            pipe = chat_helper.get()
            try:
                # image and text-only prompts trace different programs;
                # warm both
                pipe([img, "warmup"], num_beams=1, max_new_tokens=2)
                pipe(["warmup"], num_beams=1, max_new_tokens=2)
                log.info("chat route warmed")
            finally:
                chat_helper.put(pipe)
        if gen_helper is not None:
            pipe = gen_helper.get()
            try:
                kw = {"height": 32, "width": 32} if args.tiny else {}
                pipe("warmup", num_inference_steps=2, **kw)
                log.info("generation route warmed")
            finally:
                gen_helper.put(pipe)

    server = EmuHTTPServer(chat_helper, gen_helper)
    httpd = make_server(server, args.host, args.port)
    logging.getLogger("emu_tpu.serving").info(
        "serving on %s:%d", args.host, args.port)
    httpd.serve_forever()


if __name__ == "__main__":
    main()
