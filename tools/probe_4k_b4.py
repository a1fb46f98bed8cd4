"""Bisect the int4 4k-ctx batch-4 compile crash (VERDICT r2 item 9).

FINDINGS (measured r3, chip at 158 TFLOP/s): the crash is HBM
exhaustion surfacing as a helper-subprocess death, not a program-size
limit — b4 full-depth compiles at prompt 3520/3776/3904 (26.1/24.8/
23.9 tok/s) and crashes at 4032 (int8 KV 6.45→6.66 GB next to 6.7 GB
weights + ~3 GB while-loop overhead ≈ 16 GB); the same 4032 shape at
depth 8 (1/5 the weights+KV) compiles fine (123.8 tok/s), and a
deliberately over-HBM b4-4032 bf16-KV program (13.4 GB KV alone)
crashes the helper the same way (HTTP 500, subprocess exit 1) instead
of returning RESOURCE_EXHAUSTED. Mitigation: the bench lane runs b2.

Run on TPU: python tools/probe_4k_b4.py [--fast]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def try_shape(batch, prompt, layers, params):
    try:
        dt = bench._llama_decode_time(batch, layers, prompt, 32, "int4",
                                      None, True, params)
        print(f"b{batch} prompt={prompt} layers={layers}: OK "
              f"({32 * batch / dt:.1f} tok/s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"b{batch} prompt={prompt} layers={layers}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return False


def main():
    fast = "--fast" in sys.argv
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s")
    p4 = bench.init_llama_quant_full(bench._llama_13b_cfg(40), "int4")
    # map the prompt boundary at b4 full depth
    for prompt in ([3520, 3776, 4032] if not fast else [4032]):
        if try_shape(4, prompt, 40, p4):
            continue
        break
    # same 4k shape, reduced depth (same per-step HLO, fewer scan layers
    # & less live memory): distinguishes compiler program-size limits
    # from memory-planning failures
    del p4
    try_shape(4, 4032, 8, None)


if __name__ == "__main__":
    main()
