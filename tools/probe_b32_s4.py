"""Probe: can the b32+int8KV serving lane use native-s4 now that the
unpack is lax.map-serialized (commit d5e9c39)? Round-2 state: XLA
materialized 2x1.32 GB pre-stack gate_up nibble planes at b32 and
overflowed HBM by 240 MB (fused fine at b8), so the 841 tok/s b32 lane
stayed int8. Run on TPU: python tools/probe_b32_s4.py [mlp|1|packed ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    modes = sys.argv[1:] or ["mlp", "1", "packed"]
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s")
    p4 = bench.init_llama_quant_full(bench._llama_13b_cfg(40), "int4")
    for mode in modes:
        if mode == "packed":
            os.environ.pop("EMU_TPU_DECODE_S4", None)
        else:
            os.environ["EMU_TPU_DECODE_S4"] = mode
        try:
            v = bench.bench_llama_decode(batch=32, layers=40, quant="int4",
                                         kv_quant=True, params=p4)
            print(f"b32 int4 {mode}: {v:.1f} tok/s  (int8 lane: 841)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"b32 int4 {mode} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    os.environ.pop("EMU_TPU_DECODE_S4", None)


if __name__ == "__main__":
    main()
