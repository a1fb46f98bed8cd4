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
    """Default lanes bisect the full-s4 b32 crash along the MEMORY axis
    (VERDICT r4 item 6): full s4 doubles weight residency to 13.4 GB, so
    if the crash is HBM exhaustion (the 4k-b4 root-cause class —
    tools/probe_4k_b4.py: the remote compile helper dies with HTTP 500
    instead of a clean RESOURCE_EXHAUSTED), shrinking ONLY the KV cache
    (batch or context) should flip it to compiling:

      1@p16   full s4, b32, prompt 16 / 16 new  (KV 0.5 GB vs 2.6)
      1@b16   full s4, b16, standard prompt     (KV 1.3 GB)
      1       full s4, b32, standard prompt     (the crashing shape)

    A compile success at 1@p16 with the same weights/program structure
    pins the root cause on memory, not a compiler shape limit."""
    modes = sys.argv[1:] or ["1@p16", "1@b16", "1", "mlp"]
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s")
    p4 = bench.init_llama_quant_full(bench._llama_13b_cfg(40), "int4")
    for mode in modes:
        batch, prompt, new = 32, 128, 64
        s4 = mode
        if "@" in mode:
            s4, shape = mode.split("@")
            if shape == "p16":
                prompt, new = 16, 16
            elif shape == "b16":
                batch = 16
        if s4 == "packed":
            os.environ.pop("EMU_TPU_DECODE_S4", None)
        else:
            os.environ["EMU_TPU_DECODE_S4"] = s4
        try:
            v = bench.bench_llama_decode(batch=batch, layers=40,
                                         quant="int4", prompt=prompt,
                                         new=new, kv_quant=True,
                                         params=p4)
            print(f"int4 {mode} (b{batch} p{prompt}+{new}): {v:.1f} tok/s"
                  "  (int8 b32 lane: 841)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"int4 {mode} (b{batch} p{prompt}+{new}) FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    os.environ.pop("EMU_TPU_DECODE_S4", None)


if __name__ == "__main__":
    main()
