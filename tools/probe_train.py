"""Train-step probes (VERDICT r2 item 10): remat policy A/B at real 13B
layer dims, plus the depth-fit validation (full-remat 4/2-layer fit vs a
MEASURED 8-layer step). Run on TPU:
    python tools/probe_train.py [dots dots+attn valid]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    modes = sys.argv[1:] or ["dots", "dots+attn", "valid"]
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
    for mode in modes:
        try:
            if mode == "valid":
                err = bench.bench_train_fit_validation()
                print(f"depth-fit validation: {err:.1f}% error", flush=True)
            else:
                v = bench.bench_llama_train(remat=mode)
                # MFU: 6*P*tokens/s over 197 TF/s peak; P ~= 12*L*W^2
                # per-layer + embed/head — use the 13B known 6.74e9/layer
                # forward-param count via the bench's own print
                print(f"train remat={mode}: {v:.0f} tok/s/chip", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"train {mode} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
