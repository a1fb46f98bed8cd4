"""Train depth-knee attribution A/B (VERDICT r4 item 9).

BASELINE.md root cause: at quarter width (hidden 2560) the per-layer
marginal train-step cost is flat through L8 (~33 ms/layer) then jumps
~12% by L16 — resident HBM state (weights+grads+optimizer temporaries)
crossing a scheduling threshold. This probe A/Bs the OPTIMIZER's share
of that residency: fused_adafactor (bf16 factored accumulators) vs
plain SGD (zero optimizer state) at L2/4/8/16.

Reading: if the L8→16 marginal jump survives under SGD, optimizer
residency is NOT the knee's cause (refutation — the knee is
weights+grads scheduling) and shrinking accumulators further buys
nothing; if SGD is flat, adafactor residency is the lever.

Usage (chip otherwise idle):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_train_knee.py
"""

from __future__ import annotations

import sys

import jax

sys.path.insert(0, "/root/repo")

from bench import _llama_train_step_time, chip_health_tflops  # noqa: E402

K = 3
DEPTHS = (2, 4, 8, 16)


def main():
    print(f"sustained matmul: {chip_health_tflops():.0f} TFLOP/s")
    for opt in ("fused", "sgd"):
        meas = {}
        for ell in DEPTHS:
            jax.clear_caches()
            meas[ell] = _llama_train_step_time(
                8, 1024, ell, K, hidden=2560, inter=6912, heads=20,
                optimizer=opt)
            print(f"  {opt:6s} L{ell:2d}: {meas[ell] / K * 1e3:8.1f} "
                  f"ms/step", flush=True)
        margs = {f"L{a}->{b}": (meas[b] - meas[a]) / (b - a) / K * 1e3
                 for a, b in zip(DEPTHS, DEPTHS[1:])}
        knee = (margs["L8->16"] / margs["L4->8"] - 1) * 100
        print(f"  {opt:6s} marginals ms/layer: "
              + ", ".join(f"{p} {v:.1f}" for p, v in margs.items())
              + f"  -> L8->16 knee {knee:+.1f}% vs L4->8")


if __name__ == "__main__":
    main()
