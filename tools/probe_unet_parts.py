"""SDXL UNet parts probe at 128² latents (VERDICT r4 item 8).

Attributes the 7.55 steps/s lane to buckets — Transformer2D interior
(attention + GEGLU FF), GroupNorm chains, conv/resnet remainder — by
timing the CFG step under shape-safe identity patches, with
jax.clear_caches() before every variant (the ADVICE r4 jit-cache lesson)
and a baseline re-time at the end to bound chip drift. Also prints the
compiled FLOP / bytes-accessed estimates (XLA cost analysis) and the
resulting MXU/HBM roofline for the full step, so "conv/HBM-bound" is a
number, not a claim.

Numerically WRONG under the patches — timing only.

Usage (chip otherwise idle):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_unet_parts.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import _time_call, chip_health_tflops  # noqa: E402

K = 5
SIZE = 128
HBM_GBPS = 819.0          # v5e nameplate HBM bandwidth


def build():
    from emu_tpu.config import UNetConfig
    from emu_tpu.diffusion import unet
    cfg = UNetConfig.emu2_sdxl()
    params = unet.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 4),
                            jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 1792),
                            jnp.bfloat16)
    text_embeds = jnp.mean(ctx, axis=1)
    tids = jnp.tile(jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]]),
                    (2, 1))
    t = jnp.asarray([500.0, 500.0])

    def loop(p, x):
        def body(i, x):
            out = unet.forward(p, cfg, x, t, ctx,
                               added_text_embeds=text_embeds,
                               added_time_ids=tids)
            return out * 0.5 + x * 0.5
        return jax.lax.fori_loop(0, K, body, x)

    return loop, params, lat


def cost_analysis(loop, params, lat):
    try:
        c = jax.jit(loop).lower(params, lat).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = c.get("flops", 0.0) / K
        byts = c.get("bytes accessed", 0.0) / K
        return flops, byts
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}")
        return None, None


def main():
    tf = chip_health_tflops()
    print(f"sustained matmul: {tf:.0f} TFLOP/s")
    loop, params, lat = build()

    flops, byts = cost_analysis(loop, params, lat)
    if flops:
        t_mxu = flops / (tf * 1e12)
        t_hbm = (byts or 0) / (HBM_GBPS * 1e9)
        print(f"XLA cost est/step: {flops / 1e9:.0f} GFLOP, "
              f"{(byts or 0) / 1e9:.1f} GB accessed -> roofline "
              f"max(MXU {t_mxu * 1e3:.1f} ms, HBM {t_hbm * 1e3:.1f} ms) "
              f"= {max(t_mxu, t_hbm) * 1e3:.1f} ms/step "
              f"({1 / max(t_mxu, t_hbm):.1f} steps/s ideal)")

    import emu_tpu.diffusion.layers as D
    import emu_tpu.diffusion.unet as U

    results = {}

    def run(name):
        jax.clear_caches()
        dt = _time_call(jax.jit(loop), params, lat) / K
        results[name] = dt
        print(f"  {name:28s} {dt * 1e3:7.2f} ms/step "
              f"({1 / dt:5.2f} steps/s)", flush=True)

    print(f"== CFG step timing, {SIZE}^2 latents (min-of-3, {K} in-jit) ==")
    run("baseline")

    orig_tf2d = U._transformer2d
    U._transformer2d = lambda p, x, ctx, n_heads, cfg: x
    try:
        run("transformer2d=identity")
    finally:
        U._transformer2d = orig_tf2d

    orig_attn = D.attention
    D.attention = lambda p, x, ctx, n_heads: x
    try:
        run("attention=identity")
    finally:
        D.attention = orig_attn

    orig_gn = D.group_norm
    D.group_norm = lambda p, x, groups, eps: x
    try:
        run("groupnorm=identity")
    finally:
        D.group_norm = orig_gn

    run("baseline-recheck")

    base = min(results["baseline"], results["baseline-recheck"])
    drift = abs(results["baseline"] - results["baseline-recheck"]) / base
    print(f"  baseline drift: {drift * 100:.1f}%"
          + (" (HIGH — unreliable run)" if drift > 0.05 else ""))
    tf2d = base - results["transformer2d=identity"]
    attn = base - results["attention=identity"]
    gn = base - results["groupnorm=identity"]
    conv = results["transformer2d=identity"] - gn  # resnets keep their GNs
    print(f"buckets ms/step: transformer2d {tf2d * 1e3:.2f} "
          f"(attention {attn * 1e3:.2f}, geglu-ff ~{(tf2d - attn) * 1e3:.2f}), "
          f"groupnorm-all {gn * 1e3:.2f}, conv/resnet-remainder "
          f"~{conv * 1e3:.2f}")


if __name__ == "__main__":
    main()
