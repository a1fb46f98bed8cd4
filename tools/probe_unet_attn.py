"""A/B the UNet's attention + geglu shapes across backends on chip.

The r5 UNet parts probe attributed 95.4 of 133.4 ms/step to the
Transformer2D interior (attention 44.7, geglu-ff 50.8) against a
2479-GFLOP/18-ms-roofline step — ~13% of roofline. Suspects:
  - CROSS-attention (Skv = 64 conditioning tokens) routed to the flash
    kernel whenever Sq >= 512: bk pads 64 -> 1024 (16x wasted compute)
    and launches per-(batch, head) programs (~45 us each).
  - SELF-attention at S 1024/4096 choosing per-(b,h) flash over
    batched_mha / XLA at B=2.
This probe times each shape on xla vs flash vs batched_mha and the
geglu FF matmuls standalone, so the dispatcher can route by data.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_unet_attn.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timed(name, fn, *args, iters=200):
    f = jax.jit(lambda a0, *rest: jax.lax.fori_loop(
        0, iters, lambda i, acc: fn(acc, *rest) * jnp.bfloat16(0.5) + a0,
        a0))
    f(*args)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(f(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    us = best / iters * 1e6
    print(f"  {name:44s} {us:8.0f} us", flush=True)
    return us


def attn_shapes():
    from emu_tpu.ops.attention import dot_product_attention
    from emu_tpu.ops.flash_attention import batched_mha, mha_fits

    for (b, s, skv, h, d, tag) in [
        (2, 1024, 1024, 20, 64, "self 32^2 H20"),
        (2, 4096, 4096, 10, 64, "self 64^2 H10"),
        (2, 1024, 64, 20, 64, "cross 32^2 Skv64"),
        (2, 4096, 64, 10, 64, "cross 64^2 Skv64"),
    ]:
        q = jnp.ones((b, s, h, d), jnp.bfloat16)
        k = jnp.ones((b, skv, h, d), jnp.bfloat16)
        v = jnp.ones((b, skv, h, d), jnp.bfloat16)
        print(f"{tag}  (mha_fits={mha_fits(s, d, 2)})", flush=True)

        def xla(acc, k, v):
            lg = jnp.einsum("bqhd,bkhd->bhqk", acc, k) * (d ** -0.5)
            w = jax.nn.softmax(lg, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v)

        timed("xla einsum", xla, q, k, v)
        import os
        timed("dispatcher (current routing)",
              lambda acc, k, v: dot_product_attention(
                  acc, k, v, scale=d ** -0.5), q, k, v)
        if s == skv and mha_fits(s, d, 2):
            timed("batched_mha (forced)",
                  lambda acc, k, v: batched_mha(acc, k, v, scale=d ** -0.5),
                  q, k, v)


def geglu_shapes():
    from emu_tpu.ops import layers as L
    for (b, s, c, tag) in [(2, 1024, 1280, "32^2 ff"),
                           (2, 4096, 640, "64^2 ff")]:
        x = jnp.ones((b, s, c), jnp.bfloat16)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        p1 = L.dense_init(k1, c, 8 * c, dtype=jnp.bfloat16)
        p2 = L.dense_init(k2, 4 * c, c, dtype=jnp.bfloat16)
        gflop = 2 * b * s * (c * 8 * c + 4 * c * c) / 1e9

        def ff(acc, p1, p2):
            h = L.dense(p1, acc)
            h, gate = jnp.split(h, 2, axis=-1)
            return L.dense(p2, h * jax.nn.gelu(gate))

        us = timed(f"geglu {tag} ({gflop:.1f} GFLOP)", ff, x, p1, p2)
        print(f"    -> {gflop / us * 1e6 / 1e3:.0f} TFLOP/s effective",
              flush=True)


if __name__ == "__main__":
    from bench import chip_health_tflops
    print(f"chip: {chip_health_tflops():.0f} TFLOP/s", flush=True)
    attn_shapes()
    geglu_shapes()
