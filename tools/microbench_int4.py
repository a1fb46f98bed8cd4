"""Microbench: int4 weight GEMV strategies at 13B decode shapes.

Compares, at the decode hot shapes (x [B,1,m] bf16, W [m,n]):
  a) pallas W4A8 GEMV (ops/q4_matmul.q4_matmul) — current decode path
  b) XLA-native s4: W stored jnp.int4, dot on W.astype(bf16) (convert
     should fuse into the dot operand stream, never materializing bf16)
  c) XLA int8 weight-only (the 700 GB/s reference point)

Run on the TPU tunnel:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_int4.py
"""
import functools
import time

import jax
import jax.numpy as jnp

B, M, N = 8, 5120, 13824          # gate/up-ish decode GEMV
K = 500                           # chained invocations per fetch


def timeit(name, fn, *args, bytes_per_call):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))   # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:34s} {per*1e6:9.1f} us/call  "
          f"{bytes_per_call/per/1e9:7.1f} GB/s eff")


def loop(body):
    @jax.jit
    def f(x, *ws):
        def it(i, acc):
            y = body(acc, *ws)
            return (acc + (jnp.sum(y[..., :8].astype(jnp.float32))
                           * 1e-12).astype(acc.dtype))
        return jax.lax.fori_loop(0, K, it, x)
    return f


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, M), jnp.bfloat16)
    wf = jax.random.normal(key, (M, N), jnp.bfloat16)

    # c) int8 weight-only reference
    w8 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 10, -127, 127)
                   ).astype(jnp.int8)
    s8 = jnp.full((N,), 0.1, jnp.float32)

    def int8_mm(x, w8, s8):
        y = jax.lax.dot_general(
            x, w8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * s8).astype(jnp.bfloat16)

    timeit("XLA int8 weight-only", loop(int8_mm), x, w8, s8,
           bytes_per_call=M * N)

    # b) XLA-native s4 storage
    w4 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 3, -8, 7)
                   ).astype(jnp.int4)
    s4 = jnp.full((N,), 1 / 3, jnp.float32)

    def s4_mm(x, w4, s4):
        y = jax.lax.dot_general(
            x, w4.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * s4).astype(jnp.bfloat16)

    timeit("XLA s4 storage, bf16 dot", loop(s4_mm), x, w4, s4,
           bytes_per_call=M * N // 2)

    def s4_mm_i8(x, w4, s4):
        y = jax.lax.dot_general(
            x, w4.astype(jnp.int8), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * s4).astype(jnp.bfloat16)

    try:
        timeit("XLA s4 storage, int8 dot", loop(s4_mm_i8), x, w4, s4,
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4->int8 dot failed:", e)

    # a) pallas W4A8 GEMV (current path)
    from emu_tpu.ops.q4_matmul import matmul_q4
    from emu_tpu.ops.quant import quantize_kernel_int4
    p4 = jax.jit(quantize_kernel_int4)(wf)

    def pallas_mm(x, kq, sc):
        return matmul_q4(x, kq, sc)

    try:
        timeit("pallas W4A8 GEMV", loop(pallas_mm), x,
               p4["kernel_q4"], p4["scale4"],
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("pallas q4 failed:", e)


if __name__ == "__main__":
    main()
