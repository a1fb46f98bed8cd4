"""Microbench: int4 weight GEMV strategies at 13B decode shapes.

Compares, at the decode hot shapes (x [B,m] bf16, W [m,n]):
  a) pallas W4A8 GEMV (ops/q4_matmul.matmul_q4) — current decode path
  b) XLA-native s4: W stored jnp.int4, convert-to-bf16 inside the loop
     (the tunnel backend cannot device_put s4 arrays — RecursionError —
     so the s4 weights are created inside the jitted program)
  c) XLA int8 weight-only (the current int8 decode reference point)

A hoisting caveat for (b): if XLA moved the s4->bf16 convert out of the
fori_loop it would time like a bf16 matmul (141 MB/call) — the printed
GB/s-eff assumes packed bytes, so a hoisted run shows up as ~2x the
int8 time, not as a win.

Run on the TPU tunnel:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_int4.py
"""
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
          f"{K*bytes_per_call/best/1e9:7.1f} GB/s eff", flush=True)


def chain(x, y):
    return x + (jnp.sum(y[..., :8].astype(jnp.float32))
                * 1e-12).astype(x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, M), jnp.bfloat16)
    wf = jax.random.normal(key, (M, N), jnp.bfloat16)

    # c) int8 weight-only reference
    w8 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 10, -127, 127)
                   ).astype(jnp.int8)
    s8 = jnp.full((N,), 0.1, jnp.float32)

    @jax.jit
    def int8_loop(x, w8, s8):
        def it(i, acc):
            y = jax.lax.dot_general(acc, w8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * s8).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    timeit("XLA int8 weight-only", int8_loop, x, w8, s8,
           bytes_per_call=M * N)

    # b) XLA-native s4 storage, conversion inside the loop body
    @jax.jit
    def s4_loop(x, wf, s8):
        w4 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 3, -8, 7)
                       ).astype(jnp.int4)

        def it(i, acc):
            y = jax.lax.dot_general(acc, w4.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * s8).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("XLA s4 storage, bf16 dot", s4_loop, x, wf, s8,
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 bf16 dot failed:", repr(e)[:200])

    @jax.jit
    def s4i8_loop(x, wf, s8):
        w4 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 3, -8, 7)
                       ).astype(jnp.int4)

        def it(i, acc):
            y = jax.lax.dot_general(acc, w4.astype(jnp.int8),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * s8).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("XLA s4 storage, int8 dot", s4i8_loop, x, wf, s8,
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 int8 dot failed:", repr(e)[:200])

    # d) grouped-scale s4: exact grouped-scale semantics via a
    # G-batched dot + scale-weighted sum over groups
    GS = 128
    G = M // GS

    @jax.jit
    def s4_grouped_loop(x, wf, sg):
        w4 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 3, -8, 7)
                       ).astype(jnp.int4).reshape(G, GS, N)

        def it(i, acc):
            xg = acc.reshape(B, G, GS).transpose(1, 0, 2)      # [G, B, GS]
            y = jax.lax.dot_general(
                xg, w4.astype(jnp.bfloat16),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)             # [G, B, N]
            y = jnp.sum(y * sg[:, None, :], axis=0)
            return chain(acc, y.astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    sg = jnp.full((G, N), 1 / 3, jnp.float32)
    try:
        timeit("XLA s4 grouped-scale (G-batched)", s4_grouped_loop, x, wf,
               sg, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 grouped failed:", repr(e)[:200])

    # e) factored scales: w ~ s4 * (t[g] * s[n]) -> scale x rows by t,
    # one plain dot, scale output by s
    @jax.jit
    def s4_factored_loop(x, wf, tg, sn):
        w4 = jnp.round(jnp.clip(wf.astype(jnp.float32) * 3, -8, 7)
                       ).astype(jnp.int4)

        def it(i, acc):
            xs = (acc.reshape(B, G, GS) * tg[:, None]).reshape(B, M)
            y = jax.lax.dot_general(xs.astype(jnp.bfloat16),
                                    w4.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * sn).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    tg = jnp.full((G,), 1.0, jnp.float32)
    try:
        timeit("XLA s4 factored scales", s4_factored_loop, x, wf, tg, s8,
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 factored failed:", repr(e)[:200])

    # g) TUNNEL-SAFE s4: weights stored as pair-packed int8 (rows 2k,
    # 2k+1 in low/high nibble of byte k), bitcast to s4 [K/2, N, 2]
    # inside the program, contraction over (K/2, pair) in one dot.
    # int8 storage crosses jit boundaries fine; the bitcast+convert
    # fuses into the dot operand stream.
    w8p = w8  # reuse as bit pattern; treat as pair-packed storage

    @jax.jit
    def s4_bitcast_loop(x, w8p, sn):
        w4 = jax.lax.bitcast_convert_type(w8p[: M // 2], jnp.int4)

        def it(i, acc):
            xr = acc.reshape(B, M // 2, 2)
            y = jax.lax.dot_general(xr, w4.astype(jnp.bfloat16),
                                    (((1, 2), (0, 2)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * sn).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 bitcast-from-i8, pair dot", s4_bitcast_loop, x, w8, s8,
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 bitcast failed:", repr(e)[:200])

    # h) tunnel-safe s4 with GROUPED scales: G-batched pair dot
    @jax.jit
    def s4_bitcast_grouped_loop(x, w8p, sg):
        wg = jax.lax.bitcast_convert_type(
            w8p[: M // 2].reshape(G, GS // 2, N), jnp.int4)

        def it(i, acc):
            xg = acc.reshape(B, G, GS // 2, 2).transpose(1, 0, 2, 3)
            y = jax.lax.dot_general(xg, wg.astype(jnp.bfloat16),
                                    (((2, 3), (1, 3)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            y = jnp.sum(y * sg[:, None, :], axis=0)
            return chain(acc, y.astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 bitcast grouped (G-batched)", s4_bitcast_grouped_loop,
               x, w8, sg, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 bitcast grouped failed:", repr(e)[:200])

    # i) COLUMN-pair packing: packed [K, N/2] int8, bitcast [K, N/2, 2];
    # the dot contracts only K (normal contraction), output reshapes
    # [B, N/2, 2] -> [B, N] for free (minor-most adjacent)
    @jax.jit
    def s4_colpack_loop(x, w8p, sn):
        w4 = jax.lax.bitcast_convert_type(w8p[:, : N // 2], jnp.int4)

        def it(i, acc):
            y = jax.lax.dot_general(acc, w4.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y.reshape(B, N)
            return chain(acc, (y * sn).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 col-pair bitcast, plain dot", s4_colpack_loop, x, w8,
               s8, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 col-pair failed:", repr(e)[:200])

    @jax.jit
    def s4_colpack_grouped_loop(x, w8p, sg):
        w4 = jax.lax.bitcast_convert_type(
            w8p[:, : N // 2], jnp.int4).reshape(G, GS, N // 2, 2)

        def it(i, acc):
            xg = acc.reshape(B, G, GS).transpose(1, 0, 2)
            y = jax.lax.dot_general(xg, w4.astype(jnp.bfloat16),
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            y = jnp.sum(y.reshape(G, B, N) * sg[:, None, :], axis=0)
            return chain(acc, y.astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 col-pair grouped (G-batched)", s4_colpack_grouped_loop,
               x, w8, sg, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 col-pair grouped failed:", repr(e)[:200])

    # j) col-pair packed int8 storage (tunnel-safe), bitcast -> s4 and
    # MATERIALIZED once before the loop via optimization_barrier — the
    # barrier is the whole trick: without it XLA fuses the bitcast into
    # every dot's operand stream (variants g-i, ~240 GB/s); with it the
    # loop reads a plain s4 buffer like variant (b) (~400 GB/s).
    # bitcast [M, N/2] i8 -> [M, N/2, 2] s4 -> reshape [M, N] is free
    # (low nibble = even column: minor-most adjacency).
    @jax.jit
    def s4_barrier_loop(x, w8p, sn):
        w4 = jax.lax.bitcast_convert_type(
            w8p[:, : N // 2], jnp.int4).reshape(M, N)
        w4 = jax.lax.optimization_barrier(w4)

        def it(i, acc):
            y = jax.lax.dot_general(acc, w4.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return chain(acc, (y * sn).astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 BARRIER col-pair, plain dot", s4_barrier_loop, x, w8,
               s8, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 barrier failed:", repr(e)[:200])

    # k) barrier-materialized s4 with GROUPED scales (the production
    # int4 layout: per-(K-group, column) scales) via G-batched dot
    @jax.jit
    def s4_barrier_grouped_loop(x, w8p, sg):
        w4 = jax.lax.bitcast_convert_type(
            w8p[:, : N // 2], jnp.int4).reshape(M, N)
        w4 = jax.lax.optimization_barrier(w4).reshape(G, GS, N)

        def it(i, acc):
            xg = acc.reshape(B, G, GS).transpose(1, 0, 2)
            y = jax.lax.dot_general(xg, w4.astype(jnp.bfloat16),
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            y = jnp.sum(y * sg[:, None, :], axis=0)
            return chain(acc, y.astype(jnp.bfloat16))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("s4 BARRIER grouped (G-batched)", s4_barrier_grouped_loop,
               x, w8, sg, bytes_per_call=M * N // 2)
    except Exception as e:
        print("s4 barrier grouped failed:", repr(e)[:200])

    # f) jit-boundary: can a jit-produced s4 array feed another jit on
    # this backend? (eager device_put of s4 hits a RecursionError)
    try:
        w4dev = jax.jit(
            lambda w: jnp.round(jnp.clip(w.astype(jnp.float32) * 3, -8, 7)
                                ).astype(jnp.int4))(wf)

        @jax.jit
        def consume(x, w4):
            return jax.lax.dot_general(x, w4.astype(jnp.bfloat16),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        float(jnp.sum(consume(x, w4dev)))
        print("s4 jit-boundary: OK (jit-produced s4 feeds another jit)")
    except Exception as e:
        print("s4 jit-boundary FAILED:", repr(e)[:200])

    # a) pallas W4A8 GEMV (current path)
    from emu_tpu.ops.q4_matmul import matmul_q4
    from emu_tpu.ops.quant import quantize_kernel_int4
    p4 = jax.jit(quantize_kernel_int4)(wf)

    @jax.jit
    def pallas_loop(x, kq, sc):
        def it(i, acc):
            return chain(acc, matmul_q4(acc, kq, sc))
        return jax.lax.fori_loop(0, K, it, x)

    try:
        timeit("pallas W4A8 GEMV", pallas_loop, x,
               p4["kernel_q4"], p4["scale4"],
               bytes_per_call=M * N // 2)
    except Exception as e:
        print("pallas q4 failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
