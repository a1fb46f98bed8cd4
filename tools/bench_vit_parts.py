"""Per-component microbench of the ViT-g layer on real TPU.

Times each piece of the fused block path in isolation (K in-jit iterations,
min-of-3, one scalar fetch — see bench.py timing notes) and prints
us/layer-equivalent next to the matmul-roofline ideal at the probed
sustained TFLOP/s. Run: python tools/bench_vit_parts.py
"""

import time

import jax
import jax.numpy as jnp


import sys

if "--model" in sys.argv and sys.argv[sys.argv.index("--model") + 1] == "4b":
    # EVA-CLIP-4B (Emu2): 448px → 1025 tokens, width 1792, head_dim 112,
    # mlp_hidden 15360 (ratio 60/7). Production fused-MLP tier for
    # dim 1792 is (bm 256, bf 512) — ops/layers._fused_mlp_bf.
    B, S, W, HID, H, D = 8, 1025, 1792, 15360, 16, 112
    # bn must tile 3*H*D = 5376 = 384 * 14 (512 does not divide it)
    BM, BF, BN = 256, 512, 384
    K_ITERS = 100
    LAYERS = 64
else:
    B, S, W, HID, H, D = 32, 257, 1408, 6144, 16, 88
    BM, BF, BN = 512, 768, 384
    K_ITERS = 500
    LAYERS = 40


def _flag(name, default):
    return (int(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


BM = _flag("--bm", BM)     # fused-MLP row block A/B override
BF = _flag("--bf", BF)     # fused-MLP hidden block A/B override
BN = _flag("--bn", BN)
D = _flag("--d", D)        # head_dim A/B (e.g. zero-padded 112 -> 128)
M = B * S


def _fetch(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, *args):
    _fetch(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_ITERS


def loop(f):
    @jax.jit
    def run(*args):
        def body(i, acc):
            out = f(*((args[0] + (acc * 1e-8).astype(args[0].dtype)),
                      *args[1:]))
            return acc + jnp.sum(out.reshape(-1)[:4].astype(jnp.float32))
        return jax.lax.fori_loop(0, K_ITERS, body, jnp.float32(0))
    return run


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    tf = bench.chip_health_tflops()
    print(f"sustained matmul: {tf:.0f} TFLOP/s")

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 16))
    x = jax.random.normal(next(ks), (B, S, W), jnp.bfloat16)
    wqkv = jax.random.normal(next(ks), (W, 3 * H * D), jnp.bfloat16) * 0.02
    bqkv = jnp.zeros((3 * H * D,), jnp.bfloat16)
    lns = jnp.ones((W,), jnp.bfloat16)
    lnb = jnp.zeros((W,), jnp.bfloat16)
    qkv = jax.random.normal(next(ks), (B, S, 3 * H * D), jnp.bfloat16)
    o = jax.random.normal(next(ks), (B, S, H * D), jnp.bfloat16)
    wproj = jax.random.normal(next(ks), (H * D, W), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(next(ks), (W, HID), jnp.bfloat16) * 0.02
    b1 = jnp.zeros((HID,), jnp.bfloat16)
    w2 = jax.random.normal(next(ks), (HID, W), jnp.bfloat16) * 0.02
    b2 = jnp.zeros((W,), jnp.bfloat16)

    from emu_tpu.ops.fused_mlp import fused_dense, fused_mlp
    from emu_tpu.ops.flash_attention import mha_packed_qkv, batched_mha

    def report(name, dt, gflop):
        ideal_us = gflop / tf * 1e3
        print(f"{name:34s} {dt*1e6:8.0f} us/layer  ideal {ideal_us:6.0f} us"
              f"  ({100*ideal_us/(dt*1e6):3.0f}% of roofline)")

    gf_qkv = 2 * M * W * 3 * H * D / 1e9
    dt = _time(loop(lambda xx: fused_dense(
        xx, wqkv, bqkv, lns, lnb, ln_mode="pre", bm=BM, bn=BN)), x)
    report("fused LN+QKV dense", dt, gf_qkv)

    dt = _time(loop(lambda xx: jnp.dot(xx, wqkv,
                                       preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16)), x)
    report("XLA QKV dense (no LN)", dt, gf_qkv)

    gf_mha = 2 * 2 * M * S * H * D / 1e9
    dt = _time(loop(lambda qq: mha_packed_qkv(qq, H, D, scale=D ** -0.5)),
               qkv)
    report("mha_packed_qkv", dt, gf_mha)

    def split_mha(qq):
        q, k, v = (t.reshape(B, S, H, D) for t in jnp.split(qq, 3, axis=-1))
        return batched_mha(q, k, v, scale=D ** -0.5).reshape(B, S, H * D)
    dt = _time(loop(split_mha), qkv)
    report("split + batched_mha + reshape", dt, gf_mha)

    gf_proj = 2 * M * H * D * W / 1e9
    dt = _time(loop(lambda oo: jnp.dot(oo, wproj,
                                       preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16)), o)
    report("XLA proj dense", dt, gf_proj)

    # --- the CURRENT production path (vit._fused_attn_branch): head-major
    # einsum projections + the BHSD kernel -------------------------------
    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd
    plan = bhsd_plan(H, D, S, 2)
    s_pad = plan[2]
    print(f"bhsd plan (hb, bq, s_pad) = {plan}")
    wqkv4 = wqkv.reshape(W, 3, H, D)
    qb = jnp.zeros((H * D,), jnp.bfloat16)

    def qkv_bhsd(xx):
        src = jnp.pad(xx, ((0, 0), (0, s_pad - S), (0, 0)))
        return [jnp.einsum("bsm,mhd->bhsd", src, wqkv4[:, t],
                           preferred_element_type=jnp.float32
                           ).astype(xx.dtype) for t in range(3)]

    dt = _time(loop(lambda xx: qkv_bhsd(xx)[2]), x)
    report("3x head-major qkv einsum (pad)", dt, gf_qkv)

    qp, kp, vp = (jnp.pad(
        jax.random.normal(next(ks), (B, H, S, D), jnp.bfloat16),
        ((0, 0), (0, 0), (0, s_pad - S), (0, 0))) for _ in range(3))
    dt = _time(loop(lambda qq: mha_bhsd(qq, kp, vp, qb, qb,
                                        scale=D ** -0.5, s_real=S)), qp)
    report("mha_bhsd kernel", dt, gf_mha)

    ob = jax.random.normal(next(ks), (B, H, s_pad, D), jnp.bfloat16)
    wproj3 = wproj.reshape(H, D, W)
    dt = _time(loop(lambda oo: jnp.einsum(
        "bhsd,hdw->bsw", oo, wproj3,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)), ob)
    report("head-major proj einsum", dt, gf_proj)

    gf_mlp = 2 * 2 * M * W * HID / 1e9
    dt = _time(loop(lambda xx: fused_mlp(
        xx, w1, b1, w2, b2, ln_mode="pre", residual=True, eps=1e-6,
        ln_scale=lns, ln_bias=lnb, bm=BM, bf=BF)), x)
    report("fused LN+MLP+residual", dt, gf_mlp)

    total_gf = gf_qkv + gf_mha + gf_proj + gf_mlp
    print(f"layer total ideal at {tf:.0f} TF/s: "
          f"{total_gf / tf * 1e3:.2f} ms -> "
          f"{B / (LAYERS * total_gf / tf / 1e3):.0f} img/s roofline")

    if "--int8" in sys.argv:
        int8_main(tf)


def _time_n(fn, *args, n=1):
    """Min-of-3 for an n-iteration in-jit loop; returns seconds/iter."""
    _fetch(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / n


def int8_probe_tops():
    """Sustained s8xs8->s32 matmul — the int8-MXU analogue of
    bench.chip_health_tflops (expected ~2x the bf16 rate)."""
    a = jax.random.randint(jax.random.PRNGKey(0), (8192, 8192), -127, 128,
                           jnp.int8)

    @jax.jit
    def f(a):
        def body(i, acc):
            y = jax.lax.dot_general(acc, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(y, -127, 127).astype(jnp.int8)
        return jax.lax.fori_loop(0, 50, body, a)

    dt = _time_n(f, a, n=50)
    return 2 * 8192 ** 3 / dt / 1e12


def int8_main(tf):
    """W8A8 encoder parts (VERDICT r4 item 4): attribute the measured
    W8A8/bf16 e2e ratio (ViT-g 1.32x, EVA-4B 1.46x vs ~2x int8 MXU) to
    buckets — dynamic act-quant cost, the bf16 attention island, scale
    epilogues — against the int8 sustained roofline."""
    from emu_tpu.ops.quant import einsum_w8a8, quantize_activations
    from emu_tpu.ops.fused_mlp import fused_mlp_w8a8
    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd

    tops = int8_probe_tops()
    print(f"\n== W8A8 parts ==  sustained int8 matmul: {tops:.0f} TOP/s "
          f"({tops / tf:.2f}x bf16)")
    ks = iter(jax.random.split(jax.random.PRNGKey(7), 16))
    x = jax.random.normal(next(ks), (B, S, W), jnp.bfloat16)
    plan = bhsd_plan(H, D, S, 2)
    s_pad = plan[2]
    xp = jnp.pad(x, ((0, 0), (0, s_pad - S), (0, 0)))

    def rint8(shape):
        return jax.random.randint(next(ks), shape, -127, 128, jnp.int8)

    wq = [rint8((W, H, D)) for _ in range(3)]
    sq = [jnp.full((1, H, 1, D), 0.01, jnp.float32) for _ in range(3)]
    wp, sp = rint8((H, D, W)), jnp.full((W,), 0.01, jnp.float32)
    w1, s1 = rint8((W, HID)), jnp.full((HID,), 0.01, jnp.float32)
    w2, s2 = rint8((HID, W)), jnp.full((W,), 0.01, jnp.float32)
    b1 = jnp.zeros((HID,), jnp.float32)
    b2 = jnp.zeros((W,), jnp.float32)

    def report8(name, dt, gflop, bf16_island=False):
        ideal_us = gflop / (tf if bf16_island else tops) * 1e3
        print(f"{name:34s} {dt*1e6:8.0f} us/layer  ideal {ideal_us:6.0f} us"
              f"  ({100*ideal_us/(dt*1e6):3.0f}% of "
              f"{'bf16' if bf16_island else 'int8'} roofline)")
        return dt

    gf_qkv = 2 * M * W * 3 * H * D / 1e9
    t_qkv = report8("3x einsum_w8a8 qkv (dyn quant)", _time(loop(
        lambda xx: sum(einsum_w8a8("bsm,mhd->bhsd", xx, wq[t], sq[t])
                       for t in range(3))), xp), gf_qkv)

    # pre-quantized variant isolates the dynamic act-quant + f32 cast
    # cost: same matmuls + scale epilogue, no per-token max/round chain
    xq8 = quantize_activations(xp)[0]

    def prequant(xx):
        y = sum(jnp.einsum("bsm,mhd->bhsd", xx, wq[t],
                           preferred_element_type=jnp.int32)
                for t in range(3))
        return (y.astype(jnp.float32) * 0.01).astype(jnp.bfloat16)

    @jax.jit
    def pq_loop(xx):
        def body(i, acc):
            out = prequant(jnp.bitwise_xor(xx, (acc > 1e30).astype(
                jnp.int8)))
            return acc + jnp.sum(out.reshape(-1)[:4].astype(jnp.float32))
        return jax.lax.fori_loop(0, K_ITERS, body, jnp.float32(0))

    t_pq = report8("3x int8 qkv einsum (pre-quant)", _time(pq_loop, xq8),
                   gf_qkv)
    print(f"{'-> dynamic act-quant cost':34s} {(t_qkv - t_pq)*1e6:8.0f} "
          f"us/layer")

    t_aq = _time(loop(lambda xx: quantize_activations(xx)[0]), xp)
    print(f"{'quantize_activations alone':34s} {t_aq*1e6:8.0f} us/layer")

    gf_mha = 2 * 2 * M * S * H * D / 1e9
    qb = jnp.zeros((H * D,), jnp.bfloat16)
    qp, kp, vp = (jax.random.normal(next(ks), (B, H, s_pad, D),
                                    jnp.bfloat16) for _ in range(3))
    t_mha = report8("mha_bhsd kernel (bf16 island)", _time(loop(
        lambda qq: mha_bhsd(qq, kp, vp, qb, qb, scale=D ** -0.5,
                            s_real=S)), qp), gf_mha, bf16_island=True)

    gf_proj = 2 * M * H * D * W / 1e9
    ob = jax.random.normal(next(ks), (B, H, s_pad, D), jnp.bfloat16)
    t_proj = report8("einsum_w8a8 proj (dyn quant)", _time(loop(
        lambda oo: einsum_w8a8("bhsd,hdw->bsw", oo, wp, sp,
                               token_axes=(1, 3))), ob), gf_proj)

    gf_mlp = 2 * 2 * M * W * HID / 1e9
    # production block sizes (ops/layers._fused_mlp_w8a8_bf)
    from emu_tpu.ops.layers import _fused_mlp_w8a8_bf
    fake = {"fc1": {"kernel_w8a8": w1}, "fc2": {"kernel_w8a8": w2}}
    blk = _fused_mlp_w8a8_bf(fake, x, ("fc1", "fc2")) or (512, 1024)
    t_mlp = report8(f"fused_mlp_w8a8 bm{blk[0]} bf{blk[1]}", _time(loop(
        lambda xx: fused_mlp_w8a8(xx, w1, s1, b1, w2, s2, b2, bm=blk[0],
                                  bf=blk[1])), x), gf_mlp)

    total = t_qkv + t_mha + t_proj + t_mlp
    gf_mm = gf_qkv + gf_proj + gf_mlp
    ideal = gf_mm / tops / 1e3 + gf_mha / tf / 1e3
    print(f"\nW8A8 layer total {total*1e3:.2f} ms vs mixed roofline "
          f"{ideal*1e3:.2f} ms ({100*ideal/total:.0f}%)")
    print(f"model estimate: {B / (LAYERS * total):.0f} img/s measured-parts"
          f" | {B / (LAYERS * ideal):.0f} img/s mixed-roofline")
    print("buckets us/layer: "
          f"act-quant {(t_qkv - t_pq + t_aq)*1e6:.0f} (qkv delta + proj "
          f"est), bf16-attn island {t_mha*1e6:.0f} "
          f"(vs {gf_mha / tops * 1e3:.0f} if int8), "
          f"mlp over-ideal {(t_mlp - gf_mlp / tops / 1e3)*1e6:.0f}, "
          f"qkv+proj over-ideal "
          f"{(t_pq + t_proj - (gf_qkv + gf_proj) / tops / 1e3)*1e6:.0f}")


if __name__ == "__main__":
    main()
