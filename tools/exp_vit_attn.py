"""Experiment: qkv projection layout + mha_bhsd head-block variants (ViT-g).

Fix for bench_vit_parts' qkv lane: keep all three q/k/v outputs live so XLA
cannot DCE two of the einsums. Measures, at B=32/S=257/W=1408/H=16/D=88:

  qkv variants (all produce head-major tensors for the kernel):
    A. 3x "bsm,mhd->bhsd" einsums             (current production path)
    B. 3x "bsm,mhd->hbsd" einsums             (head-outermost epilogue)
    C. 1x "bsm,mthd->tbhsd" fused einsum
    D. packed dense [BS,W]x[W,3HD] + reshape/transpose to 3x BHSD
  kernel variants: hb in {16, 8, 4, 2} x bq in {264, 132}

Run: python tools/exp_vit_attn.py
"""

import functools
import time

import jax
import jax.numpy as jnp

B, S, W, H, D = 32, 257, 1408, 16, 88
K_ITERS = 500


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
            if isinstance(out, (tuple, list)):
                s = sum(jnp.sum(o.reshape(-1)[:4].astype(jnp.float32))
                        for o in out)
            else:
                s = jnp.sum(out.reshape(-1)[:4].astype(jnp.float32))
            return acc + s
        return jax.lax.fori_loop(0, K_ITERS, body, jnp.float32(0))
    return run


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    tf = bench.chip_health_tflops()
    print(f"sustained matmul: {tf:.0f} TFLOP/s")

    ks = iter(jax.random.split(jax.random.PRNGKey(0), 16))
    x = jax.random.normal(next(ks), (B, S, W), jnp.bfloat16)
    wqkv = jax.random.normal(next(ks), (W, 3 * H * D), jnp.bfloat16) * 0.02
    wqkv4 = wqkv.reshape(W, 3, H, D)

    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd
    plan = bhsd_plan(H, D, S, 2)
    s_pad = plan[2]
    gf_qkv = 2 * B * S * W * 3 * H * D / 1e9
    ideal = gf_qkv / tf * 1e3

    def report(name, dt):
        print(f"{name:40s} {dt*1e6:8.0f} us  ideal {ideal:5.0f}"
              f"  ({100*ideal/(dt*1e6):3.0f}%)")

    def padx(xx):
        return jnp.pad(xx, ((0, 0), (0, s_pad - S), (0, 0)))

    def v_a(xx):
        src = padx(xx)
        return [jnp.einsum("bsm,mhd->bhsd", src, wqkv4[:, t],
                           preferred_element_type=jnp.float32
                           ).astype(xx.dtype) for t in range(3)]
    report("A: 3x bhsd einsum (all live)", _time(loop(v_a), x))

    def v_b(xx):
        src = padx(xx)
        return [jnp.einsum("bsm,mhd->hbsd", src, wqkv4[:, t],
                           preferred_element_type=jnp.float32
                           ).astype(xx.dtype) for t in range(3)]
    report("B: 3x hbsd einsum (all live)", _time(loop(v_b), x))

    def v_c(xx):
        src = padx(xx)
        o = jnp.einsum("bsm,mthd->tbhsd", src, wqkv4,
                       preferred_element_type=jnp.float32).astype(xx.dtype)
        return [o[0], o[1], o[2]]
    report("C: 1x tbhsd fused einsum", _time(loop(v_c), x))

    def v_d(xx):
        src = padx(xx)
        o = jnp.dot(src.reshape(-1, W), wqkv,
                    preferred_element_type=jnp.float32).astype(xx.dtype)
        o = o.reshape(B, s_pad, 3, H, D).transpose(2, 0, 3, 1, 4)
        return [o[0], o[1], o[2]]
    report("D: packed dense + transpose", _time(loop(v_d), x))

    # ---- kernel head-block sweep --------------------------------------
    import emu_tpu.ops.flash_attention as FA
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.pad(jax.random.normal(next(ks), (B, H, S, D), jnp.bfloat16),
                ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    k = jnp.pad(jax.random.normal(next(ks), (B, H, S, D), jnp.bfloat16),
                ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    v = jnp.pad(jax.random.normal(next(ks), (B, H, S, D), jnp.bfloat16),
                ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    qb = jnp.zeros((H, 1, D), jnp.bfloat16)
    gf_mha = 2 * 2 * B * S * S * H * D / 1e9
    ideal_mha = gf_mha / tf * 1e3

    def kern_variant(hb, bq):
        kern = functools.partial(FA._bhsd_kernel, scale=D ** -0.5, hb=hb,
                                 s_real=S)
        kv_spec = pl.BlockSpec((1, hb, s_pad, D), lambda i, g, iq: (i, g, 0, 0),
                               memory_space=pltpu.VMEM)
        qo_spec = pl.BlockSpec((1, hb, bq, D), lambda i, g, iq: (i, g, iq, 0),
                               memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((hb, 1, D), lambda i, g, iq: (g, 0, 0),
                              memory_space=pltpu.VMEM)
        def run(qq, kk, vv):
            return pl.pallas_call(
                kern, grid=(B, H // hb, s_pad // bq),
                in_specs=[qo_spec, kv_spec, kv_spec, b_spec, b_spec],
                out_specs=qo_spec,
                out_shape=jax.ShapeDtypeStruct((B, H, s_pad, D), jnp.bfloat16),
            )(qq, kk, vv, qb, qb)
        return run

    for hb in (16, 8, 4, 2, 1):
        for bq in (264, 88):
            dt = _time(loop(kern_variant(hb, bq)), q, k, v)
            print(f"kernel hb={hb:2d} bq={bq:3d}"
                  f"{'':26s} {dt*1e6:8.0f} us  ideal {ideal_mha:5.0f}"
                  f"  ({100*ideal_mha/(dt*1e6):3.0f}%)")

    # ---- max-pass elimination A/B (VERDICT r4 item 9) ------------------
    # replace the bf16 row-max with a STATIC bound: softmax is shift-
    # invariant, so any constant works in exact math; in f32 the bound
    # must sit within ~80 of the true row max or the denominators
    # underflow. Measures the ceiling of removing the reduction pass.
    import numpy as np

    def nomax_kernel(q_ref, k_ref, v_ref, bq_ref, bv_ref, o_ref, *,
                     scale, hb, s_real, bound):
        skv = k_ref.shape[2]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1)
        pad_bias = jnp.where(col < s_real, 0.0, -1e30)
        for hh in range(hb):
            qq = q_ref[0, hh] + bq_ref[hh]
            kk2 = k_ref[0, hh]
            s = jax.lax.dot_general(qq, kk2, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ) * scale
            s = s + pad_bias
            p = jnp.exp(jnp.minimum(s - bound, 60.0))
            denom = jnp.sum(p, axis=-1, keepdims=True) + 1e-30
            o = jax.lax.dot_general(p.astype(v_ref.dtype),
                                    v_ref[0, hh] + bv_ref[hh],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[0, hh] = (o / denom).astype(o_ref.dtype)

    def nomax_variant(hb, bq, bound):
        kern = functools.partial(nomax_kernel, scale=D ** -0.5, hb=hb,
                                 s_real=S, bound=bound)
        kv_spec = pl.BlockSpec((1, hb, s_pad, D),
                               lambda i, g, iq: (i, g, 0, 0),
                               memory_space=pltpu.VMEM)
        qo_spec = pl.BlockSpec((1, hb, bq, D),
                               lambda i, g, iq: (i, g, iq, 0),
                               memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((hb, 1, D), lambda i, g, iq: (g, 0, 0),
                              memory_space=pltpu.VMEM)

        def run(qq, kk, vv):
            return pl.pallas_call(
                kern, grid=(B, H // hb, s_pad // bq),
                in_specs=[qo_spec, kv_spec, kv_spec, b_spec, b_spec],
                out_specs=qo_spec,
                out_shape=jax.ShapeDtypeStruct((B, H, s_pad, D),
                                               jnp.bfloat16),
            )(qq, kk, vv, qb, qb)
        return run

    # true max of these synthetic logits for a tight-but-safe bound
    smax = float(jnp.max(jnp.einsum(
        "bhsd,bhtd->bhst", q[:2].astype(jnp.float32),
        k[:2].astype(jnp.float32)) * (D ** -0.5)))
    print(f"synthetic logit max ~ {smax:.1f}")
    hb0, bq0 = plan[0], plan[1]
    ref_out = kern_variant(hb0, bq0)(q, k, v)
    for bound in (smax + 1, smax + 40):
        run = nomax_variant(hb0, bq0, bound)
        dt = _time(loop(run), q, k, v)
        err = float(jnp.max(jnp.abs(
            run(q, k, v).astype(jnp.float32)
            - ref_out.astype(jnp.float32))))
        print(f"nomax bound={bound:6.1f} hb={hb0} bq={bq0}"
              f"{'':15s} {dt*1e6:8.0f} us  ideal {ideal_mha:5.0f}"
              f"  ({100*ideal_mha/(dt*1e6):3.0f}%)  max|err| {err:.2e}")


if __name__ == "__main__":
    main()
