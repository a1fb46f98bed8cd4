"""Quantify the BSHD→BHSD pad/transpose overhead in the flash path at
the 13B train shape (B8 S1024 H40 D128).

Lanes:
  fwd_bshd   flash_attention as the model calls it (pads + transposes)
  fwd_bhsd   the same forward kernel on pre-padded [B, H, S, D] inputs
  bwd_bshd   full custom-VJP grad (pads/transposes both directions)
  bwd_bhsd   backward kernels alone on resident BHSD operands

fwd_bshd - fwd_bhsd ≈ what a BHSD-native qkv/proj einsum layout would
save per layer forward; same for the backward pair.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402

B, S, H, D = 8, 1024, 40, 128
TOK = B * S


def timed(make_fn, args, k=30):
    fn = make_fn()

    @jax.jit
    def loop(*xs):
        def body(i, carry):
            s, _ = carry
            eps = (s * 1e-12).astype(xs[0].dtype)
            outs = fn(*((xs[0] + eps,) + xs[1:]))
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(outs):
                s = s + jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:8]
                                .astype(jnp.float32))
            return (s, outs)
        s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), fn(*xs)))
        return s

    return bench._time_call(lambda: loop(*args)) / k


def main():
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
    from emu_tpu.ops import flash_attention as fa
    key = jax.random.PRNGKey(0)
    scale = D ** -0.5
    q, k, v = (jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    valid = jnp.ones((B, 1, S), jnp.int32)

    dt = timed(lambda: (lambda q, k, v: fa.flash_attention(
        q, k, v, scale=scale, causal=True)), (q, k, v))
    print(f"fwd_bshd : {dt * 1e3:7.2f} ms", flush=True)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fwd_bhsd(qt, kt, vt):
        bq = 512
        kernel = functools.partial(fa._kernel, scale=scale, causal=True,
                                   diag_offset=0, bq=bq, skv_real=S)
        qo = pl.BlockSpec((1, 1, bq, D), lambda b_, h_, i: (b_, h_, i, 0),
                          memory_space=pltpu.VMEM)
        kv = pl.BlockSpec((1, 1, S, D), lambda b_, h_, i: (b_, h_, 0, 0),
                          memory_space=pltpu.VMEM)
        vs = pl.BlockSpec((1, 1, S), lambda b_, h_, i: (b_, 0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B, H, S // bq), in_specs=[qo, kv, kv, vs],
            out_specs=qo,
            out_shape=jax.ShapeDtypeStruct((B, H, S, D), qt.dtype),
        )(qt, kt, vt, valid)

    dt = timed(lambda: fwd_bhsd, (qt, kt, vt))
    print(f"fwd_bhsd : {dt * 1e3:7.2f} ms", flush=True)

    def mk_bwd_bshd():
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(
                q, k, v, scale=scale, causal=True).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))
    dt = timed(mk_bwd_bshd, (q, k, v))
    print(f"bwd_bshd : {dt * 1e3:7.2f} ms  (fwd+bwd, transposed I/O)",
          flush=True)

    # backward kernels alone on resident BHSD operands (lse from a fwd)
    def mk_bwd_bhsd():
        valid_f = jnp.ones((B, S), jnp.float32)

        def run(qt, kt, vt):
            q_b = qt.transpose(0, 2, 1, 3)
            out, res = fa._flash_short(q_b, kt.transpose(0, 2, 1, 3),
                                       vt.transpose(0, 2, 1, 3), valid_f,
                                       scale, True, False, with_lse=True)
            qt2, kt2, vt2, ot, lse, _ = res
            return fa._flash_bwd_whole(q_b, kt.transpose(0, 2, 1, 3),
                                       vt.transpose(0, 2, 1, 3), valid_f,
                                       out, out, lse, scale, True, False)
        return run
    dt = timed(mk_bwd_bhsd, (qt, kt, vt))
    print(f"bwd_ref  : {dt * 1e3:7.2f} ms  (fwd+bwd via internals, incl "
          "transposes — sanity)", flush=True)


if __name__ == "__main__":
    main()
