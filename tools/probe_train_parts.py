"""Decompose the 13B train step's 130.6 ms/layer marginal cost (VERDICT
r2 item 10: push train MFU 61% -> 65%+). Times, on chip, at the train
shapes (B8 x S1024, W5120/F13824/H40/D128):

  flash_fwd   pallas flash forward alone
  flash_vjp   flash forward + custom-VJP backward (jax.grad q,k,v)
  dense_vjp   the layer's dense matmul chain fwd+bwd (XLA baseline)
  layer_vjp   one full decoder layer fwd+bwd under remat=dots

Run: python tools/probe_train_parts.py [lanes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # noqa: E402  (timing helpers + chip probe)

B, S, W, F, H, D = 8, 1024, 5120, 13824, 40, 128
TOK = B * S


def timed_grad(make_fn, args, k=30):
    """Min-of-3 seconds for k chained invocations of make_fn's grad."""
    fn = make_fn()

    @jax.jit
    def loop(*xs):
        def body(i, carry):
            s, _ = carry
            eps = (s * 1e-12).astype(xs[0].dtype)
            outs = fn(*((xs[0] + eps,) + xs[1:]))
            # consume EVERY output leaf or XLA DCEs whole grad kernels
            # (e.g. the fused dk/dv pallas call) out of the loop body
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(outs):
                s = s + jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:8]
                                .astype(jnp.float32))
            return (s, outs)
        s, outs = jax.lax.fori_loop(
            0, k, body, (jnp.float32(0.0), fn(*xs)))
        return s

    return bench._time_call(lambda: loop(*args)) / k


def main():
    lanes = sys.argv[1:] or ["flash_fwd", "flash_vjp", "dense_vjp",
                             "layer_vjp"]
    print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
    key = jax.random.PRNGKey(0)
    from emu_tpu.ops.flash_attention import flash_attention
    scale = D ** -0.5

    if "flash_fwd" in lanes or "flash_vjp" in lanes:
        q = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        kk = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        vv = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
        # causal logit-domain FLOPs: ~half the S^2 rectangle
        fwd_tf = 4 * B * H * S * S * D / 1e12

    if "flash_fwd" in lanes:
        dt = timed_grad(
            lambda: (lambda q, k, v: flash_attention(
                q, k, v, scale=scale, causal=True)),
            (q, kk, vv))
        print(f"flash_fwd : {dt * 1e3:7.2f} ms  "
              f"({fwd_tf / dt:6.1f} TF/s rect, "
              f"{fwd_tf / 2 / dt:6.1f} causal-useful)", flush=True)

    if "flash_vjp" in lanes:
        def mk():
            def loss(q, k, v):
                return jnp.sum(flash_attention(
                    q, k, v, scale=scale, causal=True).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))
        dt = timed_grad(mk, (q, kk, vv))
        # fwd + recompute-free bwd: dq kernel (3 matmuls) + dkv kernel
        # (4 matmuls) over the same rectangle -> ~ (1 + 3.5) * fwd/2... use
        # raw rectangle flops fwd*(1+3.5)/2 nominal
        tf = fwd_tf * (1 + 3.5) / 1  # rectangle-domain total
        print(f"flash_vjp : {dt * 1e3:7.2f} ms  "
              f"({tf / dt:6.1f} TF/s rect-total, fwd+bwd)", flush=True)

    if "dense_vjp" in lanes:
        x = jax.random.normal(key, (TOK, W), jnp.bfloat16)
        wq = jax.random.normal(key, (W, 3 * W), jnp.bfloat16) * 0.02
        wo = jax.random.normal(key, (W, W), jnp.bfloat16) * 0.02
        wg = jax.random.normal(key, (W, 2 * F), jnp.bfloat16) * 0.02
        wd = jax.random.normal(key, (F, W), jnp.bfloat16) * 0.02

        def mk():
            def loss(x, wq, wo, wg, wd):
                hf = jnp.dot(x, wq, preferred_element_type=jnp.float32)
                # consume ALL qkv columns or XLA DCEs 2/3 of the matmul
                keep = jnp.sum(hf) * 1e-9
                h = hf.astype(jnp.bfloat16)[:, :W]
                h = jnp.dot(h, wo, preferred_element_type=jnp.float32)
                h = h.astype(jnp.bfloat16)
                g = jnp.dot(h, wg, preferred_element_type=jnp.float32)
                g = (jax.nn.silu(g[:, :F]) * g[:, F:]).astype(jnp.bfloat16)
                y = jnp.dot(g, wd, preferred_element_type=jnp.float32)
                # full-rank cotangent: sum(y) would make dy all-ones and
                # XLA collapses g^T@ones / ones@wd^T into reductions,
                # eliding two weight-grad matmuls (~20% of bwd FLOPs)
                return 0.5 * jnp.sum(y * y) + keep
            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))
        dt = timed_grad(mk, (x, wq, wo, wg, wd))
        tf = 3 * 2 * TOK * (4 * W * W + 3 * W * F) / 1e12
        print(f"dense_vjp : {dt * 1e3:7.2f} ms  ({tf / dt:6.1f} TF/s, "
              f"3x-fwd model)", flush=True)

    if "layer_vjp" in lanes:
        from emu_tpu.config import LlamaConfig
        from emu_tpu.models import llama
        cfg = LlamaConfig(hidden_size=W, intermediate_size=F,
                          num_hidden_layers=1, num_attention_heads=H,
                          vocab_size=32000, extended_vocab_size=32004,
                          max_position_embeddings=S)
        params = llama.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        emb = jax.random.normal(key, (B, S, W), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.int32)

        def mk():
            def loss(e, p):
                out = llama.forward_hidden(p, cfg, e, mask, remat="dots")
                of = out.astype(jnp.float32)
                return 0.5 * jnp.sum(of * of)
            return jax.grad(loss, argnums=(0, 1))
        dt = timed_grad(mk, (emb, params))
        dense_tf = 3 * 2 * TOK * (4 * W * W + 3 * W * F) / 1e12
        print(f"layer_vjp : {dt * 1e3:7.2f} ms  (dense-only roofline "
              f"{dense_tf / dt:6.1f} TF/s; depth-fit marginal was "
              f"130.6 ms incl optimizer)", flush=True)


def marginal(opt: str, remat="dots"):
    """Per-layer marginal ms of the train step at L4/L2, with the
    optimizer ('adafactor') or with plain grad consumption ('none') —
    the difference is the optimizer+update marginal the depth fit
    charges per layer."""
    import optax
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama
    times = {}
    for layers in (4, 2):
        cfg = LlamaConfig(hidden_size=W, intermediate_size=F,
                          num_hidden_layers=layers, num_attention_heads=H,
                          vocab_size=32000, extended_vocab_size=32004,
                          max_position_embeddings=S)
        params = llama.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 32000)
        mask = jnp.ones_like(ids)
        if opt == "fused":
            from emu_tpu.optim import fused_adafactor
            tx = fused_adafactor(1e-3)
        else:
            tx = optax.adafactor(1e-3)
        opt_state = tx.init(params)

        def loss_fn(p, ids, mask, c=None):
            embeds = llama.embed(p, ids)
            if c is not None:
                # loop-carried perturbation: without it XLA hoists the
                # whole value_and_grad out of the fori_loop (LICM) when
                # params are not updated between iterations
                embeds = embeds * (1 + c * 1e-12).astype(embeds.dtype)
            hidden = llama.forward_hidden(p, cfg, embeds, mask,
                                          remat=remat)
            return llama.masked_ce_loss(p, hidden[:, :-1], ids[:, 1:],
                                        mask[:, 1:])

        kk = 3

        @jax.jit
        def steps(p, s, ids, mask):
            def body(i, carry):
                p, s, prev = carry
                if opt == "nograd":
                    loss, grads = jax.value_and_grad(loss_fn)(
                        p, ids, mask, prev)
                else:
                    loss, grads = jax.value_and_grad(loss_fn)(p, ids, mask)
                if opt in ("adafactor", "fused"):
                    updates, s = tx.update(grads, s, p)
                    p = optax.apply_updates(p, updates)
                elif opt == "nograd":
                    # consume grads into a scalar only: no param-update
                    # HBM traffic at all (isolates value_and_grad cost).
                    # sum(g*g), not sum(g): reduce-of-dot is algebraically
                    # collapsible and slice-consumption DCEs the matmuls
                    gs = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in jax.tree_util.tree_leaves(grads))
                    loss = loss + gs * 1e-20
                else:
                    # consume grads without optimizer state traffic
                    p = jax.tree_util.tree_map(
                        lambda a, g: a - (1e-12 * g).astype(a.dtype),
                        p, grads)
                return p, s, loss
            _, _, loss = jax.lax.fori_loop(0, kk, body,
                                           (p, s, jnp.float32(0)))
            return loss

        times[layers] = bench._time_call(
            lambda: steps(params, opt_state, ids, mask)) / kk
        print(f"  L{layers} {opt} remat={remat}: "
              f"{times[layers] * 1e3:.1f} ms/step", flush=True)
    marg = (times[4] - times[2]) / 2 * 1e3
    print(f"marginal ({opt}, remat={remat}): {marg:.1f} ms/layer",
          flush=True)
    return marg


if __name__ == "__main__":
    if "marginal" in sys.argv[1:]:
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        m_none = marginal("none")
        m_ada = marginal("adafactor")
        print(f"optimizer marginal: {m_ada - m_none:.1f} ms/layer",
              flush=True)
    elif "noremat" in sys.argv[1:]:
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        marginal("adafactor", remat=False)
    elif "nograd" in sys.argv[1:]:
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        marginal("nograd")
    elif "named" in sys.argv[1:]:
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        marginal("adafactor", remat="named")
    elif "fused" in sys.argv[1:]:
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        marginal("fused")
    elif "pure" in sys.argv[1:]:
        # marginal of the BARE layer stack grad (no lm_head/CE/optimizer):
        # separates layer cost from step-context cost
        print(f"chip: {bench.chip_health_tflops():.0f} TFLOP/s", flush=True)
        from emu_tpu.config import LlamaConfig
        from emu_tpu.models import llama
        key = jax.random.PRNGKey(0)
        emb = jax.random.normal(key, (B, S, W), jnp.bfloat16)
        mask = jnp.ones((B, S), jnp.int32)
        times = {}
        for layers in (4, 2):
            cfg = LlamaConfig(hidden_size=W, intermediate_size=F,
                              num_hidden_layers=layers,
                              num_attention_heads=H,
                              vocab_size=32000, extended_vocab_size=32004,
                              max_position_embeddings=S)
            params = llama.init(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)

            def mk():
                def loss(e, p):
                    out = llama.forward_hidden(p, cfg, e, mask,
                                               remat="dots")
                    of = out.astype(jnp.float32)
                    return 0.5 * jnp.sum(of * of)
                return jax.grad(loss, argnums=(0, 1))
            times[layers] = timed_grad(mk, (emb, params), k=6)
            print(f"  L{layers} pure: {times[layers] * 1e3:.1f} ms",
                  flush=True)
        print(f"pure layer marginal: "
              f"{(times[4] - times[2]) / 2 * 1e3:.1f} ms/layer", flush=True)
    else:
        main()
