"""TPU-lean optimizers.

`fused_adafactor` reproduces `optax.adafactor`'s default update rule
(Shazeer & Stern 2018; factored second moments, block-RMS clipping,
parameter-scale multiplier) as ONE per-leaf computation instead of a
chain of five GradientTransformations. The motivation is HBM traffic,
not math: each optax transform boundary materializes a full-size f32
`updates` tree that the next transform re-reads, which on a 13B-width
layer (~317M params) costs ~17.6 ms/layer of the measured train-step
marginal (tools/probe_train_parts.py) against a ~4 ms traffic roofline.
Here every elementwise stage is expressed in one function of the raw
gradient so XLA fuses it into the minimal number of passes over the
leaf: the update tensor `g * row_factor * col_factor` is never
materialized — its RMS (needed for clipping) is computed by a fused
reduce, and the final parameter delta is recomputed from `g` in the
apply pass.

Semantics matched against optax (tests/test_optim.py):
- factored dims = two largest axes when both >= min_dim_size_to_factor
  (optax._src.factorized._factored_dims)
- decay_t = 1 - (step+1)^-decay_rate on an int32 safe-increment counter
- second-moment state is stored in the PARAM dtype (optax rounds the
  f32 row/col moments to param dtype each step; we reproduce the
  round-trip so bf16 training matches bit-for-bit in expectation)
- clip: u /= max(1, rms(u)/threshold); param scale: u *= max(rms(p),
  1e-3); sign flip folded into the returned update (optax `scale(-1)`)

Reference: the training loop the reference finetunes with is plain
torch AdamW (Emu1 `train/` configs); adafactor is the memory-lean
TPU-classic choice that leaves HBM room for activations at 13B width
(see bench.py train lane).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


class FusedAdafactorState(NamedTuple):
    count: jax.Array          # i32 scalar
    v_row: Any                # tree: factored row moments (param dtype)
    v_col: Any                # tree: factored col moments
    v: Any                    # tree: full moments for unfactored leaves


def _factored_dims(shape, min_dim_size_to_factor: int):
    """Two largest axes to factor over, or None (mirrors optax)."""
    if len(shape) < 2:
        return None
    sorted_dims = np.argsort(shape)
    if shape[sorted_dims[-2]] < min_dim_size_to_factor:
        return None
    return int(sorted_dims[-2]), int(sorted_dims[-1])


def fused_adafactor(learning_rate: float,
                    min_dim_size_to_factor: int = 128,
                    decay_rate: float = 0.8,
                    decay_offset: int = 0,
                    multiply_by_parameter_scale: bool = True,
                    clipping_threshold: Optional[float] = 1.0,
                    eps: float = 1e-30,
                    min_scale: float = 1e-3) -> optax.GradientTransformation:
    """Drop-in for `optax.adafactor(learning_rate)` (defaults, no momentum,
    no weight decay) with single-kernel-chain leaf updates."""

    def init_fn(params):
        def _init(p):
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            if dims is not None:
                d1, d0 = dims
                vr = jnp.zeros(np.delete(p.shape, d0), dtype=p.dtype)
                vc = jnp.zeros(np.delete(p.shape, d1), dtype=p.dtype)
                return vr, vc, jnp.zeros((1,), dtype=p.dtype)
            z = jnp.zeros((1,), dtype=p.dtype)
            return z, z, jnp.zeros(p.shape, dtype=p.dtype)

        trees = jax.tree_util.tree_map(_init, params)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], trees, is_leaf=lambda t: isinstance(t, tuple))
        return FusedAdafactorState(jnp.zeros([], jnp.int32),
                                   pick(0), pick(1), pick(2))

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("fused_adafactor requires params")
        step = state.count - decay_offset
        decay_t = 1.0 - (step.astype(jnp.float32) + 1.0) ** (-decay_rate)

        def _leaf(g, vr, vc, v, p):
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            g32 = g.astype(jnp.float32)
            gsq = g32 * g32 + eps
            if dims is not None:
                d1, d0 = dims
                new_vr = (decay_t * vr.astype(jnp.float32)
                          + (1.0 - decay_t) * jnp.mean(gsq, axis=d0))
                new_vc = (decay_t * vc.astype(jnp.float32)
                          + (1.0 - decay_t) * jnp.mean(gsq, axis=d1))
                # optax rounds the moments to param dtype each step, and
                # the factors are computed FROM the rounded values —
                # reproduce the round-trip for bitwise-equal trajectories
                new_vr = new_vr.astype(p.dtype)
                new_vc = new_vc.astype(p.dtype)
                vr32 = new_vr.astype(jnp.float32)
                vc32 = new_vc.astype(jnp.float32)
                reduced_d1 = d1 - 1 if d1 > d0 else d1
                row_mean = jnp.mean(vr32, axis=reduced_d1, keepdims=True)
                rf = (vr32 / row_mean) ** -0.5
                cf = vc32 ** -0.5
                rf_b = jnp.expand_dims(rf, axis=d0)
                cf_b = jnp.expand_dims(cf, axis=d1)
                # rms(u) without materializing u: mean((g*rf*cf)^2) is a
                # fused elementwise+reduce re-reading only g
                u_sq_mean = jnp.mean(g32 * g32 * (rf_b * rf_b)
                                     * (cf_b * cf_b))
                new_v = v

                def u_of(gg):
                    return gg * rf_b * cf_b
            else:
                new_v32 = (decay_t * v.astype(jnp.float32)
                           + (1.0 - decay_t) * gsq)
                new_v = new_v32.astype(p.dtype)
                inv = new_v.astype(jnp.float32) ** -0.5
                u_sq_mean = jnp.mean(g32 * g32 * inv * inv)
                new_vr, new_vc = vr, vc

                def u_of(gg):
                    return gg * inv

            scale = jnp.float32(learning_rate)
            if clipping_threshold is not None:
                clip_denom = jnp.maximum(
                    1.0, jnp.sqrt(u_sq_mean) / clipping_threshold)
                scale = scale / clip_denom
            if multiply_by_parameter_scale:
                p32 = p.astype(jnp.float32)
                scale = scale * jnp.maximum(
                    jnp.sqrt(jnp.mean(p32 * p32)), min_scale)
            # sign flip (optax scale(-1)) folded in; the delta is
            # recomputed from g here so apply_updates fuses into this
            # same pass instead of round-tripping a f32 updates tree
            upd = (-scale * u_of(g32)).astype(p.dtype)
            return upd, new_vr, new_vc, new_v

        out = jax.tree_util.tree_map(_leaf, grads, state.v_row,
                                     state.v_col, state.v, params)
        pick = lambda i: jax.tree_util.tree_map(
            lambda t: t[i], out, is_leaf=lambda t: isinstance(t, tuple))
        new_state = FusedAdafactorState(
            optax.safe_increment(state.count), pick(1), pick(2), pick(3))
        return pick(0), new_state

    return optax.GradientTransformation(init_fn, update_fn)
