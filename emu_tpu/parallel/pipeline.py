"""Pipeline parallelism: GPipe schedule over a "pipe" mesh axis.

The reference's only pipelining is the regex layer-placement of
`Emu2/emu/mixin.py:12-65` — layers assigned to devices, activations
`.to()`-ed between them serially (no microbatching, the idle devices
just wait). The TPU-native version shards the stacked layer axis over a
`"pipe"` mesh axis and runs the classic GPipe schedule inside one
`shard_map` program: each tick every stage applies its layer slab to the
microbatch it holds, then `ppermute` rotates activations one stage
forward over ICI. M microbatches through S stages take M + S - 1 ticks
(the usual bubble); the schedule is a static python loop, so XLA sees
straight-line collective code and overlaps compute with the permutes.

Composes with the other axes: a ("data", "pipe") or ("pipe", "model")
mesh runs DP or TP inside each stage — the stage_fn's own shardings
apply within the shard_map residual axes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def pipeline_forward(stage_fn: Callable, stage_params, micro_tree,
                     mesh: Mesh, axis: str = "pipe"):
    """Run microbatches through pipeline stages.

    stage_fn(params_slab, micro) -> micro: applies ONE stage's layer
    slab (its shard of the stacked layer axis) to one microbatch.
    stage_params: pytree whose leaves have a leading stacked-layer axis
    (length divisible by the `axis` size; sharded over it here).
    micro_tree: array or pytree of arrays with leading microbatch axis
    [M, ...], replicated over `axis`. Non-float leaves (masks,
    positions) ride through unchanged. Returns the same structure.
    """
    n_stages = mesh.shape[axis]
    n_micro = jax.tree_util.tree_leaves(micro_tree)[0].shape[0]
    tmap = jax.tree_util.tree_map

    def body(p_slab, xs):
        s = jax.lax.axis_index(axis)
        last = n_stages - 1
        cur = tmap(lambda a: jnp.zeros_like(a[0]), xs)
        outs = tmap(jnp.zeros_like, xs)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        for t in range(n_micro + n_stages - 1):
            if t < n_micro:
                # stage 0 injects the next microbatch
                cur = tmap(lambda a, c: jnp.where(s == 0, a[t], c), xs, cur)
            y = stage_fn(p_slab, cur)
            oi = t - last
            if oi >= 0:
                # the last stage has finished microbatch `oi`
                outs = tmap(lambda o, v: o.at[oi].set(
                    jnp.where(s == last, v, o[oi])), outs, y)
            if t < n_micro + n_stages - 2:
                cur = tmap(lambda v: jax.lax.ppermute(v, axis, perm), y)
        # replicate the last stage's collected outputs to every stage
        return tmap(lambda o: jax.lax.psum(
            jnp.where(s == last, o, jnp.zeros_like(o)), axis), outs)

    specs = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    # only the pipe axis goes manual: any other mesh axes ("data",
    # "model") stay auto, so DP batch sharding and TP weight sharding
    # ride through GSPMD *inside* each stage — one program runs 3D
    # DP x PP x TP parallelism
    # check_vma must stay on: with it off, shard_map expands out_specs
    # over ALL mesh axes and rejects the auto ones. The closing psum
    # makes every output replicated over `axis`, so the check passes.
    return jax.shard_map(body, mesh=mesh, in_specs=(specs, P()),
                         out_specs=P(),
                         axis_names={axis})(stage_params, micro_tree)


def pipeline_llama_hidden(params: dict, cfg, inputs_embeds: jax.Array,
                          attention_mask: jax.Array, mesh: Mesh,
                          n_micro: int = 4, axis: str = "pipe"
                          ) -> jax.Array:
    """llama.forward_hidden, pipeline-parallel over `axis`.

    The batch splits into n_micro microbatches; each stage applies its
    contiguous block of cfg.num_hidden_layers / n_stages layers (a local
    lax.scan). Embedding and the final norm run replicated.
    """
    from emu_tpu.models import llama
    from emu_tpu.ops import layers as L
    b, s, _ = inputs_embeds.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    from emu_tpu.ops import rope as R
    cos, sin = llama.rope_tables(cfg, s)
    positions = llama._positions_from_mask(attention_mask)
    micro = {"x": inputs_embeds.reshape(n_micro, mb, s, -1),
             "pos": positions.reshape(n_micro, mb, s),
             "mask": attention_mask.reshape(n_micro, mb, s)}

    def stage(p_slab, m):
        # rope rows are constant across the stage's layers: gather once
        # outside the layer scan (same hoist as llama.forward_hidden)
        rows = R.gather_rope_rows(cos, sin, m["pos"])

        def layer_body(h, p):
            h, _ = llama._layer(p, cfg, h, rows,
                                lambda k, v: ((k, v), 0.0), m["mask"], True)
            return h, None

        x, _ = jax.lax.scan(layer_body, m["x"], p_slab)
        return dict(m, x=x)

    out = pipeline_forward(stage, params["layers"], micro, mesh, axis)
    x = out["x"].reshape(b, s, -1)
    return L.rms_norm(params["norm"], x, cfg.rms_norm_eps)
