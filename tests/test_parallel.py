"""Multi-device sharding tests on the 8-virtual-CPU-device mesh:
TP/DP-sharded forwards must equal the unsharded computation."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from emu_tpu.config import Emu1Config, LlamaConfig
from emu_tpu.models import emu1, llama, vit
from emu_tpu.parallel import make_mesh, shard_params


def test_llama_tp_forward_matches_replicated():
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(0).integers(3, 64, (2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    embeds = llama.embed(params, jnp.asarray(ids))
    ref = np.asarray(llama.forward_hidden(params, cfg, embeds,
                                          jnp.asarray(mask)))

    mesh = make_mesh((2, 4))
    sharded = shard_params(params, mesh, llama.sharding_rules)
    data = jax.device_put(embeds, NamedSharding(mesh, P("data")))
    out = np.asarray(llama.forward_hidden(sharded, cfg, data,
                                          jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_llama_tp_generate_matches_replicated():
    from emu_tpu.generation import GenerationConfig, llama_generate
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(1), cfg)
    ids = np.random.default_rng(1).integers(3, 64, (2, 5)).astype(np.int32)
    mask = np.ones_like(ids)
    gcfg = GenerationConfig(max_new_tokens=6, num_beams=3,
                            length_penalty=-1.0, pad_token_id=0)
    embeds = llama.embed(params, jnp.asarray(ids))
    ref = np.asarray(llama_generate(params, cfg, embeds, jnp.asarray(mask),
                                    gcfg))
    mesh = make_mesh((1, 8))
    sharded = shard_params(params, mesh, llama.sharding_rules)
    out = np.asarray(llama_generate(sharded, cfg,
                                    llama.embed(sharded, jnp.asarray(ids)),
                                    jnp.asarray(mask), gcfg))
    np.testing.assert_array_equal(out, ref)


def test_llama_tp_generate_quantized_matches_replicated():
    """quantize= + mesh= compose (ADVICE r3): anchored rules give
    quantized leaves explicit layouts instead of a float-kernel spec
    landing on packing dims; sharded quantized decode must be
    token-exact vs the unsharded quantized run."""
    from emu_tpu.generation import GenerationConfig, llama_generate
    from emu_tpu.ops.quant import quantize_tree
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      vocab_size=64, extended_vocab_size=64)
    base = llama.fuse_projections(llama.init(jax.random.PRNGKey(1), cfg))
    ids = np.random.default_rng(1).integers(3, 64, (2, 5)).astype(np.int32)
    mask = np.ones_like(ids)
    gcfg = GenerationConfig(max_new_tokens=6, pad_token_id=0)
    mesh = make_mesh((1, 8))
    for bits in (8, 4):
        params = quantize_tree(base, bits=bits)
        embeds = llama.embed(params, jnp.asarray(ids))
        ref = np.asarray(llama_generate(params, cfg, embeds,
                                        jnp.asarray(mask), gcfg))
        sharded = shard_params(params, mesh, llama.sharding_rules)
        out = np.asarray(llama_generate(
            sharded, cfg, llama.embed(sharded, jnp.asarray(ids)),
            jnp.asarray(mask), gcfg))
        np.testing.assert_array_equal(out, ref)


def test_quantized_sharding_rules_place_quantized_leaves():
    """The out-sharded planes' quantized kernels and scales actually get
    a 'model' axis (not the default replicate) on an 8-way TP mesh."""
    from emu_tpu.ops.quant import quantize_tree
    from emu_tpu.parallel.mesh import sharding_tree, tree_paths_and_leaves
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      vocab_size=64, extended_vocab_size=64)
    params = quantize_tree(
        llama.fuse_projections(llama.init(jax.random.PRNGKey(0), cfg)),
        bits=4)
    mesh = make_mesh((1, 8))
    tree = sharding_tree(params, mesh, llama.sharding_rules)
    specs = {path: s.spec for path, s in tree_paths_and_leaves(tree)}
    assert specs["layers/self_attn/qkv_proj/kernel_q4"][-1] == "model"
    assert specs["layers/self_attn/qkv_proj/scale4"][-1] == "model"
    assert specs["layers/mlp/gate_up/kernel_q4"][-1] == "model"
    assert specs["lm_head/kernel_q4"][-1] == "model"
    # contraction-sharded planes stay replicated in packed int4 form
    assert all(a is None for a in specs["layers/mlp/down/kernel_q4"])


def test_vit_tp_forward_matches_replicated():
    cfg = Emu1Config.tiny().vision
    params = vit.init(jax.random.PRNGKey(2), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (4, 28, 28, 3))
    ref = np.asarray(vit.forward_features(params, cfg, imgs))
    mesh = make_mesh((2, 4))
    sharded = shard_params(params, mesh, vit.sharding_rules)
    data = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    out = np.asarray(vit.forward_features(sharded, cfg, data))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_emu1_composite_sharding_rules_cover_params():
    """Every heavy kernel matches a TP rule (catches rule-path drift)."""
    import re
    from emu_tpu.parallel.mesh import tree_paths_and_leaves
    cfg = Emu1Config.tiny()
    params = emu1.init(jax.random.PRNGKey(0), cfg)
    rules = [re.compile(p) for p, _ in emu1.sharding_rules]
    unmatched_big = []
    for path, leaf in tree_paths_and_leaves(params):
        if leaf.ndim >= 2 and leaf.size > 4096 and "embed" not in path \
                and not any(r.search(path) for r in rules):
            unmatched_big.append(path)
    # projection / patch_embed / lm_head etc. should all be covered;
    # small glue (ln, cls, pos) may be replicated
    allowed = {"cformer/projection/kernel", "visual/pos_embed",
               "decoder/stu_regress_head/kernel"}
    assert set(unmatched_big) <= allowed, unmatched_big


def test_pipeline_parallel_matches_sequential():
    """GPipe pipeline over a 'pipe' mesh axis ≡ sequential layer scan,
    both for a toy stage and the real llama forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama
    from emu_tpu.parallel import (make_mesh, pipeline_forward,
                                  pipeline_llama_hidden)

    mesh = make_mesh((4,), axis_names=("pipe",),
                     devices=jax.devices()[:4])
    W = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 16))

    def stage(w_slab, h):
        def body(h, w):
            return jnp.tanh(h @ w), None
        return jax.lax.scan(body, h, w_slab)[0]

    out = pipeline_forward(stage, W, x, mesh)
    ref = x
    for i in range(8):
        ref = jnp.tanh(ref @ W[i])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                      num_hidden_layers=4, num_attention_heads=4,
                      vocab_size=128, extended_vocab_size=128)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (8, 1)) % 120
    mask = jnp.ones_like(ids)
    embeds = llama.embed(params, ids)
    ref = llama.forward_hidden(params, cfg, embeds, mask)
    out = pipeline_llama_hidden(params, cfg, embeds, mask, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_composes_with_dp_tp():
    """3D parallelism in one program: a ("data", "pipe", "model") =
    (2, 2, 2) mesh runs GPipe over "pipe" while the batch shards over
    "data" and the per-stage weights shard over "model" (only the pipe
    axis goes manual in the shard_map; the others stay auto/GSPMD).
    Output must match the replicated sequential forward."""
    import re
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama
    from emu_tpu.parallel import make_mesh, pipeline_llama_hidden

    mesh = make_mesh((2, 2, 2), axis_names=("data", "pipe", "model"))
    cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                      num_hidden_layers=4, num_attention_heads=4,
                      vocab_size=128, extended_vocab_size=128)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ref_params = params

    # stacked layer tensors: "pipe" on the layer axis + the TP rule's
    # "model" placement; everything else replicated
    def place(path, leaf):
        spec = P()
        for pat, s in llama.sharding_rules:
            if re.search(pat, path):
                spec = P(*(("pipe",) + tuple(s)[1:]))
                break
        else:
            if path.startswith("layers/"):
                spec = P("pipe")
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    def walk(tree, path=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}" if path else k)
                    for k, v in tree.items()}
        return place(path, tree)

    params = walk(params)
    ids = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (8, 1)) % 120
    mask = jnp.ones_like(ids)
    embeds = llama.embed(ref_params, ids)
    ref = llama.forward_hidden(ref_params, cfg, embeds, mask)
    embeds_d = jax.device_put(embeds, NamedSharding(mesh, P("data")))
    out = pipeline_llama_hidden(params, cfg, embeds_d, mask, mesh,
                                n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_parallel_training_grads():
    """Pipeline-parallel TRAINING: jax.grad through the GPipe shard_map
    (ppermute transposes to the reverse rotation) matches the sequential
    forward's gradients — layer-sharded training works end to end."""
    import jax
    import jax.numpy as jnp
    from emu_tpu.config import LlamaConfig
    from emu_tpu.models import llama
    from emu_tpu.parallel import make_mesh, pipeline_llama_hidden

    mesh = make_mesh((4,), axis_names=("pipe",), devices=jax.devices()[:4])
    cfg = LlamaConfig(hidden_size=128, intermediate_size=256,
                      num_hidden_layers=4, num_attention_heads=4,
                      vocab_size=64, extended_vocab_size=64)
    params = llama.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (8, 1)) % 60
    mask = jnp.ones_like(ids)
    embeds = llama.embed(params, ids)

    def loss_pp(p):
        h = pipeline_llama_hidden(p, cfg, embeds, mask, mesh, n_micro=2)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def loss_seq(p):
        h = llama.forward_hidden(p, cfg, embeds, mask)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_seq = jax.grad(loss_seq)(params)
    worst = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(b)) + 1e-9)), g_pp, g_seq)))
    assert worst < 1e-4, worst
