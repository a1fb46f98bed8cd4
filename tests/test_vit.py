"""EVA ViT numerics: independent torch re-derivation as the golden oracle.

There is no importable EVA implementation in this image, so the test builds
its own minimal torch EVA block from the published math (pre/post-norm,
fused QKV with q/v-only biases, exact GELU, LN eps 1e-6) and checks our JAX
stack against it at fp32.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from emu_tpu.config import VisionConfig  # noqa: E402
from emu_tpu.models import vit  # noqa: E402
from emu_tpu.ops import layers as L  # noqa: E402

CFG = VisionConfig(image_size=28, patch_size=14, width=32, layers=2,
                   head_width=8, mlp_ratio=4.0, num_classes=0)


def _torch_block(p, x, postnorm, n_heads, head_dim):
    """Reference EVA block math in torch (independent re-derivation)."""
    def ln(w, b, t):
        return F.layer_norm(t, (t.shape[-1],), w, b, eps=1e-6)

    def attn(t):
        B, N, C = t.shape
        qkv_bias = torch.cat([p["q_bias"], torch.zeros_like(p["q_bias"]),
                              p["v_bias"]])
        qkv = F.linear(t, p["qkv_w"], qkv_bias)
        qkv = qkv.reshape(B, N, 3, n_heads, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q * head_dim ** -0.5) @ k.transpose(-2, -1)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, -1)
        return F.linear(o, p["proj_w"], p["proj_b"])

    def mlp(t):
        h = F.gelu(F.linear(t, p["fc1_w"], p["fc1_b"]))
        return F.linear(h, p["fc2_w"], p["fc2_b"])

    if postnorm:
        x = x + ln(p["n1_w"], p["n1_b"], attn(x))
        x = x + ln(p["n2_w"], p["n2_b"], mlp(x))
    else:
        x = x + attn(ln(p["n1_w"], p["n1_b"], x))
        x = x + mlp(ln(p["n2_w"], p["n2_b"], x))
    return x


@pytest.mark.parametrize("postnorm", [False, True])
def test_block_matches_torch_rederivation(postnorm):
    cfg = VisionConfig(image_size=28, patch_size=14, width=32, layers=1,
                       head_width=8, mlp_ratio=4.0, num_classes=0,
                       postnorm=postnorm)
    rng = np.random.default_rng(0)
    w, hidden, ahd = 32, 128, 32

    def rand(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    tp = {
        "qkv_w": torch.tensor(rand(3 * ahd, w)),
        "q_bias": torch.tensor(rand(ahd)),
        "v_bias": torch.tensor(rand(ahd)),
        "proj_w": torch.tensor(rand(w, ahd)),
        "proj_b": torch.tensor(rand(w)),
        "fc1_w": torch.tensor(rand(hidden, w)),
        "fc1_b": torch.tensor(rand(hidden)),
        "fc2_w": torch.tensor(rand(w, hidden)),
        "fc2_b": torch.tensor(rand(w)),
        "n1_w": torch.tensor(1 + rand(w)), "n1_b": torch.tensor(rand(w)),
        "n2_w": torch.tensor(1 + rand(w)), "n2_b": torch.tensor(rand(w)),
    }
    jp = {
        "norm1": {"scale": jnp.asarray(tp["n1_w"].numpy()),
                  "bias": jnp.asarray(tp["n1_b"].numpy())},
        "norm2": {"scale": jnp.asarray(tp["n2_w"].numpy()),
                  "bias": jnp.asarray(tp["n2_b"].numpy())},
        "attn": {
            "qkv": {"kernel": jnp.asarray(tp["qkv_w"].numpy().T)},
            "q_bias": jnp.asarray(tp["q_bias"].numpy()),
            "v_bias": jnp.asarray(tp["v_bias"].numpy()),
            "proj": {"kernel": jnp.asarray(tp["proj_w"].numpy().T),
                     "bias": jnp.asarray(tp["proj_b"].numpy())},
        },
        "mlp": {
            "fc1": {"kernel": jnp.asarray(tp["fc1_w"].numpy().T),
                    "bias": jnp.asarray(tp["fc1_b"].numpy())},
            "fc2": {"kernel": jnp.asarray(tp["fc2_w"].numpy().T),
                    "bias": jnp.asarray(tp["fc2_b"].numpy())},
        },
    }
    x = rand(2, 5, w)
    with torch.no_grad():
        ref = _torch_block(tp, torch.tensor(x), postnorm, 4, 8).numpy()
    ours = np.asarray(vit._block(cfg, jp, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_patch_embed_matches_torch_conv():
    """Patchify-matmul ≡ Conv2d(k=p, s=p) under the converter's reshape."""
    rng = np.random.default_rng(1)
    p_sz, c, w = 14, 3, 32
    conv_w = rng.standard_normal((w, c, p_sz, p_sz)).astype(np.float32) * 0.05
    conv_b = rng.standard_normal(w).astype(np.float32)
    img = rng.standard_normal((2, c, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = F.conv2d(torch.tensor(img), torch.tensor(conv_w),
                       torch.tensor(conv_b), stride=p_sz)
        ref = ref.flatten(2).transpose(1, 2).numpy()  # [B, N, w]

    # converter layout: [w, c, p, p] → [p, p, c, w] → [(p p c), w]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(p_sz * p_sz * c, w)
    params = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(conv_b)}
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    ours = np.asarray(L.patch_embed(params, img_nhwc, p_sz))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_forward_features_shape_and_finite():
    params = vit.init(jax.random.PRNGKey(0), CFG)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    feats = vit.forward_features(params, CFG, imgs)
    assert feats.shape == (2, CFG.seq_len, CFG.width)
    assert np.isfinite(np.asarray(feats)).all()


def test_avg_pool_tokens_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 6)).astype(np.float32)  # 4x4 grid
    with torch.no_grad():
        t = torch.tensor(x).permute(0, 2, 1).reshape(2, 6, 4, 4)
        ref = F.avg_pool2d(t, kernel_size=2, stride=2)
        ref = ref.reshape(2, 6, -1).permute(0, 2, 1).numpy()
    ours = np.asarray(L.avg_pool_tokens(jnp.asarray(x), 4))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_shared_rel_pos_bias_variant():
    """use_shared_rel_pos_bias: index table symmetry + forward sanity."""
    from emu_tpu.models.vit import relative_position_index
    import dataclasses
    idx = relative_position_index(2)        # 2x2 grid + cls
    assert idx.shape == (5, 5)
    n_rel = (2 * 2 - 1) ** 2 + 3
    assert idx.max() == n_rel - 1            # cls->cls bucket
    assert (idx[1:, 1:].T == idx[1:, 1:][::1][:, ::1].T).all()
    # relative offsets are antisymmetric -> idx[i,j] pairs with idx[j,i]
    assert idx[1, 2] != idx[2, 1]

    cfg = dataclasses.replace(CFG, use_shared_rel_pos_bias=True)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    assert params["rel_pos_bias"].shape == ((2 * cfg.grid_size - 1) ** 2 + 3,
                                            cfg.num_heads)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 3))
    base = vit.forward_features(vit.init(jax.random.PRNGKey(0),
                                         CFG), CFG, imgs)
    # non-uniform bias changes the output (a constant shift would be
    # softmax-invariant)
    params["rel_pos_bias"] = 0.5 * jax.random.normal(
        jax.random.PRNGKey(2), params["rel_pos_bias"].shape)
    out = vit.forward_features(params, cfg, imgs)
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_swiglu_subln_block_matches_torch():
    """EVA SwiGLU + sub-LN variant vs independent torch re-derivation
    (ref Emu2/emu/eva_vit.py SwiGLU :110-140, inner_attn_ln)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, layers=1, naiveswiglu=True, subln=True)
    rng = np.random.default_rng(3)
    w, hidden, ahd = 32, 128, 32

    def rand(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    tp = {k: torch.tensor(v) for k, v in {
        "qkv_w": rand(3 * ahd, w), "q_bias": rand(ahd), "v_bias": rand(ahd),
        "proj_w": rand(w, ahd), "proj_b": rand(w),
        "w1_w": rand(hidden, w), "w1_b": rand(hidden),
        "w2_w": rand(hidden, w), "w2_b": rand(hidden),
        "w3_w": rand(w, hidden), "w3_b": rand(w),
        "n1_w": 1 + rand(w), "n1_b": rand(w),
        "n2_w": 1 + rand(w), "n2_b": rand(w),
        "iln_w": 1 + rand(ahd), "iln_b": rand(ahd),
        "fln_w": 1 + rand(hidden), "fln_b": rand(hidden),
    }.items()}

    def torch_fwd(x):
        def ln(wt, b, t):
            return F.layer_norm(t, (t.shape[-1],), wt, b, eps=1e-6)
        B, N, C = x.shape
        h = ln(tp["n1_w"], tp["n1_b"], x)
        qkv_bias = torch.cat([tp["q_bias"], torch.zeros_like(tp["q_bias"]),
                              tp["v_bias"]])
        qkv = F.linear(h, tp["qkv_w"], qkv_bias)
        qkv = qkv.reshape(B, N, 3, 4, 8).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = ((q * 8 ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, -1)
        o = ln(tp["iln_w"], tp["iln_b"], o)          # inner_attn_ln
        x = x + F.linear(o, tp["proj_w"], tp["proj_b"])
        h = ln(tp["n2_w"], tp["n2_b"], x)
        x1 = F.linear(h, tp["w1_w"], tp["w1_b"])
        x2 = F.linear(h, tp["w2_w"], tp["w2_b"])
        g = F.silu(x1) * x2
        g = ln(tp["fln_w"], tp["fln_b"], g)          # ffn_ln
        return x + F.linear(g, tp["w3_w"], tp["w3_b"])

    jp = {
        "norm1": {"scale": jnp.asarray(tp["n1_w"].numpy()),
                  "bias": jnp.asarray(tp["n1_b"].numpy())},
        "norm2": {"scale": jnp.asarray(tp["n2_w"].numpy()),
                  "bias": jnp.asarray(tp["n2_b"].numpy())},
        "attn": {
            "qkv": {"kernel": jnp.asarray(tp["qkv_w"].numpy().T)},
            "q_bias": jnp.asarray(tp["q_bias"].numpy()),
            "v_bias": jnp.asarray(tp["v_bias"].numpy()),
            "proj": {"kernel": jnp.asarray(tp["proj_w"].numpy().T),
                     "bias": jnp.asarray(tp["proj_b"].numpy())},
            "inner_ln": {"scale": jnp.asarray(tp["iln_w"].numpy()),
                         "bias": jnp.asarray(tp["iln_b"].numpy())},
        },
        "mlp": {
            "w1": {"kernel": jnp.asarray(tp["w1_w"].numpy().T),
                   "bias": jnp.asarray(tp["w1_b"].numpy())},
            "w2": {"kernel": jnp.asarray(tp["w2_w"].numpy().T),
                   "bias": jnp.asarray(tp["w2_b"].numpy())},
            "w3": {"kernel": jnp.asarray(tp["w3_w"].numpy().T),
                   "bias": jnp.asarray(tp["w3_b"].numpy())},
            "ffn_ln": {"scale": jnp.asarray(tp["fln_w"].numpy()),
                       "bias": jnp.asarray(tp["fln_b"].numpy())},
        },
    }
    x = rand(2, 5, w)
    with torch.no_grad():
        ref = torch_fwd(torch.tensor(x)).numpy()
    ours = np.asarray(vit._block(cfg, jp, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vit_w8a8_forward_close():
    """W8A8-quantized ViT (int8-MXU path) tracks the fp32 forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.config import VisionConfig
    from emu_tpu.models import vit
    from emu_tpu.ops.quant import VIT_PATTERNS, quantize_tree
    cfg = VisionConfig(width=128, layers=3, head_width=32, image_size=56,
                       num_classes=0)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))
    ref = np.asarray(vit.forward_features(params, cfg, img))
    qp = quantize_tree(params, VIT_PATTERNS, act_quant=True)
    assert "kernel_w8a8" in qp["blocks"]["attn"]["qkv"]
    out = np.asarray(vit.forward_features(qp, cfg, img))
    cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
    assert cos > 0.995, cos
