"""Fused pallas MLP (fc1→act→fc2) vs the unfused layers (interpret, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from emu_tpu.ops import layers as L
from emu_tpu.ops.fused_mlp import fused_mlp


def _params(kind, kdim=256, f=700, n=256):
    ks = iter(jax.random.split(jax.random.PRNGKey(0), 8))
    if kind == "gelu":
        p = {"fc1": L.dense_init(next(ks), kdim, f),
             "fc2": L.dense_init(next(ks), f, n)}
        p["fc1"]["bias"] = jax.random.normal(next(ks), (f,)) * 0.1
        p["fc2"]["bias"] = jax.random.normal(next(ks), (n,)) * 0.1
    else:
        p = {"w1": L.dense_init(next(ks), kdim, f),
             "w2": L.dense_init(next(ks), kdim, f),
             "w3": L.dense_init(next(ks), f, n)}
    return p


def test_fused_gelu_matches_unfused():
    """Hidden dim 700 isn't a multiple of bf=128 — exercises padding."""
    p = _params("gelu")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 35, 256), jnp.float32)
    ref = L.gelu_mlp(p, x)
    out = fused_mlp(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"],
                    bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_swiglu_matches_unfused():
    p = _params("swiglu")
    x = jax.random.normal(jax.random.PRNGKey(2), (70, 256), jnp.float32)
    ref = L.swiglu_mlp(p, x)
    out = fused_mlp(x, p["w1"]["kernel"], p["w1"]["bias"],
                    p["w2"]["kernel"], p["w2"]["bias"],
                    p["w3"]["kernel"], p["w3"]["bias"],
                    activation="swiglu", bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gelu_no_bias():
    p = _params("gelu")
    del p["fc1"]["bias"], p["fc2"]["bias"]
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 256), jnp.float32)
    ref = L.gelu_mlp(p, x)
    out = fused_mlp(x, p["fc1"]["kernel"], None, p["fc2"]["kernel"], None,
                    bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_erf_accuracy():
    """In-kernel A&S erf approximation vs lax.erf: ~4e-7 in fp32."""
    from emu_tpu.ops.fused_mlp import _erf
    x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(_erf(x)),
                               np.asarray(jax.lax.erf(x)),
                               atol=1e-6)


def test_fused_block_prenorm_residual():
    """x + mlp(LN(x)) — the Emu1 pre-norm MLP branch in one kernel."""
    p = _params("gelu", kdim=256, f=512, n=256)
    ln = L.layer_norm_init(256)
    ln["scale"] = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(9), (256,))
    ln["bias"] = 0.1 * jax.random.normal(jax.random.PRNGKey(10), (256,))
    x = jax.random.normal(jax.random.PRNGKey(4), (72, 256), jnp.float32)
    ref = x + L.gelu_mlp(p, L.layer_norm(ln, x, 1e-6))
    from emu_tpu.ops.fused_mlp import fused_mlp
    out = fused_mlp(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"],
                    ln_scale=ln["scale"], ln_bias=ln["bias"],
                    ln_mode="pre", residual=True, eps=1e-6,
                    bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_postnorm_residual():
    """x + LN(mlp(x)) — the Emu2 post-norm MLP branch in one kernel."""
    p = _params("gelu", kdim=256, f=512, n=256)
    ln = L.layer_norm_init(256)
    ln["scale"] = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(11), (256,))
    ln["bias"] = 0.1 * jax.random.normal(jax.random.PRNGKey(12), (256,))
    x = jax.random.normal(jax.random.PRNGKey(5), (72, 256), jnp.float32)
    ref = x + L.layer_norm(ln, L.gelu_mlp(p, x), 1e-6)
    from emu_tpu.ops.fused_mlp import fused_mlp
    out = fused_mlp(x, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"],
                    ln_scale=ln["scale"], ln_bias=ln["bias"],
                    ln_mode="post", residual=True, eps=1e-6,
                    bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_fused_block_swiglu_prenorm():
    p = _params("swiglu", kdim=256, f=512, n=256)
    ln = L.layer_norm_init(256)
    x = jax.random.normal(jax.random.PRNGKey(6), (72, 256), jnp.float32)
    ref = x + L.swiglu_mlp(p, L.layer_norm(ln, x, 1e-6))
    from emu_tpu.ops.fused_mlp import fused_mlp
    out = fused_mlp(x, p["w1"]["kernel"], p["w1"]["bias"],
                    p["w2"]["kernel"], p["w2"]["bias"],
                    p["w3"]["kernel"], p["w3"]["bias"],
                    ln_scale=ln["scale"], ln_bias=ln["bias"],
                    activation="swiglu", ln_mode="pre", residual=True,
                    eps=1e-6, bm=64, bf=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


# --- fused single dense ([LN→] matmul [→LN] [+residual]) --------------------


def _dense_ref(x, w, b, lns=None, lnb=None, res=None, ln_mode=None, eps=1e-6):
    if ln_mode == "pre":
        x = L.layer_norm({"scale": lns, "bias": lnb}, x, eps)
    y = L.dense({"kernel": w, "bias": b} if b is not None else {"kernel": w},
                x)
    if ln_mode == "post":
        y = L.layer_norm({"scale": lns, "bias": lnb}, y, eps)
    if res is not None:
        y = y + res
    return y


def test_fused_dense_pre_ln():
    from emu_tpu.ops.fused_mlp import fused_dense
    ks = iter(jax.random.split(jax.random.PRNGKey(9), 8))
    x = jax.random.normal(next(ks), (3, 70, 256))
    w = jax.random.normal(next(ks), (256, 384)) * 0.05
    b = jax.random.normal(next(ks), (384,)) * 0.1
    lns = 1.0 + 0.1 * jax.random.normal(next(ks), (256,))
    lnb = 0.1 * jax.random.normal(next(ks), (256,))
    ref = _dense_ref(x, w, b, lns, lnb, ln_mode="pre")
    out = fused_dense(x, w, b, lns, lnb, ln_mode="pre", bm=64, bn=128,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_dense_post_ln_residual():
    from emu_tpu.ops.fused_mlp import fused_dense
    ks = iter(jax.random.split(jax.random.PRNGKey(10), 8))
    x = jax.random.normal(next(ks), (130, 256))
    w = jax.random.normal(next(ks), (256, 256)) * 0.05
    res = jax.random.normal(next(ks), (130, 256))
    lns = 1.0 + 0.1 * jax.random.normal(next(ks), (256,))
    lnb = 0.1 * jax.random.normal(next(ks), (256,))
    ref = _dense_ref(x, w, None, lns, lnb, res=res, ln_mode="post")
    out = fused_dense(x, w, None, lns, lnb, residual=res, ln_mode="post",
                      bm=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_dense_plain_matmul():
    from emu_tpu.ops.fused_mlp import fused_dense
    ks = iter(jax.random.split(jax.random.PRNGKey(11), 4))
    x = jax.random.normal(next(ks), (64, 128))
    w = jax.random.normal(next(ks), (128, 256)) * 0.05
    ref = _dense_ref(x, w, None)
    out = fused_dense(x, w, bm=64, bn=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
