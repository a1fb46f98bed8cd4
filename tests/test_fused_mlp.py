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


# --- W8A8 (int8 MXU) paths ---------------------------------------------------


def test_dense_w8a8_close_to_fp32():
    from emu_tpu.ops.quant import quantize_tree
    ks = iter(jax.random.split(jax.random.PRNGKey(12), 4))
    p = {"fc": L.dense_init(next(ks), 256, 320)}
    p["fc"]["kernel"] = jax.random.normal(next(ks), (256, 320)) * 0.05
    p["fc"]["bias"] = jax.random.normal(next(ks), (320,)) * 0.1
    x = jax.random.normal(next(ks), (4, 33, 256))
    ref = np.asarray(L.dense(p["fc"], x))
    q = quantize_tree(p, patterns=(r"fc/kernel$",), act_quant=True)
    assert "kernel_w8a8" in q["fc"]
    out = np.asarray(L.dense(q["fc"], x))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_einsum_w8a8_matches_dequant():
    from emu_tpu.ops.quant import einsum_w8a8, quantize_kernel
    ks = iter(jax.random.split(jax.random.PRNGKey(13), 4))
    b, s, w, h, d = 2, 9, 64, 4, 16
    x = jax.random.normal(next(ks), (b, s, w))
    kern = jax.random.normal(next(ks), (w, h * d)) * 0.05
    q = quantize_kernel(kern)
    ref = jnp.einsum("bsm,mhd->bhsd", x, kern.reshape(w, h, d))
    out = einsum_w8a8("bsm,mhd->bhsd", x, q["kernel_q8"].reshape(w, h, d),
                      q["scale"].reshape(h, d)[None, :, None, :])
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / \
        np.abs(np.asarray(ref)).mean()
    assert rel < 0.02, rel
    # proj form: contract two axes, per-token scale over them
    o = jax.random.normal(next(ks), (b, h, s, d))
    kern2 = jax.random.normal(jax.random.PRNGKey(9), (h * d, w)) * 0.05
    q2 = quantize_kernel(kern2)
    ref2 = jnp.einsum("bhsd,hdw->bsw", o, kern2.reshape(h, d, w))
    out2 = einsum_w8a8("bhsd,hdw->bsw", o, q2["kernel_q8"].reshape(h, d, w),
                       q2["scale"], token_axes=(1, 3))
    rel2 = np.abs(np.asarray(out2) - np.asarray(ref2)).mean() / \
        np.abs(np.asarray(ref2)).mean()
    assert rel2 < 0.02, rel2


def test_fused_mlp_w8a8_close_to_fp32():
    from emu_tpu.ops.fused_mlp import fused_mlp_w8a8
    from emu_tpu.ops.quant import quantize_kernel
    p = _params("gelu")
    x = jax.random.normal(jax.random.PRNGKey(14), (70, 256))
    ref = np.asarray(L.gelu_mlp(p, x))
    q1 = quantize_kernel(p["fc1"]["kernel"])
    q2 = quantize_kernel(p["fc2"]["kernel"])
    out = np.asarray(fused_mlp_w8a8(
        x, q1["kernel_q8"], q1["scale"], p["fc1"]["bias"],
        q2["kernel_q8"], q2["scale"], p["fc2"]["bias"],
        bm=64, bf=256, interpret=True))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


def test_fused_mlp_w8a8_ln_residual():
    from emu_tpu.ops.fused_mlp import fused_mlp_w8a8
    from emu_tpu.ops.quant import quantize_kernel
    ks = iter(jax.random.split(jax.random.PRNGKey(15), 4))
    p = _params("gelu")
    x = jax.random.normal(next(ks), (70, 256))
    lns = 1.0 + 0.1 * jax.random.normal(next(ks), (256,))
    lnb = 0.1 * jax.random.normal(next(ks), (256,))
    xn = L.layer_norm({"scale": lns, "bias": lnb}, x)
    ref = np.asarray(x + L.gelu_mlp(p, xn))
    q1 = quantize_kernel(p["fc1"]["kernel"])
    q2 = quantize_kernel(p["fc2"]["kernel"])
    out = np.asarray(fused_mlp_w8a8(
        x, q1["kernel_q8"], q1["scale"], p["fc1"]["bias"],
        q2["kernel_q8"], q2["scale"], p["fc2"]["bias"], lns, lnb,
        ln_mode="pre", residual=True, bm=64, bf=256, interpret=True))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


# --- W4A8 (packed-int4 MXU) path ---------------------------------------------


def test_matmul_q4_matches_dequant():
    """The pallas W4A8 matmul tracks the dequantized-int4 reference; the
    residual error is the per-token int8 activation quantization."""
    from emu_tpu.ops.q4_matmul import matmul_q4
    from emu_tpu.ops.quant import dequantize_int4, quantize_kernel_int4
    ks = iter(jax.random.split(jax.random.PRNGKey(21), 3))
    k, n = 256, 192
    x = jax.random.normal(next(ks), (5, 1, k))
    kern = jax.random.normal(next(ks), (k, n)) * 0.05
    q = quantize_kernel_int4(kern, group_size=128)
    bias = jax.random.normal(next(ks), (n,)) * 0.1
    w = dequantize_int4(q, jnp.float32)
    ref = np.asarray(x @ w + bias)
    out = np.asarray(matmul_q4(x, q["kernel_q4"], q["scale4"], bias,
                               bm=32, bn=128, interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_matmul_q4_n_padding():
    from emu_tpu.ops.q4_matmul import matmul_q4
    from emu_tpu.ops.quant import dequantize_int4, quantize_kernel_int4
    ks = iter(jax.random.split(jax.random.PRNGKey(22), 2))
    k, n = 256, 96                          # n not a multiple of bn
    x = jax.random.normal(next(ks), (3, k))
    kern = jax.random.normal(next(ks), (k, n)) * 0.05
    q = quantize_kernel_int4(kern, group_size=128)
    ref = np.asarray(x @ dequantize_int4(q, jnp.float32))
    out = np.asarray(matmul_q4(x, q["kernel_q4"], q["scale4"],
                               bm=32, bn=128, interpret=True))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_fused_swiglu_q4_matches_reference():
    """One-call W4A8 swiglu block (rms → gate_up int4 → silu·mul → down
    int4 → +residual) tracks the dequantized-int4 reference chain."""
    from emu_tpu.ops.q4_matmul import fused_swiglu_q4
    from emu_tpu.ops.quant import dequantize_int4, quantize_kernel_int4
    ks = iter(jax.random.split(jax.random.PRNGKey(30), 5))
    d, f, m = 512, 2048, 5
    x = jax.random.normal(next(ks), (m, 1, d))
    rms = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
    w_gu = jax.random.normal(next(ks), (d, 2 * f)) * 0.05
    w_dn = jax.random.normal(next(ks), (f, d)) * 0.05
    q_gu = quantize_kernel_int4(w_gu)
    q_dn = quantize_kernel_int4(w_dn)

    xn = L.rms_norm(rms, x)
    gu = xn @ dequantize_int4(q_gu, jnp.float32)
    g, u = jnp.split(gu, 2, axis=-1)
    ref = np.asarray(x + (jax.nn.silu(g) * u)
                     @ dequantize_int4(q_dn, jnp.float32))

    out = np.asarray(fused_swiglu_q4(
        x, rms, q_gu["kernel_q4"], q_gu["scale4"],
        q_dn["kernel_q4"], q_dn["scale4"], interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


def test_fused_swiglu_q4_full_block_batch():
    """m > 8 drives obm == bm (full 32-row block): the pad-row concats
    must vanish — zero-row pads are invalid Mosaic broadcasts and killed
    the b32 packed-int4 decode lane on chip (probe r3)."""
    from emu_tpu.ops.q4_matmul import fused_swiglu_q4
    from emu_tpu.ops.quant import dequantize_int4, quantize_kernel_int4
    ks = iter(jax.random.split(jax.random.PRNGKey(32), 4))
    d, f, m = 512, 2048, 32
    x = jax.random.normal(next(ks), (m, 1, d))
    rms = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
    w_gu = jax.random.normal(next(ks), (d, 2 * f)) * 0.05
    w_dn = jax.random.normal(next(ks), (f, d)) * 0.05
    q_gu = quantize_kernel_int4(w_gu)
    q_dn = quantize_kernel_int4(w_dn)

    xn = L.rms_norm(rms, x)
    gu = xn @ dequantize_int4(q_gu, jnp.float32)
    g, u = jnp.split(gu, 2, axis=-1)
    ref = np.asarray(x + (jax.nn.silu(g) * u)
                     @ dequantize_int4(q_dn, jnp.float32))
    out = np.asarray(fused_swiglu_q4(
        x, rms, q_gu["kernel_q4"], q_gu["scale4"],
        q_dn["kernel_q4"], q_dn["scale4"], interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


def test_fused_swiglu_q4_group_size_256():
    """group_size=256 layouts (gs_f=256 with the default bf=384 request)
    must snap the F-block to the group grid — the old blocking logic
    diverged (bf marched negative) and hung at trace time."""
    from emu_tpu.ops.q4_matmul import fused_swiglu_q4
    from emu_tpu.ops.quant import dequantize_int4, quantize_kernel_int4
    ks = iter(jax.random.split(jax.random.PRNGKey(31), 4))
    d, f, m = 512, 2048, 3
    x = jax.random.normal(next(ks), (m, 1, d))
    rms = 1.0 + 0.1 * jax.random.normal(next(ks), (d,))
    w_gu = jax.random.normal(next(ks), (d, 2 * f)) * 0.05
    w_dn = jax.random.normal(next(ks), (f, d)) * 0.05
    q_gu = quantize_kernel_int4(w_gu, group_size=256)
    q_dn = quantize_kernel_int4(w_dn, group_size=256)

    xn = L.rms_norm(rms, x)
    gu = xn @ dequantize_int4(q_gu, jnp.float32)
    g, u = jnp.split(gu, 2, axis=-1)
    ref = np.asarray(x + (jax.nn.silu(g) * u)
                     @ dequantize_int4(q_dn, jnp.float32))
    out = np.asarray(fused_swiglu_q4(
        x, rms, q_gu["kernel_q4"], q_gu["scale4"],
        q_dn["kernel_q4"], q_dn["scale4"], interpret=True))
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.05, rel


def test_fused_swiglu_q4_plan_gates():
    from emu_tpu.ops.q4_matmul import swiglu_q4_plan
    import jax as _jax
    from emu_tpu.ops.quant import quantize_kernel_int4
    w_gu = jnp.zeros((512, 4096))
    w_dn = jnp.zeros((2048, 512))
    p = {"gate_up": quantize_kernel_int4(w_gu),
         "down": quantize_kernel_int4(w_dn)}
    x = jnp.zeros((8, 1, 512))
    # CPU backend → False regardless of layout
    assert swiglu_q4_plan(jnp.ones((512,)), p, x) is False
