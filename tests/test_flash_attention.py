"""Pallas flash attention vs the XLA reference path (interpret mode, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emu_tpu.ops.attention import _xla_attention
from emu_tpu.ops.flash_attention import (_STREAMING_THRESHOLD,
                                         _flash_streaming, batched_mha,
                                         flash_attention)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("d", [88, 128])
def test_flash_matches_xla_unmasked(d):
    b, s, h = 2, 257, 4
    q, k, v = (_rand(i, (b, s, h, d)) for i in range(3))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, False)
    out = flash_attention(q, k, v, scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_flash_causal_with_padding():
    b, s, h, d = 2, 130, 2, 64
    q, k, v = (_rand(i + 10, (b, s, h, d)) for i in range(3))
    kv_valid = np.ones((b, s), np.int32)
    kv_valid[0, :7] = 0                     # left padding
    ref = _xla_attention(q, k, v, None, None, jnp.asarray(kv_valid),
                         d ** -0.5, True)
    out = flash_attention(q, k, v, kv_valid=jnp.asarray(kv_valid),
                          scale=d ** -0.5, causal=True, interpret=True)
    valid = kv_valid.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("causal,with_valid,d", [
    (False, False, 88), (True, False, 64), (True, True, 64),
])
def test_flash_backward_matches_xla_grads(causal, with_valid, d):
    """Custom-VJP flash backward vs XLA autodiff through the reference
    attention — dq/dk/dv all compared (the xformers-backward equivalent,
    ref Emu1/models/eva_vit_model.py:22)."""
    b, s, h = 2, 130, 2
    q, k, v = (_rand(i + 40, (b, s, h, d)) for i in range(3))
    kv_valid = None
    cot = np.array(_rand(50, (b, s, h, d)))      # copy: jnp views are RO
    if with_valid:
        kvn = np.ones((b, s), np.int32)
        kvn[0, :9] = 0
        kv_valid = jnp.asarray(kvn)
        # fully-masked (left-pad) query rows hold garbage by contract and
        # their loss contribution is always masked in training — the XLA
        # path degenerates to uniform attention there (leaking gradient
        # into every v row), the flash backward zeroes them; neither is
        # observable through a masked loss, so exclude them here.
        cot[0, :9] = 0.0
    cot = jnp.asarray(cot)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv_valid=kv_valid, scale=d ** -0.5,
                              causal=causal, interpret=True)
        return jnp.sum(out * cot)

    def loss_ref(q, k, v):
        out = _xla_attention(q, k, v, None, None, kv_valid, d ** -0.5,
                             causal)
        return jnp.sum(out * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-2, atol=2e-3,
                                   err_msg=f"d{name}")


@pytest.mark.parametrize("with_valid,sq,skv", [
    (False, 130, 130), (True, 130, 130), (False, 96, 160),
])
def test_flash_backward_tiled_matches_whole(monkeypatch, with_valid, sq, skv):
    """The 2D-tiled causal-skip backward (routes in at S >= 4096 on chip)
    must produce the same gradients as the whole-KV backward; forced here
    at small sizes via the routing threshold."""
    from emu_tpu.ops import flash_attention as fa

    b, h, d = 2, 2, 64
    q = _rand(1, (b, sq, h, d))
    k = _rand(2, (b, skv, h, d))
    v = _rand(3, (b, skv, h, d))
    cot = jnp.asarray(np.array(_rand(4, (b, sq, h, d))))
    kv_valid = None
    if with_valid:
        kvn = np.ones((b, skv), np.int32)
        kvn[1, -11:] = 0
        kv_valid = jnp.asarray(kvn)

    def loss(q, k, v):
        out = flash_attention(q, k, v, kv_valid=kv_valid, scale=d ** -0.5,
                              causal=True, interpret=True)
        return jnp.sum(out * cot)

    g_whole = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(fa, "_BWD_SKIP_MIN", 8)
    jax.clear_caches()     # the jitted wrapper must re-trace the new route
    g_tiled = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g_tiled, g_whole):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"d{name}")


def test_flash_backward_cross_lengths():
    """Sq != Skv (causal offset) gradients."""
    b, h, d = 1, 2, 32
    sq, skv = 64, 130
    q = _rand(60, (b, sq, h, d))
    k = _rand(61, (b, skv, h, d))
    v = _rand(62, (b, skv, h, d))
    cot = _rand(63, (b, sq, h, d))

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) * cot)
        return inner

    flash_fn = lambda q, k, v: flash_attention(
        q, k, v, scale=d ** -0.5, causal=True, interpret=True)
    ref_fn = lambda q, k, v: _xla_attention(q, k, v, None, None, None,
                                            d ** -0.5, True)
    g1 = jax.grad(loss(flash_fn), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-2, atol=2e-3,
                                   err_msg=f"d{name}")


def test_flash_cross_lengths():
    """Sq != Skv with causal offset (decode-against-cache alignment)."""
    b, h, d = 1, 2, 32
    sq, skv = 129, 260
    q = _rand(20, (b, sq, h, d))
    k = _rand(21, (b, skv, h, d))
    v = _rand(22, (b, skv, h, d))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, True)
    out = flash_attention(q, k, v, scale=d ** -0.5, causal=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


# --- streaming (multi-kv-block running-softmax) variant --------------------


@pytest.mark.parametrize("causal", [False, True])
def test_streaming_matches_xla(causal):
    """Small bk forces several kv blocks through the running softmax."""
    b, h, d = 2, 2, 64
    sq, skv = 67, 300
    q = _rand(30, (b, sq, h, d))
    k = _rand(31, (b, skv, h, d))
    v = _rand(32, (b, skv, h, d))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, causal)
    out = _flash_streaming(q, k, v, None, d ** -0.5, causal, True, bk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_streaming_fully_masked_leading_block():
    """Left padding covering a whole kv block must wash out of the
    accumulator via the exp(m_prev - m_new) correction."""
    b, h, d = 1, 2, 32
    sq = skv = 264
    q, k, v = (_rand(40 + i, (b, s_, h, d)) for i, s_ in
               enumerate((sq, skv, skv)))
    kv_valid = np.ones((b, skv), np.int32)
    kv_valid[0, :128] = 0                    # block 0 (bk=128) fully masked
    ref = _xla_attention(q, k, v, None, None, jnp.asarray(kv_valid),
                         d ** -0.5, True)
    out = _flash_streaming(q, k, v, jnp.asarray(kv_valid), d ** -0.5, True,
                           True, bk=128)
    valid = kv_valid.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid],
                               rtol=2e-3, atol=2e-3)


def test_streaming_routing_threshold():
    """flash_attention auto-routes to the streaming kernel past the
    VMEM-whole-K/V ceiling (decode-shaped: short q, long cache)."""
    b, h, d = 1, 2, 64
    sq, skv = 16, _STREAMING_THRESHOLD + 128
    q = _rand(50, (b, sq, h, d))
    k = _rand(51, (b, skv, h, d))
    v = _rand(52, (b, skv, h, d))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, True)
    out = flash_attention(q, k, v, scale=d ** -0.5, causal=True,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


# --- per-batch all-heads kernel (short unmasked self-attention) -------------


@pytest.mark.parametrize("s,d", [(257, 88), (130, 64)])
def test_batched_mha_matches_xla(s, d):
    """ViT-shaped: odd sequence, non-128 head dim, all heads per program."""
    b, h = 2, 4
    q, k, v = (_rand(60 + i, (b, s, h, d)) for i in range(3))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, False)
    out = batched_mha(q, k, v, scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


# --- packed-QKV kernel (transpose-free ViT path) ----------------------------


@pytest.mark.parametrize("s,h,d", [(257, 16, 88), (136, 8, 112), (96, 4, 64)])
def test_mha_packed_qkv_matches_xla(s, h, d):
    """Consumes [B, S, 3*H*D] q|k|v-packed projections directly."""
    from emu_tpu.ops.flash_attention import mha_packed_qkv, packed_qkv_plan
    b = 2
    assert packed_qkv_plan(h, d, s, 2) is not None
    qkv = _rand(7, (b, s, 3 * h * d))
    q, k, v = (t.reshape(b, s, h, d) for t in jnp.split(qkv, 3, axis=-1))
    ref = _xla_attention(q, k, v, None, None, None, d ** -0.5, False)
    out = mha_packed_qkv(qkv, h, d, scale=d ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(b, s, h * d)),
                               rtol=2e-3, atol=2e-3)


def test_packed_qkv_plan_lane_rule():
    """Head groups must keep (hg*d) % 128 == 0 unless hg == h."""
    from emu_tpu.ops.flash_attention import packed_qkv_plan
    plan = packed_qkv_plan(16, 88, 257, 2)       # ViT-g: only hg=16 is legal
    assert plan is not None and plan[0] == 16
    plan = packed_qkv_plan(16, 112, 1025, 2)     # EVA-4B: 8*112 = 896 = 7*128
    assert plan is not None
    hg = plan[0]
    assert hg == 16 or (hg * 112) % 128 == 0


@pytest.mark.parametrize("s,h,d", [(257, 16, 88), (96, 4, 64)])
def test_mha_bhsd_matches_xla(s, h, d):
    """Head-major kernel with in-kernel q/v projection biases."""
    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd
    b = 2
    plan = bhsd_plan(h, d, s, 2)
    assert plan is not None
    s_pad = plan[2]
    q, k, v = (_rand(40 + i, (b, s, h, d)) for i in range(3))
    qb = _rand(50, (h * d,)) * 0.3
    vb = _rand(51, (h * d,)) * 0.3
    ref = _xla_attention(q + qb.reshape(1, 1, h, d), k,
                         v + vb.reshape(1, 1, h, d), None, None, None,
                         d ** -0.5, False)
    def pad_t(t):
        t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)
    out = mha_bhsd(pad_t(q), pad_t(k), pad_t(v), qb, vb, scale=d ** -0.5,
                   s_real=s, interpret=True)
    out = out.transpose(0, 2, 1, 3)[:, :s]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_mha_bhsd_static_max_matches_rowmax():
    """Opt-in max-pass elimination (EMU_TPU_VIT_STATIC_MAX): with a bound
    inside the safety contract (within +70 of the true row max), outputs
    match the row-max kernel; a bound far BELOW the scores hits the exp
    clip and stays finite (containment, not correctness)."""
    from emu_tpu.ops.flash_attention import bhsd_plan, mha_bhsd
    b, s, h, d = 2, 257, 16, 88
    s_pad = bhsd_plan(h, d, s, 2)[2]
    q, k, v = (_rand(60 + i, (b, s, h, d)) for i in range(3))

    def pad_t(t):
        t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)

    ref = mha_bhsd(pad_t(q), pad_t(k), pad_t(v), scale=d ** -0.5,
                   s_real=s, interpret=True)
    for bound in (10.0, 60.0):           # loose and looser, both in-range
        out = mha_bhsd(pad_t(q), pad_t(k), pad_t(v), scale=d ** -0.5,
                       s_real=s, interpret=True, static_max=bound)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)
    # violation containment: bound 100 BELOW the scores → clipped exp,
    # finite outputs (wrong weighting is the documented failure mode)
    out = mha_bhsd(pad_t(q), pad_t(k), pad_t(v), scale=d ** -0.5,
                   s_real=s, interpret=True, static_max=-100.0)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_decode_attention_matches_xla():
    """Single-query (decode) pallas kernel on the head-major cache ≡ XLA
    attention with kv_valid — MHA and GQA, short and multi-chunk."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.ops.decode_attention import decode_attention

    def check(b, s, h, hkv, d, lens, seed):
        ks = iter(jax.random.split(jax.random.PRNGKey(seed), 4))
        q = jax.random.normal(next(ks), (b, 1, h, d))
        k = jax.random.normal(next(ks), (b, hkv, s, d))   # head-major
        v = jax.random.normal(next(ks), (b, hkv, s, d))
        valid = (jnp.arange(s)[None, :]
                 < jnp.asarray(lens)[:, None]).astype(jnp.int32)
        scale = d ** -0.5
        # oracle: token-major repeat-to-full-heads XLA path
        rep = h // hkv
        k_t = jnp.repeat(k.transpose(0, 2, 1, 3), rep, axis=2)
        v_t = jnp.repeat(v.transpose(0, 2, 1, 3), rep, axis=2)
        ref = np.asarray(_xla_attention(q, k_t, v_t, None, None, valid,
                                        scale, False))
        out = np.asarray(decode_attention(q, k, v, valid, scale=scale,
                                          interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    check(3, 40, 5, 5, 128, [40, 17, 5], 40)       # MHA, one chunk
    check(3, 512, 4, 4, 128, [512, 300, 17], 50)   # MHA, multi-chunk
    check(2, 256, 8, 2, 128, [256, 100], 60)       # GQA rep=4


def test_decode_attention_stacked_layer():
    """Stacked-cache mode: passing the full [L, B, Hkv, S, D] cache with a
    traced layer index ≡ slicing the layer first (the index rides scalar
    prefetch into the kernel's index_maps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.decode_attention import decode_attention

    L, b, s, h, hkv, d = 3, 2, 64, 4, 2, 128
    ks = iter(jax.random.split(jax.random.PRNGKey(80), 3))
    q = jax.random.normal(next(ks), (b, 1, h, d))
    k = jax.random.normal(next(ks), (L, b, hkv, s, d))
    v = jax.random.normal(next(ks), (L, b, hkv, s, d))
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 37])[:, None]).astype(jnp.int32)
    scale = d ** -0.5
    for li in range(L):
        ref = np.asarray(decode_attention(q, k[li], v[li], valid,
                                          scale=scale, interpret=True))
        out = np.asarray(decode_attention(q, k, v, valid, scale=scale,
                                          layer=jnp.int32(li),
                                          interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_decode_attention_stacked_int8_gqa():
    """Stacked cache + int8 scales + GQA (rep > 1) through the batched
    kernel ≡ per-layer dequantized XLA oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.models.llama import kv_quantize
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.ops.decode_attention import decode_attention

    L, b, s, h, hkv, d = 2, 2, 128, 8, 2, 128
    ks = iter(jax.random.split(jax.random.PRNGKey(90), 3))
    q = jax.random.normal(next(ks), (b, 1, h, d))
    k = jax.random.normal(next(ks), (L, b, hkv, s, d))
    v = jax.random.normal(next(ks), (L, b, hkv, s, d))
    kq, kscale = kv_quantize(k)
    vq, vscale = kv_quantize(v)
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 51])[:, None]).astype(jnp.int32)
    scale = d ** -0.5
    rep = h // hkv
    for li in range(L):
        k_deq = (kq[li].astype(jnp.float32) * kscale[li][..., None])
        v_deq = (vq[li].astype(jnp.float32) * vscale[li][..., None])
        k_t = jnp.repeat(k_deq.transpose(0, 2, 1, 3), rep, axis=2)
        v_t = jnp.repeat(v_deq.transpose(0, 2, 1, 3), rep, axis=2)
        ref = np.asarray(_xla_attention(q, k_t, v_t, None, None, valid,
                                        scale, False))
        out = np.asarray(decode_attention(q, kq, vq, valid,
                                          k_scale=kscale, v_scale=vscale,
                                          scale=scale, layer=jnp.int32(li),
                                          interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_decode_attention_int8_native():
    """int8 cache planes consumed natively (scales folded in-kernel)
    track the dequantize-then-attend oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.models.llama import kv_quantize
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.ops.decode_attention import decode_attention
    ks = iter(jax.random.split(jax.random.PRNGKey(70), 3))
    b, s, h, d = 2, 128, 4, 128
    q = jax.random.normal(next(ks), (b, 1, h, d))
    k = jax.random.normal(next(ks), (b, h, s, d))
    v = jax.random.normal(next(ks), (b, h, s, d))
    kq, kscale = kv_quantize(k)
    vq, vscale = kv_quantize(v)
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 70])[:, None]).astype(jnp.int32)
    scale = d ** -0.5
    k_deq = (kq.astype(jnp.float32) * kscale[..., None]).transpose(0, 2, 1, 3)
    v_deq = (vq.astype(jnp.float32) * vscale[..., None]).transpose(0, 2, 1, 3)
    ref = np.asarray(_xla_attention(q, k_deq, v_deq, None, None, valid,
                                    scale, False))
    out = np.asarray(decode_attention(q, kq, vq, valid, k_scale=kscale,
                                      v_scale=vscale, scale=scale,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_decode_attention_extra_kv():
    """Deferred-cache-write mode: the current token's k/v ride as separate
    k_new/v_new operands (one extra always-valid column) — kernel output
    ≡ attending a cache that already contains the row. Covers MHA, GQA,
    stacked-layer, and int8-cache (extra column stays exact bf16/f32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.models.llama import kv_quantize
    from emu_tpu.ops.decode_attention import decode_attention

    def check(b, s, h, hkv, d, lens, seed, quant=False, stacked=1):
        ks = iter(jax.random.split(jax.random.PRNGKey(seed), 5))
        q = jax.random.normal(next(ks), (b, 1, h, d))
        k = jax.random.normal(next(ks), (stacked, b, hkv, s, d))
        v = jax.random.normal(next(ks), (stacked, b, hkv, s, d))
        lens = jnp.asarray(lens)
        # the new token's row occupies slot lens[b]-1 in each row
        slot = lens - 1
        bidx = jnp.arange(b)
        kn = k[0, bidx, :, slot][:, :, None, :]          # [B, Hkv, 1, D]
        vn = v[0, bidx, :, slot][:, :, None, :]
        valid = (jnp.arange(s)[None, :] < lens[:, None]).astype(jnp.int32)
        cache_valid = (valid
                       * (jnp.arange(s)[None, :] != slot[:, None])
                       ).astype(jnp.int32)
        scale = d ** -0.5
        layer = jnp.int32(0) if stacked > 1 else None
        if quant:
            kq, kscale = kv_quantize(k)
            vq, vscale = kv_quantize(v)
            if stacked == 1:
                kq, vq = kq[0], vq[0]
                kscale, vscale = kscale[0], vscale[0]
            # the extra column is consumed exactly (unquantized), so the
            # oracle is the XLA fallback in the same deferred mode: both
            # paths dequantize the cache and read the exact new row
            from emu_tpu.ops.attention import cache_attention
            kv = {"format": "bhsd", "k": kq, "v": vq,
                  "k_scale": kscale, "v_scale": vscale,
                  "dtype": q.dtype, "layer": layer,
                  "k_new": kn, "v_new": vn}
            ref = np.asarray(cache_attention(
                q, kv, kv_valid=cache_valid, scale=scale))
            out = np.asarray(decode_attention(
                q, kq, vq, cache_valid, k_scale=kscale, v_scale=vscale,
                scale=scale, layer=layer, k_new=kn, v_new=vn,
                interpret=True))
            np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
            return
        karr, varr = (k, v) if stacked > 1 else (k[0], v[0])
        ref = np.asarray(decode_attention(q, karr, varr, valid,
                                          scale=scale, layer=layer,
                                          interpret=True))
        out = np.asarray(decode_attention(q, karr, varr, cache_valid,
                                          scale=scale, layer=layer,
                                          k_new=kn, v_new=vn,
                                          interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    check(3, 40, 5, 5, 128, [40, 17, 5], 41)        # MHA, one chunk
    check(3, 512, 4, 4, 128, [512, 300, 17], 51)    # MHA, multi-chunk
    check(2, 256, 8, 2, 128, [256, 100], 61)        # GQA rep=4
    check(2, 64, 4, 2, 128, [64, 30], 71, stacked=3)
    check(2, 128, 8, 2, 128, [128, 51], 81, quant=True, stacked=2)


def test_decode_attention_verify_chunk():
    """Sq > 1 deferred mode (speculative verify): all queries see the
    committed cache columns, query i sees chunk column j iff j <= i —
    kernel ≡ the dense-mask XLA oracle on the fully-written cache."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.ops.decode_attention import decode_attention

    def check(b, s, h, hkv, d, qn, committed, seed):
        ks = iter(jax.random.split(jax.random.PRNGKey(seed), 3))
        q = jax.random.normal(next(ks), (b, qn, h, d))
        k = jax.random.normal(next(ks), (b, hkv, s, d))
        v = jax.random.normal(next(ks), (b, hkv, s, d))
        com = jnp.asarray(committed)                       # [B]
        kn = jnp.stack([k[r, :, com[r]:com[r] + qn] for r in range(b)])
        vn = jnp.stack([v[r, :, com[r]:com[r] + qn] for r in range(b)])
        cache_valid = (jnp.arange(s)[None] < com[:, None]).astype(jnp.int32)
        scale = d ** -0.5
        # oracle: dense mask over the fully-written cache
        rep = h // hkv
        j = jnp.arange(s)[None, None, None, :]
        i = jnp.arange(qn)[None, None, :, None]
        dense = (j < com[:, None, None, None]) | (
            (j >= com[:, None, None, None])
            & (j <= com[:, None, None, None] + i))
        k_t = jnp.repeat(k.transpose(0, 2, 1, 3), rep, axis=2)
        v_t = jnp.repeat(v.transpose(0, 2, 1, 3), rep, axis=2)
        ref = np.asarray(_xla_attention(q, k_t, v_t, None, dense, None,
                                        scale, False))
        out = np.asarray(decode_attention(q, k, v, cache_valid,
                                          scale=scale, k_new=kn, v_new=vn,
                                          interpret=True))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    check(2, 64, 4, 4, 128, 4, [32, 11], 42)       # MHA one chunk
    check(2, 512, 4, 4, 128, 3, [500, 80], 52)     # multi-chunk stream
    check(2, 128, 8, 2, 128, 5, [100, 40], 62)     # GQA rep=4


def test_decode_attention_emu2_33b_dims():
    """The Emu2-33B head geometry (52 heads, head_dim 128 — ref
    Emu2/emu/conf/llama_config/config.json) gets a valid decode-kernel
    VMEM plan and matches the XLA oracle (VERDICT r2 item 1: nothing
    validated 6656-width kernel plans)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.attention import _xla_attention
    from emu_tpu.ops.decode_attention import (decode_attention,
                                              decode_attention_fits)

    # bf16 and int8 cache planes, short and 2k contexts
    for itemsize in (1, 2):
        assert decode_attention_fits(8, 52, 52, 192, 128, itemsize)
        assert decode_attention_fits(8, 52, 52, 2048, 128, itemsize)

    b, s, h, d = 2, 192, 52, 128
    ks = iter(jax.random.split(jax.random.PRNGKey(33), 3))
    q = jax.random.normal(next(ks), (b, 1, h, d))
    k = jax.random.normal(next(ks), (b, h, s, d))      # head-major MHA
    v = jax.random.normal(next(ks), (b, h, s, d))
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 77])[:, None]).astype(jnp.int32)
    scale = d ** -0.5
    ref = np.asarray(_xla_attention(q, k.transpose(0, 2, 1, 3),
                                    v.transpose(0, 2, 1, 3), None, None,
                                    valid, scale, False))
    out = np.asarray(decode_attention(q, k, v, valid, scale=scale,
                                      interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_paged_decode_attention_matches_dense():
    """Paged kernel (page table in scalar prefetch, head-major pool) ≡
    the dense decode kernel over the gathered contiguous view — shuffled
    physical pages, GQA, deferred k_new/v_new column, layer stacking."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.decode_attention import (decode_attention,
                                              paged_decode_attention,
                                              paged_decode_attention_fits)

    L, b, h, hkv, d = 2, 3, 8, 2, 128
    page, P = 16, 4                     # 64 logical positions per row
    n_pages = b * P + 2                 # spare pages stay unreferenced
    s = P * page
    ks = iter(jax.random.split(jax.random.PRNGKey(7), 6))
    pool_k = jax.random.normal(next(ks), (L, n_pages, hkv, page, d))
    pool_v = jax.random.normal(next(ks), (L, n_pages, hkv, page, d))
    # shuffled, non-contiguous page assignment
    perm = np.asarray(jax.random.permutation(next(ks), n_pages))[:b * P]
    table = jnp.asarray(perm.reshape(b, P), jnp.int32)
    q = jax.random.normal(next(ks), (b, 1, h, d))
    lens = [s, 37, 18]
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray(lens)[:, None]).astype(jnp.int32)
    k_new = jax.random.normal(next(ks), (b, hkv, 1, d))
    v_new = jax.random.normal(next(ks), (b, hkv, 1, d))
    scale = d ** -0.5

    assert paged_decode_attention_fits(h, hkv, page, s, d, 4)

    # oracle: gather the contiguous head-major view, dense kernel
    def view(pool, li):
        g = pool[li][table]                        # [B, P, Hkv, page, D]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, s, d)

    for li in range(L):
        ref = np.asarray(decode_attention(
            q, view(pool_k, li), view(pool_v, li), valid, scale=scale,
            k_new=k_new, v_new=v_new, interpret=True))
        out = np.asarray(paged_decode_attention(
            q, pool_k, pool_v, table, valid, scale=scale,
            layer=jnp.int32(li), k_new=k_new, v_new=v_new,
            interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_paged_decode_step_kernel_route_matches_fallback():
    """paged_decode_step through the kernel route (cache_attention paged
    descriptor) ≡ the XLA gather fallback, on the interpret backend."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unittest import mock
    from emu_tpu.config import LlamaConfig
    from emu_tpu.generation.paged_kv import (PageAllocator,
                                             init_paged_cache,
                                             paged_decode_step,
                                             paged_prefill_insert)
    from emu_tpu.models import llama
    from emu_tpu.ops import attention as A
    from emu_tpu.ops import decode_attention as DA

    cfg = LlamaConfig(hidden_size=256, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=2,
                      num_key_value_heads=None, vocab_size=64,
                      extended_vocab_size=64,
                      max_position_embeddings=128)   # head_dim 128
    page, P = 8, 3
    params = llama.init(jax.random.PRNGKey(0), cfg)
    alloc = PageAllocator(8)
    cache = init_paged_cache(cfg, 8, page, max_slots=2, pages_per_slot=P,
                             dtype=jnp.float32)
    prompts = [[5, 17, 3, 42, 8], [9, 2, 71, 4, 33, 12, 60]]
    lasts = []
    for slot, p in enumerate(prompts):
        pages = jnp.asarray(alloc.alloc(-(-(len(p) + 4) // page)),
                            jnp.int32)
        emb = llama.embed(params, jnp.asarray(p)[None])
        hid, cache = paged_prefill_insert(
            params, cfg, cache, emb, jnp.ones((1, len(p)), jnp.int32),
            pages, slot)
        lasts.append(int(jnp.argmax(llama.logits(params, hid[0]))))

    lengths = jnp.asarray([len(p) for p in prompts], jnp.int32)
    sm = jnp.arange(P * page)[None] <= lengths[:, None]
    emb = llama.embed(params, jnp.asarray(lasts)[:, None])

    hid_fb, _ = paged_decode_step(params, cfg, cache, emb, lengths, sm,
                                  lengths)

    # force the kernel route: pretend the backend is TPU, run the pallas
    # kernel in interpret mode
    real = DA.paged_decode_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    with mock.patch.object(jax, "default_backend", lambda: "tpu"), \
         mock.patch.object(DA, "paged_decode_attention", interp), \
         mock.patch.object(A, "cache_attention", A.cache_attention):
        hid_k, _ = paged_decode_step(params, cfg, cache, emb, lengths, sm,
                                     lengths)
    np.testing.assert_allclose(np.asarray(hid_k), np.asarray(hid_fb),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_attention_int8_matches_dense():
    """int8 paged kernel (native int8 pages + pre-gathered logical
    scale planes) ≡ dense int8 kernel over the gathered view."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.decode_attention import (decode_attention,
                                              paged_decode_attention)

    L, b, h, hkv, d = 2, 2, 4, 2, 128
    page, P = 16, 3
    n_pages = b * P
    s = P * page
    ks_it = iter(jax.random.split(jax.random.PRNGKey(11), 8))
    pool_k = jax.random.randint(next(ks_it), (L, n_pages, hkv, page, d),
                                -127, 128, jnp.int8)
    pool_v = jax.random.randint(next(ks_it), (L, n_pages, hkv, page, d),
                                -127, 128, jnp.int8)
    ksc = jax.random.uniform(next(ks_it), (L, n_pages, hkv, page),
                             minval=0.01, maxval=0.03)
    vsc = jax.random.uniform(next(ks_it), (L, n_pages, hkv, page),
                             minval=0.01, maxval=0.03)
    perm = np.asarray(jax.random.permutation(next(ks_it), n_pages))
    table = jnp.asarray(perm.reshape(b, P), jnp.int32)
    q = jax.random.normal(next(ks_it), (b, 1, h, d))
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 29])[:, None]).astype(jnp.int32)
    k_new = jax.random.normal(next(ks_it), (b, hkv, 1, d))
    v_new = jax.random.normal(next(ks_it), (b, hkv, 1, d))
    scale = d ** -0.5

    # pre-gathered logical scale views [L, B, Hkv, S]
    def sview(sc):
        g = sc[:, table]                          # [L, B, P, Hkv, page]
        return g.transpose(0, 1, 3, 2, 4).reshape(L, b, hkv, s)

    def view(pool, li):
        g = pool[li][table]                       # [B, P, Hkv, page, D]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, s, d)

    ks_l, vs_l = sview(ksc), sview(vsc)
    for li in range(L):
        ref = np.asarray(decode_attention(
            q, view(pool_k, li), view(pool_v, li), valid, scale=scale,
            k_scale=ks_l[li], v_scale=vs_l[li], k_new=k_new, v_new=v_new,
            interpret=True))
        out = np.asarray(paged_decode_attention(
            q, pool_k, pool_v, table, valid, scale=scale,
            k_scale=ks_l, v_scale=vs_l, layer=jnp.int32(li),
            k_new=k_new, v_new=v_new, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_paged_decode_attention_verify_chunk():
    """Sq > 1 (speculative verify chunk) through the paged kernel ≡ the
    dense kernel over the gathered view — intra-chunk causal triangle
    included."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.decode_attention import (decode_attention,
                                              paged_decode_attention)

    b, h, hkv, d, qn = 2, 4, 2, 128, 4
    page, P = 16, 2
    n_pages = b * P
    s = P * page
    ks = iter(jax.random.split(jax.random.PRNGKey(21), 6))
    pool_k = jax.random.normal(next(ks), (1, n_pages, hkv, page, d))
    pool_v = jax.random.normal(next(ks), (1, n_pages, hkv, page, d))
    perm = np.asarray(jax.random.permutation(next(ks), n_pages))
    table = jnp.asarray(perm.reshape(b, P), jnp.int32)
    q = jax.random.normal(next(ks), (b, qn, h, d))
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([20, 9])[:, None]).astype(jnp.int32)
    k_new = jax.random.normal(next(ks), (b, hkv, qn, d))
    v_new = jax.random.normal(next(ks), (b, hkv, qn, d))
    scale = d ** -0.5

    def view(pool):
        g = pool[0][table]
        return g.transpose(0, 2, 1, 3, 4).reshape(b, hkv, s, d)

    ref = np.asarray(decode_attention(q, view(pool_k), view(pool_v), valid,
                                      scale=scale, k_new=k_new, v_new=v_new,
                                      interpret=True))
    out = np.asarray(paged_decode_attention(q, pool_k, pool_v, table, valid,
                                            scale=scale, layer=jnp.int32(0),
                                            k_new=k_new, v_new=v_new,
                                            interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_gqa_prefill_flash_repeat_matches_grouped():
    """The GQA long-prefill route (repeat K/V to full heads -> flash
    kernel) ≡ the no-repeat grouped einsum — the dense grouped path
    materializes [B, Hkv, rep, S, S] fp32 logits (4.8 GB at 2k-b8 13B,
    the OOM behind every GQA long-context lane), so long causal prefill
    streams through flash instead."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from emu_tpu.ops.attention import _xla_attention_gqa
    from emu_tpu.ops.flash_attention import flash_attention

    b, s, h, hkv, d = 2, 512, 8, 2, 64
    ks = iter(jax.random.split(jax.random.PRNGKey(5), 3))
    q = jax.random.normal(next(ks), (b, s, h, d))
    k = jax.random.normal(next(ks), (b, s, hkv, d))
    v = jax.random.normal(next(ks), (b, s, hkv, d))
    valid = (jnp.arange(s)[None, :]
             < jnp.asarray([s, 300])[:, None]).astype(jnp.int32)
    scale = d ** -0.5
    ref = np.asarray(_xla_attention_gqa(q, k, v, None, None, valid, scale,
                                        True))
    rep = h // hkv
    out = np.asarray(flash_attention(q, jnp.repeat(k, rep, axis=2),
                                     jnp.repeat(v, rep, axis=2),
                                     kv_valid=valid, scale=scale,
                                     causal=True, interpret=True))
    # compare only valid query rows (invalid rows are masked garbage
    # downstream)
    m = np.asarray(valid, bool)
    np.testing.assert_allclose(out[m], ref[m], rtol=2e-5, atol=2e-5)
