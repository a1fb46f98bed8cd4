"""Diffusion stack tests: layer numerics vs torch, scheduler math, UNet/VAE.

Layer ops are checked against torch's own conv/group-norm (the numerical
spec of the diffusers blocks); schedulers are validated functionally — with
an oracle noise-predictor, the reverse process must recover the clean
sample exactly (Euler) / tightly (PLMS).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from emu_tpu.config import SchedulerConfig, UNetConfig, VAEConfig  # noqa: E402
from emu_tpu.diffusion import layers as D  # noqa: E402
from emu_tpu.diffusion import unet, vae  # noqa: E402
from emu_tpu.diffusion.schedulers import (  # noqa: E402
    EulerDiscreteScheduler, PNDMScheduler)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32) * 0.1  # OIHW
    b = rng.standard_normal(4).astype(np.float32)
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w),
                   torch.tensor(b), padding=1).numpy().transpose(0, 2, 3, 1)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = np.array(D.conv2d(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ref = F.group_norm(torch.tensor(x.transpose(0, 3, 1, 2)), 4,
                       torch.tensor(w), torch.tensor(b),
                       eps=1e-5).numpy().transpose(0, 2, 3, 1)
    p = {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}
    ours = np.array(D.group_norm(p, jnp.asarray(x), 4, 1e-5))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_formula():
    t = jnp.asarray([0.0, 10.0, 999.0])
    emb = np.array(D.timestep_embedding(t, 8, flip_sin_to_cos=True))
    half = 4
    exponent = -np.log(10000.0) * np.arange(half) / half
    ref = np.asarray(t)[:, None] * np.exp(exponent)[None]
    np.testing.assert_allclose(emb, np.concatenate(
        [np.cos(ref), np.sin(ref)], -1), rtol=1e-5, atol=1e-6)


def test_euler_scheduler_recovers_clean_sample_with_oracle():
    """With exact eps known, every Euler step lands on the x0 trajectory."""
    sched = EulerDiscreteScheduler(SchedulerConfig(), num_inference_steps=20)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    sample = x0 + noise * sched.sigmas[0]
    # leading spacing tops out at t=981 → sigma slightly below the
    # full-schedule sigma_max ≈ 14.6
    assert 11.0 < float(sched.sigmas[0]) < 14.7
    for i in range(sched.num_inference_steps):
        sigma = sched.sigmas[i]
        eps = (sample - x0) / sigma          # oracle noise prediction
        sample = sched.step(eps, jnp.int32(i), sample)
    np.testing.assert_allclose(np.array(sample), np.array(x0), rtol=1e-3,
                               atol=1e-3)


def test_plms_scheduler_recovers_clean_sample_with_oracle():
    sched = PNDMScheduler(SchedulerConfig(), num_inference_steps=20)
    rng = np.random.default_rng(3)
    x0 = np.random.default_rng(3).standard_normal((1, 4, 4, 2)).astype(
        np.float32)
    x0 = jnp.asarray(x0)
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    sample = x0  # start from x_T = sqrt(ac)x0 + sqrt(1-ac)n
    t0 = int(sched.timesteps[0])
    ac = sched.alphas_cumprod[t0]
    sample = jnp.sqrt(ac) * x0 + jnp.sqrt(1 - ac) * noise
    state = sched.init_state(sample.shape)
    for i in range(sched.num_steps):
        t = sched.timesteps[i]
        ct = jnp.where(jnp.int32(state["counter"]) == 1, t + sched.ratio, t)
        acc = sched.alphas_cumprod[ct]
        base = jnp.where(state["counter"] == 1, state["cur_sample"], sample)
        eps = (base - jnp.sqrt(acc) * x0) / jnp.sqrt(1 - acc)  # oracle
        sample, state = sched.step(eps, jnp.int32(i), sample, state)
    np.testing.assert_allclose(np.array(sample), np.array(x0), rtol=5e-2,
                               atol=5e-2)


def test_plms_matches_hand_derived_step_sequence():
    """Pin the PLMS trajectory against an independent float64
    transliteration of the published PNDM/PLMS update equations
    (Liu et al. 2022 eq. 12; diffusers step_plms bookkeeping: duplicated
    second-to-last timestep, counter==1 half-step on the saved sample,
    Adams-Bashforth 2/3/4-term coefficients). The hand reference keeps a
    Python-list eps history and scalar control flow — none of the jitted
    implementation's ring-buffer/switch structure — so agreement at 1e-4
    over a 4-step (5 PLMS calls) run with a nonlinear fake model pins the
    algebra, not the implementation."""
    cfg = SchedulerConfig()
    n_inf = 4
    sched = PNDMScheduler(cfg, num_inference_steps=n_inf)

    n = cfg.num_train_timesteps
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                        dtype=np.float64) ** 2
    ac = np.cumprod(1.0 - betas)
    final_ac = 1.0 if cfg.set_alpha_to_one else ac[0]
    ratio = n // n_inf

    def get_prev(sample, t, t_prev, eps):
        a_t = ac[t]
        a_prev = ac[t_prev] if t_prev >= 0 else final_ac
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (
            a_t * (1 - a_t) * a_prev) ** 0.5
        return coeff * sample - (a_prev - a_t) * eps / denom

    def fake_eps(x, t):                     # nonlinear, t-dependent
        return np.tanh(x) * (0.5 + t / n) + 0.01 * x * x

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 3, 2))

    # hand reference walk
    base = (np.arange(n_inf) * ratio).astype(np.int64) + cfg.steps_offset
    ts = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    ets, cur_sample, ref, traj = [], None, x.copy(), []
    for counter, t in enumerate(ts):
        t = int(t)
        eps = fake_eps(ref, t)
        t_prev = t - ratio
        if counter != 1:
            ets = ets[-3:] + [eps]
        else:
            t_prev, t = t, t + ratio
        if len(ets) == 1 and counter == 0:
            eff, cur_sample, sample = eps, ref, ref
        elif len(ets) == 1 and counter == 1:
            eff = (eps + ets[-1]) / 2
            sample = cur_sample
        elif len(ets) == 2:
            eff = (3 * ets[-1] - ets[-2]) / 2
            sample = ref
        elif len(ets) == 3:
            eff = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
            sample = ref
        else:
            eff = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3]
                   - 9 * ets[-4]) / 24
            sample = ref
        ref = get_prev(sample, t, t_prev, eff)
        traj.append(ref.copy())

    # jitted implementation walk, same fake model
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ts)
    sample = jnp.asarray(x, jnp.float32)
    state = sched.init_state(sample.shape)
    step = jax.jit(sched.step)
    for i in range(sched.num_steps):
        t = int(sched.timesteps[i])
        eps = jnp.asarray(fake_eps(np.asarray(sample, np.float64), t),
                          jnp.float32)
        sample, state = step(eps, jnp.int32(i), sample, state)
        np.testing.assert_allclose(np.asarray(sample, np.float64), traj[i],
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"PLMS step {i} (t={t})")


def test_unet_sd_class_shapes():
    cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=False)
    params = unet.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    out = unet.forward(params, cfg, x, jnp.asarray([10.0, 500.0]), ctx)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.array(out)).all()


def test_unet_sdxl_class_with_text_time():
    cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=True)
    params = unet.init(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 16))
    text_embeds = jnp.mean(ctx, axis=1)                       # [B, 16]
    time_ids = jnp.tile(jnp.asarray([[8., 8., 0., 0., 8., 8.]]), (2, 1))
    out = unet.forward(params, cfg, x, jnp.asarray([10.0, 500.0]), ctx,
                       added_text_embeds=text_embeds,
                       added_time_ids=time_ids)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.array(out)).all()


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    params = vae.init(jax.random.PRNGKey(6), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 3)) * 2 - 1
    mean, logvar = vae.encode(params, cfg, img)
    assert mean.shape == (1, 8, 8, 4)          # one downsample (2 blocks)
    dec = vae.decode(params, cfg, mean)
    assert dec.shape == (1, 16, 16, 3)
    assert np.isfinite(np.array(dec)).all()


def test_vae_chunked_attention_matches_dense():
    from emu_tpu.diffusion.vae import _vae_attention
    from emu_tpu.diffusion import layers as DL
    rng = np.random.default_rng(5)
    c = 16
    p = {
        "to_q": {"kernel": jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1)},
        "to_k": {"kernel": jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1)},
        "to_v": {"kernel": jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1)},
        "to_out": {"kernel": jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .1),
                   "bias": jnp.zeros(c)},
    }
    x = jnp.asarray(rng.standard_normal((2, 50, c)).astype(np.float32))
    dense = DL.attention(p, x, None, 1)
    chunked = _vae_attention(p, x, chunk=16)     # 50 → 4 chunks with pad
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_unet_block_cache_exact_contract():
    """DeepCache split exactness: (a) return_cache=True changes nothing
    about the output; (b) a cached pass fed the cache of the SAME
    (sample, t) reproduces the full output bit-for-bit (the shallow path
    is recomputed, the deep path is the cache)."""
    for sdxl in (False, True):
        cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=sdxl)
        params = unet.init(jax.random.PRNGKey(7), cfg)
        x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(9), (2, 5, 16))
        kw = {}
        if sdxl:
            kw = dict(added_text_embeds=jnp.mean(ctx, axis=1),
                      added_time_ids=jnp.tile(
                          jnp.asarray([[8., 8., 0., 0., 8., 8.]]), (2, 1)))
        t = jnp.asarray([10.0, 500.0])
        ref = unet.forward(params, cfg, x, t, ctx, **kw)
        out, cache = unet.forward(params, cfg, x, t, ctx, return_cache=True,
                                  **kw)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        out2, cache2 = unet.forward(params, cfg, x, t, ctx,
                                    deep_cache=cache, **kw)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(cache2), np.asarray(cache))


def test_unet_block_cache_skips_deep_compute():
    """A cached pass must not read the deep parameters: poisoning the mid
    block with NaNs changes nothing when deep_cache is supplied."""
    cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=False)
    params = unet.init(jax.random.PRNGKey(11), cfg)
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(13), (1, 5, 16))
    t = jnp.asarray([100.0])
    _, cache = unet.forward(params, cfg, x, t, ctx, return_cache=True)
    poisoned = jax.tree_util.tree_map(lambda a: a, params)
    poisoned["mid_block"] = jax.tree_util.tree_map(
        lambda a: jnp.full_like(a, jnp.nan), poisoned["mid_block"])
    out, _ = unet.forward(poisoned, cfg, x, t, ctx, deep_cache=cache)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_w8a8_transformer_blocks():
    """W8A8 quantization of the Transformer2D interior (UNET_PATTERNS):
    output stays close to fp32 on tiny weights; conv-projection (SD1.5
    use_linear_projection=False) configs keep their conv kernels
    untouched and still run."""
    from emu_tpu.ops.quant import UNET_PATTERNS, quantize_tree

    for sdxl in (True, False):
        cfg = UNetConfig.tiny(cross_attention_dim=16, sdxl=sdxl)
        params = unet.init(jax.random.PRNGKey(21), cfg)
        x = jax.random.normal(jax.random.PRNGKey(22), (2, 8, 8, 4))
        ctx = jax.random.normal(jax.random.PRNGKey(23), (2, 5, 16))
        kw = {}
        if sdxl:
            kw = dict(added_text_embeds=jnp.mean(ctx, axis=1),
                      added_time_ids=jnp.tile(
                          jnp.asarray([[8., 8., 0., 0., 8., 8.]]), (2, 1)))
        t = jnp.asarray([10.0, 500.0])
        ref = np.asarray(unet.forward(params, cfg, x, t, ctx, **kw))
        qp = quantize_tree(params, UNET_PATTERNS, act_quant=True)
        n_q = len(jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda _: 1, qp, is_leaf=lambda d: isinstance(d, dict)
                and "kernel_w8a8" in d)))
        out = np.asarray(unet.forward(qp, cfg, x, t, ctx, **kw))
        assert np.isfinite(out).all()
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-9)
        assert err < 0.15, err
        # quantized + block-cached compose
        o1, cache = unet.forward(qp, cfg, x, t, ctx, return_cache=True,
                                 **kw)
        o2, _ = unet.forward(qp, cfg, x, t, ctx, deep_cache=cache, **kw)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
