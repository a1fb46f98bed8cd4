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
