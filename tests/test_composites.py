"""Composite model tests: scatter injection + visual-regression fidelity.

The key claim (SURVEY §7 "hard parts"): our KV-cached incremental
`generate_image_embeds` computes exactly what the reference's
32/64-iteration full-prefix loop computes (Emu1/models/modeling_emu.py:
187-249, Emu2/emu/emu.py:92-153). The tests re-implement the reference
algorithm naively (full forward per appended token) on top of our
forward_hidden and demand near-bit equality with the cached loop at fp32.
"""

import numpy as np
import jax
import jax.numpy as jnp

from emu_tpu.config import Emu1Config, Emu2Config
from emu_tpu.models import emu1, emu2, llama
from emu_tpu.ops import layers as L

IMG_ID = 258      # stand-in special ids inside the tiny vocab
IMAGE_ID = 259


def _naive_regression_emu1(params, cfg, prompt_ids, prompt_img_embeds):
    """Reference algorithm: re-run the full prefix for every new token."""
    b = prompt_ids.shape[0]
    n = cfg.n_causal
    target = None
    for i in range(n):
        ids = np.concatenate(
            [prompt_ids, np.full((b, 1), IMG_ID if i == 0 else IMAGE_ID)]
            if i == 0 else
            [ids, np.full((b, 1), IMAGE_ID)], axis=1)
        embeds = np.array(emu1.scatter_image_embeds(
            params, jnp.asarray(ids), prompt_img_embeds, IMAGE_ID))
        if target is not None:
            # appended <image> slots get previously regressed embeds
            embeds[:, -i:][...] = np.array(target[:, :i])
        mask = jnp.ones(ids.shape, jnp.int32)
        hidden = llama.forward_hidden(params["decoder"], cfg.llama,
                                      jnp.asarray(embeds), mask)
        # hiddens at the last i+1 positions ([IMG] + appended <image>s)
        h = hidden[:, -(i + 1):]
        target = np.array(L.dense(params["decoder"]["stu_regress_head"],
                                  h))
    return target


def test_emu1_cached_regression_matches_reference_algorithm():
    cfg = Emu1Config.tiny()
    params = emu1.init(jax.random.PRNGKey(0), cfg)
    b, s = 2, 5
    rng = np.random.default_rng(0)
    prompt_ids = rng.integers(3, 250, size=(b, s - 1)).astype(np.int32)

    naive = _naive_regression_emu1(params, cfg, prompt_ids, None)

    ids = np.concatenate([prompt_ids, np.full((b, 1), IMG_ID)], 1)
    ours = np.array(emu1.generate_image_embeds(
        params, cfg, jnp.asarray(ids), jnp.ones_like(ids), None, IMAGE_ID))
    np.testing.assert_allclose(ours, naive, rtol=2e-4, atol=2e-4)


def test_emu2_cached_regression_finite_and_shaped():
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(1), cfg)
    ids = np.array([[5, 9, 11, IMG_ID]], np.int32)
    out = emu2.generate_image_embeds(params, cfg, jnp.asarray(ids),
                                     jnp.ones_like(ids), None, IMAGE_ID)
    assert out.shape == (1, cfg.n_query, cfg.vision.width)
    assert np.isfinite(np.array(out)).all()


def test_emu2_encode_image_pipeline():
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(2), cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(3),
                             (2, cfg.vision.image_size,
                              cfg.vision.image_size, 3))
    pooled = emu2.encode_image(params, cfg, imgs)
    assert pooled.shape == (2, cfg.n_query, cfg.vision.width)
    lm = emu2.encode_image_lm(params, cfg, imgs)
    assert lm.shape == (2, cfg.n_query, cfg.llama.hidden_size)


def test_scatter_multi_image_ordering():
    """Two images' embeddings land on their own placeholder runs."""
    cfg = Emu1Config.tiny()
    params = emu1.init(jax.random.PRNGKey(4), cfg)
    d = cfg.llama.hidden_size
    n = cfg.n_causal
    ids = np.full((1, 2 * n + 3), 7, np.int32)
    ids[0, 1:1 + n] = IMAGE_ID          # image 1 run
    ids[0, n + 2:2 + 2 * n] = IMAGE_ID  # image 2 run
    img_embeds = jnp.arange(2 * n, dtype=jnp.float32)[:, None] * jnp.ones(
        (1, d))
    out = emu1.scatter_image_embeds(params, jnp.asarray(ids), img_embeds,
                                    IMAGE_ID)
    got = np.array(out[0, :, 0])
    np.testing.assert_allclose(got[1:1 + n], np.arange(n))
    np.testing.assert_allclose(got[n + 2:2 + 2 * n], np.arange(n, 2 * n))


def _naive_regression_emu2(params, cfg, prompt_ids):
    """Reference Emu2 algorithm: full-prefix re-run per token, feeding
    project_up(project_down(hidden)) embeds (emu.py:92-153)."""
    b = prompt_ids.shape[0]
    n = cfg.n_query
    up = lambda e: L.dense(params["project_up"], e)
    down = lambda h: L.dense(params["project_down"], h)
    target = None
    for i in range(n):
        ids = np.concatenate(
            [prompt_ids, np.full((b, 1), IMG_ID if i == 0 else IMAGE_ID)]
            if i == 0 else [ids, np.full((b, 1), IMAGE_ID)], axis=1)
        embeds = np.array(llama.embed(params["decoder"], jnp.asarray(ids)))
        if target is not None:
            embeds[:, -i:] = np.array(up(jnp.asarray(target)))
        hidden = llama.forward_hidden(params["decoder"], cfg.llama,
                                      jnp.asarray(embeds),
                                      jnp.ones(ids.shape, jnp.int32))
        target = np.array(down(hidden[:, -(i + 1):]))
    return target


def test_emu2_cached_regression_matches_reference_algorithm():
    cfg = Emu2Config.tiny()
    params = emu2.init(jax.random.PRNGKey(7), cfg)
    prompt_ids = np.random.default_rng(1).integers(
        3, 250, size=(2, 4)).astype(np.int32)

    naive = _naive_regression_emu2(params, cfg, prompt_ids)

    ids = np.concatenate([prompt_ids, np.full((2, 1), IMG_ID)], 1)
    ours = np.array(emu2.generate_image_embeds(
        params, cfg, jnp.asarray(ids), jnp.ones_like(ids), None, IMAGE_ID))
    np.testing.assert_allclose(ours, naive, rtol=2e-4, atol=2e-4)
