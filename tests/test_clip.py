"""CLIP dual encoder vs transformers.CLIPModel (tiny random weights)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from emu_tpu.models import clip as C


def _hf_tiny():
    cfg = transformers.CLIPConfig(
        text_config_dict=None,
        vision_config_dict=None,
        projection_dim=16,
        text_config=dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=16, projection_dim=16,
                         eos_token_id=98),
        vision_config=dict(image_size=28, patch_size=14, hidden_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, projection_dim=16),
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(cfg).eval()
    return model


def _ids(b, t, vocab=99, eos=98):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 90, (b, t))
    for i in range(b):
        ids[i, rng.randint(1, t)] = eos   # eot = max id, once per row
    return ids


@pytest.fixture(scope="module")
def setup():
    model = _hf_tiny()
    cfg = C.CLIPConfig.tiny()
    params = C.convert_clip(model.state_dict(), cfg)
    return model, cfg, params


def test_image_embeds_match(setup):
    model, cfg, params = setup
    rng = np.random.RandomState(1)
    pix = rng.randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            torch.tensor(pix.transpose(0, 3, 1, 2)))
    out = C.image_embeds(params, cfg, jnp.asarray(pix))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_text_embeds_match(setup):
    model, cfg, params = setup
    ids = _ids(3, 12)
    with torch.no_grad():
        ref = model.get_text_features(torch.tensor(ids))
    out = C.text_embeds(params["text"], cfg.text, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_similarity_logits_match(setup):
    model, cfg, params = setup
    rng = np.random.RandomState(2)
    pix = rng.randn(2, 28, 28, 3).astype(np.float32)
    ids = _ids(2, 10)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    pixel_values=torch.tensor(pix.transpose(0, 3, 1, 2)))
    lpi, lpt = C.similarity_logits(params, cfg, jnp.asarray(pix),
                                   jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(lpi),
                               ref.logits_per_image.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_clip_score_definition(setup):
    """score_i = max(100 cos(img_i, txt_i), 0) — cross-check via HF embeds."""
    model, cfg, params = setup
    rng = np.random.RandomState(3)
    pix = rng.randn(2, 28, 28, 3).astype(np.float32)
    ids = _ids(2, 10)
    with torch.no_grad():
        ie = model.get_image_features(torch.tensor(pix.transpose(0, 3, 1, 2)))
        te = model.get_text_features(torch.tensor(ids))
    ie = torch.nn.functional.normalize(ie, dim=-1)
    te = torch.nn.functional.normalize(te, dim=-1)
    ref = (100 * (ie * te).sum(-1)).clamp(min=0).numpy()
    out = C.clip_score(params, cfg, jnp.asarray(pix), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_init_shapes_match_converter(setup):
    """init() produces the same pytree structure the converter emits."""
    model, cfg, params = setup
    fresh = C.init(jax.random.PRNGKey(0), cfg)
    ref_paths = {p for p, _ in jax.tree_util.tree_flatten_with_path(params)[0][0:0]}
    a = jax.tree_util.tree_structure(params)
    b = jax.tree_util.tree_structure(fresh)
    assert a == b


def test_evaluate_clip_score_metric(setup):
    from emu_tpu.mm_eval.metrics.clip_score import evaluate_clip_score
    model, cfg, params = setup
    rng = np.random.RandomState(4)
    imgs = rng.rand(3, 40, 32, 3).astype(np.float32)   # non-square: crop path
    ids = _ids(3, 10)
    out = evaluate_clip_score(params, cfg, imgs, ids, batch_size=2)
    assert len(out["scores"]) == 3
    assert 0.0 <= out["clip_score"] <= 100.0
