"""Training loop: loss decreases when overfitting one tiny batch, sharded."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from emu_tpu.config import Emu1Config
from emu_tpu.models import emu1
from emu_tpu.parallel import make_mesh
from emu_tpu.training import Trainer


def test_overfit_one_batch_loss_decreases(tmp_path):
    cfg = Emu1Config.tiny()
    params = emu1.init(jax.random.PRNGKey(0), cfg)
    pad, img, img_end, image = (cfg.llama.vocab_size,
                                cfg.llama.vocab_size + 1,
                                cfg.llama.vocab_size + 2,
                                cfg.llama.vocab_size + 3)
    trainer = Trainer(cfg, params, optax.adamw(3e-3),
                      (pad, img, img_end, image), mesh=make_mesh((2, 4)),
                      checkpoint_dir=str(tmp_path), checkpoint_every=5)

    rng = np.random.default_rng(0)
    b, n = 4, cfg.n_causal
    ids = np.full((b, 4 + n), 7, np.int32)
    ids[:, 0] = 1
    ids[:, 1] = img
    ids[:, 2:2 + n] = image
    ids[:, 2 + n] = img_end
    ids[:, 3 + n] = rng.integers(3, 200, b)
    mask = np.ones_like(ids)
    images = rng.standard_normal((b, 28, 28, 3)).astype(np.float32) * 0.1

    losses = [trainer.step(jnp.asarray(images), jnp.asarray(ids),
                           jnp.asarray(mask)) for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses
    # periodic checkpoint fired at step 5
    import os
    assert any(d.startswith("step_") for d in os.listdir(tmp_path))
