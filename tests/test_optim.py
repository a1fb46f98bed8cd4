"""fused_adafactor vs optax.adafactor: same trajectory, one fused pass.

The fused optimizer reorders only float multiplications (lr/clip/pscale
folded into one scalar) and rounds the update to param dtype before the
add instead of after — in f32 both are exact-to-tolerance; in bf16 the
trajectories agree to bf16 resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from emu_tpu.optim import fused_adafactor


def _tree(key, dtype):
    ks = jax.random.split(key, 4)
    return {
        "big": jax.random.normal(ks[0], (160, 192), dtype) * 0.02,
        "wide3d": jax.random.normal(ks[1], (2, 160, 192), dtype) * 0.02,
        "vec": jax.random.normal(ks[2], (192,), dtype),
        "small": jax.random.normal(ks[3], (4, 8), dtype),  # unfactored
    }


def _run(tx, params, grads_seq, fused):
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return params


def test_matches_optax_f32():
    key = jax.random.PRNGKey(0)
    params = _tree(key, jnp.float32)
    grads_seq = [jax.tree_util.tree_map(
        lambda p, k=k: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(7), k), p.shape, p.dtype),
        params) for k in range(4)]

    p_ref = _run(optax.adafactor(1e-2), dict(params), grads_seq, False)
    p_fus = _run(fused_adafactor(1e-2), dict(params), grads_seq, True)
    for name in params:
        np.testing.assert_allclose(np.asarray(p_fus[name]),
                                   np.asarray(p_ref[name]),
                                   rtol=2e-5, atol=2e-7, err_msg=name)


def test_matches_optax_bf16():
    key = jax.random.PRNGKey(1)
    params = _tree(key, jnp.bfloat16)
    grads_seq = [jax.tree_util.tree_map(
        lambda p, k=k: jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(9), k), p.shape, p.dtype),
        params) for k in range(3)]

    p_ref = _run(optax.adafactor(1e-2), dict(params), grads_seq, False)
    p_fus = _run(fused_adafactor(1e-2), dict(params), grads_seq, True)
    for name in params:
        a = np.asarray(p_fus[name], np.float32)
        b = np.asarray(p_ref[name], np.float32)
        # bf16 rounding of the update before/after the add: one-ulp-level
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3, err_msg=name)


def test_clip_engages():
    """Huge gradients must hit the block-RMS clip exactly like optax."""
    params = {"w": jnp.ones((130, 140), jnp.float32)}
    grads = {"w": 50.0 * jnp.ones((130, 140), jnp.float32)}
    p_ref = _run(optax.adafactor(1e-2), dict(params), [grads] * 2, False)
    p_fus = _run(fused_adafactor(1e-2), dict(params), [grads] * 2, True)
    np.testing.assert_allclose(np.asarray(p_fus["w"]),
                               np.asarray(p_ref["w"]), rtol=1e-5)


def test_state_is_factored():
    """Factored leaves carry row/col vectors, not full-shape moments."""
    tx = fused_adafactor(1e-2)
    params = {"w": jnp.zeros((256, 512)), "b": jnp.zeros((512,))}
    st = tx.init(params)
    assert st.v_row["w"].shape == (256,)
    assert st.v_col["w"].shape == (512,)
    assert st.v["w"].shape == (1,)
    assert st.v["b"].shape == (512,)
