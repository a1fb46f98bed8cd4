"""Noise schedulers: PNDM (PLMS) for Emu1, EulerDiscrete for Emu2.

Re-implementations of the diffusers schedulers the reference instantiates:
- PNDMScheduler with skip_prk_steps=True (pure PLMS linear-multistep), the
  Emu1 pipeline's 50-step scheduler (Emu1/models/pipeline.py:94-141);
- EulerDiscreteScheduler per Emu2/emu/conf/diffusion_config/scheduler/
  scheduler_config.json (scaled_linear betas 0.00085→0.012, leading
  spacing, steps_offset 1, epsilon prediction).

TPU design: timestep/sigma tables are precomputed host-side (numpy) and
baked into the jitted denoise loop as constants; `step` is a pure function
(state in → state out) so the 50-step loop is a single `lax.fori_loop`
with no host round-trips.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from emu_tpu.config import SchedulerConfig


def _betas(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5, n,
                           dtype=np.float64) ** 2
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    raise ValueError(cfg.beta_schedule)


class EulerDiscreteScheduler:
    """Euler method over the sigma schedule (k-diffusion style)."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_inference_steps: int = 50):
        self.cfg = cfg
        n = cfg.num_train_timesteps
        alphas_cumprod = np.cumprod(1.0 - _betas(cfg))
        sigmas_full = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5

        if cfg.timestep_spacing == "leading":
            ratio = n // num_inference_steps
            ts = (np.arange(num_inference_steps) * ratio).round()[::-1]
            ts = ts.astype(np.float64) + cfg.steps_offset
        elif cfg.timestep_spacing == "linspace":
            ts = np.linspace(0, n - 1, num_inference_steps,
                             dtype=np.float64)[::-1]
        else:
            raise ValueError(cfg.timestep_spacing)
        sig = np.interp(ts, np.arange(n), sigmas_full)
        self.timesteps = jnp.asarray(ts, jnp.float32)
        self.sigmas = jnp.asarray(np.concatenate([sig, [0.0]]), jnp.float32)
        if cfg.timestep_spacing in ("linspace", "trailing"):
            self.init_noise_sigma = float(sig.max())
        else:
            self.init_noise_sigma = float((sig.max() ** 2 + 1) ** 0.5)
        self.num_inference_steps = num_inference_steps

    def scale_model_input(self, sample: jax.Array, i: jax.Array) -> jax.Array:
        sigma = self.sigmas[i]
        return sample / jnp.sqrt(sigma ** 2 + 1).astype(sample.dtype)

    def step(self, model_output: jax.Array, i: jax.Array,
             sample: jax.Array) -> jax.Array:
        """One Euler step (epsilon prediction, s_churn=0)."""
        sigma = self.sigmas[i].astype(jnp.float32)
        sigma_next = self.sigmas[i + 1].astype(jnp.float32)
        samplef = sample.astype(jnp.float32)
        outf = model_output.astype(jnp.float32)
        pred_original = samplef - sigma * outf
        derivative = (samplef - pred_original) / sigma
        return (samplef + derivative * (sigma_next - sigma)).astype(
            sample.dtype)


class PNDMScheduler:
    """PLMS (skip_prk_steps=True): 4th-order linear multistep.

    Matches diffusers PNDMScheduler.step_plms, including the duplicated
    second-to-last timestep used to bootstrap the multistep history and the
    counter==1 half-step that reuses the saved sample.
    """

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig(),
                 num_inference_steps: int = 50):
        assert cfg.skip_prk_steps, "only PLMS mode is implemented"
        self.cfg = cfg
        n = cfg.num_train_timesteps
        self.ratio = n // num_inference_steps
        base = (np.arange(num_inference_steps) * self.ratio).round().astype(
            np.int64) + cfg.steps_offset
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        self.timesteps = jnp.asarray(plms.copy(), jnp.int32)
        self.num_steps = len(plms)          # num_inference_steps + 1
        ac = np.cumprod(1.0 - _betas(cfg))
        self.alphas_cumprod = jnp.asarray(ac, jnp.float32)
        self.final_alpha_cumprod = jnp.float32(
            1.0 if cfg.set_alpha_to_one else ac[0])
        self.init_noise_sigma = 1.0

    def init_state(self, sample_shape: Tuple[int, ...],
                   dtype=jnp.float32) -> dict:
        return {
            "ets": jnp.zeros((4,) + tuple(sample_shape), jnp.float32),
            "n_ets": jnp.int32(0),
            "counter": jnp.int32(0),
            "cur_sample": jnp.zeros(sample_shape, jnp.float32),
        }

    def scale_model_input(self, sample: jax.Array, i: jax.Array) -> jax.Array:
        return sample

    def _get_prev_sample(self, sample, timestep, prev_timestep, eps):
        alpha_t = self.alphas_cumprod[timestep]
        alpha_prev = jnp.where(prev_timestep >= 0,
                               self.alphas_cumprod[jnp.maximum(prev_timestep,
                                                               0)],
                               self.final_alpha_cumprod)
        beta_t = 1 - alpha_t
        beta_prev = 1 - alpha_prev
        sample_coeff = (alpha_prev / alpha_t) ** 0.5
        denom = alpha_t * beta_prev ** 0.5 + (
            alpha_t * beta_t * alpha_prev) ** 0.5
        return sample_coeff * sample - (alpha_prev - alpha_t) * eps / denom

    def step(self, model_output: jax.Array, i: jax.Array,
             sample: jax.Array, state: dict) -> Tuple[jax.Array, dict]:
        """One PLMS step. i indexes self.timesteps; returns (prev, state)."""
        timestep = self.timesteps[i]
        prev_timestep = timestep - self.ratio
        counter = state["counter"]
        outf = model_output.astype(jnp.float32)
        samplef = sample.astype(jnp.float32)

        # counter==1 replays the duplicated timestep pair
        timestep_eff = jnp.where(counter == 1, timestep + self.ratio,
                                 timestep)
        prev_eff = jnp.where(counter == 1, timestep, prev_timestep)

        # history push (skipped at counter==1)
        push = counter != 1
        ets = jnp.where(push,
                        jnp.concatenate([state["ets"][1:], outf[None]], 0),
                        state["ets"])
        n_ets = jnp.where(push, jnp.minimum(state["n_ets"] + 1, 4),
                          state["n_ets"])

        e1, e2, e3, e4 = ets[3], ets[2], ets[1], ets[0]
        order = jnp.where(counter == 0, 0,
                          jnp.where(counter == 1, 1,
                                    jnp.minimum(n_ets, 4) + 1))
        eff = jax.lax.switch(
            order,
            [lambda: outf,                               # counter 0
             lambda: (outf + e1) / 2,                    # counter 1
             lambda: outf,                               # (unreachable pad)
             lambda: (3 * e1 - e2) / 2,                  # 2 ets
             lambda: (23 * e1 - 16 * e2 + 5 * e3) / 12,  # 3 ets
             lambda: (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24],
        )
        cur_sample = jnp.where(counter == 0, samplef, state["cur_sample"])
        base = jnp.where(counter == 1, state["cur_sample"], samplef)

        prev = self._get_prev_sample(base, timestep_eff, prev_eff, eff)
        new_state = {"ets": ets, "n_ets": n_ets, "counter": counter + 1,
                     "cur_sample": cur_sample}
        return prev.astype(sample.dtype), new_state
