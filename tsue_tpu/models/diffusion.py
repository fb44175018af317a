"""DDPM trajectory generator with classifier-free guidance and EMA.

Capability parity with ref modify_scripts/capstone_project.py:
- ConditionalUNet (:1043-1122): 1-D conv UNet (3 enc + mid + 3 dec with
  skip concat, base 64ch) over (B, 2, T); condition vector fused by 1-head
  cross-attention at the bottleneck; CFG built into the forward: the batch
  is [uncond-half || cond-half], output = uncond + scale*(cond - uncond);
- beta schedules linear/cosine, 1000 steps (:1125-1135);
- q_sample forward noising (:1210-1215);
- reverse sampling with x0-clamping to [-1, 1] (:1311-1353).  NB the
  reference's "posterior mean" is the DDIM-style update
  sqrt(acum_prev)*x0 + sqrt(1-acum_prev)*eps — preserved verbatim for
  behavioral parity;
- EMA shadow params, decay 0.9999 (:1023-1040) — a pure pytree lerp here.

TPU-first: the 1000-step reverse loop is ONE ``lax.scan`` under jit (the
reference runs 1000 Python iterations with per-step host sync); convs are
channel-last for TPU layout; fp32 params with optional bf16 compute (no
GradScaler needed, unlike the reference's fp16 AMP).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        x = nn.relu(nn.Conv(self.features, (3,), padding="SAME",
                            name="conv1")(x))
        return nn.relu(nn.Conv(self.features, (3,), padding="SAME",
                               name="conv2")(x))


class ConditionalUNet(nn.Module):
    in_channels: int = 2
    cond_dim: int = 128
    base_channels: int = 64
    n_layers: int = 3

    @nn.compact
    def _single(self, x, cond):
        """x: (B, T, C_in); cond: (B, cond_dim)."""
        feats = []
        h = x
        for i in range(self.n_layers):
            h = ConvBlock(self.base_channels, name=f"enc_{i}")(h)
            feats.append(h)
        h = nn.relu(nn.Conv(self.base_channels, (3,), padding="SAME",
                            name="mid")(h))
        # bottleneck cross-attention: queries = time steps, kv = 1 cond token
        c = nn.Dense(self.base_channels, name="cond_proj")(cond)[:, None, :]
        from tsue_tpu.models.layers import MHA
        attn = MHA(self.base_channels, 1, name="cross_attn")(h, c)
        h = h + attn
        for i in range(self.n_layers):
            h = jnp.concatenate([h, feats[-(i + 1)]], axis=-1)
            h = ConvBlock(self.base_channels, name=f"dec_{i}")(h)
        return nn.Conv(self.in_channels, (3,), padding="SAME",
                       name="out_conv")(h)

    @nn.compact
    def __call__(self, x, cond_emb, cfg_scale: float = 3.0):
        """x: (B, 2, T) with B = [uncond-half || cond-half]; returns the
        CFG-combined noise prediction in the same layout (ref :1086-1122)."""
        B = x.shape[0]
        half = B // 2
        h = jnp.swapaxes(x, 1, 2)                     # (B, T, 2)
        out = self._single(h, cond_emb)               # shared weights
        out = jnp.swapaxes(out, 1, 2)                 # (B, 2, T)
        out_uncond, out_cond = out[:half], out[half:]
        guided = out_uncond + cfg_scale * (out_cond - out_uncond)
        return jnp.concatenate([out_uncond, guided], axis=0)


# ---------------------------------------------------------------------------
# Schedule + sampling
# ---------------------------------------------------------------------------

def make_beta_schedule(schedule_type: str = "cosine", n_timestep: int = 1000,
                       start: float = 1e-4, end: float = 0.02) -> np.ndarray:
    if schedule_type == "linear":
        return np.linspace(start, end, n_timestep, dtype=np.float64)
    if schedule_type == "cosine":
        steps = np.arange(n_timestep + 1, dtype=np.float64)
        ac = np.cos(((steps / n_timestep) + 0.008) / 1.008 * np.pi * 0.5) ** 2
        ac = ac / ac[0]
        # clip like Nichol & Dhariwal; the unclipped tail reaches beta>=1
        # which breaks the posterior variance (the reference leaves this
        # latent hazard in, ref :1130-1133)
        return np.clip(1 - (ac[1:] / ac[:-1]), 0.0, 0.999)
    raise ValueError(f"unknown schedule {schedule_type!r}")


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    betas: np.ndarray
    alphas_cum: np.ndarray
    alphas_cum_prev: np.ndarray
    sqrt_alphas_cum: np.ndarray
    sqrt_one_minus_alphas_cum: np.ndarray
    posterior_var: np.ndarray

    @staticmethod
    def create(schedule_type: str = "cosine",
               n_timestep: int = 1000) -> "DDPMSchedule":
        betas = make_beta_schedule(schedule_type, n_timestep)
        ac = np.cumprod(1.0 - betas)
        ac_prev = np.append(1.0, ac[:-1])
        return DDPMSchedule(
            betas=betas, alphas_cum=ac, alphas_cum_prev=ac_prev,
            sqrt_alphas_cum=np.sqrt(ac),
            sqrt_one_minus_alphas_cum=np.sqrt(1 - ac),
            posterior_var=betas * (1 - ac_prev) / (1 - ac))

    @property
    def n_timestep(self):
        return len(self.betas)


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather schedule coefficients at t and reshape for broadcasting."""
    vals = jnp.asarray(arr, jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


def q_sample(sched: DDPMSchedule, x0: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward noising (ref :1210-1215)."""
    return (_extract(sched.sqrt_alphas_cum, t, x0.ndim) * x0 +
            _extract(sched.sqrt_one_minus_alphas_cum, t, x0.ndim) * noise)


def p_mean_variance(sched: DDPMSchedule, noise_pred, x_t, t):
    """Reference formula incl. x0 clamp and DDIM-style mean (ref :1311-1336)."""
    sqrt_oma = _extract(sched.sqrt_one_minus_alphas_cum, t, x_t.ndim)
    sqrt_ac = _extract(sched.sqrt_alphas_cum, t, x_t.ndim)
    x0_pred = (x_t - noise_pred * sqrt_oma) / (sqrt_ac + 1e-7)
    x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
    ac_prev = _extract(sched.alphas_cum_prev, t, x_t.ndim)
    var = _extract(sched.posterior_var, t, x_t.ndim)
    mean = jnp.sqrt(ac_prev) * x0_pred + jnp.sqrt(1 - ac_prev) * noise_pred
    return mean, var


def p_sample_loop(model, variables, sched: DDPMSchedule, shape: Tuple,
                  cond_emb: jnp.ndarray, rng: jax.Array,
                  cfg_scale: float = 3.0) -> jnp.ndarray:
    """Full reverse process as one scanned, jittable program.

    ``shape`` = (B, C, T) with B = 2*half ([uncond || cond] halves, like the
    training batch); returns the final x (same layout).
    """
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, shape)

    def body(carry, t):
        x, rng = carry
        rng, zrng = jax.random.split(rng)
        tb = jnp.full((shape[0],), t, jnp.int32)
        noise_pred = model.apply(variables, x, cond_emb, cfg_scale)
        mean, var = p_mean_variance(sched, noise_pred, x, tb)
        z = jax.random.normal(zrng, x.shape)
        x = jnp.where(t > 0, mean + jnp.sqrt(var) * z, mean)
        return (x, rng), None

    ts = jnp.arange(sched.n_timestep - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (x, rng), ts)
    return x


# ---------------------------------------------------------------------------
# EMA + train step
# ---------------------------------------------------------------------------

def ema_update(shadow, params, decay: float = 0.9999):
    """shadow <- decay*shadow + (1-decay)*params (ref :1023-1040)."""
    return jax.tree.map(lambda s, p: decay * s + (1 - decay) * p,
                        shadow, params)


def make_diffusion_train_step(model: ConditionalUNet, sched: DDPMSchedule,
                              tx, cfg_scale: float = 3.0,
                              uncond_scale: float = 0.05):
    """One CFG training step (ref :1229-1256): duplicate the batch into
    [uncond || cond] halves, noise at random t, MSE on noise prediction."""
    import optax

    def loss_fn(params, x0, cond, rng):
        B = x0.shape[0]
        r1, r2, r3 = jax.random.split(rng, 3)
        uncond = uncond_scale * jax.random.normal(r1, cond.shape)
        full_cond = jnp.concatenate([uncond, cond], axis=0)
        x0_full = jnp.concatenate([x0, x0], axis=0)
        t = jax.random.randint(r2, (2 * B,), 0, sched.n_timestep)
        noise = jax.random.normal(r3, x0_full.shape)
        x_t = q_sample(sched, x0_full, t, noise)
        noise_pred = model.apply({"params": params}, x_t, full_cond,
                                 cfg_scale)
        return jnp.mean((noise_pred - noise) ** 2)

    def step(params, opt_state, ema_params, x0, cond, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, x0, cond, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params)
        return params, opt_state, ema_params, {"loss": loss}

    return step
