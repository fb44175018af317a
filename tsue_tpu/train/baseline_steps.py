"""Jit-able train/eval steps for the baseline models.

Mirrors the per-script DDP loops of ref scripts/baseline_*.py (train:
AdamW/Adam on denorm-MSE; Trajectron adds 0.1*KL, ref
scripts/baseline_trajtron.py:241-243; GAIL alternates BCE D/G updates, ref
scripts/baseline_GAIL.py:287-460) as pure functions over (variables, batch).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from tsue_tpu.models.baselines import (CSLSTM, GAILDiscriminator,
                                       GAILGenerator, TrajectronPP)
from tsue_tpu.models.baselines.trajectron import kl_divergence
from tsue_tpu.train.losses import denorm_mse_loss


def make_baseline_train_step(model, tx: optax.GradientTransformation,
                             kl_weight: float = 0.1):
    """Returns step(variables, opt_state, batch, rng) -> (vars, opt, metrics).

    ``variables`` may contain "batch_stats" (STGCNN); teacher forcing is
    applied for CSLSTM (ref scripts/baseline_cs_lstm.py:219-226); Trajectron
    adds the KL term with stochastic latents.
    """
    is_cslstm = isinstance(model, CSLSTM)
    is_vae = isinstance(model, TrajectronPP)

    def loss_fn(params, variables, batch, rng):
        vs = dict(variables, params=params)
        mutable = ["batch_stats"] if "batch_stats" in variables else False
        rngs = {"dropout": rng, "latent": jax.random.fold_in(rng, 1),
                "noise": jax.random.fold_in(rng, 2)}
        kwargs = {}
        if is_cslstm:
            kwargs["teacher"] = batch["traj_out"]
        if is_vae:
            kwargs["return_latent"] = True
        out = model.apply(vs, batch, False, rngs=rngs, mutable=mutable,
                          **kwargs)
        pred, new_model_state = out if mutable else (out, {})
        if is_vae:
            pred, (mu, logvar) = pred
        loss = denorm_mse_loss(pred, batch["traj_out"], batch["norm_stat"],
                               batch.get("valid"))
        if is_vae:
            loss = loss + kl_weight * kl_divergence(mu, logvar)
        return loss, new_model_state

    def step(variables, opt_state, batch, rng):
        params = variables["params"]
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, variables, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = dict(variables, params=params)
        if new_state:
            new_vars["batch_stats"] = new_state["batch_stats"]
        return new_vars, opt_state, {"loss": loss}

    return step


def make_baseline_eval_fn(model):
    """eval(variables, batch, rng, K) -> candidates (B, K, 2, T_out).

    K>1 draws stochastic candidates via explicit RNG streams (latent/noise/
    dropout); deterministic models return identical candidates, matching the
    reference's behavior for models without stochasticity.
    """
    def candidates(variables, batch, rng, K: int):
        keys = jax.random.split(rng, K)
        # train-mode BatchNorm writes batch_stats; allow and discard the
        # update (the reference's eval-in-train-mode also mutates running
        # stats as a side effect, ref scripts/test_baseline_stgcnn.py)
        mutable = ["batch_stats"] if "batch_stats" in variables else False

        def one(key):
            rngs = {"dropout": key, "latent": jax.random.fold_in(key, 1),
                    "noise": jax.random.fold_in(key, 2)}
            out = model.apply(variables, batch, False, rngs=rngs,
                              mutable=mutable)
            return out[0] if mutable else out

        preds = jax.vmap(one)(keys)            # (K, B, 2, T)
        return jnp.swapaxes(preds, 0, 1)

    return candidates


def make_gail_train_step(gen: GAILGenerator, disc: GAILDiscriminator,
                         g_tx: optax.GradientTransformation,
                         d_tx: optax.GradientTransformation,
                         adv_weight: float = 0.05):
    """Alternating GAN update (ref scripts/baseline_GAIL.py:287-460).

    D: BCE(real=1, fake=0) on [history || future]; G: denorm-MSE +
    adv_weight * BCE(fake=1).  One call does one D update then one G update.
    """
    eps = 1e-6

    def d_loss_fn(d_params, g_params, batch, rng):
        fake = gen.apply({"params": g_params}, batch, True)
        x = batch["traj_in"]
        real_p = disc.apply({"params": d_params}, x, batch["traj_out"])
        fake_p = disc.apply({"params": d_params}, x,
                            jax.lax.stop_gradient(fake))
        loss = -jnp.mean(jnp.log(real_p + eps)) \
               - jnp.mean(jnp.log(1 - fake_p + eps))
        return loss

    def g_loss_fn(g_params, d_params, batch, rng):
        fake = gen.apply({"params": g_params}, batch, True)
        mse = denorm_mse_loss(fake, batch["traj_out"], batch["norm_stat"],
                              batch.get("valid"))
        fake_p = disc.apply({"params": d_params}, batch["traj_in"], fake)
        adv = -jnp.mean(jnp.log(fake_p + eps))
        return mse + adv_weight * adv, (mse, adv)

    def step(g_params, d_params, g_opt, d_opt, batch, rng):
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_params, g_params, batch, rng)
        d_updates, d_opt = d_tx.update(d_grads, d_opt, d_params)
        d_params = optax.apply_updates(d_params, d_updates)

        (g_loss, (mse, adv)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, d_params, batch, rng)
        g_updates, g_opt = g_tx.update(g_grads, g_opt, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        return g_params, d_params, g_opt, d_opt, {
            "d_loss": d_loss, "g_loss": g_loss, "mse": mse, "adv": adv}

    return step
