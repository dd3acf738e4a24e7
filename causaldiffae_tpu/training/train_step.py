"""The jitted training step.

Replaces the reference's TrainLoop.run_step/forward_backward/optimize_normal
(`train_util.py:221-297`) with ONE compiled function: timestep sampling, the
q_sample + UNet forward + variational loss, backprop, the optimizer update,
EMA, the loss-aware sampler update, and all metric reductions happen on
device in a single XLA program. Data parallelism is expressed by jitting this
function over a Mesh with the batch sharded on the 'data' axis - XLA inserts
the gradient all-reduce over ICI (replacing DDP/gloo, SURVEY §2.12).

Microbatching (`train_util.py:233-259`) is a `lax.scan` over microbatches
with summed gradients (matching per-microbatch ``loss.backward()``
accumulation).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.process import GaussianDiffusion
from .samplers import sample_timesteps, update_sampler_state
from .state import TrainState, ema_rates, kl_weight_for_step

__all__ = ["make_train_step"]


def _tree_ema(ema, params, rate: float):
    """target = rate * target + (1 - rate) * src (reference `nn.py:503-513`)."""
    return jax.tree_util.tree_map(lambda e, p: e * rate + p * (1.0 - rate), ema, params)


def _global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree))
    )


def _quartile_means(t: jnp.ndarray, values: jnp.ndarray, num_timesteps: int) -> Dict[str, jnp.ndarray]:
    """Per-quartile-of-t loss buckets (reference `train_util.py:401-407`)."""
    q = (4 * t // num_timesteps).astype(jnp.int32)
    out = {}
    for i in range(4):
        m = (q == i).astype(jnp.float32)
        out[f"q{i}"] = jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)
        out[f"q{i}_count"] = jnp.sum(m)
    return out


def make_train_step(cfg, model, diffusion: GaussianDiffusion, tx: optax.GradientTransformation):
    """Build ``train_step(state, batch) -> (state, metrics)``.

    ``batch`` is a dict with 'image' [B,H,W,C] and optional 'y' [B] / 'c'
    [B,n_vars]. The returned function is pure and jit/pjit-compatible.
    """
    rates = ema_rates(cfg)
    has_bn = cfg.rep_cond  # encoder BatchNorm is the only mutable collection

    def loss_fn(params, batch_stats, images, cond, t, weights, rng, kl_weight):
        r_noise, r_rep, r_mask, r_drop = jax.random.split(rng, 4)
        rngs = {"reparam": r_rep, "cfmask": r_mask, "dropout": r_drop}
        captured = {}

        def forward(x_t, t_model):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            kwargs = {}
            if cfg.class_cond:
                kwargs["y"] = cond["y"]
            if cfg.context_cond:
                kwargs["c"] = cond["c"]
            if cfg.rep_cond:
                kwargs["x_start"] = images
            if has_bn:
                (eps, aux), mut = model.apply(
                    variables, x_t, t_model, train=True, rngs=rngs,
                    mutable=["batch_stats"], **kwargs,
                )
                captured["batch_stats"] = mut["batch_stats"]
            else:
                eps, aux = model.apply(
                    variables, x_t, t_model, train=True, rngs=rngs, **kwargs
                )
            return eps, aux

        terms = diffusion.training_losses(
            forward, images, t, r_noise,
            c=cond.get("c"),
            rep_cond=cfg.rep_cond,
            causal_modeling=cfg.causal_modeling,
            kl_weight=kl_weight,
        )
        loss = jnp.mean(terms["loss"] * weights)
        return loss, (terms, captured.get("batch_stats", batch_stats))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict]:
        images = batch["image"]
        B = images.shape[0]
        cond = {k: v for k, v in batch.items() if k != "image"}
        rng = jax.random.fold_in(state.base_rng, state.step)
        rng_t, rng_loss = jax.random.split(rng)

        t, weights = sample_timesteps(state.sampler_state, diffusion.num_timesteps, B, rng_t)
        kl_weight = kl_weight_for_step(state.step, cfg.kl_anneal_steps)

        micro = cfg.microbatch if cfg.microbatch > 0 else B
        n_micro = max(B // micro, 1)
        if n_micro == 1:
            (loss, (terms, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, images, cond, t, weights,
                rng_loss, kl_weight,
            )
        else:
            def micro_body(carry, xs):
                grads_acc, bs = carry
                im, cd, tt, ww, i = xs
                (l, (tm, new_bs)), g = grad_fn(
                    state.params, bs, im, cd, tt, ww,
                    jax.random.fold_in(rng_loss, i), kl_weight,
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, g)
                return (grads_acc, new_bs), tm

            reshape = lambda x: x.reshape(n_micro, micro, *x.shape[1:])
            xs = (
                reshape(images),
                jax.tree_util.tree_map(reshape, cond),
                reshape(t),
                reshape(weights),
                jnp.arange(n_micro),
            )
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, new_bs), terms = jax.lax.scan(
                micro_body, (zero_grads, state.batch_stats), xs
            )
            terms = jax.tree_util.tree_map(
                lambda x: x.reshape(-1) if x.ndim > 1 else x.mean(), terms
            )
            loss = jnp.mean(terms["loss"].reshape(-1) * weights) if terms["loss"].ndim else terms["loss"]

        # loss-aware sampler sees the (logically global) per-sample losses
        per_sample_loss = jnp.broadcast_to(terms["loss"], (B,))
        sampler_state = update_sampler_state(state.sampler_state, t, per_sample_loss)

        grad_norm = _global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.skip_nonfinite:
            # the bf16 analogue of the fp16 NaN skip (train_util.py:276-280):
            # if any grad is non-finite, keep the previous params/opt state
            ok = jnp.isfinite(grad_norm)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old) if hasattr(new, "shape") else new,
                opt_state, state.opt_state,
            )
        ema_params = {r: _tree_ema(state.ema_params[r], params, float(r)) for r in rates}

        metrics = {
            "loss": jnp.mean(jnp.broadcast_to(terms["loss"], (B,)) * weights),
            "grad_norm": grad_norm,
            "param_norm": _global_norm(params),
            "kl_weight": kl_weight,
        }
        if "mse" in terms:
            metrics["mse"] = jnp.mean(terms["mse"] * weights)
        if cfg.skip_nonfinite:
            metrics["step_skipped"] = 1.0 - jnp.isfinite(grad_norm).astype(jnp.float32)
        if "kld_rep" in terms:
            metrics["kld_rep"] = jnp.mean(terms["kld_rep"])
        if "vb" in terms:
            metrics["vb"] = jnp.mean(terms["vb"] * weights)
        if sampler_state is not None:
            # observability for the loss-aware sampler's in-graph warm-up ->
            # weighted transition (reference resample.py:137-144 gates on
            # every term having a full ring history): warmed flips 0->1 the
            # step the last timestep fills, warmup_frac tracks progress.
            hpt = sampler_state["history"].shape[1]
            metrics["sampler_warmed"] = jnp.all(
                sampler_state["counts"] == hpt
            ).astype(jnp.float32)
            metrics["sampler_warmup_frac"] = jnp.mean(
                sampler_state["counts"] / hpt
            )
        for key in ("loss", "mse"):
            if key not in terms:
                continue
            vals = jnp.broadcast_to(terms[key], (B,)) * weights
            for name, v in _quartile_means(t, vals, diffusion.num_timesteps).items():
                metrics[f"{key}_{name}"] = v

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            ema_params=ema_params,
            sampler_state=sampler_state,
            base_rng=state.base_rng,
        )
        return new_state, metrics

    return train_step
