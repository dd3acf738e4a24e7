"""Counterfactual generation: abduct -> intervene -> regenerate.

Rebuild of the do-intervention path in reference
`scripts/image_causaldae_test.py:320-607` as one jitted program per
intervention spec:

1. ENCODE:   (mu, _) = encoder(x);   var := eval_var (fixed 1e-3,
             `image_causaldae_test.py:406`)
2. INTERVENE (root variable): overwrite mu's block BEFORE the SCM pass so
   effects propagate (`:405-413`); (effect variable): overwrite z_post's
   block AFTER the SCM pass (`:445-453`).
3. SCM:      z_pre = A^T mu; z_post = g(z_pre) + mu;  z ~ N(z_post, eval_var)
4. ABDUCT:   x_t = q_sample(x, t_abduct, noise) in the respaced process
   (stochastic forward abduction at t=249 of the 250-step respacing, the
   shipped eval path `:415-419`; deterministic DDIM inversion is also
   available via `diffusion.sampling.ddim_reverse_loop`).
5. REGENERATE: DDIM (or ancestral) chain from x_t conditioned on z, with
   optional classifier-free guidance w (uncond branch: z = 0).

The whole pipeline is a single XLA program: 250 UNet forwards + encoder +
SCM fused into one `lax.scan` launch instead of the reference's 250
host-dispatched model calls.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.process import GaussianDiffusion
from ..diffusion.sampling import (
    ddim_reverse_loop,
    ddim_sample_loop,
    dpm_solver_pp_loop,
    p_sample_loop,
)
from ..models.unet import CausalUNet, reparameterize

__all__ = ["make_counterfactual_fn", "make_reconstruct_fn", "make_prior_sample_fn",
           "resolve_sampler"]


def resolve_sampler(use_ddim: bool, sampler: Optional[str] = None,
                    sample_steps: Optional[int] = None):
    """Pick the generation chain: 'ddim' | 'ddpm' | 'dpm++' (fast ODE solver,
    no reference counterpart). ``sampler=None`` preserves the historic
    ``use_ddim`` flag. Returns a loop with the common
    ``(diffusion, model_fn, noise, rng, *, clip_denoised, w, uncond_fn)``
    call signature."""
    if sampler is None:
        sampler = "ddim" if use_ddim else "ddpm"
    if sampler == "dpm++":
        return partial(dpm_solver_pp_loop, num_steps=sample_steps)
    if sample_steps is not None:
        raise ValueError("sample_steps only applies to the dpm++ sampler; "
                         "ddim/ddpm step counts come from timestep_respacing")
    return {"ddim": ddim_sample_loop, "ddpm": p_sample_loop}[sampler]


def _overwrite_block(arr: jnp.ndarray, var_index: int, n_vars: int, value) -> jnp.ndarray:
    """Set latent block ``var_index`` to ``value`` (SURVEY 'latent slicing')."""
    d = arr.shape[1] // n_vars
    block = jnp.broadcast_to(jnp.asarray(value, dtype=arr.dtype), (arr.shape[0], d))
    return arr.at[:, var_index * d:(var_index + 1) * d].set(block)


def make_counterfactual_fn(
    cfg,
    model: CausalUNet,
    diffusion: GaussianDiffusion,
    *,
    intervene_var: int,
    where: str = "auto",          # 'pre' (root, before SCM) | 'post' (effect) | 'auto'
    use_ddim: bool = True,
    w: Optional[float] = None,
    abduction: str = "qsample",   # 'qsample' (stochastic, the reference's
                                  # shipped path) | 'ddim' (deterministic
                                  # inversion through the conditioned model)
    sampler: Optional[str] = None,        # 'ddim' | 'ddpm' | 'dpm++'
    sample_steps: Optional[int] = None,   # dpm++ node budget
):
    """Build jittable ``fn(variables, x, cond, value, rng) -> samples``.

    ``value`` is the normalized intervention level broadcast over the
    variable's latent block. 'auto' picks pre/post by whether the variable
    has parents in cfg's adjacency (roots intervene on mu, effects on z_post
    - the reference's convention).
    """
    assert abduction in ("qsample", "ddim")
    loop = resolve_sampler(use_ddim, sampler, sample_steps)
    n_vars = cfg.n_vars
    if where == "auto":
        import numpy as np

        A = np.asarray(cfg.adjacency)
        has_parents = A[:, intervene_var].sum() > 0
        where = "post" if has_parents else "pre"
    assert where in ("pre", "post")

    def fn(variables, x, cond: Dict[str, jnp.ndarray], value, rng):
        B = x.shape[0]
        r_noise, r_rep, r_chain = jax.random.split(rng, 3)

        mu_raw, _ = model.apply(variables, x, train=False, method=CausalUNet.encode)
        var = jnp.full_like(mu_raw, cfg.reparam_var_scale)
        rep_noise = jax.random.normal(r_rep, mu_raw.shape, mu_raw.dtype)

        def make_z(intervene: bool) -> jnp.ndarray:
            """Latent under the (counter)factual world, with SHARED exogenous
            reparameterization noise (the abduction of u in do-calculus)."""
            mu = mu_raw
            if intervene and where == "pre":
                mu = _overwrite_block(mu, intervene_var, n_vars, value)
            z_post = (model.apply(variables, mu, method=CausalUNet.causalize)
                      if cfg.causal_modeling else mu)
            if intervene and where == "post":
                z_post = _overwrite_block(z_post, intervene_var, n_vars, value)
            return z_post + jnp.sqrt(var) * rep_noise

        y = cond.get("y")
        c = cond.get("c")

        def make_model_fn(z):
            def model_fn(xx, tt):
                return model.apply(variables, xx, tt, y=y, c=c, z=z, train=False,
                                   method=CausalUNet.denoise)
            return model_fn

        z = make_z(True)
        model_fn = make_model_fn(z)
        uncond_fn = make_model_fn(jnp.zeros_like(z)) if w is not None else None

        if abduction == "qsample":
            # stochastic abduction at the respaced t (reference :415-419)
            t = jnp.full((B,), cfg.abduction_t, dtype=jnp.int32)
            noise = jax.random.normal(r_noise, x.shape, x.dtype)
            x_t = diffusion.q_sample(x, t, noise)
        else:
            # deterministic DDIM inversion through the model conditioned on
            # the FACTUAL latent (no intervention) - exact exogenous-noise
            # abduction; regeneration below conditions on the intervened z.
            # The inversion uses the SAME guidance weight as generation so a
            # guided no-intervention roundtrip stays (near-)identity.
            x_t = ddim_reverse_loop(
                diffusion, make_model_fn(make_z(False)), x,
                clip_denoised=cfg.clip_denoised, w=w, uncond_fn=uncond_fn,
            )
        return loop(
            diffusion, model_fn, x_t, r_chain,
            clip_denoised=cfg.clip_denoised, w=w, uncond_fn=uncond_fn,
        )

    return fn


def make_reconstruct_fn(cfg, model: CausalUNet, diffusion: GaussianDiffusion,
                        *, use_ddim: bool = True, w: Optional[float] = None,
                        sampler: Optional[str] = None,
                        sample_steps: Optional[int] = None):
    """Identity counterfactual (no intervention): encode -> abduct -> regenerate.

    Used for reconstruction grids and latent traversals
    (`image_causaldae_test.py:484-520`).
    """
    loop = resolve_sampler(use_ddim, sampler, sample_steps)

    def fn(variables, x, cond, rng):
        B = x.shape[0]
        r_noise, r_rep, r_chain = jax.random.split(rng, 3)
        mu, _ = model.apply(variables, x, train=False, method=CausalUNet.encode)
        z_post = (
            model.apply(variables, mu, method=CausalUNet.causalize)
            if cfg.causal_modeling else mu
        )
        z = z_post + jnp.sqrt(cfg.reparam_var_scale) * jax.random.normal(
            r_rep, z_post.shape, z_post.dtype
        )
        t = jnp.full((B,), cfg.abduction_t, dtype=jnp.int32)
        x_t = diffusion.q_sample(x, t, jax.random.normal(r_noise, x.shape, x.dtype))
        y, c = cond.get("y"), cond.get("c")

        def model_fn(xx, tt):
            return model.apply(variables, xx, tt, y=y, c=c, z=z, train=False,
                               method=CausalUNet.denoise)

        uncond_fn = None
        if w is not None:
            z0 = jnp.zeros_like(z)

            def uncond_fn(xx, tt):
                return model.apply(variables, xx, tt, y=y, c=c, z=z0, train=False,
                                   method=CausalUNet.denoise)

        return loop(diffusion, model_fn, x_t, r_chain,
                    clip_denoised=cfg.clip_denoised, w=w, uncond_fn=uncond_fn)

    return fn


def make_prior_sample_fn(cfg, model: CausalUNet, diffusion: GaussianDiffusion,
                         *, use_ddim: bool = False,
                         sampler: Optional[str] = None,
                         sample_steps: Optional[int] = None):
    """Unconditional prior sampling: z ~ N(0, I), x_T ~ N(0, I)
    (reference `scripts/image_sample_rep.py:55-67`)."""
    loop = resolve_sampler(use_ddim, sampler, sample_steps)

    def fn(variables, shape, cond, rng):
        r_z, r_noise, r_chain = jax.random.split(rng, 3)
        z = jax.random.normal(r_z, (shape[0], cfg.rep_dim))
        noise = jax.random.normal(r_noise, shape)
        y, c = cond.get("y"), cond.get("c")

        def model_fn(xx, tt):
            return model.apply(variables, xx, tt, y=y, c=c, z=z, train=False,
                               method=CausalUNet.denoise)

        return loop(diffusion, model_fn, noise, r_chain, clip_denoised=cfg.clip_denoised)

    return fn
