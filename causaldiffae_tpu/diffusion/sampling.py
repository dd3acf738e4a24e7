"""Compiled sampling loops.

The reference runs its samplers as Python loops of 250-2000 individual model
calls (`gaussian_diffusion.py:416-504,598-680`, hot loop noted in SURVEY §3.2).
Here each full chain is ONE ``lax.scan`` inside ``jit``: the UNet forward is
traced once, XLA pipelines the whole chain on-device, and there is zero
host<->device ping-pong per step. Guidance (two model calls/step), per-step z
conditioning and the respaced timestep map are all scan-carried or closed
over as constants.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .process import GaussianDiffusion

__all__ = [
    "p_sample_loop",
    "ddim_sample_loop",
    "ddim_reverse_loop",
    "calc_bpd_loop",
]


def _reverse_timesteps(diffusion: GaussianDiffusion) -> jnp.ndarray:
    return jnp.arange(diffusion.num_timesteps - 1, -1, -1, dtype=jnp.int32)


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn,
    noise: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    w: Optional[float] = None,
    uncond_fn=None,
) -> jnp.ndarray:
    """Ancestral (DDPM) sampling chain as a single scan.

    Functional equivalent of reference `p_sample_loop` /
    `p_sample_loop_progressive` (`gaussian_diffusion.py:416-504`). ``noise``
    is the starting x_T (callers draw it; q_sample-abducted x_t for
    counterfactuals, pure N(0,I) for prior sampling).
    """
    B = noise.shape[0]

    def step(carry, t_scalar):
        x, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        out = diffusion.p_sample(
            model_fn, x, t, sub, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, w=w, uncond_fn=uncond_fn,
        )
        return (out["sample"], key), None

    (x, _), _ = jax.lax.scan(step, (noise, rng), _reverse_timesteps(diffusion))
    return x


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn,
    noise: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    eta: float = 0.0,
    w: Optional[float] = None,
    uncond_fn=None,
) -> jnp.ndarray:
    """DDIM sampling chain as a single scan.

    Functional equivalent of reference `ddim_sample_loop(_progressive)`
    (`gaussian_diffusion.py:598-680`).
    """
    B = noise.shape[0]

    def step(carry, t_scalar):
        x, key = carry
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        out = diffusion.ddim_sample(
            model_fn, x, t, sub, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, eta=eta, w=w, uncond_fn=uncond_fn,
        )
        return (out["sample"], key), None

    (x, _), _ = jax.lax.scan(step, (noise, rng), _reverse_timesteps(diffusion))
    return x


def ddim_reverse_loop(
    diffusion: GaussianDiffusion,
    model_fn,
    x0: jnp.ndarray,
    *,
    num_steps: Optional[int] = None,
    clip_denoised: bool = True,
    w: Optional[float] = None,
    uncond_fn=None,
) -> jnp.ndarray:
    """Deterministic DDIM inversion x_0 -> x_{T-1} (abduction by ODE).

    The reference ships `ddim_reverse_sample` (`gaussian_diffusion.py:560-596`)
    but its eval path abducts with a stochastic `q_sample` at t=249
    (`image_causaldae_test.py:415-419`); both are supported - this is the
    deterministic one, scanning t = 0..num_steps-1 forward. Pass the same
    (w, uncond_fn) guidance as the generation chain for exact roundtrips.

    The default inverts T-1 steps, yielding x at level T-1 - the level the
    generation scan treats its input as (its first step runs t=T-1). One
    more step would be destructive, not just misaligned: the reference's
    alphas_cumprod_next[T-1] == 0 (`gaussian_diffusion.py:146`) collapses
    the state to pure predicted eps. Verified by the analytic roundtrip
    test (`tests/test_evals.py::test_guided_ddim_roundtrip_identity`).
    """
    B = x0.shape[0]
    n = num_steps if num_steps is not None else diffusion.num_timesteps - 1

    def step(x, t_scalar):
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        out = diffusion.ddim_reverse_sample(
            model_fn, x, t, clip_denoised=clip_denoised, w=w, uncond_fn=uncond_fn,
        )
        return out["sample"], None

    x, _ = jax.lax.scan(step, x0, jnp.arange(n, dtype=jnp.int32))
    return x


def calc_bpd_loop(
    diffusion: GaussianDiffusion,
    model_fn,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
):
    """Full per-timestep VLB sweep (bits/dim) as one scan.

    Reference `calc_bpd_loop` (`gaussian_diffusion.py:880-935`): T iterations
    of q_sample + vb_terms, plus x0/eps MSEs, stacked [N, T] with column 0 =
    t=0 (the reference iterates t descending and appends, so its column order
    is descending; we return ascending-t arrays and note it - the reference
    only ever sums/means over the axis).
    """
    B = x_start.shape[0]

    def step(key, t_scalar):
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        noise = jax.random.normal(sub, x_start.shape, dtype=x_start.dtype)
        x_t = diffusion.q_sample(x_start, t, noise)
        out = diffusion.vb_terms_bpd(model_fn, x_start, x_t, t, clip_denoised=clip_denoised)
        eps = diffusion.predict_eps_from_xstart(x_t, t, out["pred_xstart"])
        xstart_mse = ((out["pred_xstart"] - x_start) ** 2).reshape(B, -1).mean(-1)
        mse = ((eps - noise) ** 2).reshape(B, -1).mean(-1)
        return key, (out["output"], xstart_mse, mse)

    ts = jnp.arange(diffusion.num_timesteps, dtype=jnp.int32)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, rng, ts)
    vb = vb.T          # [N, T], ascending t
    xstart_mse = xstart_mse.T
    mse = mse.T
    prior_bpd = diffusion.prior_bpd(x_start)
    total_bpd = vb.sum(axis=1) + prior_bpd
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior_bpd,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
