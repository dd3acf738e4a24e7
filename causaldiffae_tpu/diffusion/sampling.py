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
import numpy as np

from .process import GaussianDiffusion

__all__ = [
    "p_sample_loop",
    "ddim_sample_loop",
    "ddim_reverse_loop",
    "dpm_solver_pp_loop",
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


def dpm_solver_pp_loop(
    diffusion: GaussianDiffusion,
    model_fn,
    noise: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    w: Optional[float] = None,
    uncond_fn=None,
    order: int = 2,
    num_steps: Optional[int] = None,
) -> jnp.ndarray:
    """DPM-Solver++ multistep sampling chain as a single scan (deterministic).

    A fast high-order solver for the same probability-flow ODE the DDIM
    (eta=0) chain integrates — the reference has no equivalent (its samplers
    are C4 ancestral + C5 DDIM, `gaussian_diffusion.py:383-680`); this is a
    serving-speed extension: 10-25 solver steps recover the quality of a
    250-step DDIM chain, cutting counterfactual-generation latency ~10x.

    Implements the data-prediction ("++") multistep solver of Lu et al. 2022
    (arXiv:2211.01095, Algorithm 2 / the 2M variant):

        lambda_t   = log(alpha_t / sigma_t),  h_i = lambda_{t_i} - lambda_{t_{i-1}}
        x_{t_i}    = (sigma_{t_i}/sigma_{t_{i-1}}) x_{t_{i-1}}
                     - alpha_{t_i} (e^{-h_i} - 1) D_i
        D_i (1st order) = x0(x_{t_{i-1}}, t_{i-1})
        D_i (2M)        = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1},
                          r_i = h_{i-1}/h_i

    with ``alpha_t = sqrt(alphas_cumprod[t])``, ``sigma_t = sqrt(1 - acp[t])``
    taken from the (respaced) discrete schedule's own nodes. The first step
    and the final step run first order (standard "lower_order_final"); the
    final node is the clean-data point alpha=1, sigma=0, where the update
    collapses exactly to the x0 prediction — mirroring the DDIM chain's
    ``alphas_cumprod_prev[0] == 1`` behavior. At ``order=1`` every step is
    algebraically identical to a DDIM eta=0 step (asserted in
    ``tests/test_dpm_solver.py``), so the solver nests the reference
    semantics exactly.

    Guidance/clipping flow through ``p_mean_variance`` unchanged, so ``w``,
    ``uncond_fn``, ``clip_denoised`` and ``denoised_fn`` mean exactly what
    they do in the DDIM chain. ``rng`` is accepted for call-site symmetry
    with the stochastic samplers and ignored (the solver is deterministic).

    ``num_steps`` (when set) makes the solver pick its OWN node subset of the
    process's timesteps, **uniform in lambda (logSNR)** between the process's
    top node and t=0 — the grid the DPM-Solver paper uses and the reason it
    beats DDIM at equal step counts. The reference's t-uniform respacing grid
    leaves a huge final lambda-gap (h ~ 3.6 at 10 steps on the linear
    schedule) that wrecks multistep extrapolation — measured on the
    closed-form Gaussian ODE: 2M at 10 lambda-uniform steps errs 0.015 vs
    0.118 for t-uniform DDIM-10 (``tests/test_dpm_solver.py``). The chain
    still STARTS at the process's top node, so q_sample abduction at
    ``cfg.abduction_t`` (the respaced top, reference
    `image_causaldae_test.py:415-419`) is unchanged; only the descent grid
    is re-spaced.
    """
    assert order in (1, 2), order
    del rng
    B = noise.shape[0]
    N_proc = diffusion.num_timesteps

    # Node coefficients, precomputed in float64 off the (respaced) schedule.
    acp = np.asarray(diffusion.schedule.alphas_cumprod, dtype=np.float64)
    if num_steps is None or num_steps >= N_proc:
        desc = np.arange(N_proc - 1, -1, -1)
    else:
        lam_all = 0.5 * np.log(acp / (1.0 - acp))  # decreasing in t
        targets = np.linspace(lam_all[N_proc - 1], lam_all[0], num_steps)
        nodes = {int(np.argmin(np.abs(lam_all - tg))) for tg in targets}
        nodes.update((N_proc - 1, 0))  # endpoints exact
        desc = np.asarray(sorted(nodes, reverse=True))
    N = len(desc)
    alpha = np.sqrt(acp[desc])
    sigma = np.sqrt(1.0 - acp[desc])
    lam = np.log(alpha / sigma)
    a_next = np.append(alpha[1:], 1.0)          # terminal node: clean data
    sratio = np.append(sigma[1:], 0.0) / sigma  # sigma_{t_i}/sigma_{t_{i-1}}
    h = np.append(lam[1:] - lam[:-1], np.inf)   # terminal h -> inf
    phi = np.expm1(-h)                          # e^{-h} - 1; terminal -> -1
    c2 = np.zeros(N)                            # use2m/(2 r_i), 0 = 1st order
    if order >= 2 and N >= 3:
        c2[1:N - 1] = h[1:N - 1] / (2.0 * h[:N - 2])

    xs = (
        desc.astype(np.int32),
        sratio.astype(np.float32),
        a_next.astype(np.float32),
        phi.astype(np.float32),
        c2.astype(np.float32),
    )

    def step(carry, per_step):
        x, x0_prev = carry
        t_scalar, s_ratio, a_nxt, phi_i, c2_i = per_step
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        out = diffusion.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            w=w, uncond_fn=uncond_fn,
        )
        x0 = out["pred_xstart"]
        d = x0 + c2_i * (x0 - x0_prev)
        x_next = s_ratio * x - a_nxt * phi_i * d
        return (x_next, x0), None

    (x, _), _ = jax.lax.scan(step, (noise, jnp.zeros_like(noise)), xs)
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
