"""Likelihood / KL helpers for the variational objective.

Rebuild of reference `improved_diffusion/losses.py` (Gaussian KL and the
discretized Gaussian decoder likelihood) and the elementwise-KL helper
`kl_normal` from `improved_diffusion/nn.py:440-457`. All pure jnp - these run
on the VPU, fused by XLA into the surrounding computation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "normal_kl",
    "kl_normal",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "mean_flat",
]


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (reference `nn.py:534-538`)."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians in (mean, log-variance) form.

    Reference `losses.py:12-39`. Broadcasts, so scalars work for the prior.
    """
    mean1, logvar1 = jnp.asarray(mean1), jnp.asarray(logvar1)
    mean2, logvar2 = jnp.asarray(mean2), jnp.asarray(logvar2)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def kl_normal(qm, qv, pm, pv):
    """KL(q || p) between diagonal Gaussians in (mean, VARIANCE) form, summed
    over the last axis. Reference `nn.py:440-457` - note the reference's
    representation objective feeds a softplus'd quantity here as the variance
    (quirk preserved by the callers, see process.representation_loss).
    """
    element_wise = 0.5 * (
        jnp.log(pv) - jnp.log(qv) + qv / pv + (qm - pm) ** 2 / pv - 1.0
    )
    return element_wise.sum(-1)


def approx_standard_normal_cdf(x):
    """Tanh approximation of the standard normal CDF (reference `losses.py:42-47`)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of images discretized to 256 bins under a Gaussian.

    Reference `losses.py:50-77`; x assumed uint8-origin data in [-1, 1].
    """
    assert x.shape == means.shape == log_scales.shape
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs
