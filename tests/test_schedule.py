"""Golden tests for beta schedules, derived coefficients, and respacing."""

import numpy as np
import pytest

from causaldiffae_tpu.diffusion import (
    get_named_beta_schedule,
    make_schedule,
    respace_schedule,
    space_timesteps,
)


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.0001, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-12)
    # scale-invariance in the limit: T=500 has endpoints x2
    betas500 = get_named_beta_schedule("linear", 500)
    np.testing.assert_allclose(betas500[0], 0.0002, rtol=1e-12)
    np.testing.assert_allclose(betas500[-1], 0.04, rtol=1e-12)


def test_cosine_schedule_bounds():
    betas = get_named_beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # alpha_bar should be monotonically decreasing toward ~0
    ab = np.cumprod(1 - betas)
    assert (np.diff(ab) < 0).all()
    assert ab[-1] < 1e-3


def test_derived_arrays_closed_forms():
    betas = get_named_beta_schedule("linear", 100)
    s = make_schedule(betas)
    alphas = 1 - betas
    ab = np.cumprod(alphas)
    ab_prev = np.append(1.0, ab[:-1])
    np.testing.assert_allclose(s.alphas_cumprod, ab, rtol=1e-6)
    np.testing.assert_allclose(s.sqrt_alphas_cumprod, np.sqrt(ab), rtol=1e-6)
    np.testing.assert_allclose(
        s.posterior_variance, betas * (1 - ab_prev) / (1 - ab), rtol=1e-6
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef1, betas * np.sqrt(ab_prev) / (1 - ab), rtol=1e-6
    )
    np.testing.assert_allclose(
        s.posterior_mean_coef2, (1 - ab_prev) * np.sqrt(alphas) / (1 - ab), rtol=1e-6
    )
    # posterior mean coefficients must sum to the x-preserving combination:
    # coef1 + coef2 * sqrt(ab_t)/... -> check the q_posterior identity instead:
    # for x_start = x_t = x (scalar 1), mean = coef1 + coef2 should be < 1+eps
    assert np.all(s.posterior_mean_coef1 + s.posterior_mean_coef2 <= 1.0 + 1e-5)
    # FIXED_LARGE: variance[0] = posterior_variance[1], rest = betas
    np.testing.assert_allclose(s.fixed_large_variance[0], s.posterior_variance[1], rtol=1e-6)
    np.testing.assert_allclose(s.fixed_large_variance[1:], betas[1:], rtol=1e-6)


def test_space_timesteps_ddim_and_sections():
    # ddim strided
    got = space_timesteps(1000, "ddim250")
    assert got == set(range(0, 1000, 4))
    # single-section 250 on 1000 steps
    got = space_timesteps(1000, "250")
    assert len(got) == 250
    assert 0 in got and max(got) == 999
    # multi-section
    got = space_timesteps(300, [10, 15, 20])
    assert len(got) == 45


def test_respace_preserves_alpha_bar():
    betas = get_named_beta_schedule("linear", 1000)
    keep = space_timesteps(1000, "250")
    sched, tmap = respace_schedule(betas, keep)
    assert sched.num_timesteps == 250
    assert tmap.shape == (250,)
    base_ab = np.cumprod(1 - betas)
    # kept steps' cumulative alpha must be preserved exactly
    np.testing.assert_allclose(sched.alphas_cumprod, base_ab[tmap], rtol=1e-5)


@pytest.mark.parametrize("respacing", ["", "250", "ddim50"])
def test_parity_with_reference_schedules(respacing):
    """Bit-level parity of all precomputed buffers vs the PyTorch reference."""
    import sys

    from conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, str(REFERENCE_ROOT))
    from improved_diffusion import gaussian_diffusion as ref_gd
    from improved_diffusion.respace import SpacedDiffusion
    from improved_diffusion.respace import space_timesteps as ref_space

    betas = get_named_beta_schedule("linear", 1000)
    if respacing:
        ref = SpacedDiffusion(
            use_timesteps=ref_space(1000, respacing),
            betas=betas,
            model_mean_type=ref_gd.ModelMeanType.EPSILON,
            model_var_type=ref_gd.ModelVarType.FIXED_LARGE,
            loss_type=ref_gd.LossType.MSE,
        )
        sched, tmap = respace_schedule(betas, space_timesteps(1000, respacing))
        np.testing.assert_array_equal(tmap, np.array(ref.timestep_map))
    else:
        ref = ref_gd.GaussianDiffusion(
            betas=betas,
            model_mean_type=ref_gd.ModelMeanType.EPSILON,
            model_var_type=ref_gd.ModelVarType.FIXED_LARGE,
            loss_type=ref_gd.LossType.MSE,
        )
        sched = make_schedule(betas)

    for name in [
        "betas",
        "alphas_cumprod",
        "alphas_cumprod_prev",
        "alphas_cumprod_next",
        "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod",
        "posterior_variance",
        "posterior_log_variance_clipped",
        "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            getattr(sched, name),
            getattr(ref, name).astype(np.float32),
            rtol=2e-6,
            atol=1e-7,
            err_msg=name,
        )
