"""Parity tests for the non-default diffusion branches vs the torch reference.

VERDICT round-1 item 6: every enum value in `process.py` (LEARNED /
LEARNED_RANGE variances, KL / RESCALED_KL losses, PREVIOUS_X / START_X
means) must be executed by at least one test. Each case runs the reference
`gaussian_diffusion.py` implementation and ours on identical inputs with an
identical deterministic fake model and asserts numerical agreement.

Also covers the KL-weight anneal parity vs the reference
`TrainLoop.linear_kl_weight_scheduler` (`train_util.py:176-187`).
"""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

th = pytest.importorskip("torch")
sys.path.insert(0, str(REFERENCE_ROOT))

import jax
import jax.numpy as jnp

from improved_diffusion import gaussian_diffusion as ref_gd
from improved_diffusion.respace import SpacedDiffusion
from improved_diffusion.respace import space_timesteps as ref_space

from causaldiffae_tpu.diffusion import create_diffusion
from causaldiffae_tpu.diffusion.process import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
)
from causaldiffae_tpu.diffusion.schedule import get_named_beta_schedule, make_schedule


def _ref_process(mean_type, var_type, loss_type, steps=1000, respacing="250"):
    return SpacedDiffusion(
        use_timesteps=ref_space(steps, respacing),
        betas=ref_gd.get_named_beta_schedule("linear", steps),
        model_mean_type=mean_type,
        model_var_type=var_type,
        loss_type=loss_type,
        rescale_timesteps=False,
    )


def _our_process(mean_type, var_type, loss_type, steps=1000, respacing="250"):
    from causaldiffae_tpu.diffusion.respace import respace_schedule, space_timesteps

    betas = get_named_beta_schedule("linear", steps)
    schedule, timestep_map = respace_schedule(betas, space_timesteps(steps, respacing))
    return GaussianDiffusion(
        schedule=schedule, mean_type=mean_type, var_type=var_type,
        loss_type=loss_type, timestep_map=timestep_map, original_num_steps=steps,
    )


# Deterministic fake models. For learned variance the model emits 2C
# channels: [mean-ish output, var values in (-1, 1)].
def _fake_out_nchw_torch(x, t):
    return th.tanh(x) * th.cos(t.float() / 100.0).view(-1, 1, 1, 1)


def _fake_var_nchw_torch(x, t):
    return 0.7 * th.tanh(0.3 * x + 0.1) * th.sin(t.float() / 77.0 + 0.5).view(-1, 1, 1, 1)


class _FakeTorch:
    """model(x, t) -> (out, mu, var, z_post, mask) like the reference UNet."""

    def __init__(self, learned_var=False):
        self.learned_var = learned_var

    def __call__(self, x, t, **kw):
        out = _fake_out_nchw_torch(x, t)
        if self.learned_var:
            out = th.cat([out, _fake_var_nchw_torch(x, t)], dim=1)
        return out, None, None, None, None


def _fake_jax(x_nhwc, t, learned_var=False):
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
    ct = jnp.cos(t.astype(jnp.float32) / 100.0).reshape(-1, 1, 1, 1)
    out = jnp.tanh(x) * ct
    if learned_var:
        st = jnp.sin(t.astype(jnp.float32) / 77.0 + 0.5).reshape(-1, 1, 1, 1)
        out = jnp.concatenate([out, 0.7 * jnp.tanh(0.3 * x + 0.1) * st], axis=1)
    return jnp.transpose(out, (0, 2, 3, 1))


def _batch(seed=0, B=4):
    rng = np.random.RandomState(seed)
    x0 = np.clip(rng.randn(B, 1, 8, 8) * 0.4, -1, 1).astype(np.float32)
    noise = rng.randn(B, 1, 8, 8).astype(np.float32)
    t = np.array([0, 17, 128, 249], dtype=np.int64)[:B]
    return x0, noise, t


# --------------------------------------------------------------------- #
# learned-sigma branches (LEARNED_RANGE + RESCALED_MSE is the reference
# learn_sigma=True config; LEARNED exercises the raw-log-variance split)
# --------------------------------------------------------------------- #
def test_learned_range_training_losses_parity():
    """Parity for the intended learn_sigma semantics.

    NB the reference fork's own learn_sigma training path CRASHES: its
    frozen-out wrapper (`gaussian_diffusion.py:826` `lambda *args, r=...: r`)
    returns a bare tensor where `p_mean_variance` (`:287`) unpacks the
    5-tuple the forked UNet returns - fine in upstream improved-diffusion,
    broken here since the fork changed the model output contract. So the
    expected values are composed from the reference's `_vb_terms_bpd` with a
    correctly-wrapped frozen output (the upstream semantics, which our
    implementation follows at `process.py:431-442`).
    """
    ref = _ref_process(ref_gd.ModelMeanType.EPSILON, ref_gd.ModelVarType.LEARNED_RANGE,
                       ref_gd.LossType.RESCALED_MSE)
    ours = _our_process(ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE,
                        LossType.RESCALED_MSE)
    x0, noise, t = _batch()
    got = ours.training_losses(
        lambda xx, tt: (_fake_jax(xx, tt, learned_var=True), {}),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.PRNGKey(0), noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    # expected, composed the way reference training_losses intends (:813-851)
    x0t, nt, tt = th.from_numpy(x0), th.from_numpy(noise), th.from_numpy(t)
    x_t = ref.q_sample(x0t, tt, noise=nt)
    # the model sees original-process timesteps via the respacing map
    # (reference `respace.py` _WrappedModel)
    tm = th.tensor(np.asarray(ref.timestep_map, dtype=np.int64))[tt]
    out = _fake_out_nchw_torch(x_t, tm)
    var_vals = _fake_var_nchw_torch(x_t, tm)
    frozen = th.cat([out.detach(), var_vals], dim=1)
    exp_vb = ref._vb_terms_bpd(
        model=lambda *a: (frozen, None, None, None, None),
        x_start=x0t, x_t=x_t, t=tt, clip_denoised=False,
    )["output"] * (ref.num_timesteps / 1000.0)
    exp_mse = ref_gd.mean_flat((nt - out) ** 2)
    exp = {"mse": exp_mse, "vb": exp_vb, "loss": exp_mse + exp_vb}
    for key in ("mse", "vb", "loss"):
        np.testing.assert_allclose(
            np.asarray(got[key]), exp[key].detach().numpy(), atol=2e-4, rtol=1e-3,
            err_msg=key,
        )


@pytest.mark.parametrize("vt_ref,vt_ours", [
    (ref_gd.ModelVarType.LEARNED, ModelVarType.LEARNED),
    (ref_gd.ModelVarType.LEARNED_RANGE, ModelVarType.LEARNED_RANGE),
])
def test_learned_variance_p_mean_variance_parity(vt_ref, vt_ours):
    ref = _ref_process(ref_gd.ModelMeanType.EPSILON, vt_ref, ref_gd.LossType.MSE)
    ours = _our_process(ModelMeanType.EPSILON, vt_ours, LossType.MSE)
    x0, _, t = _batch(seed=1)
    exp = ref.p_mean_variance(
        _FakeTorch(learned_var=True), th.from_numpy(x0), th.from_numpy(t),
        clip_denoised=True,
    )
    got = ours.p_mean_variance(
        lambda xx, tt: _fake_jax(xx, tt, learned_var=True),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t), clip_denoised=True,
    )
    for key in ("mean", "variance", "log_variance", "pred_xstart"):
        r = exp[key].numpy()
        o = np.broadcast_to(np.asarray(got[key]).transpose(0, 3, 1, 2), r.shape)
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-3, err_msg=key)


def test_learned_range_vb_frozen_mean_blocks_gradient():
    """The vb term must not backprop into the mean half (stop_gradient)."""
    ours = _our_process(ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE,
                        LossType.RESCALED_MSE)
    x0, noise, t = _batch(seed=2)
    x0j = jnp.asarray(x0.transpose(0, 2, 3, 1))

    def vb_of_scale(s):
        # scale only the MEAN half of the model output; vb must be constant in s
        def fwd(xx, tt):
            out = _fake_jax(xx, tt, learned_var=True)
            mean, var = jnp.split(out, 2, axis=-1)
            return jnp.concatenate([mean * s, var], axis=-1), {}

        terms = ours.training_losses(
            fwd, x0j, jnp.asarray(t), jax.random.PRNGKey(0),
            noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
        )
        return terms["vb"].sum()

    g = jax.grad(vb_of_scale)(1.0)
    np.testing.assert_allclose(float(g), 0.0, atol=1e-8)


# --------------------------------------------------------------------- #
# KL / RESCALED_KL loss types
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("lt_ref,lt_ours", [
    (ref_gd.LossType.KL, LossType.KL),
    (ref_gd.LossType.RESCALED_KL, LossType.RESCALED_KL),
])
def test_kl_loss_training_losses_parity(lt_ref, lt_ours):
    ref = _ref_process(ref_gd.ModelMeanType.EPSILON, ref_gd.ModelVarType.FIXED_LARGE,
                       lt_ref)
    ours = _our_process(ModelMeanType.EPSILON, ModelVarType.FIXED_LARGE, lt_ours)
    x0, noise, t = _batch(seed=3)
    exp = ref.training_losses(
        _FakeTorch(), th.from_numpy(x0), th.from_numpy(t), noise=th.from_numpy(noise)
    )
    got = ours.training_losses(
        lambda xx, tt: (_fake_jax(xx, tt), {}),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.PRNGKey(0), noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got["loss"]), exp["loss"].numpy(),
                               atol=2e-3, rtol=1e-3)


# --------------------------------------------------------------------- #
# PREVIOUS_X and START_X mean types
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("mt_ref,mt_ours", [
    (ref_gd.ModelMeanType.PREVIOUS_X, ModelMeanType.PREVIOUS_X),
    (ref_gd.ModelMeanType.START_X, ModelMeanType.START_X),
])
def test_mean_type_parity(mt_ref, mt_ours):
    ref = _ref_process(mt_ref, ref_gd.ModelVarType.FIXED_LARGE, ref_gd.LossType.MSE)
    ours = _our_process(mt_ours, ModelVarType.FIXED_LARGE, LossType.MSE)
    x0, noise, t = _batch(seed=4)

    # p_mean_variance
    exp = ref.p_mean_variance(_FakeTorch(), th.from_numpy(x0), th.from_numpy(t),
                              clip_denoised=True)
    got = ours.p_mean_variance(
        lambda xx, tt: _fake_jax(xx, tt),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t), clip_denoised=True,
    )
    for key in ("mean", "pred_xstart"):
        r = exp[key].numpy()
        o = np.broadcast_to(np.asarray(got[key]).transpose(0, 3, 1, 2), r.shape)
        np.testing.assert_allclose(o, r, atol=3e-4, rtol=1e-3, err_msg=key)

    # training target
    exp_l = ref.training_losses(_FakeTorch(), th.from_numpy(x0), th.from_numpy(t),
                                noise=th.from_numpy(noise))
    got_l = ours.training_losses(
        lambda xx, tt: (_fake_jax(xx, tt), {}),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.PRNGKey(0), noise=jnp.asarray(noise.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got_l["loss"]), exp_l["loss"].numpy(),
                               atol=1e-5, rtol=1e-4)


# --------------------------------------------------------------------- #
# factory: learn_sigma / use_kl flags wire the right enum combos
# --------------------------------------------------------------------- #
def test_create_diffusion_flag_wiring():
    d = create_diffusion(steps=100, learn_sigma=True, rescale_learned_sigmas=True)
    assert d.var_type == ModelVarType.LEARNED_RANGE
    assert d.loss_type == LossType.RESCALED_MSE
    d = create_diffusion(steps=100, use_kl=True)
    assert d.loss_type == LossType.RESCALED_KL
    d = create_diffusion(steps=100, sigma_small=True)
    assert d.var_type == ModelVarType.FIXED_SMALL
    d = create_diffusion(steps=100, predict_xstart=True)
    assert d.mean_type == ModelMeanType.START_X


# --------------------------------------------------------------------- #
# KL-weight anneal parity vs the reference scheduler
# --------------------------------------------------------------------- #
def test_kl_anneal_parity_vs_reference_scheduler():
    # train_util imports blobfile/mpi4py/torchvision, none installed here;
    # stub just enough to import the module and call the pure scheduler.
    # FUNCTIONAL stubs, not empty ones: improved_diffusion modules cache
    # `bf`/`MPI` objects at import, so whatever stub imports them first must
    # survive reuse by later tests (tests/test_reference_eval.py shares the
    # process). Use the cross-stack harness's canonical shim installer.
    import importlib.util as _ilu
    from pathlib import Path as _Path

    _spec = _ilu.spec_from_file_location(
        "cdae_reference_eval_shims",
        str(_Path(__file__).resolve().parent.parent / "scripts"
            / "reference_eval.py"))
    _harness = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_harness)
    before = set(sys.modules)
    _harness.install_reference_shims()
    installed = [m for m in sys.modules if m not in before]

    try:
        from improved_diffusion.train_util import TrainLoop

        from causaldiffae_tpu.training import kl_weight_for_step

        total = 50_000
        for step in (0, 1, 7, 123, 25_000, 49_998, 49_999, 50_000, 61_234):
            exp = TrainLoop.linear_kl_weight_scheduler(None, step, total, 0.0, 1.0)
            got = float(kl_weight_for_step(jnp.asarray(step), total))
            np.testing.assert_allclose(got, exp, atol=1e-7, err_msg=f"step={step}")
    finally:
        # bare stubs (no __spec__) poison later importlib.util.find_spec
        # calls and fake out 'is torchvision present' gates in other tests
        for name in installed:
            sys.modules.pop(name, None)
