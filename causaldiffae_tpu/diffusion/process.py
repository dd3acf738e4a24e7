"""Pure-functional Gaussian diffusion process for TPU.

Rebuild of reference `improved_diffusion/gaussian_diffusion.py` +
`respace.py`, redesigned for XLA:

- The process object is a frozen Python dataclass holding float32 numpy
  coefficient arrays (:class:`DiffusionSchedule`). It is *closed over* by
  jitted functions, so every per-timestep coefficient becomes an XLA constant
  and per-step "extract" ops compile to cheap gathers.
- The model is a black-box callable ``model_fn(x, t_model) -> eps`` (all
  conditioning pre-bound by the caller). Classifier-free guidance takes a
  second ``uncond_fn`` instead of mutating a kwargs dict
  (reference `gaussian_diffusion.py:277-285`).
- Samplers live in `sampling.py` as single ``lax.scan`` loops; the per-step
  math (``p_sample`` / ``ddim_sample`` / ``ddim_reverse_sample``) is here.
- The CausalDiffAE variational objective (`gaussian_diffusion.py:718-859`)
  is `training_losses` + `representation_loss`, with the masked-KL
  classifier-free gating preserved exactly (`:762-764`).

RNG is explicit: every stochastic function takes a `jax.random` key.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .losses import (
    discretized_gaussian_log_likelihood,
    kl_normal,
    mean_flat,
    normal_kl,
)
from .respace import respace_schedule, space_timesteps
from .schedule import DiffusionSchedule, get_named_beta_schedule, make_schedule

__all__ = [
    "ModelMeanType",
    "ModelVarType",
    "LossType",
    "GaussianDiffusion",
    "create_diffusion",
]

# String enums (static jit arguments; reference uses Python enums at
# gaussian_diffusion.py:68-101).
class ModelMeanType:
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType:
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType:
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and broadcast to an ndim tensor.

    Reference `gaussian_diffusion.py:938-951`; here `arr` is a closed-over
    constant so this is a single on-device gather.
    """
    out = jnp.asarray(arr)[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Static diffusion process description.

    ``timestep_map`` is non-None iff this is a respaced process; model-facing
    timesteps are mapped back to the original process exactly like the
    reference's `_WrappedModel` (`respace.py:112-124`).
    """

    schedule: DiffusionSchedule
    mean_type: str = ModelMeanType.EPSILON
    var_type: str = ModelVarType.FIXED_LARGE
    loss_type: str = LossType.MSE
    rescale_timesteps: bool = False
    timestep_map: Optional[np.ndarray] = None
    original_num_steps: Optional[int] = None

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    # ------------------------------------------------------------------ #
    # timestep plumbing
    # ------------------------------------------------------------------ #
    def model_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Timesteps as seen by the model: respacing map + optional rescale.

        Combines `respace._WrappedModel.__call__` (`respace.py:119-124`) and
        `GaussianDiffusion._scale_timesteps` (`gaussian_diffusion.py:378-381`).
        """
        new_t = t
        if self.timestep_map is not None:
            new_t = jnp.asarray(self.timestep_map)[t]
        if self.rescale_timesteps:
            base = self.original_num_steps or self.num_timesteps
            return new_t.astype(jnp.float32) * (1000.0 / base)
        return new_t

    # ------------------------------------------------------------------ #
    # q process
    # ------------------------------------------------------------------ #
    def q_mean_variance(self, x_start, t):
        """Moments of q(x_t | x_0). Reference `gaussian_diffusion.py:184-199`."""
        s = self.schedule
        mean = _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        variance = _extract(1.0 - s.alphas_cumprod, t, x_start.ndim)
        log_variance = _extract(s.log_one_minus_alphas_cumprod, t, x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        """Sample q(x_t | x_0) with given noise. Reference `gaussian_diffusion.py:201-222`."""
        s = self.schedule
        return (
            _extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        """Moments of q(x_{t-1} | x_t, x_0). Reference `gaussian_diffusion.py:224-246`."""
        s = self.schedule
        posterior_mean = (
            _extract(s.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(s.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        posterior_variance = _extract(s.posterior_variance, t, x_t.ndim)
        posterior_log_variance = _extract(s.posterior_log_variance_clipped, t, x_t.ndim)
        return posterior_mean, posterior_variance, posterior_log_variance

    # ------------------------------------------------------------------ #
    # eps <-> x0 conversions
    # ------------------------------------------------------------------ #
    def predict_xstart_from_eps(self, x_t, t, eps):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
        )

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        s = self.schedule
        return (
            _extract(s.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def predict_xstart_from_xprev(self, x_t, t, xprev):
        s = self.schedule
        coef1 = _extract(1.0 / s.posterior_mean_coef1, t, x_t.ndim)
        coef2 = _extract(s.posterior_mean_coef2 / s.posterior_mean_coef1, t, x_t.ndim)
        return coef1 * xprev - coef2 * x_t

    # ------------------------------------------------------------------ #
    # p process (model-driven)
    # ------------------------------------------------------------------ #
    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn=None,
        w: Optional[float] = None,
        uncond_fn: Optional[ModelFn] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Moments of p(x_{t-1} | x_t) plus the x_0 prediction.

        Reference `gaussian_diffusion.py:248-353`. Classifier-free guidance:
        ``w * eps_cond + (1 - w) * eps_uncond`` where the unconditional branch
        is the caller-supplied ``uncond_fn`` (z=0 in CausalDiffAE,
        `gaussian_diffusion.py:277-285`).
        """
        s = self.schedule
        t_model = self.model_t(t)
        if w is not None:
            assert uncond_fn is not None, "guidance requires an unconditional model fn"
            pred_cond = model_fn(x, t_model)
            pred_uncond = uncond_fn(x, t_model)
            model_output = w * pred_cond + (1.0 - w) * pred_uncond
        else:
            model_output = model_fn(x, t_model)

        C = x.shape[-1]
        if self.var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            if self.var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _extract(s.posterior_log_variance_clipped, t, x.ndim)
                max_log = _extract(s.log_betas, t, x.ndim)
                frac = (model_var_values + 1) / 2  # [-1,1] -> [0,1]
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            var_arr, logvar_arr = {
                ModelVarType.FIXED_LARGE: (s.fixed_large_variance, s.fixed_large_log_variance),
                ModelVarType.FIXED_SMALL: (s.posterior_variance, s.posterior_log_variance_clipped),
            }[self.var_type]
            model_variance = _extract(var_arr, t, x.ndim)
            model_log_variance = _extract(logvar_arr, t, x.ndim)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                return jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(self.predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
            if self.mean_type == ModelMeanType.START_X:
                pred_xstart = process_xstart(model_output)
            else:
                pred_xstart = process_xstart(self.predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:
            raise NotImplementedError(self.mean_type)

        del C
        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": jnp.broadcast_to(model_log_variance, x.shape),
            "pred_xstart": pred_xstart,
        }

    # -- single reverse steps (scanned over in sampling.py) -------------- #
    def p_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None,
        w=None, uncond_fn=None,
    ):
        """One ancestral (DDPM) reverse step. Reference `gaussian_diffusion.py:383-414`."""
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            w=w, uncond_fn=uncond_fn,
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = out["mean"] + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(
        self, model_fn, x, t, rng, clip_denoised=True, denoised_fn=None,
        eta=0.0, w=None, uncond_fn=None,
    ):
        """One DDIM reverse step (Song et al. Eq. 12).

        Reference `gaussian_diffusion.py:506-558`.
        """
        s = self.schedule
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            w=w, uncond_fn=uncond_fn,
        )
        eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = _extract(s.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = _extract(s.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(x.dtype).reshape(-1, *([1] * (x.ndim - 1)))
        sample = mean_pred + nonzero_mask * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(
        self, model_fn, x, t, clip_denoised=True, denoised_fn=None,
        w=None, uncond_fn=None,
    ):
        """One deterministic DDIM inversion step x_t -> x_{t+1}.

        Reference `gaussian_diffusion.py:560-596`. Guidance (w, uncond_fn)
        makes the inversion use the SAME effective eps-model as a guided
        generation chain, so guided roundtrips stay exact.
        """
        s = self.schedule
        out = self.p_mean_variance(
            model_fn, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            w=w, uncond_fn=uncond_fn,
        )
        eps = (
            _extract(s.sqrt_recip_alphas_cumprod, t, x.ndim) * x - out["pred_xstart"]
        ) / _extract(s.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        alpha_bar_next = _extract(s.alphas_cumprod_next, t, x.ndim)
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_next)
            + jnp.sqrt(1 - alpha_bar_next) * eps
        )
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # ------------------------------------------------------------------ #
    # VLB terms
    # ------------------------------------------------------------------ #
    def vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True):
        """One VLB term in bits/dim. Reference `gaussian_diffusion.py:682-715`."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=clip_denoised)
        kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
        kl = mean_flat(kl) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def prior_bpd(self, x_start):
        """Prior KL term in bits/dim. Reference `gaussian_diffusion.py:862-878`."""
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, dtype=jnp.int32)
        qt_mean, _, qt_log_variance = self.q_mean_variance(x_start, t)
        kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
        return mean_flat(kl_prior) / np.log(2.0)

    # ------------------------------------------------------------------ #
    # CausalDiffAE variational objective
    # ------------------------------------------------------------------ #
    @staticmethod
    def label_prior_mean(c: jnp.ndarray, dim: int, scale=None) -> jnp.ndarray:
        """Per-variable latent prior means from normalized labels.

        Reference `GaussianDiffusion.prior` (`gaussian_diffusion.py:718-725`)
        with the identity scale rows [0, 1] used by `representation_loss`
        (`:731-733`): prior mean of variable j's latent block = label value
        c[:, j], broadcast over the block dimension.
        """
        c = jnp.asarray(c, dtype=jnp.float32)
        if scale is not None:
            lo = jnp.asarray(scale)[:, 0]
            hi = jnp.asarray(scale)[:, 1]
            c = (c - lo[None, :]) / hi[None, :]
        return jnp.broadcast_to(c[:, :, None], (*c.shape, dim))

    def representation_loss(self, mu, var, z_post, causal_modeling, mask, c):
        """KL objective on the semantic representation.

        Reference `gaussian_diffusion.py:727-766`:
        - KL(q(u|x) || N(0, I)) with q = (mu, var) where `var` is the
          encoder's softplus'd output treated as a variance (quirk preserved;
          see `nn.py:108` + `nn.py:440-457`).
        - if causal_modeling: + sum_i KL(N(z_post_i, I) || N(y_i, I)) - the
          label-alignment term, unit variances on both sides.
        - classifier-free gating: with a keep-mask, reduce to a scalar
          sum(kl*mask)/sum(mask) (`:762-764`); otherwise per-sample [N].
        """
        num_vars = c.shape[1]
        dim = mu.shape[1] // num_vars
        kld = kl_normal(mu, var, jnp.zeros_like(mu), jnp.ones_like(var))
        if causal_modeling:
            y_prior_mean = self.label_prior_mean(c, dim)
            zb = z_post.reshape(-1, num_vars, dim)
            ones = jnp.ones_like(zb)
            # sum_i KL(N(z_i, 1) || N(y_i, 1)) summed over block dims
            kld = kld + kl_normal(zb, ones, y_prior_mean, ones).sum(axis=1)
        if mask is not None:
            # NB: denominator guarded against an all-dropped batch - the
            # reference divides by sum(mask) unguarded (gaussian_diffusion.py:764)
            # and would NaN-poison the step if every sample were masked out
            # (probability 2^-B; real with small microbatches).
            return jnp.sum(kld * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return kld

    def training_losses(
        self,
        forward_fn: Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Dict]],
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        rng: jax.Array,
        *,
        c: Optional[jnp.ndarray] = None,
        rep_cond: bool = False,
        causal_modeling: bool = False,
        kl_weight: jnp.ndarray = 0.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Training loss for one batch of timesteps.

        Reference `gaussian_diffusion.py:768-859`. ``forward_fn(x_t, t_model)``
        returns ``(model_output, aux)`` where ``aux`` carries mu/var/z_post/
        mask from the encode path (empty when rep_cond=False). ``kl_weight``
        is the externally-annealed scalar the reference mutates on the
        diffusion object (`train_util.py:212-214`); here it is an argument.
        """
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        t_model = self.model_t(t)

        terms: Dict[str, jnp.ndarray] = {}
        if self.loss_type in (LossType.KL, LossType.RESCALED_KL):
            model_fn = lambda xx, tt: forward_fn(xx, tt)[0]
            terms["loss"] = self.vb_terms_bpd(
                model_fn, x_start=x_start, x_t=x_t, t=t, clip_denoised=False
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output, aux = forward_fn(x_t, t_model)
        if rep_cond:
            kld = self.representation_loss(
                aux["mu"], aux["var"], aux["z_post"], causal_modeling, aux.get("mask"), c
            )
            terms["kld_rep"] = kld

        if self.var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
            # Learn variance with the VLB but block its gradient to the mean
            # (reference gaussian_diffusion.py:823-833).
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
            )
            terms["vb"] = self.vb_terms_bpd(
                lambda *_: frozen, x_start=x_start, x_t=x_t, t=t, clip_denoised=False
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)

        if self.mean_type == ModelMeanType.PREVIOUS_X:
            target = self.q_posterior_mean_variance(x_start, x_t, t)[0]
        elif self.mean_type == ModelMeanType.START_X:
            target = x_start
        else:
            target = noise
        terms["mse"] = mean_flat((target - model_output) ** 2)

        if "vb" in terms:
            terms["loss"] = terms["mse"] + terms["vb"]
        elif rep_cond:
            terms["loss"] = terms["mse"] + kl_weight * terms["kld_rep"]
        else:
            terms["loss"] = terms["mse"]
        return terms


def create_diffusion(
    *,
    steps: int = 1000,
    learn_sigma: bool = False,
    sigma_small: bool = False,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    predict_xstart: bool = False,
    rescale_timesteps: bool = False,
    rescale_learned_sigmas: bool = False,
    timestep_respacing: str = "",
) -> GaussianDiffusion:
    """Factory mirroring reference `script_util.create_gaussian_diffusion`
    (`script_util.py:284-326`), returning a respaced process when
    ``timestep_respacing`` is non-empty.
    """
    betas = get_named_beta_schedule(noise_schedule, steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    mean_type = ModelMeanType.START_X if predict_xstart else ModelMeanType.EPSILON
    if learn_sigma:
        var_type = ModelVarType.LEARNED_RANGE
    else:
        var_type = ModelVarType.FIXED_SMALL if sigma_small else ModelVarType.FIXED_LARGE

    if timestep_respacing:
        use_ts = space_timesteps(steps, timestep_respacing)
        schedule, timestep_map = respace_schedule(betas, use_ts)
        return GaussianDiffusion(
            schedule=schedule,
            mean_type=mean_type,
            var_type=var_type,
            loss_type=loss_type,
            rescale_timesteps=rescale_timesteps,
            timestep_map=timestep_map,
            original_num_steps=steps,
        )
    return GaussianDiffusion(
        schedule=make_schedule(betas),
        mean_type=mean_type,
        var_type=var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
        original_num_steps=steps,
    )
