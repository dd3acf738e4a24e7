"""Pure-functional diffusion process core (schedules, q/p math, samplers)."""

from .losses import (
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
    kl_normal,
    mean_flat,
    normal_kl,
)
from .process import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)
from .respace import respace_schedule, space_timesteps
from .sampling import (
    calc_bpd_loop,
    ddim_reverse_loop,
    ddim_sample_loop,
    dpm_solver_pp_loop,
    p_sample_loop,
)
from .schedule import (
    DiffusionSchedule,
    betas_for_alpha_bar,
    get_named_beta_schedule,
    make_schedule,
)
