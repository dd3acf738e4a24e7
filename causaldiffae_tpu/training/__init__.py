"""Training runtime: state, jitted step, schedule samplers, loop, checkpoints."""

from .samplers import init_sampler_state, sample_timesteps, update_sampler_state
from .state import (TrainState, create_train_state, ema_rates, eval_params,
                    kl_weight_for_step, make_optimizer, restore_eval_state)
from .train_step import make_train_step
