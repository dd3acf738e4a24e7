"""Replicated training state pytree.

Replaces the reference TrainLoop's mutable Python attributes
(`train_util.py:30-126`: model params, AdamW state, per-rate EMA param
lists, step counter, fp16 master params) with one immutable pytree that a
jitted step consumes and returns (donated, so updates are in-place on
device). bf16 compute + fp32 params makes the whole fp16_util.py loss-
scaling machinery unnecessary (SURVEY §2.11).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from .samplers import init_sampler_state


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray                      # scalar int32
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Dict[str, Any]             # ema-rate string -> params tree
    sampler_state: Optional[Dict[str, jnp.ndarray]]
    base_rng: jax.Array


def make_optimizer(cfg) -> optax.GradientTransformation:
    """AdamW with the reference's linear LR anneal (`train_util.py:305-311`)."""
    if cfg.lr_anneal_steps:
        def lr_fn(step):
            frac_done = step / cfg.lr_anneal_steps
            return cfg.lr * (1.0 - frac_done)
    else:
        lr_fn = cfg.lr
    return optax.adamw(lr_fn, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay)


def ema_rates(cfg) -> list:
    return [r for r in str(cfg.ema_rate).split(",") if r]


def create_train_state(cfg, model, tx: optax.GradientTransformation, rng: jax.Array,
                       sample_batch: Dict[str, jnp.ndarray]) -> TrainState:
    """Initialize params/EMA/optimizer from one example batch.

    Initialization runs on the host CPU backend: eager dispatch of the many
    small init ops through a remote TPU runtime is minutes-slow, while the
    CPU does it in seconds; the jitted train step moves everything to the
    accelerator on first use.
    """
    init_rngs = {
        "params": rng,
        "reparam": jax.random.fold_in(rng, 1),
        "cfmask": jax.random.fold_in(rng, 2),
        "dropout": jax.random.fold_in(rng, 3),
    }
    x = sample_batch["image"]
    t = jnp.zeros((x.shape[0],), dtype=jnp.int32)
    kwargs = {}
    if cfg.class_cond:
        kwargs["y"] = sample_batch["y"]
    if cfg.context_cond:
        kwargs["c"] = sample_batch["c"]
    if cfg.rep_cond:
        kwargs["x_start"] = x
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    # init runs on CPU where the Pallas TPU kernels can't compile; params are
    # identical either way (the kernels are parameter-free), so init a clone
    init_model = model.clone(use_pallas=False) if getattr(model, "use_pallas", False) else model

    def build():
        variables = init_model.init(init_rngs, x, t, train=True, **kwargs)
        params = variables["params"]
        # NB opt_state/EMA must be built under the SAME device context as
        # params - a mixed CPU/TPU state breaks any jit over it later.
        return TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema_params={r: jax.tree_util.tree_map(jnp.copy, params) for r in ema_rates(cfg)},
            sampler_state=init_sampler_state(cfg.schedule_sampler, cfg.diffusion_steps),
            base_rng=jax.random.fold_in(rng, 7),
        )

    if cpu is not None and jax.default_backend() != "cpu":
        x = jax.device_put(x, cpu)
        t = jax.device_put(t, cpu)
        kwargs = {k: jax.device_put(v, cpu) for k, v in kwargs.items()}
        with jax.default_device(cpu):
            return build()
    return build()


def restore_eval_state(cfg, model, ckpt_dir=None, template_batch=None,
                       batch_size: int = 1) -> TrainState:
    """Template TrainState on host + optional checkpoint restore.

    The shared init->restore boilerplate of every eval/serving CLI
    (counterfactual_test, sample, nll, export_torch). ``template_batch``
    only supplies shapes; when omitted a ``batch_size``-row synthetic batch
    is rendered (batch size does not affect param shapes, so 1 is enough
    and keeps CLI startup cheap). Restore fails fast on a missing/empty
    checkpoint directory (CheckpointManager raises FileNotFoundError).
    """
    from ..data import synthetic_dataset  # lazy: avoid training<->data cycle
    from .checkpoint import CheckpointManager

    if template_batch is None:
        pool = synthetic_dataset(cfg.dataset, batch_size, seed=cfg.seed)
        template_batch = {k: jnp.asarray(v) for k, v in pool.items()}
    state = create_train_state(cfg, model, make_optimizer(cfg),
                               jax.random.PRNGKey(cfg.seed), template_batch)
    if ckpt_dir:
        state = CheckpointManager(ckpt_dir).restore(state)
    return state


def eval_params(state: TrainState, cfg, use_ema: bool = False):
    """Resolve the param tree eval should run with.

    Raw params by default — matches the reference's eval scripts and avoids
    the EMA-still-mostly-init trap at short budgets (see CLAUDE.md
    invariants). With ``use_ema`` the FIRST configured rate's tree is
    returned, and a missing key is an ERROR rather than a silent fallback
    to raw params (comma-separated ``ema_rate`` strings are not themselves
    keys of ``ema_params``; ``ema_rates(cfg)`` is the key source of truth).
    """
    if not use_ema:
        return state.params
    rates = ema_rates(cfg)
    if not rates:
        raise ValueError("use_ema requested but cfg.ema_rate is empty")
    key = rates[0]
    if key not in state.ema_params:
        raise KeyError(f"EMA rate {key!r} not in checkpoint ema_params "
                       f"(present: {sorted(state.ema_params)})")
    return state.ema_params[key]


def kl_weight_for_step(step: jnp.ndarray, total_steps: int,
                       initial: float = 0.0, final: float = 1.0) -> jnp.ndarray:
    """Linear KL-weight anneal (reference `train_util.py:174-186,212-214`).

    The reference computes schedule(step) *after* incrementing, so the loss
    at step s uses weight s/(total-1), clamped to [initial, final].
    """
    t = step.astype(jnp.float32) / (total_steps - 1)
    return jnp.clip((1.0 - t) * initial + t * final, min(initial, final), max(initial, final))
