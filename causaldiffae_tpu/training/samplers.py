"""Timestep schedule samplers (functional, in-graph).

Rebuild of reference `improved_diffusion/resample.py`. The reference's
LossAwareSampler synchronizes per-rank losses with explicit
``dist.all_gather`` calls (`resample.py:85-106`); here the sampler state
lives in the replicated TrainState and is updated *inside* the jitted step
from the logically-global (t, loss) vectors - with a sharded batch XLA
inserts the gathers itself, and the update is deterministic across replicas
(the requirement stated at `resample.py:108-123`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "init_sampler_state",
    "sample_timesteps",
    "update_sampler_state",
]


def init_sampler_state(
    name: str, num_timesteps: int, history_per_term: int = 10
) -> Optional[Dict[str, jnp.ndarray]]:
    """None for uniform; {history, counts} for loss-second-moment
    (reference `resample.py:126-135`)."""
    if name == "uniform":
        return None
    if name == "loss-second-moment":
        return {
            "history": jnp.zeros((num_timesteps, history_per_term), dtype=jnp.float32),
            "counts": jnp.zeros((num_timesteps,), dtype=jnp.int32),
        }
    raise NotImplementedError(f"unknown schedule sampler: {name}")


def _weights(state: Optional[Dict], num_timesteps: int, uniform_prob: float = 0.001):
    """Sampler weights (reference `resample.py:63-68,137-144`)."""
    if state is None:
        return jnp.ones((num_timesteps,), dtype=jnp.float32)
    history_per_term = state["history"].shape[1]
    warmed_up = jnp.all(state["counts"] == history_per_term)
    w = jnp.sqrt(jnp.mean(state["history"] ** 2, axis=-1))
    w = w / jnp.maximum(w.sum(), 1e-12)
    w = w * (1 - uniform_prob) + uniform_prob / num_timesteps
    return jnp.where(warmed_up, w, jnp.ones((num_timesteps,), dtype=jnp.float32))


def sample_timesteps(
    state: Optional[Dict], num_timesteps: int, batch_size: int, rng: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample (t, loss-weights) (reference `resample.py:44-60`)."""
    w = _weights(state, num_timesteps)
    p = w / w.sum()
    t = jax.random.categorical(rng, jnp.log(p), shape=(batch_size,))
    weights = 1.0 / (num_timesteps * p[t])
    return t.astype(jnp.int32), weights.astype(jnp.float32)


def update_sampler_state(
    state: Optional[Dict], t: jnp.ndarray, losses: jnp.ndarray
) -> Optional[Dict]:
    """Push each (t, loss) pair into the per-timestep ring history.

    Faithful to reference `resample.py:146-153`: until a term has
    history_per_term entries, append; afterwards shift-out the oldest.
    Sequential scan over the batch keeps duplicate-t semantics identical.
    """
    if state is None:
        return None
    history_per_term = state["history"].shape[1]

    def push(carry, tl):
        history, counts = carry
        ti, li = tl
        row = history[ti]
        cnt = counts[ti]
        shifted = jnp.concatenate([row[1:], jnp.array([li])])
        appended = row.at[jnp.minimum(cnt, history_per_term - 1)].set(li)
        new_row = jnp.where(cnt == history_per_term, shifted, appended)
        history = history.at[ti].set(new_row)
        counts = counts.at[ti].set(jnp.minimum(cnt + 1, history_per_term))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(
        push, (state["history"], state["counts"]), (t, losses.astype(jnp.float32))
    )
    return {"history": history, "counts": counts}
