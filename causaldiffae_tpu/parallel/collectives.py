"""Multi-host collective helpers for evaluation.

The reference gathers generated samples and MAE scalars across ranks with
explicit ``dist.all_gather`` calls (`image_causaldae_test.py:438-440,
1046-1076`, `image_nll.py:63-69`). In the JAX single-controller model,
metrics computed inside a jitted function over a global mesh are already
global; these helpers cover the remaining host-side case - concatenating
per-host eval outputs (samples, MAE lists) across processes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["gather_across_hosts", "mean_across_hosts", "is_primary_host",
           "sync_across_hosts"]


def is_primary_host() -> bool:
    return jax.process_index() == 0


def gather_across_hosts(x: np.ndarray) -> np.ndarray:
    """Concatenate a per-host array over the leading axis across processes.

    Single-process: identity. Multi-host: `multihost_utils.process_allgather`
    (replaces the eval scripts' dist.all_gather of sample batches).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.reshape(gathered, (-1,) + tuple(np.shape(x)[1:]))


def sync_across_hosts(tag: str = "barrier") -> None:
    """Barrier across processes (e.g. wait for the primary host to finish
    writing a shared file before others read it). Single-process: no-op."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def mean_across_hosts(value: float) -> float:
    """Mean of a per-host scalar (replaces the MAE all_gather + average,
    `image_causaldae_test.py:1046-1076`)."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils

    return float(np.mean(multihost_utils.process_allgather(np.asarray(value))))
