"""Synthetic dataset generation from the ground-truth SCMs.

Lets every workload train/eval end-to-end without the external dataset
downloads the reference assumes (MorphoMNIST archives, pendulum PNG dumps,
causal_circuit npz). Samples exogenous factors, pushes them through the SCMs
in `simulators.py`, renders images, and yields batches in the exact format
the trainer expects: {'image': [B,H,W,C] float32 in [0,1], 'y': [B] int,
'c': [B, n_vars] float32 normalized labels} (matching the reference loaders'
[0,1] ranges and normalization, `image_datasets.py:241-498`).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from ..config import DATA_SCALES
from .simulators import (
    circuit_scm,
    morphomnist_scm,
    pendulum_scm,
    render_circuit,
    render_morphomnist,
    render_pendulum,
)

__all__ = ["synthetic_dataset", "synthetic_iterator"]


def _normalize(c_raw: np.ndarray, dataset: str) -> np.ndarray:
    scale = np.asarray(DATA_SCALES[dataset])
    return ((c_raw - scale[:, 0]) / scale[:, 1]).astype(np.float32)


def synthetic_dataset(dataset: str, n: int, seed: int = 0,
                      image_size: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Materialize n samples of a synthetic workload."""
    rng = np.random.RandomState(seed)
    if dataset == "morphomnist":
        thickness = rng.uniform(0.7, 5.8, size=n)
        intensity = morphomnist_scm(thickness, noise=rng.randn(n) * 4.0)
        images = render_morphomnist(thickness, intensity, size=image_size or 28)
        c = _normalize(np.stack([thickness, intensity], -1), dataset)
        y = rng.randint(0, 10, size=n).astype(np.int64)
        return {"image": images, "y": y, "c": c}
    if dataset == "pendulum":
        angle = rng.uniform(-40, 44, size=n)
        light = rng.uniform(60, 148, size=n)
        light = np.where(np.abs(light - 100) < 1e-3, 101.0, light)  # tan(pi/2) pole
        slen, spos = pendulum_scm(angle, light)
        images = render_pendulum(angle, light, size=image_size or 96)
        c = _normalize(np.stack([angle, light, slen, spos], -1), dataset)
        return {"image": images, "c": c.astype(np.float32)}
    if dataset == "circuit":
        arm = rng.uniform(0, 1, size=n)
        blue, green, red = circuit_scm(arm, rng)
        images = render_circuit(arm, blue, green, red, size=image_size or 128)
        c = np.stack([arm, blue, green, red], -1).astype(np.float32)
        return {"image": images, "c": c}
    raise ValueError(f"unknown synthetic dataset: {dataset}")


def synthetic_iterator(dataset: str, batch_size: int, seed: int = 0,
                       image_size: Optional[int] = None,
                       pool: int = 4096) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite batch iterator over a fixed synthetic pool (shuffled)."""
    data = synthetic_dataset(dataset, pool, seed=seed, image_size=image_size)
    n = data["image"].shape[0]
    rng = np.random.RandomState(seed + 1)
    while True:
        idx = rng.randint(0, n, size=batch_size)
        yield {k: v[idx] for k, v in data.items()}
