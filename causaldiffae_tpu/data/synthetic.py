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


def _quantize8(data: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Snap rendered images onto the 8-bit grid (u8/255).

    Every real source the reference trains on is 8-bit (MNIST IDX, PNG
    frames); quantizing the synthetic renders the same way keeps the
    synthetic distribution realistic AND lets the native C++ loader serve a
    uint8 pool with fused normalization (`loaders.make_data_iterator`).
    """
    img = data["image"]
    data["image"] = (np.rint(img * 255.0).astype(np.uint8).astype(np.float32)
                     / np.float32(255.0))
    return data


def synthetic_dataset(dataset: str, n: int, seed: int = 0,
                      image_size: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Materialize n samples of a synthetic workload (8-bit-grid images)."""
    return _quantize8(_synthetic_dataset_raw(dataset, n, seed, image_size))


def _synthetic_dataset_raw(dataset: str, n: int, seed: int = 0,
                           image_size: Optional[int] = None) -> Dict[str, np.ndarray]:
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
                       image_size: Optional[int] = None, pool: int = 4096,
                       native: Optional[bool] = None,
                       shard: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled batch iterator over a fixed synthetic pool.

    Served by the native C++ prefetch loader when available (uint8 pool +
    fused normalize on worker threads); numpy fallback otherwise.

    ``batch_size`` is the GLOBAL batch: with ``shard=True`` (the default) a
    multi-host run gives each process its ``[rank::P]`` slice of the pool and
    yields ``batch_size // P`` rows per batch — the same per-host feed
    convention as `loaders.load_data`. ``shard=False`` keeps the full pool
    and full batch on every process (for tests that need identical global
    batches everywhere).
    """
    from .loaders import _proc_shard, _shard, make_data_iterator

    data = synthetic_dataset(dataset, pool, seed=seed, image_size=image_size)
    if shard:
        rank, num_shards = _proc_shard()
        if num_shards > 1:
            if batch_size % num_shards != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by process count {num_shards}")
            data = _shard(data, rank, num_shards)
            batch_size //= num_shards
    return make_data_iterator(data, batch_size, seed=seed + 1, native=native)
