"""Image quality metrics: Frechet distance machinery + FID.

Rebuild of reference `improved_diffusion/quality_metrics.py`: activation
statistics (mu, sigma) + the matrix-sqrt Frechet distance (`:45-73`). The
feature extractor is pluggable: the reference uses torchvision InceptionV3
(whose pretrained weights require network download - unavailable in
air-gapped TPU pods), so the default here is a trained anti-causal
classifier trunk or raw downsampled pixels; an Inception path is used
automatically when torchvision weights are locally available.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg

__all__ = ["activation_statistics", "frechet_distance", "FID",
           "pixel_feature_fn", "classifier_feature_fn", "inception_feature_fn",
           "default_feature_fn"]


def activation_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) over [N, D] features (reference `quality_metrics.py:9-43`)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (reference `:45-73`)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def pixel_feature_fn(size: int = 8) -> Callable[[np.ndarray], np.ndarray]:
    """Cheap always-available features: avg-pooled grayscale pixels."""
    def fn(images: np.ndarray) -> np.ndarray:
        x = np.asarray(images, dtype=np.float64)
        if x.ndim == 4:
            x = x.mean(axis=-1)
        B, H, W = x.shape
        fh, fw = H // size, W // size
        x = x[:, : fh * size, : fw * size]
        x = x.reshape(B, size, fh, size, fw).mean(axis=(2, 4))
        return x.reshape(B, -1)
    return fn


def classifier_feature_fn(model, variables, batch_size: int = 64) -> Callable[[np.ndarray], np.ndarray]:
    """Learned deep features from a trained anti-causal classifier trunk.

    The reference computes FID over InceptionV3 activations
    (`quality_metrics.py:9-43`); on an air-gapped pod the pretrained
    Inception weights cannot be downloaded, so the feature extractor is the
    Conv-BN-LeakyReLU trunk of a classifier trained on the same dataset
    (`models/encoder.GaussianConvEncoderClf.features`) - a learned,
    dataset-appropriate deep feature space with the same Frechet machinery.
    """
    import jax
    import jax.numpy as jnp

    from ..models.encoder import GaussianConvEncoderClf

    @jax.jit
    def feats(x):
        return model.apply(variables, x, train=False,
                           method=GaussianConvEncoderClf.features)

    def fn(images: np.ndarray) -> np.ndarray:
        out = []
        n = len(images)
        for i in range(0, n, batch_size):
            out.append(np.asarray(feats(jnp.asarray(images[i:i + batch_size]))))
        return np.concatenate(out, axis=0)

    return fn


def inception_feature_fn(weights_path: Optional[str] = None,
                         batch_size: int = 32,
                         feature: int = 64) -> Callable[[np.ndarray], np.ndarray]:
    """InceptionV3 pool features — the published-FID feature space.

    Implements the torchmetrics ``FrechetInceptionDistance(feature=64)``
    contract the reference instantiates (`image_causaldae_test.py:38`), in
    pure JAX (`evals.inception`): the pytorch-fid InceptionV3 head up to the
    64 (or 192) pool tap, weights ported from a local torch state dict
    (torchvision or pytorch-fid layout — no torchvision dependency, no
    network egress). Raises with a clear message when the weights file is
    missing: random-init features would give a meaningless FID.
    """
    if not weights_path:
        raise RuntimeError(
            "inception FID needs a local weights file (no network egress to "
            "download pretrained weights); random-init features would give a "
            "meaningless FID. Use classifier_feature_fn instead."
        )
    try:
        import torch  # noqa: F401  (load_inception_head needs torch.load)
    except ImportError as e:
        raise RuntimeError(
            "inception FID needs torch to read the weights file; on hosts "
            "without torch use classifier_feature_fn (trained-trunk FID) "
            "instead."
        ) from e
    from .inception import head_feature_fn, load_inception_head

    return head_feature_fn(load_inception_head(weights_path, feature=feature),
                           batch_size=batch_size)


def default_feature_fn(classifier_model=None, classifier_variables=None,
                       inception_weights: Optional[str] = None):
    """Best-available feature extractor: Inception (local weights) >
    classifier trunk > avg-pooled pixels."""
    if inception_weights:
        return inception_feature_fn(inception_weights)
    if classifier_model is not None:
        return classifier_feature_fn(classifier_model, classifier_variables)
    return pixel_feature_fn()


class FID:
    """Accumulate real/fake features, then compute the Frechet distance
    (reference `quality_metrics.py:75-83` / torchmetrics usage in the eval
    scripts)."""

    def __init__(self, feature_fn: Optional[Callable] = None):
        self.feature_fn = feature_fn or pixel_feature_fn()
        self._real = []
        self._fake = []

    def update(self, images: np.ndarray, real: bool):
        feats = self.feature_fn(images)
        (self._real if real else self._fake).append(np.asarray(feats))

    def compute(self) -> float:
        real = np.concatenate(self._real, axis=0)
        fake = np.concatenate(self._fake, axis=0)
        mu1, s1 = activation_statistics(real)
        mu2, s2 = activation_statistics(fake)
        return frechet_distance(mu1, s1, mu2, s2)

    def reset(self):
        self._real, self._fake = [], []
