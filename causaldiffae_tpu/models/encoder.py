"""Causal semantic encoder (and the anti-causal classifier variant).

Rebuild of reference `improved_diffusion/nn.py:15-220`:

- `GaussianConvEncoder`: Conv(k3,s2,p1)-BatchNorm-LeakyReLU stack, hidden
  dims [16,32,32,64,64,128] for 4-variable datasets / [16,32,64,128] for
  2-variable (`nn.py:38-58`), flatten, two heads:
  mu = fc_mu(h);  var = softplus(fc_var(h)) + 1e-8.
  Quirk preserved: the second head is *named* log_var in the reference but
  is softplus'd and used directly as a variance downstream (`nn.py:108`,
  `unet.py:592`) - here it is simply called ``var``.
- `GaussianConvEncoderClf`: same trunk + scalar regression head
  (`nn.py:115-220`) - the anti-causal classifier used for effectiveness MAE.

NOTE the reference constructs the UNet's encoder with num_vars=4 hardcoded
(`unet.py:377`) which breaks 28x28 inputs; here hidden_dims follow the actual
n_vars (2 -> 4 conv stages, 28px -> 2x2 final grid), which is what the
shipped MorphoMNIST checkpoints require.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv3x3, DenseT

Dtype = Any


def default_hidden_dims(num_vars: int) -> Tuple[int, ...]:
    """Reference `nn.py:39-43`."""
    if num_vars == 4:
        return (16, 32, 32, 64, 64, 128)
    if num_vars == 2:
        return (16, 32, 64, 128)
    raise ValueError(f"no default encoder hidden dims for num_vars={num_vars}")


class ConvTrunk(nn.Module):
    """Shared Conv-BN-LeakyReLU stride-2 stack, flattened."""

    hidden_dims: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for h_dim in self.hidden_dims:
            x = Conv3x3(h_dim, stride=2, dtype=self.dtype)(x)
            # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax 0.9).
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x.reshape(x.shape[0], -1)


class GaussianConvEncoder(nn.Module):
    """Encoder q(u | x0) returning (mu, var)."""

    latent_dim: int
    num_vars: int = 4
    hidden_dims: Optional[Tuple[int, ...]] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        dims = self.hidden_dims or default_hidden_dims(self.num_vars)
        self.trunk = ConvTrunk(dims, dtype=self.dtype)
        self.fc_mu = DenseT(self.latent_dim, dtype=jnp.float32)
        self.fc_var = DenseT(self.latent_dim, dtype=jnp.float32)

    def __call__(self, x, *, train: bool = False):
        return self.encode(x, train=train)

    def encode(self, x, *, train: bool = False):
        h = self.trunk(x, train=train).astype(jnp.float32)
        mu = self.fc_mu(h)
        var = nn.softplus(self.fc_var(h)) + 1e-8
        return mu, var


class GaussianConvEncoderClf(nn.Module):
    """Anti-causal classifier: trunk + scalar regression head (`nn.py:160,214-220`)."""

    num_vars: int = 4
    hidden_dims: Optional[Tuple[int, ...]] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        dims = self.hidden_dims or default_hidden_dims(self.num_vars)
        self.trunk = ConvTrunk(dims, dtype=self.dtype)
        self.fc = DenseT(1, dtype=jnp.float32)

    def __call__(self, x, *, train: bool = False):
        return self.fc(self.features(x, train=train))

    def features(self, x, *, train: bool = False):
        """Penultimate (trunk) activations - the learned deep feature space
        used for FID when InceptionV3 weights are unavailable
        (`evals/quality.classifier_feature_fn`)."""
        return self.trunk(x, train=train).astype(jnp.float32)
