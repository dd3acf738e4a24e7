"""SCM latent layer: adjacency-masked causal mixing and the flow variant.

Rebuild of reference `improved_diffusion/nn.py:225-426`:

- :class:`CausalModeling` - the latent u is reshaped to (n_vars, d) blocks;
  ``z_pre = A^T @ u`` mixes parent blocks into each variable
  (`nn.py:290-295`), then per-variable MLPs reconstruct
  ``z_post_i = g_i(z_pre_i) + u_i`` (`nn.py:297-312`). On TPU the n per-var
  MLPs are stacked into single batched einsums (one MXU call per layer
  instead of n small matmuls).
- :class:`MultivariateCausalFlow` - the masked affine autoregressive flow
  alternative (`nn.py:342-426`), enabled by flow_based=True. Quirks
  preserved: sigmoid-bounded s/t nets, and the reverse-direction prior being
  N(mean=1, I) (`nn.py:397`).

Adjacency matrices are *config*, not hardcoded in the forward pass (the
reference bakes them into `unet.py:572-578`); canonical graphs live in
`causaldiffae_tpu.config`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import torch_bias_init, torch_kernel_init

Dtype = Any


class StackedPerVarMLP(nn.Module):
    """n_vars independent 2-layer MLPs evaluated as batched einsums.

    Equivalent to the reference's ModuleDict of per-variable `MLP`s
    (`nn.py:225-240,261-264`): Linear(d -> latent_dim), LeakyReLU,
    Linear(latent_dim -> d), separate weights per variable.
    """

    latent_dim: int
    num_var: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, n, d] -> [B, n, d]
        n = self.num_var
        d = self.latent_dim // n
        hid = self.latent_dim

        w1 = self.param("w1", torch_kernel_init, (n, d, hid))
        b1 = self.param("b1", torch_bias_init(d), (n, hid))
        w2 = self.param("w2", torch_kernel_init, (n, hid, d))
        b2 = self.param("b2", torch_bias_init(hid), (n, d))

        h = jnp.einsum("bnd,ndh->bnh", x, w1) + b1[None]
        h = nn.leaky_relu(h, negative_slope=0.01)
        return jnp.einsum("bnh,nhd->bnd", h, w2) + b2[None]


class CausalModeling(nn.Module):
    """Adjacency-masked SCM over latent blocks.

    ``adjacency`` is a static (n, n) row=cause -> col=effect matrix (nested
    tuple so the module stays hashable); pass ``learn_adjacency=True`` for a
    zero-initialised learnable A (reference `nn.py:255-259`).
    """

    latent_dim: int
    num_var: int
    adjacency: Optional[Tuple[Tuple[float, ...], ...]] = None
    learn_adjacency: bool = False

    def setup(self):
        if self.learn_adjacency:
            self.A = self.param(
                "A", nn.initializers.zeros, (self.num_var, self.num_var)
            )
        else:
            assert self.adjacency is not None, "need a static adjacency or learn_adjacency"
            self.A = jnp.asarray(self.adjacency, dtype=jnp.float32)
        self.nonlinearities = StackedPerVarMLP(self.latent_dim, self.num_var)

    def causal_masking(self, u: jnp.ndarray, A: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """z_pre = A^T @ u over variable blocks (reference `nn.py:290-295`)."""
        A = self.A if A is None else A
        d = self.latent_dim // self.num_var
        ub = u.reshape(-1, self.num_var, d)
        return jnp.einsum("ji,bjd->bid", A, ub)  # A.T @ u

    def nonlinearity_add_back_noise(self, u: jnp.ndarray, z_pre: jnp.ndarray) -> jnp.ndarray:
        """z_post_i = g_i(z_pre_i) + u_i, flattened back (reference `nn.py:297-312`)."""
        d = self.latent_dim // self.num_var
        ub = u.reshape(-1, self.num_var, d)
        z_post = self.nonlinearities(z_pre) + ub
        return z_post.reshape(-1, self.num_var * d)

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full SCM pass: mask, per-variable nonlinearity, add back noise."""
        return self.nonlinearity_add_back_noise(u, self.causal_masking(u))


class _SigmoidMLP(nn.Module):
    """Dense(nh)-ReLU-Dense(nh)-ReLU-Dense(k)-Sigmoid (reference `nn.py:350-366`)."""

    k: int
    nh: int = 100

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.nh, kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(x.shape[-1]))(x))
        x = nn.relu(nn.Dense(self.nh, kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(self.nh))(x))
        x = nn.Dense(self.k, kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(self.nh))(x)
        return jax.nn.sigmoid(x)


class MultivariateCausalFlow(nn.Module):
    """Masked affine autoregressive flow over (dim, k) latent blocks.

    Reference `nn.py:342-426`. The conditioning mask for variable i selects
    the already-computed parent blocks via column i of C = I - A; variables
    with no parents get a zero mask (so s/t condition on nothing).
    """

    dim: int = 2
    k: int = 256
    nh: int = 100

    def setup(self):
        self.s_cond = _SigmoidMLP(self.k, self.nh)
        self.t_cond = _SigmoidMLP(self.k, self.nh)

    def _mask(self, C: jnp.ndarray, i: int) -> jnp.ndarray:
        """Flattened per-dim mask: repeat column C[:, i] over each k-block."""
        col = C[:, i]  # [dim]
        return jnp.repeat(col, self.k)  # [dim * k]

    def flow(self, e: jnp.ndarray, C: jnp.ndarray):
        """e -> z with log|dz/de| (reference `nn.py:368-393`)."""
        B = e.shape[0]
        total = self.dim * self.k
        e = e.reshape(B, self.dim, self.k)
        z = jnp.zeros_like(e)
        log_det = jnp.zeros((B,), dtype=e.dtype)
        for i in range(self.dim):
            mask = self._mask(C, i)
            zin = z.reshape(B, total) * mask[None]
            s = self.s_cond(zin)
            t = self.t_cond(zin)
            zi = jnp.exp(s) * e[:, i, :] + t
            z = z.at[:, i, :].set(zi)
            log_det = log_det + s.sum(axis=1)
        return z.reshape(B, total), log_det

    def reverse(self, z: jnp.ndarray, C: jnp.ndarray):
        """z -> (log_det, prior log-prob of e). Reference `nn.py:395-426`.

        Preserves the reference's prior N(mean=ONES, I) (`nn.py:397`).
        """
        B = z.shape[0]
        total = self.dim * self.k
        zb = z.reshape(B, self.dim, self.k)
        e = jnp.zeros_like(zb)
        log_det = jnp.zeros((B,), dtype=z.dtype)
        for i in range(self.dim):
            mask = self._mask(C, i)
            zin = zb.reshape(B, total) * mask[None]
            s = self.s_cond(zin)
            t = self.t_cond(zin)
            e = e.at[:, i, :].set(jnp.exp(-s) * (zb[:, i, :] - t))
            log_det = log_det - s.sum(axis=1)
        ef = e.reshape(B, total)
        p_log_prob = -0.5 * (
            ((ef - 1.0) ** 2).sum(axis=1) + total * math.log(2 * math.pi)
        )
        return log_det, p_log_prob
