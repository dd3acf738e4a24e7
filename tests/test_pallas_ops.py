"""Correctness tests for Pallas kernels (interpret mode on CPU) vs the
reference jnp paths, including gradients through the custom VJPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causaldiffae_tpu.models.attention import qkv_attention
from causaldiffae_tpu.ops import fused_groupnorm_silu, fused_qkv_attention
from causaldiffae_tpu.ops.groupnorm_pallas import _reference as gn_reference


@pytest.mark.parametrize("B,T,H,d", [(2, 49, 2, 16), (1, 196, 4, 32), (2, 64, 1, 8)])
def test_fused_attention_matches_reference(B, T, H, d):
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    got = fused_qkv_attention(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_grad():
    B, T, H, d = 2, 16, 2, 8
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3 * C))

    def loss_pallas(q):
        return jnp.sum(fused_qkv_attention(q, H) ** 2)

    def loss_ref(q):
        return jnp.sum(qkv_attention(q, H) ** 2)

    g1 = jax.grad(loss_pallas)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("with_cond,with_silu", [(True, True), (False, True), (False, False)])
def test_fused_groupnorm_matches_reference(with_cond, with_silu):
    B, HW, C = 2, 49, 64
    G = 32
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (B, HW, C))
    gamma = jax.random.normal(k2, (C,)) * 0.1 + 1.0
    beta = jax.random.normal(k3, (C,)) * 0.1
    scale = jax.random.normal(k4, (B, C)) * 0.1 if with_cond else None
    shift = jax.random.normal(k5, (B, C)) * 0.1 if with_cond else None
    got = fused_groupnorm_silu(x, gamma, beta, scale, shift, G, 1e-5, with_silu)
    ref = gn_reference(x, gamma, beta, scale, shift, G, 1e-5, with_cond, with_silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_groupnorm_matches_flax_groupnorm():
    """Against flax's GroupNorm (the production XLA path) for affine-only."""
    import flax.linen as nn

    B, HW, C = 2, 49, 64
    x = jax.random.normal(jax.random.PRNGKey(3), (B, HW, C))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    vars_ = gn.init(jax.random.PRNGKey(4), x)
    ref = gn.apply(vars_, x)
    got = fused_groupnorm_silu(
        x, vars_["params"]["scale"], vars_["params"]["bias"], None, None,
        32, 1e-5, False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_groupnorm_grad():
    B, HW, C = 2, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(5), (B, HW, C))
    gamma = jnp.ones((C,))
    beta = jnp.zeros((C,))
    scale = jax.random.normal(jax.random.PRNGKey(6), (B, C)) * 0.1
    shift = jax.random.normal(jax.random.PRNGKey(7), (B, C)) * 0.1

    def loss_pallas(x, gamma, scale):
        return jnp.sum(fused_groupnorm_silu(x, gamma, beta, scale, shift) ** 2)

    def loss_ref(x, gamma, scale):
        return jnp.sum(gn_reference(x, gamma, beta, scale, shift, 32, 1e-5, True, True) ** 2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, scale)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, scale)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_unet_with_pallas_attention_flag():
    """use_pallas=True wires the fused kernel into the UNet (interpret on CPU)."""
    from causaldiffae_tpu.config import Config, create_model

    cfg = Config(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", use_pallas=True,
    )
    model = create_model(cfg)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, t, train=False)
    eps, aux = model.apply(variables, x, t, train=False)
    assert eps.shape == (2, 28, 28, 1)
    assert bool(jnp.isfinite(eps).all())
