"""End-to-end numerical parity against the PyTorch reference model.

Builds the reference `UNetModel` on CPU, ports its weights into the flax
`CausalUNet` via `utils/torch_port`, and asserts the eps predictions (and
encoder/SCM latents) match within float32 tolerance. This is the
"semantics-bit-for-bit" requirement from SURVEY §7 step 2.

Skipped when the reference repo is not mounted.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
sys.path.insert(0, str(REFERENCE_ROOT))

import jax
import jax.numpy as jnp
from improved_diffusion.unet import UNetModel

from causaldiffae_tpu.config import Config, create_model
from causaldiffae_tpu.models.unet import CausalUNet
from causaldiffae_tpu.utils.torch_port import (
    port_torch_state_dict,
    torch_state_dict_to_numpy,
)

# Small-but-real config: 28px, attention at ds=2 (resolution 14), 2 levels.
CFG = Config(
    name="parity", dataset="morphomnist", image_size=28, in_channels=1,
    num_channels=32, num_res_blocks=2, num_heads=2, n_vars=2, rep_dim=32,
    attention_resolutions="14,7", class_cond=True, rep_cond=True,
    causal_modeling=True, use_scale_shift_norm=True,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = UNetModel(
        in_channels=CFG.in_channels,
        model_channels=CFG.num_channels,
        out_channels=CFG.out_channels,
        num_res_blocks=CFG.num_res_blocks,
        attention_resolutions=CFG.attention_ds,
        dropout=0.0,
        channel_mult=CFG.channel_mult,
        num_classes=10,
        c_dim=None,
        rep_dim=CFG.rep_dim,
        causal_modeling=True,
        num_heads=CFG.num_heads,
        num_heads_upsample=-1,
        use_scale_shift_norm=True,
        masking=False,
        n_vars=CFG.n_vars,
    )
    # Reference hardcodes num_vars=4 in its encoder ctor (unet.py:377) which
    # breaks 28px inputs; rebuild it with the right num_vars like the shipped
    # MNIST checkpoints need.
    from improved_diffusion.nn import GaussianConvEncoder

    model.rep_emb = GaussianConvEncoder(
        in_channels=CFG.in_channels, latent_dim=CFG.rep_dim, num_vars=CFG.n_vars
    )
    # Break the symmetry of zero-init output convs so parity is meaningful.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    model.eval()
    return model


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    variables = port_torch_state_dict(
        CFG, torch_state_dict_to_numpy(torch_model.state_dict())
    )
    model = create_model(CFG)
    return model, variables


def test_denoise_parity(torch_model, flax_setup):
    """eps(x_t, t, y, z) must match torch within fp32 tolerance."""
    model, variables = flax_setup
    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 1, 28, 28).astype(np.float32)
    t = np.array([3, 700], dtype=np.int64)
    y = np.array([1, 7], dtype=np.int64)
    z = rng.randn(B, CFG.rep_dim).astype(np.float32)

    with torch.no_grad():
        ref_out = torch_model(
            torch.from_numpy(x), torch.from_numpy(t), y=torch.from_numpy(y),
            z=torch.from_numpy(z),
        )[0].numpy()

    got = model.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        y=jnp.asarray(y),
        z=jnp.asarray(z),
        train=False,
        method=CausalUNet.denoise,
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=2e-4, rtol=1e-3)


def test_encoder_parity(torch_model, flax_setup):
    """(mu, var) from the trained-weights encoder must match torch eval mode."""
    model, variables = flax_setup
    rng = np.random.RandomState(1)
    x = rng.randn(3, 1, 28, 28).astype(np.float32)
    with torch.no_grad():
        mu_ref, var_ref = torch_model.rep_emb.encode(torch.from_numpy(x))
    mu, var = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        method=CausalUNet.encode,
    )
    np.testing.assert_allclose(np.asarray(mu), mu_ref.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(var), var_ref.numpy(), atol=1e-4, rtol=1e-3)


def test_scm_parity(torch_model, flax_setup):
    """causal_masking + nonlinearity_add_back_noise must match torch."""
    model, variables = flax_setup
    rng = np.random.RandomState(2)
    mu = rng.randn(4, CFG.rep_dim).astype(np.float32)
    A = torch.tensor([[0.0, 1.0], [0.0, 0.0]])
    with torch.no_grad():
        z_pre_ref = torch_model.causal_mask.causal_masking(torch.from_numpy(mu), A)
        z_post_ref = torch_model.causal_mask.nonlinearity_add_back_noise(
            torch.from_numpy(mu), z_pre_ref
        ).numpy()
    z_post = model.apply(variables, jnp.asarray(mu), method=CausalUNet.causalize)
    np.testing.assert_allclose(np.asarray(z_post), z_post_ref, atol=1e-5, rtol=1e-4)
