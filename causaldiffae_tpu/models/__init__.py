"""Model layer: UNet denoiser, causal encoder, SCM latent modules."""

from .attention import AttentionBlock, qkv_attention
from .encoder import GaussianConvEncoder, GaussianConvEncoderClf
from .layers import (
    Conv1x1,
    Conv3x3,
    DenseT,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    silu,
    timestep_embedding,
)
from .scm import CausalModeling, MultivariateCausalFlow, StackedPerVarMLP
from .unet import CausalUNet, SuperResUNet, reparameterize
