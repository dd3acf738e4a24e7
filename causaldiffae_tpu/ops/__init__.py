"""Pallas TPU kernels for the hot ops (fused attention, fused GroupNorm+SiLU)."""

from .attention_pallas import fused_qkv_attention
from .groupnorm_pallas import fits_vmem, fused_groupnorm_silu
