"""Pallas TPU kernels for the hot ops (fused flash-style attention)."""

from .attention_pallas import fused_qkv_attention, fused_qkv_attention_t
