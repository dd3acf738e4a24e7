"""Spatial self-attention block for the UNet.

Rebuild of reference `unet.py:201-276` (AttentionBlock + QKVAttention). The
head layout matches the reference exactly: the QKV projection's output
channels are grouped head-major with [q, k, v] within each head (the
reference reshapes (B, 3C, T) -> (B*H, 3C/H, T) then splits), so torch
checkpoints port with a pure transpose. Q and K are pre-scaled by
1/sqrt(sqrt(d)) for low-precision stability (`unet.py:248-251`) and softmax
runs in float32.

Token counts here are tiny (<= (image_size/8)^2 <= 256 - SURVEY §5.7), so a
single fused kernel covers every config; `use_pallas=True` routes the
softmax(QK^T)V core through the Pallas fused kernel in
`ops/attention_pallas.py` for ALL bf16 passes - measured on v5e, the flash
kernel wins the fwd+bwd training pass (118 -> 79 ms/step: no saved softmax
weights, 64GB less HBM traffic) and, since the round-2 natural-layout
rewrite removed the host-side relayout copies, also the forward-only
sampling chain (592.8 vs 616.6 ms per DDIM-250 chain, measured round 3;
the pre-rewrite kernel LOST that comparison 690 vs 613). fp32 still routes
to the XLA einsum path (kernel scratch doubles past scoped VMEM at T=784).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DenseT, GroupNorm32

Dtype = Any


def qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Attention over tokens given fused head-major QKV.

    qkv: [B, T, 3C] with channels laid out [head0: q k v | head1: q k v ...].
    Returns [B, T, C]. Math identical to reference `QKVAttention.forward`
    (`unet.py:239-253`).
    """
    B, T, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    qkv = qkv.reshape(B, T, num_heads, 3 * d)
    q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, T, H, d]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))).astype(qkv.dtype)
    weight = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
    weight = jax.nn.softmax(weight.astype(jnp.float32), axis=-1).astype(weight.dtype)
    out = jnp.einsum("bhts,bshd->bthd", weight, v)
    return out.reshape(B, T, C)


class AttentionBlock(nn.Module):
    """Pre-norm residual attention over flattened spatial positions.

    Reference `unet.py:201-231`: GN -> 1x1 QKV -> attention -> zero-init
    1x1 proj -> residual.
    """

    channels: int
    num_heads: int = 1
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        normed = GroupNorm32()(tokens)
        qkv = DenseT(3 * C, dtype=self.dtype)(normed)
        # Pallas handles every bf16 pass: training (recompute-backward beats
        # materializing the T x T softmax weights to HBM) and forward-only
        # sampling (wins since the natural-layout rewrite; RESULTS.md
        # "Kernel routing"). fp32 doubles every kernel scratch array past
        # the 16MB scoped-VMEM limit at T=784, and XLA's einsum path
        # handles fp32 fine (spilling to HBM), so fp32 routes there.
        if self.use_pallas and qkv.dtype == jnp.bfloat16:
            import os

            from ..ops.attention_pallas import (fused_qkv_attention,
                                                fused_qkv_attention_t)

            # Orientation routing, per-shape (v5e bench_ops measurement,
            # RESULTS.md "Kernel routing"): the full-lane variant wins only
            # where the head-major kernel's d-sized output lanes waste 3/4
            # of the MXU — head_dim 32, the hot B=128/T=784 blocks (fwd
            # 1.30x, bwd 1.22x) — and LOSES at head_dim >= 64 (0.78-0.97x),
            # where its extra transposes aren't buying lane width back.
            # CDAE_ATTN_FULL_LANE=1/0 forces one kernel everywhere for A/B
            # runs (trace-time read, like CDAE_ATTN_FL_BWD).
            # `or None`: VAR= (empty string) in a shell means unset, not bogus
            force = os.environ.get("CDAE_ATTN_FULL_LANE") or None
            head_dim = C // self.num_heads
            if force == "1" or (force is None and head_dim == 32):
                h = fused_qkv_attention_t(qkv, self.num_heads)
            elif force == "0" or force is None:
                h = fused_qkv_attention(qkv, self.num_heads)
            else:
                raise ValueError(f"CDAE_ATTN_FULL_LANE={force!r}: expected '1', '0', or unset")
        else:
            h = qkv_attention(qkv, self.num_heads)
        h = DenseT(C, zero_init=True, dtype=self.dtype)(h)
        return (tokens + h).reshape(B, H, W, C)
