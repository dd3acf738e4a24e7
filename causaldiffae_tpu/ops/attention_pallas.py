"""Fused QKV self-attention Pallas kernel.

The UNet's attention runs over tiny token counts (T = (image_size/ds)^2 <=
256, SURVEY §5.7), so the whole (q k^T -> softmax -> @v) block for one
(batch, head) fits in VMEM: one kernel program per (b, h) computes the full
attention with both matmuls on the MXU and the softmax on the VPU, with NO
intermediate HBM round-trips (XLA's unfused path materializes the [B,H,T,T]
weights). Math matches `models.attention.qkv_attention` (and through it the
reference `unet.py:239-253`): q and k pre-scaled by d^-1/4, softmax in fp32.

Backward: custom VJP that recomputes via the jnp reference path - at these
shapes recompute is cheaper than saving the T x T probabilities.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU memory spaces; fall back to interpret mode elsewhere
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["fused_qkv_attention"]


def _default_interpret() -> bool:
    """Compiled on TPU devices, interpreter elsewhere (CPU tests). The axon
    platform reports platform='axon' but device_kind='TPU v5 ...', so sniff
    the device kind."""
    try:
        return "TPU" not in jax.devices()[0].device_kind.upper()
    except Exception:  # pragma: no cover
        return True


def _attn_kernel(qkv_ref, o_ref, *, num_heads: int):
    """One (batch, head) tile: qkv block [T, 3d] -> out [T, d]."""
    qkv = qkv_ref[0, 0, :, :]
    d = qkv.shape[-1] // 3
    dt = qkv.dtype
    q = qkv[:, :d]
    k = qkv[:, d:2 * d]
    v = qkv[:, 2 * d:]
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dtype=dt)
    # bf16 operands + fp32 accumulation: native MXU passes (an fp32 matmul
    # decomposes into several); matches the reference's pre-scaled low-
    # precision matmul + fp32 softmax (unet.py:248-252)
    s = jnp.dot(q * scale, (k * scale).T, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


def _forward(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    # head-major [q,k,v] within head (reference layout); heads moved off the
    # trailing two axes (TPU tiling requires the last two block dims to be
    # 8/128-aligned or full)
    qkv4 = qkv.reshape(B, T, num_heads, 3 * d).transpose(0, 2, 1, 3)
    mem = _VMEM if (_VMEM and not interpret) else None
    out4 = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, num_heads, T, d), qkv.dtype),
        grid=(B, num_heads),
        in_specs=[
            pl.BlockSpec((1, 1, T, 3 * d), lambda b, h: (b, h, 0, 0), memory_space=mem)
        ],
        out_specs=pl.BlockSpec((1, 1, T, d), lambda b, h: (b, h, 0, 0), memory_space=mem),
        interpret=interpret,
    )(qkv4)
    return out4.transpose(0, 2, 1, 3).reshape(B, T, C)


def _reference(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    from ..models.attention import qkv_attention

    return qkv_attention(qkv, num_heads)


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref):
    """Flash-style backward for one (batch, head) tile.

    Recomputes the T x T probabilities in VMEM instead of reading the saved
    forward weights from HBM - for the reference's full-resolution MNIST
    attention (T=784, batch 128) the saved-weights tensor alone is 630MB, and
    eliminating its HBM round-trips is the single biggest win in the step.
    """
    qkv = qkv_ref[0, 0, :, :]
    g = g_ref[0, 0, :, :]
    d = qkv.shape[-1] // 3
    dt = qkv.dtype
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dtype=dt)
    q = qkv[:, :d] * scale
    k = qkv[:, d:2 * d] * scale
    v = qkv[:, 2 * d:]
    # bf16 matmul operands, fp32 accumulation/softmax throughout
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    p_lp = p.astype(dt)
    dv = jnp.dot(p_lp.T, g, preferred_element_type=jnp.float32)
    dp = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lp = ds.astype(dt)
    dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds_lp.T, q, preferred_element_type=jnp.float32) * scale
    dqkv_ref[0, 0, :, :] = jnp.concatenate([dq, dk, dv], axis=-1).astype(dqkv_ref.dtype)


def _backward(qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    qkv4 = qkv.reshape(B, T, num_heads, 3 * d).transpose(0, 2, 1, 3)
    g4 = g.reshape(B, T, num_heads, d).transpose(0, 2, 1, 3)
    mem = _VMEM if (_VMEM and not interpret) else None
    dqkv4 = pl.pallas_call(
        _attn_bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, num_heads, T, 3 * d), qkv.dtype),
        grid=(B, num_heads),
        in_specs=[
            pl.BlockSpec((1, 1, T, 3 * d), lambda b, h: (b, h, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, T, d), lambda b, h: (b, h, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, 1, T, 3 * d), lambda b, h: (b, h, 0, 0), memory_space=mem),
        interpret=interpret,
    )(qkv4, g4)
    return dqkv4.transpose(0, 2, 1, 3).reshape(B, T, 3 * C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int, interpret: bool = None) -> jnp.ndarray:
    """Drop-in replacement for `qkv_attention` with a Pallas forward.

    ``interpret`` defaults to auto: compiled on TPU, interpreter elsewhere
    (so tests run on CPU).
    """
    if interpret is None:
        interpret = _default_interpret()
    return _forward(qkv, num_heads, interpret)


def _fwd(qkv, num_heads, interpret):
    if interpret is None:
        interpret = _default_interpret()
    return _forward(qkv, num_heads, interpret), qkv


def _bwd(num_heads, interpret, qkv, g):
    if interpret is None:
        interpret = _default_interpret()
    return (_backward(qkv, g, num_heads, interpret),)


fused_qkv_attention.defvjp(_fwd, _bwd)
