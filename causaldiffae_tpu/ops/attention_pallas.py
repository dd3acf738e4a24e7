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


def _attn_kernel(qkv_ref, o_ref, *, num_heads: int):
    """One (batch, head) tile: qkv block [T, 3d] -> out [T, d]."""
    qkv = qkv_ref[0, :, 0, :]
    d = qkv.shape[-1] // 3
    q = qkv[:, :d]
    k = qkv[:, d:2 * d]
    v = qkv[:, 2 * d:]
    scale = (1.0 / math.sqrt(math.sqrt(d)))
    s = jnp.dot(
        (q * scale).astype(jnp.float32), (k * scale).astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p, v.astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[0, :, 0, :] = o.astype(o_ref.dtype)


def _forward(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, threeC = qkv.shape
    C = threeC // 3
    d = C // num_heads
    # head-major [q,k,v] within head (reference layout)
    qkv4 = qkv.reshape(B, T, num_heads, 3 * d)
    out4 = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, num_heads, d), qkv.dtype),
        grid=(B, num_heads),
        in_specs=[
            pl.BlockSpec(
                (1, T, 1, 3 * d), lambda b, h: (b, 0, h, 0),
                memory_space=_VMEM if (_VMEM and not interpret) else None,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, T, 1, d), lambda b, h: (b, 0, h, 0),
            memory_space=_VMEM if (_VMEM and not interpret) else None,
        ),
        interpret=interpret,
    )(qkv4)
    return out4.reshape(B, T, C)


def _reference(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    from ..models.attention import qkv_attention

    return qkv_attention(qkv, num_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int, interpret: bool = None) -> jnp.ndarray:
    """Drop-in replacement for `qkv_attention` with a Pallas forward.

    ``interpret`` defaults to auto: compiled on TPU, interpreter elsewhere
    (so tests run on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _forward(qkv, num_heads, interpret)


def _fwd(qkv, num_heads, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _forward(qkv, num_heads, interpret), qkv


def _bwd(num_heads, interpret, qkv, g):
    _, vjp = jax.vjp(lambda x: _reference(x, num_heads), qkv)
    return (vjp(g)[0],)


fused_qkv_attention.defvjp(_fwd, _bwd)
