"""Fused QKV self-attention Pallas kernel (bf16 training pass).

One kernel program per BATCH ELEMENT reads the qkv projection's natural
[T, 3C] layout (head-major interleave on the lane dim) and loops the heads
statically inside the kernel - no host-side [B,T,H,3d] <-> [B,H,T,3d]
relayout on either side (a per-(b,h) grid forced relayout copies worth ~10%
of the train step; measured, see RESULTS.md). Both matmuls run on the MXU
with fp32 accumulation, softmax on the VPU in fp32; math matches
`models.attention.qkv_attention` (and through it the reference
`unet.py:239-253`): q and k pre-scaled by d^-1/4.

The MNIST config attends at full resolution (T=784); queries are processed
in chunks only when the unchunked VMEM scratch estimate exceeds the scoped
limit (`_q_chunk` - always-on chunking measured 15% slower).

Backward: custom VJP, flash-style - recomputes the T x T probabilities in
VMEM instead of reading saved forward weights from HBM (the saved-weights
tensor alone is 630MB for the MNIST config; eliminating its round-trips is
the kernel's reason to exist). Routed for all bf16 passes by the caller
(`models/attention.py`): since the natural-layout rewrite the forward
kernel also wins forward-only DDIM chains (592.8 vs 616.6 ms, round 3);
fp32 still routes to XLA einsum (scratch doubles past VMEM).
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


def _q_chunk(T: int, itemsize: int, backward: bool) -> int:
    """Query-chunk size: whole T when the scratch fits VMEM, else the
    largest divisor chunk that does.

    Live [cq, T] scratch per head iteration: forward ~2 fp32 (scores,
    softmax) + 1 input-dtype array; backward ~4 fp32 (s, p, dp, ds) + 2
    input-dtype casts. Unchunked T=784 fits in bf16 (~12MB, measured
    working) but overflows v5e VMEM in fp32 (~15MB) - chunking is engaged
    only under that pressure because the smaller matmuls cost ~15% step
    time when it isn't needed (82 vs 68 ms/step measured).
    """
    per_row = T * ((4 * 4 + 2 * itemsize) if backward else (2 * 4 + itemsize))
    budget = 13 * 1024 * 1024
    if T * per_row <= budget:
        return T
    for c in (256, 128, 112, 96, 64, 32, 16, 8):
        if T % c == 0 and c * per_row <= budget:
            return c
    return 8


def _attn_kernel(qkv_ref, o_ref, *, num_heads: int):
    """One batch element: qkv block [T, 3C] (head-major interleave) -> [T, C].

    Heads are processed by a static in-kernel loop over lane slices of the
    natural projection layout, so NO host-side transpose/copy is needed on
    either side of the kernel (a per-(b,h) grid forces
    [B,T,H,3d] <-> [B,H,T,3d] relayout copies worth ~10% of the train step).
    Queries are processed in chunks to bound VMEM scratch.
    """
    qkv = qkv_ref[0]                       # [T, 3C]
    T = qkv.shape[0]
    d = qkv.shape[-1] // (3 * num_heads)
    dt = qkv.dtype
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dtype=dt)
    cq = _q_chunk(T, qkv.dtype.itemsize, backward=False)
    for h in range(num_heads):
        base = h * 3 * d
        q = qkv[:, base:base + d] * scale
        k = qkv[:, base + d:base + 2 * d] * scale
        v = qkv[:, base + 2 * d:base + 3 * d]
        # bf16 operands + fp32 accumulation: native MXU passes; matches the
        # reference's pre-scaled low-precision matmul + fp32 softmax
        # (unet.py:248-252). Per-(head, chunk) results are stored straight
        # into the output ref's lane slice - no in-VMEM concatenation pass.
        for i in range(0, T, cq):
            s = jnp.dot(q[i:i + cq], k.T, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
            o_ref[0, i:i + cq, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _forward(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, threeC = qkv.shape
    C = threeC // 3
    mem = _VMEM if (_VMEM and not interpret) else None
    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, threeC), lambda b: (b, 0, 0), memory_space=mem)],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0), memory_space=mem),
        interpret=interpret,
    )(qkv)


def _reference(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    from ..models.attention import qkv_attention

    return qkv_attention(qkv, num_heads)


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, num_heads: int):
    """Flash-style backward for one batch element (in-kernel head loop).

    Recomputes the T x T probabilities in VMEM instead of reading the saved
    forward weights from HBM - for the reference's full-resolution MNIST
    attention (T=784, batch 128) the saved-weights tensor alone is 630MB, and
    eliminating its HBM round-trips is the single biggest win in the step.
    g arrives as [T, C] in the natural (head-interleaved lane) layout.
    """
    qkv = qkv_ref[0]                       # [T, 3C]
    g_all = g_ref[0]                       # [T, C]
    T = qkv.shape[0]
    d = qkv.shape[-1] // (3 * num_heads)
    dt = qkv.dtype
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dtype=dt)
    cq = _q_chunk(T, qkv.dtype.itemsize, backward=True)
    for h in range(num_heads):
        base = h * 3 * d
        q = qkv[:, base:base + d] * scale
        k = qkv[:, base + d:base + 2 * d] * scale
        v = qkv[:, base + 2 * d:base + 3 * d]
        g = g_all[:, h * d:(h + 1) * d]
        # flash-style query chunks: dq rows are chunk-local (stored straight
        # into the output lane slice), dk/dv accumulate across chunks; bf16
        # matmul operands, fp32 accumulation/softmax
        dk = jnp.zeros((T, d), dtype=jnp.float32)
        dv = jnp.zeros((T, d), dtype=jnp.float32)
        for i in range(0, T, cq):
            qc = q[i:i + cq]
            gc = g[i:i + cq]
            s = jnp.dot(qc, k.T, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            p_lp = p.astype(dt)
            dv = dv + jnp.dot(p_lp.T, gc, preferred_element_type=jnp.float32)
            dp = jnp.dot(gc, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds_lp = ds.astype(dt)
            dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32) * scale
            dqkv_ref[0, i:i + cq, base:base + d] = dq.astype(dqkv_ref.dtype)
            dk = dk + jnp.dot(ds_lp.T, qc, preferred_element_type=jnp.float32) * scale
        dqkv_ref[0, :, base + d:base + 2 * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, base + 2 * d:base + 3 * d] = dv.astype(dqkv_ref.dtype)


def _backward(qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    B, T, threeC = qkv.shape
    C = threeC // 3
    mem = _VMEM if (_VMEM and not interpret) else None
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, threeC), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, threeC), lambda b: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, T, threeC), lambda b: (b, 0, 0), memory_space=mem),
        interpret=interpret,
    )(qkv, g)


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
