"""Fused GroupNorm(+scale-shift)+SiLU Pallas kernel.

The ResBlock hot path applies GroupNorm32 -> (1+scale)*h + shift -> SiLU
(reference `unet.py:190-194` + `nn.py:435-437`): a memory-bound chain of
elementwise passes over the activation map. This kernel does it in ONE pass
per batch element: load the [HW, C] tile to VMEM, compute the 32 group
statistics in fp32 on the VPU, then normalize + affine + conditioning +
SiLU and write back - a single HBM read and write.

Falls back to the XLA path (models.layers.GroupNorm32) when the per-batch
tile would not fit VMEM (large feature maps at 96/128px level 0) - the
caller checks `fits_vmem`.

Backward: custom VJP recomputing through the jnp reference path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["fused_groupnorm_silu", "fits_vmem"]

from .attention_pallas import _default_interpret

VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def fits_vmem(hw: int, c: int, bytes_per_el: int = 4) -> bool:
    # input + output + fp32 scratch headroom
    return 3 * hw * c * bytes_per_el <= VMEM_BUDGET_BYTES


def _kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref,
            *, num_groups: int, eps: float, with_cond: bool, with_silu: bool):
    x = x_ref[0].astype(jnp.float32)            # [HW, C]
    HW, C = x.shape
    cg = C // num_groups
    # group statistics via one-hot matmuls - Mosaic can't reshape/repeat
    # across the lane dimension, but tiny (1,C)@(C,G) dots are fine
    chan = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (C, num_groups), 1)
    M = (chan // cg == grp).astype(jnp.float32)  # [C, G] one-hot membership
    cnt = float(HW * cg)
    col_sum = jnp.sum(x, axis=0, keepdims=True)          # [1, C]
    col_sumsq = jnp.sum(x * x, axis=0, keepdims=True)    # [1, C]
    g_mean = jnp.dot(col_sum, M, preferred_element_type=jnp.float32) / cnt    # [1, G]
    g_msq = jnp.dot(col_sumsq, M, preferred_element_type=jnp.float32) / cnt   # [1, G]
    inv = jax.lax.rsqrt(g_msq - g_mean * g_mean + eps)   # [1, G]
    mean_c = jnp.dot(g_mean, M.T, preferred_element_type=jnp.float32)         # [1, C]
    inv_c = jnp.dot(inv, M.T, preferred_element_type=jnp.float32)             # [1, C]
    y = (x - mean_c) * inv_c
    y = y * gamma_ref[0, 0][None, :] + beta_ref[0, 0][None, :]
    if with_cond:
        y = y * (1.0 + scale_ref[0, 0].astype(jnp.float32)[None, :]) \
            + shift_ref[0, 0].astype(jnp.float32)[None, :]
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _reference(x, gamma, beta, scale, shift, num_groups, eps, with_cond, with_silu):
    B, HW, C = x.shape
    x32 = x.astype(jnp.float32)
    cg = C // num_groups
    xg = x32.reshape(B, HW, num_groups, cg)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(B, HW, C)
    y = y * gamma[None, None, :] + beta[None, None, :]
    if with_cond:
        y = y * (1.0 + scale.astype(jnp.float32)[:, None, :]) \
            + shift.astype(jnp.float32)[:, None, :]
    if with_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _forward(x, gamma, beta, scale, shift, num_groups, eps, with_silu, interpret):
    B, HW, C = x.shape
    with_cond = scale is not None
    if scale is None:
        scale = jnp.zeros((B, C), dtype=x.dtype)
        shift = jnp.zeros((B, C), dtype=x.dtype)
    # per-channel vectors carried as [*, 1, C] so block last-two dims are
    # (1, C) - valid TPU tiling (second-to-last equals the array dim)
    gamma3 = gamma.astype(jnp.float32).reshape(1, 1, C)
    beta3 = beta.astype(jnp.float32).reshape(1, 1, C)
    scale3 = scale.reshape(B, 1, C)
    shift3 = shift.reshape(B, 1, C)
    mem = _VMEM if (_VMEM and not interpret) else None
    return pl.pallas_call(
        functools.partial(
            _kernel, num_groups=num_groups, eps=eps,
            with_cond=with_cond, with_silu=with_silu,
        ),
        out_shape=jax.ShapeDtypeStruct((B, HW, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, C), lambda b: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, C), lambda b: (0, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, HW, C), lambda b: (b, 0, 0), memory_space=mem),
        interpret=interpret,
    )(x, gamma3, beta3, scale3, shift3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_groupnorm_silu(
    x: jnp.ndarray,              # [B, HW, C]
    gamma: jnp.ndarray,          # [C]
    beta: jnp.ndarray,           # [C]
    scale: Optional[jnp.ndarray],   # [B, C] or None
    shift: Optional[jnp.ndarray],   # [B, C] or None
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = True,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    if interpret is None:
        interpret = _default_interpret()
    return _forward(x, gamma, beta, scale, shift, num_groups, eps, with_silu, interpret)


def _fwd(x, gamma, beta, scale, shift, num_groups, eps, with_silu, interpret):
    if interpret is None:
        interpret = _default_interpret()
    out = _forward(x, gamma, beta, scale, shift, num_groups, eps, with_silu, interpret)
    return out, (x, gamma, beta, scale, shift)


def _bwd(num_groups, eps, with_silu, interpret, res, g):
    x, gamma, beta, scale, shift = res
    with_cond = scale is not None

    def ref(x, gamma, beta, scale, shift):
        return _reference(x, gamma, beta, scale, shift, num_groups, eps,
                          with_cond, with_silu)

    if with_cond:
        _, vjp = jax.vjp(ref, x, gamma, beta, scale, shift)
        return vjp(g)
    _, vjp = jax.vjp(lambda a, b, c: ref(a, b, c, None, None), x, gamma, beta)
    dx, dgamma, dbeta = vjp(g)
    return (dx, dgamma, dbeta, None, None)


fused_groupnorm_silu.defvjp(_fwd, _bwd)
