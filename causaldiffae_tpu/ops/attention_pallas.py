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

__all__ = ["fused_qkv_attention", "fused_qkv_attention_t"]

# measured-winner default for _defer_norm (flipped only on a recorded v5e
# bench_ops win; RESULTS.md "Kernel routing")
_DEFER_NORM_DEFAULT = False


def _default_interpret() -> bool:
    """Compiled on TPU devices, interpreter elsewhere (CPU tests). The axon
    platform reports platform='axon' but device_kind='TPU v5 ...', so sniff
    the device kind."""
    try:
        return "TPU" not in jax.devices()[0].device_kind.upper()
    except Exception:  # pragma: no cover
        return True


def _q_chunk(T: int, itemsize: int, backward: bool, extra_lp: int = 0) -> int:
    """Query-chunk size: whole T when the scratch fits VMEM, else the
    largest divisor chunk that does.

    Live [cq, T] scratch per head iteration: forward ~2 fp32 (scores,
    softmax) + 1 input-dtype array; backward ~4 fp32 (s, p, dp, ds) + 2
    input-dtype casts. ``extra_lp`` counts additional [cq, T] input-dtype
    buffers a kernel variant materializes (the full-lane backward's ds^T
    transpose) so its chunking engages before the scoped-VMEM limit, not
    after. Unchunked T=784 fits in bf16 (~12MB, measured working) but
    overflows v5e VMEM in fp32 (~15MB) - chunking is engaged only under
    that pressure because the smaller matmuls cost ~15% step time when it
    isn't needed (82 vs 68 ms/step measured).
    """
    per_row = T * ((4 * 4 + 2 * itemsize) if backward else (2 * 4 + itemsize))
    per_row += T * extra_lp * itemsize
    budget = 13 * 1024 * 1024
    if T * per_row <= budget:
        return T
    for c in (256, 128, 112, 96, 64, 32, 16, 8):
        if T % c == 0 and c * per_row <= budget:
            return c
    return 8


def _defer_norm() -> bool:
    """Trace-time read of the deferred-normalization A/B flag.

    With ``CDAE_ATTN_DEFER_NORM=1`` the kernels compute PV with the
    UNNORMALIZED exp(s - max) and fold the softmax denominator into the
    d-sized output (forward) / the d-sized matmul operands (backward): the
    [rows, T]-sized division — a full T^2 multi-cycle VPU pass per matmul
    pair — becomes a [rows, d] multiply. Mathematically identical softmax
    (same max-subtraction; only the division is re-associated); bf16-cast
    intermediates stay in the same dynamic range because exp(s-max) <= 1.
    The default follows the v5e measurement policy (CLAUDE.md): adopt only
    on a measured win, recorded in RESULTS.md "Kernel routing". Trace-time
    like the other kernel flags — measure each flavor in its own process.
    """
    import os

    v = os.environ.get("CDAE_ATTN_DEFER_NORM") or None
    if v is None:
        return _DEFER_NORM_DEFAULT
    if v in ("0", "1"):
        return v == "1"
    raise ValueError(f"CDAE_ATTN_DEFER_NORM={v!r}: expected '1', '0', or unset")


def _exp_rows(s: jnp.ndarray, axis: int):
    """(exp(s - max), 1/sum) along ``axis`` — the two softmax factors."""
    m = jnp.max(s, axis=axis, keepdims=True)
    e = jnp.exp(s - m)
    r = 1.0 / jnp.sum(e, axis=axis, keepdims=True)
    return e, r


def _attn_kernel(qkv_ref, o_ref, *, num_heads: int, defer_norm: bool):
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
            if defer_norm:
                e, r = _exp_rows(s, axis=-1)
                o = jnp.dot(e.astype(dt), v, preferred_element_type=jnp.float32)
                o = o * r                  # [cq, d] scale, not a [cq, T] div
            else:
                p = jax.nn.softmax(s, axis=-1)
                o = jnp.dot(p.astype(dt), v, preferred_element_type=jnp.float32)
            o_ref[0, i:i + cq, h * d:(h + 1) * d] = o.astype(o_ref.dtype)


def _attn_call(kernel, out_lastdim: int, interpret: bool, qkv, *extra):
    """Shared pallas_call scaffolding: batch-only grid, whole-[T, lanes]
    blocks in VMEM, output dtype = input dtype. Used by both kernel
    orientations' forward and backward, so BlockSpec/memory-space handling
    cannot drift between them."""
    B, T, _ = qkv.shape
    mem = _VMEM if (_VMEM and not interpret) else None
    operands = (qkv,) + extra
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, out_lastdim), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, T, a.shape[-1]), lambda b: (b, 0, 0),
                               memory_space=mem) for a in operands],
        out_specs=pl.BlockSpec((1, T, out_lastdim), lambda b: (b, 0, 0),
                               memory_space=mem),
        interpret=interpret,
    )(*operands)


def _forward(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    return _attn_call(functools.partial(_attn_kernel, num_heads=num_heads,
                                        defer_norm=_defer_norm()),
                      qkv.shape[-1] // 3, interpret, qkv)


def _reference(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    from ..models.attention import qkv_attention

    return qkv_attention(qkv, num_heads)


def _attn_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, num_heads: int,
                     defer_norm: bool):
    """Flash-style backward for one batch element (in-kernel head loop).

    Recomputes the T x T probabilities in VMEM instead of reading the saved
    forward weights from HBM - for the reference's full-resolution MNIST
    attention (T=784, batch 128) the saved-weights tensor alone is 630MB, and
    eliminating its HBM round-trips is the single biggest win in the step.
    g arrives as [T, C] in the natural (head-interleaved lane) layout.

    ``defer_norm``: keep p UNNORMALIZED (e = exp(s - max)) through every
    T^2-sized op and fold the denominator r = 1/rowsum into the d-sized
    matmul operands instead — dv = e^T (r*g), dk = ds~^T (r*q), dq scaled
    post-matmul — turning the [cq, T] division into three [cq, d]
    multiplies. ds~ = e * (dp - c) with c = rowsum(dp * e) * r, identical
    math (r is constant per row), just re-associated.
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
            if defer_norm:
                e, r = _exp_rows(s, axis=-1)
                e_lp = e.astype(dt)
                gr = (gc.astype(jnp.float32) * r).astype(dt)    # [cq, d]
                dv = dv + jnp.dot(e_lp.T, gr, preferred_element_type=jnp.float32)
                dp = jnp.dot(gc, v.T, preferred_element_type=jnp.float32)
                c = jnp.sum(dp * e, axis=-1, keepdims=True) * r
                ds_u = (e * (dp - c)).astype(dt)                # unnormalized
                dq = jnp.dot(ds_u, k, preferred_element_type=jnp.float32)
                dq = dq * r * scale.astype(jnp.float32)         # [cq, d] scale
                qr = (qc.astype(jnp.float32) * r).astype(dt)    # [cq, d]
                dk = dk + jnp.dot(ds_u.T, qr,
                                  preferred_element_type=jnp.float32) * scale
            else:
                p = jax.nn.softmax(s, axis=-1)
                p_lp = p.astype(dt)
                dv = dv + jnp.dot(p_lp.T, gc, preferred_element_type=jnp.float32)
                dp = jnp.dot(gc, v.T, preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds_lp = ds.astype(dt)
                dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32) * scale
                dk = dk + jnp.dot(ds_lp.T, qc,
                                  preferred_element_type=jnp.float32) * scale
            dqkv_ref[0, i:i + cq, base:base + d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, base + d:base + 2 * d] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, base + 2 * d:base + 3 * d] = dv.astype(dqkv_ref.dtype)


def _backward(qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    return _attn_call(functools.partial(_attn_bwd_kernel, num_heads=num_heads,
                                        defer_norm=_defer_norm()),
                      qkv.shape[-1], interpret, qkv, g)


# ---------------- full-lane ("transposed orientation") variant ------------ #
#
# The d=32 head layout caps any matmul whose CONTRACTION dim (MXU depth,
# 128) or OUTPUT dim (MXU lanes, 128) is d at 25% utilization. QK^T's
# contraction IS d — unavoidable. But every other matmul in the pass can be
# re-oriented so both its contraction and its output lanes are T-sized:
#
#   forward   s_t[T,cq] = k  @ q_c^T    (capped: contraction d — same as before)
#             o_t[d,cq] = v^T @ p_t      (contraction T, lanes cq: FULL MXU;
#                                         the old p @ v had 32 output lanes)
#   backward  dv_t[d,T] = g_c^T @ p      (FULL; old p^T @ g had 32 lanes)
#             dq_t[d,cq] = k^T @ ds^T    (FULL; old ds @ k had 32 lanes)
#             dk_t[d,T] = q_c^T @ ds     (FULL; old ds^T @ q had 32 lanes)
#
# Every dot above is layout-natural for the MXU (LHS contraction on lanes,
# RHS contraction on sublanes), so Mosaic inserts no [T,T] relayouts; the
# price is small [d,cq] operand/result transposes plus ONE [cq,T] bf16
# transpose per backward chunk (ds^T). Whether that price beats the 4x lane
# waste is an empirical question — this variant exists to be measured
# against the head-major kernel on real hardware (bench_ops.py); routing
# stays with the measured winner.


def _attn_kernel_t(qkv_ref, o_ref, *, num_heads: int, defer_norm: bool):
    """Full-lane forward: scores in [k-index, q-index] orientation."""
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
        v_t = qkv[:, base + 2 * d:base + 3 * d].T      # [d, T], hoisted
        for i in range(0, T, cq):
            q_t = q[i:i + cq].T                        # [d, cq] small transpose
            # s_t = (q_c k^T)^T: contraction d (the unavoidable capped one)
            s_t = jnp.dot(k, q_t, preferred_element_type=jnp.float32)  # [T, cq]
            if defer_norm:
                e, r = _exp_rows(s_t, axis=0)          # r: [1, cq]
                o_t = jnp.dot(v_t, e.astype(dt), preferred_element_type=jnp.float32)
                o_t = o_t * r                          # [d, cq] scale, no T^2 div
            else:
                p_t = jax.nn.softmax(s_t, axis=0)      # softmax over k-index
                # o_t = (p v)^T: contraction T, output lanes cq — full MXU
                o_t = jnp.dot(v_t, p_t.astype(dt), preferred_element_type=jnp.float32)
            o_ref[0, i:i + cq, h * d:(h + 1) * d] = o_t.T.astype(o_ref.dtype)


def _attn_bwd_kernel_t(qkv_ref, g_ref, dqkv_ref, *, num_heads: int,
                       defer_norm: bool, dq_full_lane: bool = True):
    """Full-lane flash backward: dq/dk/dv all produced in [d, ·] orientation.

    Same recompute structure as `_attn_bwd_kernel`; the three output
    matmuls run with T-sized contraction AND T-sized lanes at the cost of
    one [cq, T] bf16 transpose (ds^T) per chunk plus small [d, cq] ones.
    ``dq_full_lane=False`` skips the big ds^T transpose and computes dq in
    the lane-capped orientation instead — whether the transpose beats the
    4x lane waste is hardware-empirical, so both flavors are measurable
    (env ``CDAE_ATTN_FL_BWD=capped_dq`` selects the latter). NOTE: the env
    var is read at TRACE time, so flipping it inside one process after a
    jitted caller has compiled is silently ignored by the jit cache —
    measure each flavor in its own process (as scripts/bench_ops.py and
    the bench harness do).
    """
    qkv = qkv_ref[0]                       # [T, 3C]
    g_all = g_ref[0]                       # [T, C]
    T = qkv.shape[0]
    d = qkv.shape[-1] // (3 * num_heads)
    dt = qkv.dtype
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), dtype=dt)
    # the dq_full_lane flavor materializes one extra [cq, T] bf16 buffer
    # (ds^T) on top of what the shared budget formula counts
    cq = _q_chunk(T, qkv.dtype.itemsize, backward=True,
                  extra_lp=1 if dq_full_lane else 0)
    for h in range(num_heads):
        base = h * 3 * d
        q = qkv[:, base:base + d] * scale
        k = qkv[:, base + d:base + 2 * d] * scale
        k_t = k.T                                        # [d, T], hoisted
        v_t = qkv[:, base + 2 * d:base + 3 * d].T        # [d, T], hoisted
        dk_t = jnp.zeros((d, T), dtype=jnp.float32)
        dv_t = jnp.zeros((d, T), dtype=jnp.float32)
        for i in range(0, T, cq):
            qc = q[i:i + cq]
            gc = g_all[i:i + cq, h * d:(h + 1) * d]
            s = jnp.dot(qc, k_t, preferred_element_type=jnp.float32)   # capped
            if defer_norm:
                # unnormalized p through every T^2 op; r folded into the
                # d-sized operands (see _attn_bwd_kernel docstring)
                e, r = _exp_rows(s, axis=-1)                    # r: [cq, 1]
                dp = jnp.dot(gc, v_t, preferred_element_type=jnp.float32)
                c = jnp.sum(dp * e, axis=-1, keepdims=True) * r
                p_lp = e.astype(dt)
                ds_lp = (e * (dp - c)).astype(dt)               # unnormalized
                qc_m = (qc.astype(jnp.float32) * r).astype(dt)  # [cq, d]
                gc_m = (gc.astype(jnp.float32) * r).astype(dt)  # [cq, d]
                dq_post = r                                     # [cq, 1]
            else:
                p = jax.nn.softmax(s, axis=-1)
                dp = jnp.dot(gc, v_t, preferred_element_type=jnp.float32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                p_lp = p.astype(dt)
                ds_lp = ds.astype(dt)
                qc_m, gc_m, dq_post = qc, gc, None
            if dq_full_lane:
                # dq^T = k^T ds^T — contraction T, lanes cq: full MXU
                # (costs a [cq, T] bf16 transpose of ds)
                dq_t = jnp.dot(k_t, ds_lp.T, preferred_element_type=jnp.float32)
                dq = dq_t.T
            else:
                # lane-capped dq (32 output lanes), but no big transpose
                dq = jnp.dot(ds_lp, k, preferred_element_type=jnp.float32)
            if dq_post is not None:
                dq = dq * dq_post
            dqkv_ref[0, i:i + cq, base:base + d] = (
                dq * scale.astype(jnp.float32)).astype(dqkv_ref.dtype)
            # dk^T += q_c^T ds, dv^T += g_c^T p — contraction cq, lanes T
            dk_t = dk_t + jnp.dot(qc_m.T, ds_lp, preferred_element_type=jnp.float32)
            dv_t = dv_t + jnp.dot(gc_m.T, p_lp, preferred_element_type=jnp.float32)
        dk_t = dk_t * scale.astype(jnp.float32)
        dqkv_ref[0, :, base + d:base + 2 * d] = dk_t.T.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, base + 2 * d:base + 3 * d] = dv_t.T.astype(dqkv_ref.dtype)


def _forward_t(qkv: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    return _attn_call(functools.partial(_attn_kernel_t, num_heads=num_heads,
                                        defer_norm=_defer_norm()),
                      qkv.shape[-1] // 3, interpret, qkv)


def _backward_t(qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int, interpret: bool) -> jnp.ndarray:
    import os

    # trace-time read: measure each flavor in its own process (see the
    # kernel docstring)
    dq_full_lane = os.environ.get("CDAE_ATTN_FL_BWD") != "capped_dq"
    return _attn_call(functools.partial(_attn_bwd_kernel_t, num_heads=num_heads,
                                        defer_norm=_defer_norm(),
                                        dq_full_lane=dq_full_lane),
                      qkv.shape[-1], interpret, qkv, g)


def _define_attention_vjp(f, forward_fn, backward_fn):
    """Wire the shared (resolve interpret -> forward/backward) custom-VJP
    shims; keeps the two kernel orientations' plumbing identical."""

    def fwd(qkv, num_heads, interpret):
        if interpret is None:
            interpret = _default_interpret()
        return forward_fn(qkv, num_heads, interpret), qkv

    def bwd(num_heads, interpret, qkv, g):
        if interpret is None:
            interpret = _default_interpret()
        return (backward_fn(qkv, g, num_heads, interpret),)

    f.defvjp(fwd, bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention_t(qkv: jnp.ndarray, num_heads: int, interpret: bool = None) -> jnp.ndarray:
    """Full-lane-orientation variant of `fused_qkv_attention` (same math)."""
    if interpret is None:
        interpret = _default_interpret()
    return _forward_t(qkv, num_heads, interpret)


_define_attention_vjp(fused_qkv_attention_t, _forward_t, _backward_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_qkv_attention(qkv: jnp.ndarray, num_heads: int, interpret: bool = None) -> jnp.ndarray:
    """Drop-in replacement for `qkv_attention` with a Pallas forward.

    ``interpret`` defaults to auto: compiled on TPU, interpreter elsewhere
    (so tests run on CPU).
    """
    if interpret is None:
        interpret = _default_interpret()
    return _forward(qkv, num_heads, interpret)


_define_attention_vjp(fused_qkv_attention, _forward, _backward)
