"""Profiling hooks: XLA traces + step annotations + wall-time scopes.

TPU-native replacement for the reference's never-invoked wall-clock scope
timers and thop FLOP counter (SURVEY §5.1): `jax.profiler` traces viewable
in TensorBoard/Perfetto, per-step `StepTraceAnnotation`s, and an analytic
FLOP estimate for the UNet (replacing `QKVAttention.count_flops`,
`unet.py:255-276`).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

__all__ = ["trace", "step_annotation", "unet_flops_per_sample"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profile into ``logdir`` for TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(step: int):
    """Label device work with the training step number."""
    return jax.profiler.StepTraceAnnotation("train", step_num=step)


def unet_flops_per_sample(cfg) -> float:
    """Analytic forward-FLOP estimate for one sample through the UNet.

    Counts conv/dense MACs x2 plus the two attention matmuls
    (2 * T^2 * C each, the formula from reference `unet.py:270-276`).
    Approximate: ignores norms/elementwise (<2% of total).
    """
    ch = cfg.num_channels
    size = cfg.image_size
    flops = 2 * (3 * 3 * cfg.in_channels * ch) * size * size  # stem conv

    def res_block(h, c_in, c_out):
        f = 2 * (3 * 3 * c_in * c_out) * h * h       # in conv
        f += 2 * (3 * 3 * c_out * c_out) * h * h     # out conv
        f += 2 * (4 * ch) * (2 * c_out)              # emb dense
        if c_in != c_out:
            f += 2 * c_in * c_out * h * h            # 1x1 skip
        return f

    def attn(h, c):
        t = h * h
        return 2 * (c * 3 * c) * t + 2 * 2 * t * t * c + 2 * (c * c) * t

    mults = cfg.channel_mult
    attn_ds = set(cfg.attention_ds)
    h = size
    c_in = ch
    ds = 1
    # down path
    for level, m in enumerate(mults):
        for _ in range(cfg.num_res_blocks):
            flops += res_block(h, c_in, m * ch)
            c_in = m * ch
            if ds in attn_ds:
                flops += attn(h, c_in)
        if level != len(mults) - 1:
            flops += 2 * (3 * 3 * c_in * c_in) * (h // 2) ** 2
            h //= 2
            ds *= 2
    # middle
    flops += 2 * res_block(h, c_in, c_in) + attn(h, c_in)
    # up path (skip-concat doubles input channels; approximate with 2x)
    for level, m in reversed(list(enumerate(mults))):
        for _ in range(cfg.num_res_blocks + 1):
            flops += res_block(h, 2 * c_in, m * ch)
            c_in = m * ch
            if ds in attn_ds:
                flops += attn(h, c_in)
        if level:
            h *= 2
            ds //= 2
            flops += 2 * (3 * 3 * c_in * c_in) * h * h
    flops += 2 * (3 * 3 * ch * cfg.out_channels) * size * size
    return float(flops)
