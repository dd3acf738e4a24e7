#!/usr/bin/env python
"""Microbenchmarks for the Pallas kernels vs their XLA reference paths.

Prints per-op timings (forward and forward+backward) on the current device
for the attention shapes each workload actually uses.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20):
    out = fn(*args)
    import jax

    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    from causaldiffae_tpu.models.attention import qkv_attention
    from causaldiffae_tpu.ops import fused_qkv_attention, fused_qkv_attention_t

    print(f"device: {jax.devices()[0]}")
    # (workload, B, T, heads, head_dim)
    shapes = [
        ("mnist ds=1 (hot)", 128, 784, 4, 32),
        ("mnist middle", 128, 49, 4, 64),
        ("circuit ds=8", 16, 256, 4, 64),
        ("pendulum middle", 32, 144, 4, 128),
    ]
    for name, B, T, H, d in shapes:
        C = H * d
        qkv = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * C), dtype=jnp.bfloat16)
        g = jnp.ones((B, T, C), dtype=jnp.bfloat16)

        xla_f = jax.jit(lambda q: qkv_attention(q, H))
        pal_f = jax.jit(lambda q: fused_qkv_attention(q, H))
        fl_f = jax.jit(lambda q: fused_qkv_attention_t(q, H))
        xla_b = jax.jit(jax.grad(lambda q: (qkv_attention(q, H) * g).sum().astype(jnp.float32)))
        pal_b = jax.jit(jax.grad(lambda q: (fused_qkv_attention(q, H) * g).sum().astype(jnp.float32)))
        fl_b = jax.jit(jax.grad(lambda q: (fused_qkv_attention_t(q, H) * g).sum().astype(jnp.float32)))

        tf_x = timeit(xla_f, qkv) * 1e3
        tf_p = timeit(pal_f, qkv) * 1e3
        tf_t = timeit(fl_f, qkv) * 1e3
        tb_x = timeit(xla_b, qkv) * 1e3
        tb_p = timeit(pal_b, qkv) * 1e3
        tb_t = timeit(fl_b, qkv) * 1e3
        print(f"{name:18} B={B:3} T={T:4} H={H} d={d:3} | "
              f"fwd xla {tf_x:7.3f}ms pallas {tf_p:7.3f}ms ({tf_x/tf_p:4.2f}x) "
              f"full-lane {tf_t:7.3f}ms ({tf_p/tf_t:4.2f}x vs pallas) | "
              f"bwd xla {tb_x:7.3f}ms pallas {tb_p:7.3f}ms ({tb_x/tb_p:4.2f}x) "
              f"full-lane {tb_t:7.3f}ms ({tb_p/tb_t:4.2f}x vs pallas)")


if __name__ == "__main__":
    main()
