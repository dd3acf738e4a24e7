#!/usr/bin/env python
"""Head-packed QK^T layout probe — closes the attention layout-ceiling question.

After the full-lane kernel adoption, exactly ONE matmul in the attention pass
still runs below MXU speed-of-light: QK^T, whose contraction dim IS the head
dim (d=32 of the MXU's 128-deep systolic array -> 25% depth utilization).
RESULTS.md names "a head-packed layout" (pack 4 heads' d=32 into the 128-lane
dim) as the hypothetical ceiling-breaker. This probe measures whether any
head-packing can actually buy that matmul back.

The arithmetic says no: per-head scores S_h = Q_h K_h^T need 4 independent
depth-32 contractions. Packing the heads into one depth-128 contraction
computes sum_h Q_h K_h^T — the WRONG math (it mixes heads). The only dense
packing that preserves per-head scores is the block-diagonal expansion
  S_cat[T, 4T] = Q_packed[T, 128] @ blockdiag(K_1^T..K_4^T)[128, 4T]
which reaches 100% MXU depth by inflating FLOPs exactly 4x (the zero blocks
are multiplied like everything else on a dense systolic array) — a wash by
construction, minus the cost of materializing the zero-padded operand. A
systolic array has no segmented-sum mode, so there is no third option.

Measured contenders, hot morphomnist geometry (B=128, T=784, H=4, d=32, bf16
operands / fp32 accumulation — the kernel's exact matmul contract):
  perhead   einsum bhtd,bhsd->bhts            (what the kernel does, depth 32)
  blockdiag build K_bd + btk,bks->bts         (head-packed, depth 128, 4x FLOPs)
  ghost     dense btk,bsk->bts over C=128     (WRONG MATH — sum over heads;
                                               the speed-of-light packing chases)

If blockdiag >= perhead, the layout ceiling is real and closed: the remaining
attention-vs-conv MFU gap is a property of d=32 attention on a 128-deep MXU,
not of this kernel. Reference geometry: unet.py:234-253 (num_heads=4 presets).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=50):
    import jax

    out = fn(*args)
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

    B, T, H, d = 128, 784, 4, 32
    C = H * d
    print(f"device: {jax.devices()[0]}")
    print(f"geometry: B={B} T={T} H={H} d={d} bf16 (hot morphomnist block)")

    kq, kk = jax.random.split(jax.random.PRNGKey(0))
    # natural packed layout: heads side by side on the lane dim
    q_packed = jax.random.normal(kq, (B, T, C), dtype=jnp.bfloat16)
    k_packed = jax.random.normal(kk, (B, T, C), dtype=jnp.bfloat16)
    q_heads = q_packed.reshape(B, T, H, d)
    k_heads = k_packed.reshape(B, T, H, d)

    @jax.jit
    def perhead(q, k):
        # the kernel's QK^T: per-head depth-32 contraction
        return jnp.einsum("bthd,bshd->bhts", q, k,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def blockdiag(q, k_h):
        # head-packed: one depth-128 contraction against a block-diagonal
        # RHS (includes building the zero-padded operand — it is part of
        # the approach, not overhead to excuse away)
        eye = jnp.eye(H, dtype=k_h.dtype)                     # [H, H]
        # K_bd[b, h*d+i, g*T+s] = K[b, s, h, i] * delta(h, g)
        k_bd = jnp.einsum("bshi,hg->bhigs", k_h, eye)         # [B,H,d,H,T]
        k_bd = k_bd.reshape(B, C, H * T)                      # [B, 128, 4T]
        return jnp.einsum("btk,bks->bts", q, k_bd,
                          preferred_element_type=jnp.float32)  # [B, T, 4T]

    @jax.jit
    def ghost(q, k):
        # WRONG MATH (sums scores over heads) — the dense depth-128 matmul
        # whose speed head-packing is trying to reach
        return jnp.einsum("btk,bsk->bts", q, k,
                          preferred_element_type=jnp.float32)

    # parity: blockdiag must reproduce the per-head scores exactly
    s_ph = perhead(q_heads, k_heads)                          # [B, H, T, T]
    s_bd = blockdiag(q_packed, k_heads).reshape(B, T, H, T).transpose(0, 2, 1, 3)
    err = float(jnp.max(jnp.abs(s_ph - s_bd)))
    print(f"blockdiag == perhead scores: max|diff| = {err:.2e}")
    assert err < 1e-3, "head-packed scores must match per-head math"

    # Two regimes per contender:
    #  materialized — scores written to HBM ([B,H,T,T] fp32 = 1.26 GB; both
    #    real contenders pay it equally, so it partially masks the matmul)
    #  compute-bound — scores reduced in-fusion via sum(s*s) (no algebraic
    #    shortcut exists for a Frobenius norm of a dot, so XLA must run the
    #    full contraction; this is the in-kernel regime, where scores live
    #    in VMEM and the matmul itself is the clock)
    def reduced(f):
        return jax.jit(lambda a, b: jnp.sum(jnp.square(f(a, b))))

    flops_true = 2 * B * H * T * T * d                        # useful FLOPs
    print("-- materialized scores (HBM write included) --")
    for name, f, a, b in (("perhead (kernel's layout)", perhead, q_heads, k_heads),
                          ("blockdiag (head-packed)", blockdiag, q_packed, k_heads),
                          ("ghost (wrong math, SOL)", ghost, q_packed, k_packed)):
        t = timeit(f, a, b) * 1e3
        eff = flops_true / (t * 1e-3) / 1e12
        print(f"{name:26} {t:7.3f} ms  -> {eff:6.1f} useful TFLOPS")
    print("-- compute-bound (scores reduced in-fusion) --")
    times = {}
    for name, f, a, b in (("perhead (kernel's layout)", perhead, q_heads, k_heads),
                          ("blockdiag (head-packed)", blockdiag, q_packed, k_heads),
                          ("ghost (wrong math, SOL)", ghost, q_packed, k_packed)):
        t = timeit(reduced(f), a, b) * 1e3
        times[name.split()[0]] = t
        eff = flops_true / (t * 1e-3) / 1e12
        print(f"{name:26} {t:7.3f} ms  -> {eff:6.1f} useful TFLOPS")
    r = times["perhead"] / times["blockdiag"]
    print(f"head-packed vs per-head (compute-bound): {r:4.2f}x "
          f"({'WINS — adopt' if r > 1.05 else 'no win — ceiling closed'})")


if __name__ == "__main__":
    main()
