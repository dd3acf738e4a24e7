"""Correctness tests for Pallas kernels (interpret mode on CPU) vs the
reference jnp paths, including gradients through the custom VJPs.

(A fused GroupNorm kernel existed through round 2 and was removed after
measurement: the custom-call boundary regressed both training and sampling
vs XLA's own fusion - see models/layers.GroupNorm32 docstring.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causaldiffae_tpu.models.attention import qkv_attention
from causaldiffae_tpu.ops import fused_qkv_attention


@pytest.mark.parametrize("B,T,H,d", [(2, 49, 2, 16), (1, 196, 4, 32), (2, 64, 1, 8)])
def test_fused_attention_matches_reference(B, T, H, d):
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    got = fused_qkv_attention(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_attention_grad():
    B, T, H, d = 2, 16, 2, 8
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3 * C))

    def loss_pallas(q):
        return jnp.sum(fused_qkv_attention(q, H) ** 2)

    def loss_ref(q):
        return jnp.sum(qkv_attention(q, H) ** 2)

    g1 = jax.grad(loss_pallas)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4, rtol=1e-3)


def test_unet_with_pallas_attention_flag():
    """use_pallas=True wires the fused kernel into the UNet (interpret on CPU)."""
    from causaldiffae_tpu.config import Config, create_model

    cfg = Config(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", use_pallas=True,
    )
    model = create_model(cfg)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, t, train=False)
    eps, aux = model.apply(variables, x, t, train=False)
    assert eps.shape == (2, 28, 28, 1)
    assert bool(jnp.isfinite(eps).all())


def test_attention_train_gating_numerics():
    """Pallas (all bf16 passes since round 3) and XLA (use_pallas=False)
    attention must agree within bf16 tolerance, so kernel routing cannot
    change model behavior. The kernel is gated to bf16 (fp32 doubles its
    VMEM scratch past the 16MB scoped limit at T=784); fp32 must take the
    XLA path everywhere."""
    from causaldiffae_tpu.models.attention import AttentionBlock

    blk_pallas = AttentionBlock(channels=32, num_heads=2, use_pallas=True,
                                dtype=jnp.bfloat16)
    blk_xla = AttentionBlock(channels=32, num_heads=2, use_pallas=False,
                             dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 7, 32), jnp.bfloat16)
    variables = blk_xla.init(jax.random.PRNGKey(3), x, False)
    out_xla = blk_xla.apply(variables, x, False)
    for train in (False, True):  # bf16 routes Pallas in BOTH passes now
        out_pallas = blk_pallas.apply(variables, x, train)
        np.testing.assert_allclose(
            np.asarray(out_pallas, dtype=np.float32),
            np.asarray(out_xla, dtype=np.float32), atol=3e-2, rtol=3e-2,
        )


def test_unet_routes_pallas_attention_in_bf16_train(monkeypatch):
    """The UNet-level routing (_apply_seq head dispatch + dtype gate) must
    actually reach *a* Pallas kernel for every bf16 pass (train AND eval,
    the round-3 contract) and never for fp32 - asserted with a call counter
    so a broken dispatch can't pass silently. Counts BOTH orientations
    (head-major and full-lane): which one fires is the per-shape routing's
    business (test_attention_orientation_auto_routing pins that); this test
    pins only the bf16-reaches-Pallas / fp32-never-does contract."""
    import causaldiffae_tpu.ops.attention_pallas as ap
    from causaldiffae_tpu.config import Config, create_model

    calls = {"n": 0}
    real_hm, real_t = ap.fused_qkv_attention, ap.fused_qkv_attention_t

    def counting_hm(qkv, num_heads, interpret=None):
        calls["n"] += 1
        return real_hm(qkv, num_heads, interpret)

    def counting_t(qkv, num_heads, interpret=None):
        calls["n"] += 1
        return real_t(qkv, num_heads, interpret)

    monkeypatch.setattr(ap, "fused_qkv_attention", counting_hm)
    monkeypatch.setattr(ap, "fused_qkv_attention_t", counting_t)

    cfg = Config(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", use_pallas=True, use_bf16=True,
    )
    model = create_model(cfg)
    x = jnp.zeros((2, 28, 28, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
    n_init = calls["n"]
    assert n_init > 0, "bf16 eval trace (init) never reached the Pallas kernel"

    rngs = {"dropout": jax.random.PRNGKey(1)}
    eps, _ = model.apply(variables, x, t, train=True, rngs=rngs)
    assert calls["n"] > n_init, "bf16 train forward never reached the Pallas kernel"
    assert bool(jnp.isfinite(eps).all())

    # fp32 must route to XLA einsum in both passes (kernel scratch > VMEM)
    cfg32 = cfg.replace(use_bf16=False)
    model32 = create_model(cfg32)
    before = calls["n"]
    v32 = model32.init({"params": jax.random.PRNGKey(0)}, x, t, train=False)
    model32.apply(v32, x, t, train=True, rngs=rngs)
    assert calls["n"] == before, "fp32 pass must not reach the Pallas kernel"


def test_fused_attention_chunked_path_matches(monkeypatch):
    """Force the VMEM-pressure query-chunked path (engaged on fp32 T=784 on
    real hardware) and assert forward + grad numerics match unchunked."""
    import causaldiffae_tpu.ops.attention_pallas as ap

    B, T, H, d = 1, 64, 2, 16
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(2), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    g_ref = jax.grad(lambda q: jnp.sum(qkv_attention(q, H) ** 2))(qkv)

    monkeypatch.setattr(ap, "_q_chunk",
                        lambda T, itemsize, backward, extra_lp=0: 16)
    got = fused_qkv_attention(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    g = jax.grad(lambda q: jnp.sum(fused_qkv_attention(q, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("B,T,H,d", [(2, 49, 2, 16), (1, 196, 4, 32), (2, 64, 1, 8)])
def test_full_lane_attention_matches_reference(B, T, H, d):
    """The full-lane-orientation variant computes identical attention."""
    from causaldiffae_tpu.ops import fused_qkv_attention_t

    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    got = fused_qkv_attention_t(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_full_lane_attention_grad_and_chunked(monkeypatch):
    """Grad parity for the full-lane variant, unchunked and with forced
    query chunking (exercises the per-chunk ds^T path and the cross-chunk
    transposed dk/dv accumulators)."""
    import causaldiffae_tpu.ops.attention_pallas as ap
    from causaldiffae_tpu.ops import fused_qkv_attention_t

    B, T, H, d = 2, 64, 2, 16
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    g_ref = jax.grad(lambda q: jnp.sum(qkv_attention(q, H) ** 2))(qkv)

    g1 = jax.grad(lambda q: jnp.sum(fused_qkv_attention_t(q, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g_ref), atol=1e-4, rtol=1e-3)

    monkeypatch.setattr(ap, "_q_chunk",
                        lambda T, itemsize, backward, extra_lp=0: 16)
    got = fused_qkv_attention_t(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
    g2 = jax.grad(lambda q: jnp.sum(fused_qkv_attention_t(q, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_ref), atol=1e-4, rtol=1e-3)

    # the no-big-transpose backward flavor (lane-capped dq) — same grads
    monkeypatch.setenv("CDAE_ATTN_FL_BWD", "capped_dq")
    g3 = jax.grad(lambda q: jnp.sum(fused_qkv_attention_t(q, H) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g_ref), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("flag", ["0", "1"])
def test_defer_norm_flavor_parity(monkeypatch, flag):
    """CDAE_ATTN_DEFER_NORM re-associates the softmax division (unnormalized
    exp through the T^2 ops, denominator folded into d-sized operands) —
    forward AND grads must match the jnp reference in BOTH flavors, for
    BOTH kernel orientations, including the forced-chunked path."""
    import causaldiffae_tpu.ops.attention_pallas as ap

    monkeypatch.setenv("CDAE_ATTN_DEFER_NORM", flag)
    B, T, H, d = 2, 64, 2, 16
    C = H * d
    qkv = jax.random.normal(jax.random.PRNGKey(3), (B, T, 3 * C))
    ref = qkv_attention(qkv, H)
    g_ref = jax.grad(lambda q: jnp.sum(qkv_attention(q, H) ** 2))(qkv)

    for kernel in (ap.fused_qkv_attention, ap.fused_qkv_attention_t):
        got = kernel(qkv, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        grad = jax.grad(lambda q: jnp.sum(kernel(q, H) ** 2))(qkv)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)

    monkeypatch.setattr(ap, "_q_chunk",
                        lambda T, itemsize, backward, extra_lp=0: 16)
    for kernel in (ap.fused_qkv_attention, ap.fused_qkv_attention_t):
        got = kernel(qkv, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        grad = jax.grad(lambda q: jnp.sum(kernel(q, H) ** 2))(qkv)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)

    monkeypatch.setenv("CDAE_ATTN_DEFER_NORM", "bogus")
    with pytest.raises(ValueError, match="CDAE_ATTN_DEFER_NORM"):
        ap.fused_qkv_attention(qkv, H)


def test_full_lane_env_routing(monkeypatch):
    """CDAE_ATTN_FULL_LANE=1 routes AttentionBlock's bf16 pass through the
    full-lane kernel variant."""
    import causaldiffae_tpu.ops.attention_pallas as ap
    from causaldiffae_tpu.models.attention import AttentionBlock

    calls = {"t": 0}
    real = ap.fused_qkv_attention_t

    def counting(qkv, h, interpret=None):
        calls["t"] += 1
        return real(qkv, h, interpret)

    monkeypatch.setattr(
        "causaldiffae_tpu.ops.attention_pallas.fused_qkv_attention_t", counting)
    monkeypatch.setenv("CDAE_ATTN_FULL_LANE", "1")

    block = AttentionBlock(channels=32, num_heads=2, use_pallas=True,
                           dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 7, 32), dtype=jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(1)}, x)
    before = calls["t"]  # init traces the block once too
    block.apply(variables, x)
    assert calls["t"] == before + 1


def test_attention_orientation_auto_routing(monkeypatch):
    """With CDAE_ATTN_FULL_LANE unset, AttentionBlock picks the kernel
    orientation per shape: full-lane at head_dim 32 (the measured v5e win,
    RESULTS.md "Kernel routing"), head-major otherwise; =0 forces
    head-major even at head_dim 32."""
    import causaldiffae_tpu.ops.attention_pallas as ap
    from causaldiffae_tpu.models.attention import AttentionBlock

    calls = {"t": 0, "hm": 0}
    real_t, real_hm = ap.fused_qkv_attention_t, ap.fused_qkv_attention

    def counting_t(qkv, h, interpret=None):
        calls["t"] += 1
        return real_t(qkv, h, interpret)

    def counting_hm(qkv, h, interpret=None):
        calls["hm"] += 1
        return real_hm(qkv, h, interpret)

    monkeypatch.setattr(
        "causaldiffae_tpu.ops.attention_pallas.fused_qkv_attention_t", counting_t)
    monkeypatch.setattr(
        "causaldiffae_tpu.ops.attention_pallas.fused_qkv_attention", counting_hm)
    monkeypatch.delenv("CDAE_ATTN_FULL_LANE", raising=False)

    def run(channels, num_heads):
        block = AttentionBlock(channels=channels, num_heads=num_heads,
                               use_pallas=True, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, channels),
                              dtype=jnp.bfloat16)
        variables = block.init({"params": jax.random.PRNGKey(1)}, x)
        start = dict(calls)
        block.apply(variables, x)
        return {k: calls[k] - start[k] for k in calls}

    assert run(64, 2) == {"t": 1, "hm": 0}      # head_dim 32 -> full-lane
    assert run(128, 2) == {"t": 0, "hm": 1}     # head_dim 64 -> head-major

    monkeypatch.setenv("CDAE_ATTN_FULL_LANE", "0")
    assert run(64, 2) == {"t": 0, "hm": 1}      # forced head-major

    monkeypatch.setenv("CDAE_ATTN_FULL_LANE", "")  # VAR= means unset
    assert run(64, 2) == {"t": 1, "hm": 0}

    monkeypatch.setenv("CDAE_ATTN_FULL_LANE", "bogus")
    with pytest.raises(ValueError, match="CDAE_ATTN_FULL_LANE"):
        run(64, 2)
