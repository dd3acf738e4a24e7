"""Shape/property tests for the model layer (CPU, small configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causaldiffae_tpu.config import ADJACENCY, Config, create_model
from causaldiffae_tpu.models import (
    CausalModeling,
    CausalUNet,
    GaussianConvEncoder,
    GaussianConvEncoderClf,
    MultivariateCausalFlow,
    qkv_attention,
    timestep_embedding,
)


def tiny_cfg(**kw):
    base = dict(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2,
        rep_dim=32, attention_resolutions="14",
    )
    base.update(kw)
    return Config(**base)


def init_and_run(cfg, B=2, train=True, **call_kw):
    model = create_model(cfg)
    x = jnp.zeros((B, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.zeros((B,), dtype=jnp.int32)
    kwargs = dict(call_kw)
    if cfg.class_cond:
        kwargs["y"] = jnp.zeros((B,), dtype=jnp.int32)
    if cfg.context_cond:
        kwargs["c"] = jnp.zeros((B, 4))
    if cfg.rep_cond and "z" not in kwargs:
        kwargs["x_start"] = x
    rngs = {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1),
            "cfmask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, x, t, train=train, **kwargs)
    out, mut = model.apply(
        variables, x, t, train=train, rngs=rngs, mutable=["batch_stats"], **kwargs
    )
    return model, variables, out


def test_timestep_embedding_shapes_and_values():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 128)
    assert emb.shape == (3, 128)
    # t=0: cos part all 1, sin part all 0
    np.testing.assert_allclose(emb[0, :64], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 64:], 0.0, atol=1e-6)
    # odd dim pads a zero column
    emb_odd = timestep_embedding(jnp.array([3.0]), 9)
    assert emb_odd.shape == (1, 9)
    np.testing.assert_allclose(emb_odd[0, -1], 0.0)


def test_qkv_attention_math():
    """Uniform attention check: identical keys -> output = mean of values."""
    B, T, H, d = 2, 5, 2, 4
    C = H * d
    rng = jax.random.PRNGKey(0)
    v = jax.random.normal(rng, (B, T, H, d))
    q = jnp.zeros((B, T, H, d))
    k = jnp.zeros((B, T, H, d))
    qkv = jnp.concatenate([q, k, v], axis=-1).reshape(B, T, 3 * C)
    out = qkv_attention(qkv, H).reshape(B, T, H, d)
    expected = jnp.broadcast_to(v.mean(axis=1, keepdims=True), v.shape)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_encoder_shapes_and_variance_positive():
    enc = GaussianConvEncoder(latent_dim=32, num_vars=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 1))
    vars_ = enc.init(jax.random.PRNGKey(1), x, train=False)
    mu, var = enc.apply(vars_, x, train=False)
    assert mu.shape == (2, 32) and var.shape == (2, 32)
    assert bool((var > 0).all())
    # 28px with the 2-var trunk: 4 stride-2 convs -> 2x2x128 = 512 flat
    flat = enc.apply(vars_, x, train=False, method=lambda m, x, train: m.trunk(x, train=train))
    assert flat.shape == (2, 512)


def test_encoder_clf_scalar_head():
    clf = GaussianConvEncoderClf(num_vars=2)
    x = jnp.zeros((3, 28, 28, 1))
    vars_ = clf.init(jax.random.PRNGKey(0), x, train=False)
    out = clf.apply(vars_, x, train=False)
    assert out.shape == (3, 1)


def test_causal_masking_root_blocks_zero():
    """A^T u: root variables (no parents) must get zero pre-activation."""
    cm = CausalModeling(latent_dim=8, num_var=2, adjacency=ADJACENCY["morphomnist"])
    u = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    vars_ = cm.init(jax.random.PRNGKey(1), u)
    z_pre = cm.apply(vars_, u, method=CausalModeling.causal_masking)
    # var 0 (thickness) is a root: A^T row 0 is zero
    np.testing.assert_allclose(z_pre[:, 0, :], 0.0, atol=1e-7)
    # var 1 receives var 0's block
    np.testing.assert_allclose(z_pre[:, 1, :], u.reshape(4, 2, 4)[:, 0, :], atol=1e-6)


def test_causal_masking_4var_circuit():
    A = jnp.asarray(ADJACENCY["circuit"])
    cm = CausalModeling(latent_dim=16, num_var=4, adjacency=ADJACENCY["circuit"])
    u = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
    vars_ = cm.init(jax.random.PRNGKey(1), u)
    z_pre = cm.apply(vars_, u, method=CausalModeling.causal_masking)
    ub = u.reshape(2, 4, 4)
    expected = jnp.einsum("ji,bjd->bid", A, ub)
    np.testing.assert_allclose(z_pre, expected, atol=1e-6)
    # arm (var 0) is the only root
    np.testing.assert_allclose(z_pre[:, 0, :], 0.0, atol=1e-7)
    # red (var 3) = arm + blue + green blocks
    np.testing.assert_allclose(
        z_pre[:, 3, :], ub[:, 0, :] + ub[:, 1, :] + ub[:, 2, :], atol=1e-6
    )


def test_scm_full_pass_shape():
    cm = CausalModeling(latent_dim=16, num_var=4, adjacency=ADJACENCY["pendulum"])
    u = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    vars_ = cm.init(jax.random.PRNGKey(1), u)
    z_post = cm.apply(vars_, u)
    assert z_post.shape == (3, 16)


def test_flow_shapes_and_determinism():
    """Flow path shapes/finiteness.

    NOTE: the reference's flow/reverse pair is NOT an exact inverse - the
    conditioning mask C = I - A includes the self block, which is zero while
    `flow` builds z but populated when `reverse` reads it (reference
    `nn.py:368-426`). The quirk is preserved, so we do not assert
    invertibility - only shape, finiteness, and determinism.
    """
    flow = MultivariateCausalFlow(dim=2, k=8)
    A = jnp.asarray(ADJACENCY["morphomnist"])
    C = jnp.eye(2) - A
    e = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    vars_ = flow.init(jax.random.PRNGKey(1), e, C, method=MultivariateCausalFlow.flow)
    z, log_det = flow.apply(vars_, e, C, method=MultivariateCausalFlow.flow)
    assert z.shape == (4, 16) and log_det.shape == (4,)
    z2, log_det2 = flow.apply(vars_, e, C, method=MultivariateCausalFlow.flow)
    np.testing.assert_allclose(z, z2, atol=0)
    rev_log_det, logp = flow.apply(vars_, z, C, method=MultivariateCausalFlow.reverse)
    assert logp.shape == (4,) and rev_log_det.shape == (4,)
    for arr in (z, log_det, rev_log_det, logp):
        assert bool(jnp.isfinite(arr).all())
    # s is sigmoid-bounded in (0,1), so log_det of a k=8 block pair is in (0, 16)
    assert bool((log_det > 0).all()) and bool((log_det < 16).all())


@pytest.mark.parametrize(
    "kw",
    [
        dict(class_cond=True, rep_cond=True, causal_modeling=True, masking=True),
        dict(rep_cond=True),
        dict(class_cond=True, context_cond=True),
        dict(),
    ],
)
def test_unet_training_forward_variants(kw):
    cfg = tiny_cfg(**kw)
    _, _, (eps, aux) = init_and_run(cfg)
    assert eps.shape == (2, 28, 28, 1)
    assert bool(jnp.isfinite(eps).all())
    if cfg.rep_cond:
        assert aux["mu"].shape == (2, cfg.rep_dim)
        assert bool((aux["var"] > 0).all())
        if cfg.causal_modeling:
            assert aux["z_post"].shape == (2, cfg.rep_dim)
        if cfg.masking:
            assert aux["mask"].shape == (2,)
            assert set(np.unique(np.asarray(aux["mask"]))) <= {0.0, 1.0}
    else:
        assert aux == {}


def test_unet_denoise_with_given_z_matches_contract():
    """Sampling contract: z given -> encoder must NOT run (works without x_start)."""
    cfg = tiny_cfg(class_cond=True, rep_cond=True, causal_modeling=True)
    model = create_model(cfg)
    B = 2
    x = jnp.zeros((B, 28, 28, 1))
    t = jnp.zeros((B,), dtype=jnp.int32)
    y = jnp.zeros((B,), dtype=jnp.int32)
    z = jnp.ones((B, cfg.rep_dim))
    rngs = {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1),
            "cfmask": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, t, y=y, x_start=x, train=False)
    # every residual-branch output conv is zero-init, so emb conditioning is
    # dead at init (eps == 0); randomize zeros so the liveness check works
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    key = jax.random.PRNGKey(42)
    new_leaves = []
    for p in leaves:
        key, sub = jax.random.split(key)
        new_leaves.append(
            jnp.where(jnp.all(p == 0), jax.random.normal(sub, p.shape) * 0.02, p)
        )
    variables = jax.tree_util.tree_unflatten(treedef, new_leaves)
    eps, aux = model.apply(variables, x, t, y=y, z=z, train=False, rngs=rngs)
    assert aux == {}
    eps2 = model.apply(variables, x, t, y=y, z=z, train=False,
                       method=CausalUNet.denoise)
    np.testing.assert_allclose(eps, eps2, atol=1e-6)
    # different z must change the output (conditioning is live)
    eps3 = model.apply(variables, x, t, y=y, z=z * -3.0, train=False,
                       method=CausalUNet.denoise)
    assert not np.allclose(eps, eps3, atol=1e-6)


def test_unet_learn_sigma_output_channels():
    cfg = tiny_cfg(learn_sigma=True)
    _, _, (eps, _) = init_and_run(cfg)
    assert eps.shape == (2, 28, 28, 2)


def test_masking_zeroes_dropped_samples():
    """Dropped samples' z must be exactly zero (classifier-free uncond branch)."""
    cfg = tiny_cfg(rep_cond=True, causal_modeling=True, masking=True)
    model = create_model(cfg)
    B = 64
    x = jax.random.normal(jax.random.PRNGKey(5), (B, 28, 28, 1))
    t = jnp.zeros((B,), dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1),
            "cfmask": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    variables = model.init(rngs, x, t, x_start=x, train=True)

    # re-run the latent path manually to check gating
    def latent_path(m, x_start):
        mu, var = m.encode(x_start, train=False)
        z_post = m.causalize(mu)
        return mu, z_post

    (eps, aux), _ = model.apply(
        variables, x, t, x_start=x, train=True, rngs=rngs, mutable=["batch_stats"]
    )
    mask = np.asarray(aux["mask"])
    assert 0 < mask.sum() < B  # with B=64 and p=.5, both present w.h.p.
    dropped = np.asarray(aux["z_post"])[mask == 0]
    np.testing.assert_allclose(dropped, 0.0, atol=1e-7)


def test_bf16_torso_finite():
    cfg = tiny_cfg(class_cond=True, rep_cond=True, causal_modeling=True, use_bf16=True)
    _, _, (eps, aux) = init_and_run(cfg)
    assert bool(jnp.isfinite(eps.astype(jnp.float32)).all())


def test_superres_model():
    """SuperResUNet conditions on an upsampled low-res image (unet.py:667-688)."""
    from causaldiffae_tpu.config import create_sr_model

    cfg = tiny_cfg(in_channels=3, rep_cond=False, causal_modeling=False,
                   num_channels=32, num_res_blocks=1)
    model = create_sr_model(cfg, large_size=32, small_size=16)
    x = jnp.zeros((2, 32, 32, 3))
    low = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), dtype=jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, t, low_res=low, train=False)
    eps, aux = model.apply(variables, x, t, low_res=low, train=False)
    assert eps.shape == (2, 32, 32, 3)


def test_remat_forward_and_grad():
    """use_remat=True must produce identical outputs and finite grads."""
    cfg = tiny_cfg()
    cfg_r = tiny_cfg(use_remat=True)
    model = create_model(cfg)
    model_r = create_model(cfg_r)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 1))
    t = jnp.zeros((2,), dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(1)}
    v = model.init(rngs, x, t, train=False)
    # same params work in the remat variant (remat is structure-preserving)
    eps, _ = model.apply(v, x, t, train=False)
    eps_r, _ = model_r.apply(v, x, t, train=False)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps_r), atol=1e-6)

    def loss(params):
        e, _ = model_r.apply({"params": params}, x, t, train=False)
        return jnp.sum(e ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))
