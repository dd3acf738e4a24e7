"""Train-step smoke/behavior tests, single-device and 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causaldiffae_tpu.config import Config, create_diffusion, create_model
from causaldiffae_tpu.data import synthetic_iterator
from causaldiffae_tpu.parallel import data_sharding, make_mesh, replicated, shard_batch
from causaldiffae_tpu.training import (
    create_train_state,
    kl_weight_for_step,
    make_optimizer,
    make_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", class_cond=True, rep_cond=True,
        causal_modeling=True, masking=True, diffusion_steps=100,
        batch_size=8, kl_anneal_steps=100,
    )
    base.update(kw)
    return Config(**base)


def setup(cfg):
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    tx = make_optimizer(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=64)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step_fn = make_train_step(cfg, model, diffusion, tx)
    return model, diffusion, state, step_fn, it


def test_train_step_runs_and_descends():
    cfg = tiny_cfg()
    _, _, state, step_fn, it = setup(cfg)
    step_jit = jax.jit(step_fn, donate_argnums=0)
    losses = []
    for i in range(8):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, metrics = step_jit(state, batch)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 8
    # eps-MSE on near-noise targets should fall quickly from ~1
    assert losses[-1] < losses[0] * 1.5  # noisy but must not blow up
    assert float(metrics["grad_norm"]) > 0


def test_kl_weight_anneal_values():
    assert float(kl_weight_for_step(jnp.array(0), 100)) == 0.0
    np.testing.assert_allclose(float(kl_weight_for_step(jnp.array(99), 100)), 1.0)
    np.testing.assert_allclose(
        float(kl_weight_for_step(jnp.array(50), 101)), 0.5, atol=1e-6
    )
    assert float(kl_weight_for_step(jnp.array(10_000), 100)) == 1.0


def test_ema_moves_toward_params():
    cfg = tiny_cfg(ema_rate="0.5")
    _, _, state, step_fn, it = setup(cfg)
    old_params = jax.tree_util.tree_map(jnp.copy, state.params)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, _ = jax.jit(step_fn)(state, batch)
    expected = jax.tree_util.tree_map(
        lambda o, n: 0.5 * o + 0.5 * n, old_params, state.params
    )
    jax.tree_util.tree_map(
        lambda e, x: np.testing.assert_allclose(e, x, atol=1e-6),
        state.ema_params["0.5"], expected,
    )
    # and params actually changed so the check is non-vacuous
    changed = any(
        not np.allclose(o, n)
        for o, n in zip(jax.tree_util.tree_leaves(old_params),
                        jax.tree_util.tree_leaves(state.params))
    )
    assert changed


def test_microbatch_equivalence_of_shapes():
    cfg = tiny_cfg(microbatch=4)
    _, _, state, step_fn, it = setup(cfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_loss_second_moment_sampler_state_updates():
    cfg = tiny_cfg(schedule_sampler="loss-second-moment")
    _, _, state, step_fn, it = setup(cfg)
    assert state.sampler_state is not None
    counts0 = int(state.sampler_state["counts"].sum())
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, metrics = jax.jit(step_fn)(state, batch)
    assert int(state.sampler_state["counts"].sum()) == counts0 + cfg.batch_size
    # warm-up observability: far from warmed on step 1, and the progress
    # fraction matches the ring-history fill exactly
    assert float(metrics["sampler_warmed"]) == 0.0
    hpt = state.sampler_state["history"].shape[1]
    expect = float(np.mean(np.asarray(state.sampler_state["counts"]) / hpt))
    np.testing.assert_allclose(float(metrics["sampler_warmup_frac"]), expect,
                               rtol=1e-6)


def test_data_parallel_mesh_step_matches_single_device():
    """Multi-step DP equivalence: mesh training must match single-device
    training in FULL updated parameter trees (not just a loss scalar), and
    the replicated state must stay bitwise-identical across device shards -
    the replica-divergence bug class the reference's unverified sync_params
    no-op (`dist_util.py:67-74`) could never catch.
    """
    cfg = tiny_cfg(batch_size=16)
    model, diffusion, state, step_fn, it = setup(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    batches = [{k: jnp.asarray(v) for k, v in next(it).items()} for _ in range(3)]

    rep = replicated(mesh)
    mesh_state = jax.device_put(state, rep)
    single_state = jax.device_put(state, jax.devices("cpu")[0])
    step_jit = jax.jit(step_fn)

    for i, batch in enumerate(batches):
        mesh_state, m_metrics = step_jit(mesh_state, shard_batch(mesh, batch))
        single_state, s_metrics = step_jit(
            single_state, jax.device_put(batch, jax.devices("cpu")[0])
        )
        np.testing.assert_allclose(
            float(m_metrics["loss"]), float(s_metrics["loss"]), rtol=1e-4,
            err_msg=f"loss diverged at step {i}",
        )

    assert int(mesh_state.step) == 3
    # full param-tree equivalence after 3 optimizer updates (reduction-order
    # float noise -> tolerance, but any grad-reduction bug is far larger)
    flat_mesh = jax.tree_util.tree_leaves_with_path(jax.device_get(mesh_state.params))
    flat_single = dict(
        jax.tree_util.tree_leaves_with_path(jax.device_get(single_state.params))
    )
    for path, leaf in flat_mesh:
        np.testing.assert_allclose(
            leaf, flat_single[path], atol=2e-4, rtol=2e-3,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
    # EMA trees must match too (they are updated inside the jitted step)
    for rate, tree in mesh_state.ema_params.items():
        flat_e = jax.tree_util.tree_leaves_with_path(jax.device_get(tree))
        flat_se = dict(jax.tree_util.tree_leaves_with_path(
            jax.device_get(single_state.ema_params[rate])))
        for path, leaf in flat_e:
            np.testing.assert_allclose(
                leaf, flat_se[path], atol=2e-4, rtol=2e-3,
                err_msg=f"ema[{rate}] mismatch at {jax.tree_util.keystr(path)}",
            )
    # replica identity: every device shard of the replicated params must be
    # BITWISE identical
    for path, leaf in jax.tree_util.tree_leaves_with_path(mesh_state.params):
        shards = leaf.addressable_shards
        assert len(shards) == 8
        ref_data = np.asarray(shards[0].data)
        for sh in shards[1:]:
            np.testing.assert_array_equal(
                ref_data, np.asarray(sh.data),
                err_msg=f"replica divergence at {jax.tree_util.keystr(path)} "
                        f"(device {sh.device})",
            )


def test_train_step_under_debug_nans():
    """SURVEY §5.2: the normal path must be NaN-free under jax_debug_nans."""
    cfg = tiny_cfg(batch_size=4)
    _, _, state, step_fn, it = setup(cfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    jax.config.update("jax_debug_nans", True)
    try:
        state, metrics = jax.jit(step_fn)(state, batch)
        assert np.isfinite(float(metrics["loss"]))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_train_step_flow_based():
    """flow_based=True: z_post from the causal flow, mask = -mean(log_det)
    feeds the masked-KL reduction (reference unet.py:580-587 semantics)."""
    cfg = tiny_cfg(flow_based=True, masking=False, batch_size=4)
    _, _, state, step_fn, it = setup(cfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kld_rep"]))


def test_train_step_learnable_adjacency():
    """learn_adjacency=True: A is a zero-init parameter and receives grads."""
    cfg = tiny_cfg(learn_adjacency=True, batch_size=4)
    model, diffusion, state, step_fn, it = setup(cfg)
    A0 = np.asarray(state.params["causal_mask"]["A"])
    np.testing.assert_allclose(A0, 0.0)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    for i in range(2):
        state, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    A1 = np.asarray(state.params["causal_mask"]["A"])
    assert not np.allclose(A1, 0.0)  # gradient flowed into A


def test_train_step_learn_sigma():
    """learn_sigma=True end to end: 2C-channel UNet output, vb term in the
    loss (frozen-mean split), finite step."""
    cfg = tiny_cfg(learn_sigma=True, batch_size=4)
    _, _, state, step_fn, it = setup(cfg)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, metrics = jax.jit(step_fn)(state, batch)
    assert "vb" in metrics and np.isfinite(float(metrics["vb"]))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_2d_mesh_data_model_axes():
    """make_mesh(model_parallel=2) folds a model axis; the train step runs
    with the batch sharded on 'data' and state replicated over both axes
    (the mesh API reserved for tensor parallelism - SURVEY §5.8)."""
    cfg = tiny_cfg(batch_size=8)
    model, diffusion, state, step_fn, it = setup(cfg)
    mesh = make_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = jax.device_put(state, replicated(mesh))
    new_state, metrics = jax.jit(step_fn)(state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_eval_params_strict_ema_resolution():
    """eval_params returns raw params by default, the FIRST configured
    rate's EMA tree under use_ema, and ERRORS on a missing key instead of
    silently falling back to raw params (the old `.get(str(cfg.ema_rate),
    params)` pattern mislabeled exports for comma-separated ema_rate)."""
    from causaldiffae_tpu.training import eval_params

    cfg = tiny_cfg(ema_rate="0.9999,0.99")
    _, _, state, _, _ = setup(cfg)
    assert set(state.ema_params) == {"0.9999", "0.99"}

    assert eval_params(state, cfg) is state.params
    assert eval_params(state, cfg, use_ema=True) is state.ema_params["0.9999"]

    # a state whose EMA keys don't match the config must fail loudly
    broken = state.replace(ema_params={"0.5": state.params})
    with pytest.raises(KeyError):
        eval_params(broken, cfg, use_ema=True)
    with pytest.raises(ValueError):
        eval_params(state, cfg.replace(ema_rate=""), use_ema=True)
