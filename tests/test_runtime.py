"""Runtime tests: logger, checkpoint/resume, train loop, IDX codec."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from causaldiffae_tpu.config import Config, create_diffusion, create_model
from causaldiffae_tpu.data import batch_iterator, load_idx, save_idx, synthetic_iterator
from causaldiffae_tpu.training import create_train_state, make_optimizer
from causaldiffae_tpu.training.checkpoint import CheckpointManager
from causaldiffae_tpu.training.loop import TrainLoop
from causaldiffae_tpu.utils import logger


def tiny_cfg(**kw):
    base = dict(
        name="tiny", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", class_cond=True, rep_cond=True,
        causal_modeling=True, masking=True, diffusion_steps=100,
        batch_size=4, log_interval=2, save_interval=4, kl_anneal_steps=100,
    )
    base.update(kw)
    return Config(**base)


def test_idx_roundtrip(tmp_path):
    arr = (np.arange(2 * 5 * 5) % 255).astype(np.uint8).reshape(2, 5, 5)
    p = str(tmp_path / "x-idx3-ubyte.gz")
    save_idx(arr, p)
    back = load_idx(p)
    np.testing.assert_array_equal(arr, back)


def test_batch_iterator_shapes():
    data = {"image": np.zeros((10, 4, 4, 1), np.float32), "c": np.zeros((10, 2), np.float32)}
    it = batch_iterator(data, 3, seed=0)
    b = next(it)
    assert b["image"].shape == (3, 4, 4, 1)
    assert b["c"].shape == (3, 2)


def test_logger_mean_and_formats(tmp_path):
    lg = logger.configure(dir=str(tmp_path), format_strs=["csv", "json", "log"])
    lg.logkv_mean("a", 1.0)
    lg.logkv_mean("a", 3.0)
    lg.logkv("b", 7)
    out = lg.dumpkvs()
    assert out["a"] == 2.0 and out["b"] == 7
    assert (tmp_path / "progress.csv").exists()
    assert (tmp_path / "progress.json").exists()
    # second dump with a new key extends the CSV header
    lg.logkv("c", 1)
    lg.dumpkvs()
    header = (tmp_path / "progress.csv").read_text().splitlines()[0]
    assert "c" in header.split(",")
    lg.close()


def test_checkpoint_save_restore(tmp_path):
    cfg = tiny_cfg()
    model = create_model(cfg)
    tx = make_optimizer(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.latest_step() is None
    mgr.save(0, jax.device_get(state))
    assert mgr.latest_step() == 0
    restored = mgr.restore(state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b),
        jax.device_get(state.params), restored.params,
    )


def test_train_loop_smoke_with_resume(tmp_path, monkeypatch):
    """3-step train, checkpoint, resume, 3 more steps (reference's
    DIFFUSION_TRAINING_TEST smoke pattern, train_util.py:206-209)."""
    cfg = tiny_cfg(total_steps=3, save_interval=3)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    logger.configure(dir=str(tmp_path / "logs"), format_strs=["log"])
    data = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16)
    loop = TrainLoop(cfg, model, diffusion, data,
                     ckpt_dir=str(tmp_path / "ck"), use_mesh=False)
    state = loop.run_loop()
    assert int(state.step) == 3

    # resume: a fresh loop must pick up at step 3 and continue to 6
    cfg2 = cfg.replace(total_steps=6)
    loop2 = TrainLoop(cfg2, model, diffusion, data,
                      ckpt_dir=str(tmp_path / "ck"), use_mesh=False)
    assert loop2.resume_step == 3
    state2 = loop2.run_loop()
    assert int(state2.step) == 6


def test_preemption_signal_checkpoints(tmp_path):
    """SIGTERM mid-loop -> checkpoint written, loop exits cleanly."""
    import os
    import signal
    import threading

    cfg = tiny_cfg(total_steps=10_000, save_interval=10_000)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    logger.configure(dir=str(tmp_path / "logs"), format_strs=["log"])
    data = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16)
    loop = TrainLoop(cfg, model, diffusion, data,
                     ckpt_dir=str(tmp_path / "ck"), use_mesh=False)
    timer = threading.Timer(3.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    state = loop.run_loop()
    timer.cancel()
    assert int(state.step) < 10_000  # exited early
    assert loop.ckpt.latest_step() == int(state.step)


def test_gather_across_hosts_single_process():
    from causaldiffae_tpu.parallel import gather_across_hosts, mean_across_hosts

    x = np.arange(12).reshape(3, 4)
    np.testing.assert_array_equal(gather_across_hosts(x), x)
    assert mean_across_hosts(2.5) == 2.5
