"""Single-process data-parallel eval (`parallel.local_eval_mesh`).

A 1-process host with N chips (one v5e-8 VM) must not run its sampling
chains on chip 0 while N-1 idle: the eval CLIs replicate variables over a
local data mesh and shard every generation batch. These tests drive the
SHIPPED CLI mains on the 8-virtual-device CPU harness and assert (a) the
mesh path engages, (b) the MAE is IDENTICAL to the forced single-device
run - sharding is layout, never semantics - and (c) sample/nll smoke.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax

import causaldiffae_tpu.config as config_mod
from causaldiffae_tpu.config import create_diffusion, create_model
from causaldiffae_tpu.data import synthetic_iterator
from causaldiffae_tpu.parallel import local_eval_mesh
from causaldiffae_tpu.training.loop import TrainLoop


def _register_tiny_preset(name="dp_eval_tiny"):
    from _tiny_config import tiny_config

    cfg = tiny_config(
        name=name, eval_timestep_respacing="10", abduction_t=9,
        num_samples=8, total_steps=1, save_interval=1, log_interval=1,
    )
    config_mod.PRESETS[name] = cfg
    return cfg


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = _register_tiny_preset()
    d = tmp_path_factory.mktemp("dp_eval") / "ckpt"
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16)
    loop = TrainLoop(cfg, model, diffusion, it, ckpt_dir=str(d))
    loop.run_loop(num_steps=1)
    return str(d)


def test_local_eval_mesh_gating():
    assert local_eval_mesh(8) is not None          # 8 % 8 == 0
    assert local_eval_mesh(12) is None             # indivisible batch
    mesh = local_eval_mesh(16)
    assert mesh is not None and mesh.devices.size == len(jax.local_devices())


def test_eval_placement_helper():
    """The shared placement rule behind every eval CLI: mesh path replicates
    variables + shards batches; fallback pins to device 0; None passes
    through put()."""
    from causaldiffae_tpu.parallel import eval_placement

    variables = {"params": {"w": np.ones((4, 4), np.float32)}}
    v, put, mesh = eval_placement(variables, 8)
    assert mesh is not None
    w = v["params"]["w"]
    assert w.sharding.is_fully_replicated
    b = put(np.zeros((8, 2), np.float32))
    assert not b.sharding.is_fully_replicated  # sharded on 'data'
    assert b.sharding.shard_shape(b.shape)[0] == 8 // len(jax.local_devices())
    assert put(None) is None

    # indivisible batch -> single-device fallback
    v1, put1, mesh1 = eval_placement(variables, 12)
    assert mesh1 is None
    assert v1["params"]["w"].sharding.device_set == {jax.local_devices()[0]}
    assert put1({"x": np.zeros(3)})["x"].shape == (3,)


def _run_eval_cli(ckpt_dir, out_dir, clf_dir):
    import counterfactual_test as ct_cli

    sys.argv = [
        "counterfactual_test.py", "--preset", "dp_eval_tiny",
        "--ckpt_dir", ckpt_dir, "--synthetic",
        "--num_samples", "8", "--batch_size", "8",
        "--out_dir", out_dir, "--classifier_dir", clf_dir,
        "--clf_epochs", "2", "--no_recon",
    ]
    return ct_cli.main()


def test_eval_cli_dataparallel_matches_single_device(ckpt, tmp_path, monkeypatch):
    _register_tiny_preset()
    clf_dir = str(tmp_path / "clf")
    os.makedirs(clf_dir)
    r_dp = _run_eval_cli(ckpt, str(tmp_path / "dp"), clf_dir)
    assert r_dp and all(np.isfinite(v) for v in r_dp.values())
    # the npz artifacts came back full-size (gathered across the mesh)
    arr = np.load(tmp_path / "dp" / "samples_do_thickness.npz")["samples"]
    assert arr.shape[0] == 8

    import causaldiffae_tpu.parallel.mesh as mesh_mod
    import counterfactual_test as ct_cli  # noqa: F401

    # force the single-device path (what a 1-chip host runs) - same probes,
    # same seed; the MAE must be identical: the mesh is layout only.
    # Patch the mesh MODULE: eval_placement resolves local_eval_mesh from
    # its own module globals, not the package re-export.
    monkeypatch.setattr(mesh_mod, "local_eval_mesh", lambda bs: None)
    r_sd = _run_eval_cli(ckpt, str(tmp_path / "sd"), clf_dir)
    assert set(r_dp) == set(r_sd)
    for k in r_dp:
        assert abs(r_dp[k] - r_sd[k]) < 1e-5, (k, r_dp[k], r_sd[k])


def test_sample_cli_dataparallel(ckpt, tmp_path):
    _register_tiny_preset()
    import sample as sample_cli

    out = str(tmp_path / "samples")
    sys.argv = ["sample.py", "--preset", "dp_eval_tiny", "--ckpt_dir", ckpt,
                "--num_samples", "8", "--batch_size", "8", "--out_dir", out]
    sample_cli.main()
    files = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert files, os.listdir(out)
    arr = np.load(os.path.join(out, files[0]))["arr_0"]
    assert arr.shape[0] == 8 and np.isfinite(arr).all()


def test_nll_cli_dataparallel(ckpt, tmp_path, capsys):
    _register_tiny_preset()
    import nll as nll_cli

    sys.argv = ["nll.py", "--preset", "dp_eval_tiny", "--ckpt_dir", ckpt,
                "--synthetic", "--num_samples", "8", "--batch_size", "8",
                "--out_dir", str(tmp_path / "nll")]
    nll_cli.main()
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    assert np.isfinite(json.loads(line)["total_bpd"])


def test_eval_cli_disentanglement_branch(ckpt, tmp_path):
    """--eval_disentanglement reports DCI + IRS + MCC in one JSON result."""
    _register_tiny_preset()
    import counterfactual_test as ct_cli

    sys.argv = [
        "counterfactual_test.py", "--preset", "dp_eval_tiny",
        "--ckpt_dir", ckpt, "--synthetic", "--batch_size", "8",
        "--out_dir", str(tmp_path / "dci"), "--eval_disentanglement",
    ]
    r = ct_cli.main()
    for key in ("disentanglement", "completeness", "informativeness_test",
                "IRS", "MCC_block_mean"):
        assert key in r and np.isfinite(r[key]), (key, r)
    assert 0.0 <= r["MCC_block_mean"] <= 1.0
