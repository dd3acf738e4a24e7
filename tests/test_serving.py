"""Serving artifacts (`causaldiffae_tpu/serving.py` + scripts/export_serving.py).

A trained model exports to a self-contained StableHLO artifact that
reproduces the in-process chain exactly, reloads without model code, and is
deterministic in its seed input. Driven through the SHIPPED CLI main, like
the other eval-surface suites.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import jax
import jax.numpy as jnp

import causaldiffae_tpu.config as config_mod
from causaldiffae_tpu.config import create_diffusion, create_model
from causaldiffae_tpu.data import synthetic_iterator
from causaldiffae_tpu.serving import load_artifact
from causaldiffae_tpu.training.loop import TrainLoop


def _register_tiny_preset(name="serving_tiny"):
    from _tiny_config import tiny_config

    cfg = tiny_config(
        name=name, eval_timestep_respacing="8", abduction_t=7,
        total_steps=1, save_interval=1, log_interval=1,
    )
    config_mod.PRESETS[name] = cfg
    return cfg


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = _register_tiny_preset()
    d = tmp_path_factory.mktemp("serving") / "ckpt"
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=16)
    loop = TrainLoop(cfg, model, diffusion, it, ckpt_dir=str(d), use_mesh=False)
    loop.run_loop(num_steps=1)
    return str(d)


def _run_cli(argv):
    import export_serving

    old = sys.argv
    sys.argv = ["export_serving.py"] + argv
    try:
        export_serving.main()
    finally:
        sys.argv = old


def test_counterfactual_artifact_roundtrip(ckpt, tmp_path):
    """Export do(var 0) with the CLI (its --verify pass asserts the artifact
    reproduces the direct call); then reload and check seed determinism and
    seed sensitivity from the artifact alone."""
    out = str(tmp_path / "do0.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "counterfactual", "--intervene_var", "0",
              "--batch_size", "4", "--use_pallas", "false"])

    manifest = json.loads(Path(out + ".json").read_text())
    assert [i["name"] for i in manifest["inputs"]] == ["x", "y", "value", "seed"]
    assert manifest["outputs"][0]["shape"] == [4, 28, 28, 1]

    fn, _ = load_artifact(out)
    x = jnp.zeros((4, 28, 28, 1), jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    a = np.asarray(fn(x, y, jnp.float32(1.0), jnp.int32(3)))
    b = np.asarray(fn(x, y, jnp.float32(1.0), jnp.int32(3)))
    c = np.asarray(fn(x, y, jnp.float32(1.0), jnp.int32(4)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    assert np.isfinite(a).all()


def test_prior_artifact_needs_no_x(ckpt, tmp_path):
    out = str(tmp_path / "prior.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "prior", "--batch_size", "2", "--use_pallas", "false",
              "--sampler", "dpm++", "--sample_steps", "4"])
    manifest = json.loads(Path(out + ".json").read_text())
    assert [i["name"] for i in manifest["inputs"]] == ["y", "seed"]
    fn, _ = load_artifact(out)
    imgs = np.asarray(fn(jnp.zeros((2,), jnp.int32), jnp.int32(0)))
    assert imgs.shape == (2, 28, 28, 1) and np.isfinite(imgs).all()


def test_artifact_loads_without_package(ckpt, tmp_path):
    """The deployment claim: a fresh process that never imports
    causaldiffae_tpu (only jax) deserializes the artifact and generates."""
    import subprocess

    out = str(tmp_path / "recon.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false"])

    code = f"""
import sys
assert not any(m.startswith("causaldiffae_tpu") for m in sys.modules)
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from pathlib import Path
from jax import export as jexport
exp = jexport.deserialize(Path({out!r}).read_bytes())
imgs = np.asarray(jax.jit(exp.call)(
    jnp.zeros((2, 28, 28, 1), jnp.float32), jnp.zeros((2,), jnp.int32),
    jnp.int32(0)))
assert imgs.shape == (2, 28, 28, 1) and np.isfinite(imgs).all()
assert not any(m.startswith("causaldiffae_tpu") for m in sys.modules)
print("BARE_LOAD_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900)
    assert "BARE_LOAD_OK" in r.stdout, r.stderr[-2000:]


def test_poly_batch_artifact_serves_any_batch(ckpt, tmp_path):
    """--poly_batch exports the batch dim symbolically: one artifact, every
    batch size (CLI --verify checks 2 concrete sizes vs the direct call)."""
    out = str(tmp_path / "recon_poly.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "4", "--poly_batch"])

    manifest = json.loads(Path(out + ".json").read_text())
    assert manifest["batch_size"] == "polymorphic"
    assert manifest["inputs"][0]["shape"][0] == "b"

    fn, _ = load_artifact(out)
    for b in (1, 3):
        imgs = np.asarray(fn(jnp.zeros((b, 28, 28, 1), jnp.float32),
                             jnp.zeros((b,), jnp.int32), jnp.int32(0)))
        assert imgs.shape == (b, 28, 28, 1) and np.isfinite(imgs).all()


def test_serve_cli_runs_artifact_over_stream(ckpt, tmp_path):
    """scripts/serve.py: the consumer CLI feeds a stream through a
    fixed-batch artifact (padding + trimming the tail) and reports
    throughput, with no model code in the loop."""
    out = str(tmp_path / "recon_b2.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false"])

    import serve

    served = str(tmp_path / "served.npz")
    old = sys.argv
    sys.argv = ["serve.py", "--artifact", out, "--synthetic", "5",
                "--out", served]
    try:
        report = serve.main()
    finally:
        sys.argv = old

    assert report["served"] == 5 and report["batch"] == 2
    arr = np.load(served)["samples"]
    assert arr.shape == (5, 28, 28, 1) and np.isfinite(arr).all()


def test_serve_cli_batch_flag_chunks_poly_artifact(ckpt, tmp_path):
    """--batch chunks a POLYMORPHIC artifact's stream so steady_batch_s is
    measured from calls after the first (one whole-stream call would fold
    compile time into the 'steady' rate); fixed-batch artifacts ignore it."""
    out = str(tmp_path / "recon_poly.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "4", "--poly_batch",
              "--verify", "false"])

    import serve

    served = str(tmp_path / "served_poly.npz")
    old = sys.argv
    sys.argv = ["serve.py", "--artifact", out, "--synthetic", "5",
                "--batch", "2", "--out", served]
    try:
        report = serve.main()
    finally:
        sys.argv = old

    assert report["served"] == 5 and report["batch"] == 2
    arr = np.load(served)["samples"]
    assert arr.shape == (5, 28, 28, 1) and np.isfinite(arr).all()


def test_aot_compiled_artifact_serves_without_recompile(ckpt, tmp_path):
    """--aot writes a serialized COMPILED executable next to the .shlo;
    serve.py prefers it (report['aot']) and produces the same stream as the
    recompile path (same seeds; fusion-level float drift only)."""
    out = str(tmp_path / "recon_aot.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false", "--aot"])
    assert Path(out + ".xc").exists()

    import serve

    def run(extra, dest):
        old = sys.argv
        sys.argv = ["serve.py", "--artifact", out, "--synthetic", "4",
                    "--out", dest] + extra
        try:
            return serve.main()
        finally:
            sys.argv = old

    r_aot = run([], str(tmp_path / "aot.npz"))
    r_cold = run(["--no_aot"], str(tmp_path / "cold.npz"))
    assert r_aot["aot"] is True and r_cold["aot"] is False
    a = np.load(tmp_path / "aot.npz")["samples"]
    b = np.load(tmp_path / "cold.npz")["samples"]
    assert a.shape == (4, 28, 28, 1) and np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_aot_platform_mismatch_falls_back(ckpt, tmp_path):
    """A .xc compiled for another platform must be skipped, not crash: the
    portable .shlo is the fallback."""
    import pickle

    out = str(tmp_path / "recon_fb.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false"])
    Path(out + ".xc").write_bytes(pickle.dumps(
        {"payload": b"", "in_tree": None, "out_tree": None,
         "platform": "tpu", "n_devices": 8}))

    import serve

    old = sys.argv
    sys.argv = ["serve.py", "--artifact", out, "--synthetic", "3",
                "--out", str(tmp_path / "fb.npz")]
    try:
        report = serve.main()
    finally:
        sys.argv = old
    assert report["aot"] is False and report["served"] == 3


def test_serve_cli_no_pipeline_and_p50(ckpt, tmp_path):
    """--no_pipeline serves strictly sequentially (ADVICE r4: lower peak
    memory escape hatch) and the report carries the straggler-robust p50."""
    out = str(tmp_path / "recon_np.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false"])

    import serve

    old = sys.argv
    sys.argv = ["serve.py", "--artifact", out, "--synthetic", "6",
                "--no_pipeline", "--out", str(tmp_path / "np.npz")]
    try:
        report = serve.main()
    finally:
        sys.argv = old
    assert report["pipelined"] is False
    assert report["steady_batch_p50_s"] > 0
    assert np.load(tmp_path / "np.npz")["samples"].shape == (6, 28, 28, 1)


def test_serve_cli_rejects_empty_input(ckpt, tmp_path):
    """A zero-row .npz must fail with a clear message, not IndexError
    (ADVICE r4)."""
    out = str(tmp_path / "recon_e.shlo")
    _run_cli(["--preset", "serving_tiny", "--ckpt_dir", ckpt, "--out", out,
              "--fn", "reconstruct", "--batch_size", "2",
              "--use_pallas", "false", "--verify", "false"])
    empty = str(tmp_path / "empty.npz")
    np.savez(empty, x=np.zeros((0, 28, 28, 1), np.float32),
             y=np.zeros((0,), np.int32))

    import serve

    old = sys.argv
    sys.argv = ["serve.py", "--artifact", out, "--input", empty]
    try:
        with pytest.raises(SystemExit, match="empty"):
            serve.main()
    finally:
        sys.argv = old


def test_serve_cli_rejects_nonpositive_batch():
    """--batch < 1 must fail fast (before artifact load): a negative B
    would silently produce an empty serving loop and a confusing
    np.concatenate crash."""
    import serve

    old = sys.argv
    sys.argv = ["serve.py", "--artifact", "/nonexistent.shlo", "--batch", "0"]
    try:
        with pytest.raises(SystemExit, match="must be >= 1"):
            serve.main()
    finally:
        sys.argv = old
