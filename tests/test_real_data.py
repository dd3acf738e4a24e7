"""Archive-gated real-data pipeline tests (VERDICT r3 item 7).

Every quality number so far comes from the built-in simulators because this
environment has no egress and no mounted archives
(RESULTS.md "Scope of the quality claims"). These tests make the real-data
gap *executable*: point ``CDAE_REAL_DATA_DIR`` at a directory containing any
of ``morphomnist/``, ``pendulum/``, ``circuit/`` (layouts per
`scripts/fetch_data.py` / reference `image_datasets.py:241-498`) and the
full real pipeline — loader, normalization, train step — validates in one
``pytest tests/test_real_data.py`` run. Without archives they skip cleanly.
"""

import os
from pathlib import Path

import numpy as np
import pytest

_ROOT = os.environ.get("CDAE_REAL_DATA_DIR", "")


def _archive(name: str) -> Path:
    if not _ROOT:
        pytest.skip("CDAE_REAL_DATA_DIR not set (no real archives mounted)")
    d = Path(_ROOT) / name
    if not d.exists():
        pytest.skip(f"{d} not present")
    return d


_EXPECT = {
    # dataset -> (image_size, channels, n_vars, c normalized near zero-mean)
    "morphomnist": (28, 1, 2),
    "pendulum": (96, 4, 4),
    "circuit": (128, 3, 4),
}


@pytest.mark.parametrize("name", sorted(_EXPECT))
def test_real_archive_loads_and_normalizes(name):
    d = _archive(name)
    import subprocess
    import sys

    script = Path(__file__).resolve().parent.parent / "scripts" / "fetch_data.py"
    proc = subprocess.run(
        [sys.executable, str(script), name, "--out", str(d), "--verify-only"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout


@pytest.mark.parametrize("name", sorted(_EXPECT))
def test_real_archive_trains(name):
    """Two real train steps on the real archive: finite loss, c stats sane."""
    d = _archive(name)
    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import PRESETS, create_diffusion, create_model
    from causaldiffae_tpu.data import load_data
    from causaldiffae_tpu.training import (create_train_state, make_optimizer,
                                           make_train_step)

    size, ch, n_vars = _EXPECT[name]
    cfg = PRESETS[f"{name}_causaldae"].replace(batch_size=8)
    it = load_data(data_dir=str(d), batch_size=8, image_size=cfg.image_size,
                   native=False)
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    assert batch["image"].shape == (8, size, size, ch)
    assert batch["c"].shape == (8, n_vars)
    # reference normalization keeps c roughly standardized
    assert float(jnp.abs(batch["c"]).max()) < 10.0

    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model, diffusion, tx))
    for _ in range(2):
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


# ---- fetch_data.py unit tests (no archives or egress needed) ----

@pytest.fixture
def fake_dataset(tmp_path, monkeypatch):
    """A fabricated one-zip dataset entry in fetch_data.DATASETS."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import fetch_data as fd

    import zipfile

    out = tmp_path / "data"
    out.mkdir()
    z = out / "fake.zip"
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("member.txt", "hello")
    monkeypatch.setitem(fd.DATASETS, "faketest", {
        # unroutable port: any attempted download fails fast
        "urls": ["http://127.0.0.1:1/fake.zip"],
        "sha256": {},
        "layout": ["member.txt"],
    })
    return fd, out, z, fd.sha256_file(z)


def test_fetch_present_unpinned_is_actionable_not_redownload(fake_dataset, capsys):
    fd, out, z, digest = fake_dataset
    rc = fd.fetch("faketest", out, trust_unpinned=False, sha_override="")
    msg = capsys.readouterr().out
    assert rc == 1 and digest in msg and "--trust-unpinned" in msg
    assert z.exists()  # the manual download is not clobbered or deleted


def test_fetch_extracts_already_present_archive(fake_dataset):
    """A checksum-OK archive from a manual download or interrupted run must
    still be extracted (the old flow `continue`d straight past extraction,
    so verify() failed on a perfectly good zip)."""
    fd, out, z, digest = fake_dataset
    member = out / "member.txt"
    assert not member.exists()
    rc = fd.fetch("faketest", out, trust_unpinned=False, sha_override=digest)
    assert rc == 0 and member.exists()


def test_fetch_trust_unpinned_accepts_present_archive(fake_dataset):
    fd, out, z, _ = fake_dataset
    rc = fd.fetch("faketest", out, trust_unpinned=True, sha_override="")
    assert rc == 0 and (out / "member.txt").exists()


def test_fetch_sha_override_rejected_for_multifile_dataset(fake_dataset, capsys):
    fd, out, z, digest = fake_dataset
    fd.DATASETS["faketest"]["urls"] = list(fd.DATASETS["faketest"]["urls"]) + [
        "http://127.0.0.1:1/other.zip"]
    rc = fd.fetch("faketest", out, trust_unpinned=False, sha_override=digest)
    assert rc == 1 and "ambiguous" in capsys.readouterr().out
