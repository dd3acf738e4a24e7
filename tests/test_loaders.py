"""Real-format loader tests against fabricated on-disk datasets.

Builds tiny datasets in the reference's exact storage formats (MorphoMNIST
idx.gz + morphometrics CSV, Pendulum label-in-filename PNGs, CausalCircuit
npz with PNG-encoded frames) and checks shapes, normalization, sharding,
and dispatcher routing.
"""

import gzip
import io

import numpy as np
import pytest

from causaldiffae_tpu.config import DATA_SCALES
from causaldiffae_tpu.data import load_data, save_idx
from causaldiffae_tpu.data.loaders import (
    load_circuit,
    load_morphomnist,
    load_pendulum,
)

PIL = pytest.importorskip("PIL")
from PIL import Image


@pytest.fixture
def morphomnist_dir(tmp_path):
    d = tmp_path / "morphomnist_data"
    d.mkdir()
    n = 12
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(n, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, size=(n,)).astype(np.uint8)
    for prefix in ("train", "t10k"):
        save_idx(images, str(d / f"{prefix}-images-idx3-ubyte.gz"))
        save_idx(labels, str(d / f"{prefix}-labels-idx1-ubyte.gz"))
        rows = ["index,area,length,thickness,slant,width,height,intensity"]
        for i in range(n):
            rows.append(f"{i},10,20,{2.0 + i * 0.1},0,5,5,{100 + i * 5}")
        (d / f"{prefix}-morpho.csv").write_text("\n".join(rows))
    return str(d)


def test_morphomnist_loader(morphomnist_dir):
    data = load_morphomnist(morphomnist_dir, train=True)
    assert data["image"].shape == (12, 28, 28, 1)
    assert data["image"].dtype == np.float32
    assert 0.0 <= data["image"].min() and data["image"].max() <= 1.0
    # normalization: thickness (t - 3.4)/2.4
    t0 = (2.0 - 3.4) / 2.4
    np.testing.assert_allclose(data["c"][0, 0], t0, rtol=1e-5)
    i0 = (100 - 161.0) / 94.0
    np.testing.assert_allclose(data["c"][0, 1], i0, rtol=1e-5)
    assert data["y"].dtype == np.int64


def test_load_data_dispatcher_and_sharding(morphomnist_dir):
    it = load_data(data_dir=morphomnist_dir, batch_size=4, image_size=28)
    b = next(it)
    assert b["image"].shape == (4, 28, 28, 1)
    assert set(b) == {"image", "y", "c"}


@pytest.fixture
def pendulum_dir(tmp_path):
    d = tmp_path / "pendulum"
    for split in ("train", "test"):
        sd = d / split
        sd.mkdir(parents=True)
        rng = np.random.RandomState(1)
        for i in range(6):
            arr = rng.randint(0, 255, size=(96, 96, 4), dtype=np.uint8)
            # filename: a_<angle>_<light>_<shadow_len>_<shadow_pos>.png
            Image.fromarray(arr, "RGBA").save(sd / f"a_{i * 5 - 20}_{90 + i}_{6}_{12}.png")
    return str(d)


def test_pendulum_loader(pendulum_dir):
    data = load_pendulum(pendulum_dir, split="train")
    assert data["image"].shape == (6, 96, 96, 4)
    scale = np.asarray(DATA_SCALES["pendulum"])
    # first file has angle -20 -> (-20 - 2)/42
    got_angles = sorted(data["c"][:, 0])
    assert min(got_angles) == pytest.approx((-20 - 2) / 42, rel=1e-5)


@pytest.fixture
def circuit_dir(tmp_path):
    d = tmp_path / "causal_circuit"
    d.mkdir()
    rng = np.random.RandomState(2)

    def make_npz(path, n):
        imgs = np.empty((n, 2), dtype=object)
        for i in range(n):
            for f in range(2):
                arr = rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="PNG")
                imgs[i, f] = buf.getvalue()
        latents = rng.rand(n, 2, 4)
        np.savez(path, imgs=imgs, original_latents=latents)
        return latents

    lat = {}
    for k in range(5):
        lat[k] = make_npz(d / f"train-{k}.npz", 2)
    make_npz(d / "test.npz", 2)
    return str(d), lat


def test_circuit_loader(circuit_dir):
    root, lat = circuit_dir
    data = load_circuit(root, split="train", image_size=128)
    assert data["image"].shape == (10, 128, 128, 3)
    # permutation [3,2,1,0]: first sample's c == reversed raw latents
    np.testing.assert_allclose(data["c"][0], lat[0][0, 0][::-1], rtol=1e-6)


def test_circuit_simplified_filters(circuit_dir):
    root, _ = circuit_dir
    # random latents mostly fail the regime filter; loader must not crash
    # and must return only regime-matching rows (possibly zero -> stack error
    # guarded by constructing at least one matching sample)
    from causaldiffae_tpu.data.loaders import _circuit_regime_mask

    data_full = load_circuit(root, split="train", image_size=64)
    assert len(data_full["image"]) == 10
