"""Native C++ loader tests: build, gunzip parity, gather parity, prefetch."""

import gzip

import numpy as np
import pytest

from causaldiffae_tpu.data.native_loader import (
    NativeBatchIterator,
    gather_normalize,
    gunzip_file,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="g++/zlib unavailable")


def test_gunzip_matches_python(tmp_path):
    payload = bytes(range(256)) * 1000
    p = tmp_path / "x.gz"
    with gzip.open(p, "wb") as f:
        f.write(payload)
    assert gunzip_file(str(p)) == payload


def test_gather_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(100, 7, 7, 3), dtype=np.uint8)
    idx = rng.randint(0, 100, size=32).astype(np.int64)
    got = gather_normalize(images, idx, scale=1.0 / 255.0, offset=0.0, threads=3)
    ref = images[idx].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, ref, atol=1e-7)
    # affine variant ([-1, 1] scaling)
    got2 = gather_normalize(images, idx, scale=1.0 / 127.5, offset=-1.0)
    np.testing.assert_allclose(got2, images[idx].astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_prefetch_iterator_batches():
    rng = np.random.RandomState(1)
    n = 64
    images = rng.randint(0, 256, size=(n, 5, 5, 1), dtype=np.uint8)
    c = rng.rand(n, 2).astype(np.float32)
    y = rng.randint(0, 10, size=n).astype(np.int64)
    it = NativeBatchIterator(images, batch_size=16, c=c, y=y, seed=0, threads=2)
    seen = []
    for _ in range(8):  # 2 epochs worth
        b = next(it)
        assert b["image"].shape == (16, 5, 5, 1)
        assert b["image"].dtype == np.float32
        assert b["c"].shape == (16, 2) and b["y"].shape == (16,)
        assert b["image"].min() >= 0.0 and b["image"].max() <= 1.0
        # every batch row must correspond to a real sample (match by content)
        flat = images.reshape(n, -1).astype(np.float32) / 255.0
        for row in b["image"].reshape(16, -1):
            dists = np.abs(flat - row).sum(axis=1)
            assert dists.min() < 1e-5
        seen.append(b["image"].sum())
    it.close()
    # shuffling: not all batches identical
    assert len({round(float(s), 3) for s in seen}) > 1
