"""Cross-stack data-layer parity: our loaders vs the reference's torch Datasets.

VERDICT round-2 item 2: instantiate the reference's `MorphoMNISTLike`,
`SyntheticLabeled`, and `CausalCircuit`
(`/root/reference/improved_diffusion/image_datasets.py:241-498`) on the same
fabricated archives the loader tests use, and assert elementwise equality
(after NCHW->NHWC) of images, labels, and conditioning vectors against
`causaldiffae_tpu/data/loaders.py`. This converts "semantics preserved" for
the data layer from citation to proof.

Import shims (the reference assumes an environment this test documents):

- ``mpi4py`` / ``blobfile``: stubbed (only touched by `load_data`, not by
  the Dataset classes under test).
- ``torchvision.transforms``: Compose/ToTensor/Resize reimplemented here to
  torchvision's documented PIL semantics (ToTensor: uint8 HWC -> float32
  CHW / 255; Resize(int): smaller edge -> size, other edge scaled with
  int() truncation, PIL BILINEAR, no-op if already at size). The resize
  fixture is deliberately NON-square so a size-rounding divergence fails.
- ``image_datasets.io``: the reference's own `from datasets.morphomnist
  import io` is commented out (`image_datasets.py:14-15`) so its shipped
  `io.load_idx` call hits the stdlib io module and crashes; we patch in an
  IDX codec namespace so the class is runnable at all.

Known, deliberate divergence (asserted below, not hidden): for MorphoMNIST
the reference computes the normalized morphometrics (`scaled_item`,
`image_datasets.py:276`) and then DROPS them, emitting raw thickness/
intensity as ``c`` (`:279,294`). Our loader emits the normalized values -
the convention the rest of the reference (eval intervention values ~0.2,
`image_causaldae_test.py:408`; the label-aligned latent prior with identity
scale, `gaussian_diffusion.py:729-739`) is written against. The test pins
the exact relationship: ours == (theirs - loc) / scale.
"""

import io as _stdio
import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

if not reference_available():
    pytest.skip("reference repo not mounted", allow_module_level=True)

torch = pytest.importorskip("torch")
PIL = pytest.importorskip("PIL")
from PIL import Image

from causaldiffae_tpu.config import DATA_SCALES
from causaldiffae_tpu.data import save_idx
from causaldiffae_tpu.data.loaders import (
    load_circuit,
    load_idx,
    load_morphomnist,
    load_pendulum,
)


# --------------------------------------------------------------------- #
# import shims for the reference module
# --------------------------------------------------------------------- #
def _install_stubs():
    if "mpi4py" not in sys.modules:
        mpi = types.ModuleType("mpi4py")

        class _Comm:
            def Get_rank(self):
                return 0

            def Get_size(self):
                return 1

        mpi.MPI = types.SimpleNamespace(COMM_WORLD=_Comm())
        sys.modules["mpi4py"] = mpi

    if "blobfile" not in sys.modules:
        bf = types.ModuleType("blobfile")
        bf.basename = os.path.basename
        bf.listdir = os.listdir
        bf.join = os.path.join
        bf.isdir = os.path.isdir
        bf.BlobFile = open
        sys.modules["blobfile"] = bf

    # augment (never skip): test_diffusion_branches installs a bare
    # torchvision stub for the reference's train_util; if that ran first in
    # the same session, .transforms would be missing and the reference's
    # `from torchvision import transforms` would fail
    if getattr(sys.modules.get("torchvision"), "transforms", None) is None:
        # prefer the REAL torchvision when the environment has one (its
        # Resize is then an independent implementation, making the circuit
        # resize parity check non-self-referential); only stub when absent
        # or already shadowed by another test's stub
        import importlib.util

        if ("torchvision" not in sys.modules
                and importlib.util.find_spec("torchvision") is not None):
            import torchvision  # noqa: F401  (registers the real package)
            return
        # NOTE: this stub's Resize reimplements the same int-truncation
        # aspect formula as data/loaders.load_circuit, so with the stub the
        # circuit test proves ref-class-vs-loader equality only modulo that
        # shared reading of PIL semantics; environments with torchvision
        # installed exercise the real transform via the branch above
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class ToTensor:
            def __call__(self, pic):
                arr = np.array(pic, dtype=np.uint8, copy=True)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
                return t.to(dtype=torch.float32).div(255)

        class Resize:
            def __init__(self, size):
                self.size = size

            def __call__(self, img):
                w, h = img.size
                s = self.size
                if (w <= h and w == s) or (h <= w and h == s):
                    return img
                if w < h:
                    ow, oh = s, int(s * h / w)
                else:
                    oh, ow = s, int(s * w / h)
                return img.resize((ow, oh), Image.BILINEAR)

        tr.Compose, tr.ToTensor, tr.Resize = Compose, ToTensor, Resize
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


@pytest.fixture(scope="module")
def ref_datasets():
    _install_stubs()
    sys.path.insert(0, str(REFERENCE_ROOT))
    import improved_diffusion.image_datasets as ref_ds

    # the reference's `io.load_idx` resolves to the stdlib io module (its
    # morphomnist import is commented out); give it a working codec
    ref_ds.io = types.SimpleNamespace(
        load_idx=load_idx, save_idx=save_idx, BytesIO=_stdio.BytesIO
    )
    return ref_ds


def _nchw_to_nhwc(x: torch.Tensor) -> np.ndarray:
    return np.asarray(x).transpose(1, 2, 0)


# --------------------------------------------------------------------- #
# fixtures: same fabricated archives as tests/test_loaders.py
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def morphomnist_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity") / "morphomnist_data"
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


@pytest.fixture(scope="module")
def pendulum_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("parity") / "pendulum"
    rng = np.random.RandomState(1)
    for split in ("train", "test"):
        sd = d / split
        sd.mkdir(parents=True)
        for i in range(6):
            arr = rng.randint(0, 255, size=(96, 96, 4), dtype=np.uint8)
            Image.fromarray(arr, "RGBA").save(
                sd / f"a_{i * 5 - 20}_{90 + i}_{6}_{12 + i}.png")
    return str(d)


@pytest.fixture(scope="module")
def circuit_root(tmp_path_factory):
    # the reference CausalCircuit HARDCODES '../datasets/causal_circuit/*'
    # relative to the CWD (`image_datasets.py:419,440`); lay the archives out
    # that way and chdir during construction. Frames are NON-square (48x64)
    # so resize-semantics divergence fails loudly.
    base = tmp_path_factory.mktemp("parity_circ")
    d = base / "datasets" / "causal_circuit"
    d.mkdir(parents=True)
    (base / "cwd").mkdir()
    rng = np.random.RandomState(2)

    def make_npz(path, n):
        # the reference np.loads WITHOUT allow_pickle, so the real archives'
        # `imgs` must be a bytes ('S') array, not dtype=object; fabricate the
        # same (PNG streams end in IEND+CRC 0x82, so 'S' null-stripping is
        # lossless)
        blobs = [[_png_bytes(rng) for _ in range(2)] for _ in range(n)]
        imgs = np.array(blobs, dtype=bytes)
        latents = rng.rand(n, 2, 4)
        np.savez(path, imgs=imgs, original_latents=latents)

    def _png_bytes(rng):
        arr = rng.randint(0, 255, size=(64, 48, 3), dtype=np.uint8)
        buf = _stdio.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    for k in range(5):
        make_npz(d / f"train-{k}.npz", 2)
    make_npz(d / "test.npz", 2)
    return base


# --------------------------------------------------------------------- #
def test_morphomnist_parity(ref_datasets, morphomnist_dir):
    ref = ref_datasets.MorphoMNISTLike(
        morphomnist_dir, train=True, columns=["thickness", "intensity"])
    ours = load_morphomnist(morphomnist_dir, train=True)
    assert len(ref) == len(ours["image"])

    scale = np.asarray(DATA_SCALES["morphomnist"], dtype=np.float64)
    for i in range(len(ref)):
        img, out = ref[i]
        np.testing.assert_array_equal(_nchw_to_nhwc(img), ours["image"][i])
        assert out["y"] == ours["y"][i]
        # deliberate divergence, pinned: the reference emits RAW
        # thickness/intensity (its normalized `scaled_item` is dead code,
        # `image_datasets.py:276-279`); ours emits the normalized values
        raw = out["c"].astype(np.float64)
        np.testing.assert_allclose(
            ours["c"][i], (raw - scale[:, 0]) / scale[:, 1], rtol=1e-5)
        # and our normalization IS the formula the reference computes+drops
        ref_scaled = np.array(
            [(raw[j] - ref.scale[col][0]) / ref.scale[col][1]
             for j, col in enumerate(("thickness", "intensity"))])
        np.testing.assert_allclose(ours["c"][i], ref_scaled, rtol=1e-5)


def test_pendulum_parity(ref_datasets, pendulum_dir):
    ref = ref_datasets.SyntheticLabeled(pendulum_dir, split="train")
    ours = load_pendulum(pendulum_dir, split="train")
    assert len(ref) == len(ours["image"])

    # the reference indexes os.listdir order (unsorted); ours sorts the
    # filenames. Compare as label-keyed sets: sort both sides by c rows.
    ref_imgs, ref_cs = [], []
    for i in range(len(ref)):
        img, out = ref[i]
        ref_imgs.append(_nchw_to_nhwc(img))
        ref_cs.append(out["c"])
    ref_imgs, ref_cs = np.stack(ref_imgs), np.stack(ref_cs)

    order_ref = np.lexsort(ref_cs.T[::-1])
    order_ours = np.lexsort(ours["c"].T[::-1])
    np.testing.assert_allclose(
        ref_cs[order_ref], ours["c"][order_ours], rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(
        ref_imgs[order_ref], ours["image"][order_ours])


@pytest.mark.parametrize("split", ["train", "test"])
def test_circuit_parity(ref_datasets, circuit_root, split):
    cwd = os.getcwd()
    os.chdir(circuit_root / "cwd")
    try:
        ref = ref_datasets.CausalCircuit(
            str(circuit_root / "datasets" / "causal_circuit"), dataset=split)
        ref_rows = [ref[i] for i in range(len(ref))]
    finally:
        os.chdir(cwd)
    ours = load_circuit(str(circuit_root / "datasets" / "causal_circuit"),
                        split=split, image_size=128)
    assert len(ref_rows) == len(ours["image"])
    for i, (img, out) in enumerate(ref_rows):
        np.testing.assert_array_equal(_nchw_to_nhwc(img), ours["image"][i])
        np.testing.assert_allclose(out["c"], ours["c"][i], rtol=1e-6)
