"""Real-dataset loaders: MorphoMNIST, Pendulum, CausalCircuit, image folders.

Rebuild of reference `improved_diffusion/image_datasets.py` as host-side
numpy pipelines feeding the device: each loader materializes (or memory-maps)
the full dataset once, then an infinite shuffled batch iterator yields
``{'image': [B,H,W,C] float32, 'y': [B], 'c': [B,n]}`` dicts - NHWC (TPU
layout) instead of the reference's NCHW tensors.

Semantics preserved:
- MorphoMNIST: idx.gz images/labels + morphometrics CSV; images scaled /255
  (NOT [-1,1]); c = normalized [thickness, intensity] with scale
  {'thickness': [3.4, 2.4], 'intensity': [161, 94]} (`image_datasets.py:241-296`).
- Pendulum: 96x96 RGBA PNGs named ``*_angle_light_len_pos.png``, labels
  parsed from the filename and normalized by [[2,42],[104,44],[7.5,4.5],[11,8]]
  (`image_datasets.py:344-391`).
- CausalCircuit: ``train-{0..4}.npz`` / ``test.npz`` with PNG-encoded imgs
  and latents permuted [3,2,1,0] -> [arm, blue, green, red], resized to 128
  (`image_datasets.py:411-498`).
- Generic folder loader: BOX halving + BICUBIC resize + center crop, scaled
  to [-1,1] (`image_datasets.py:141-180`, the celeba path).
- Rank sharding by ``[shard::num_shards]`` slicing (`image_datasets.py:145-146`)
  driven by jax.process_index() instead of MPI rank.
"""

from __future__ import annotations

import gzip
import io as _io
import os
import struct
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from ..config import DATA_SCALES

__all__ = ["load_idx", "save_idx", "load_morphomnist", "load_pendulum",
           "load_circuit", "load_image_folder", "batch_iterator",
           "make_data_iterator", "load_data"]


# --------------------------------------------------------------------- #
# IDX (MNIST archive) codec - replaces the external `morphomnist.io` dep
# --------------------------------------------------------------------- #
_IDX_DTYPES = {0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16,
               0x0C: np.int32, 0x0D: np.float32, 0x0E: np.float64}


def load_idx(path: str) -> np.ndarray:
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rb") as f:
        zeros, dtype_code, ndim = struct.unpack("HBB", f.read(4))
        assert zeros == 0, "invalid IDX magic"
        dtype = _IDX_DTYPES[dtype_code]
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.dtype(dtype).newbyteorder(">"))
    return data.reshape(shape)


def save_idx(arr: np.ndarray, path: str) -> None:
    code = {v: k for k, v in _IDX_DTYPES.items()}[arr.dtype.type]
    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(struct.pack("HBB", 0, code, arr.ndim))
        f.write(struct.pack(">" + "I" * arr.ndim, *arr.shape))
        f.write(np.ascontiguousarray(arr, dtype=np.dtype(arr.dtype).newbyteorder(">")).tobytes())


def _shard(arrs: Dict[str, np.ndarray], shard: int, num_shards: int):
    return {k: v[shard:][::num_shards] for k, v in arrs.items()}


def _proc_shard():
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


# --------------------------------------------------------------------- #
def load_morphomnist(root: str, train: bool = True,
                     columns=("thickness", "intensity")) -> Dict[str, np.ndarray]:
    prefix = "train" if train else "t10k"
    images = load_idx(os.path.join(root, f"{prefix}-images-idx3-ubyte.gz"))
    labels = load_idx(os.path.join(root, f"{prefix}-labels-idx1-ubyte.gz"))
    import pandas as pd

    metrics = pd.read_csv(os.path.join(root, f"{prefix}-morpho.csv"), index_col="index")
    scale = dict(zip(("thickness", "intensity"), DATA_SCALES["morphomnist"]))
    c = np.stack(
        [(metrics[col].to_numpy() - scale[col][0]) / scale[col][1] for col in columns], -1
    ).astype(np.float32)
    return {
        "image": (images.astype(np.float32) / 255.0)[..., None],
        "y": labels.astype(np.int64),
        "c": c,
    }


def load_pendulum(root: str, split: str = "train") -> Dict[str, np.ndarray]:
    from PIL import Image

    d = Path(root) / split
    files = sorted(os.listdir(d))
    scale = np.asarray(DATA_SCALES["pendulum"])
    images, labels = [], []
    for name in files:
        if not name.lower().endswith(".png"):
            continue
        parts = name[:-4].split("_")[1:]
        labels.append([int(p) for p in parts])
        with Image.open(d / name) as im:
            images.append(np.asarray(im.convert("RGBA"), dtype=np.float32) / 255.0)
    labels = np.asarray(labels, dtype=np.float32)
    c = (labels - scale[:, 0]) / scale[:, 1]
    return {"image": np.stack(images), "c": c.astype(np.float32)}


def _circuit_regime_mask(lat: np.ndarray) -> np.ndarray:
    """The 'simplified' filtered-regime selection (reference
    `CausalCircuitSimplified`, `image_datasets.py:502-610`): three disjoint
    arm-position bands with specific light configurations. ``lat`` is in the
    RAW latent order [red, green, blue, arm] (pre-permutation)."""
    r1 = (lat[:, 3] > 0.1) & (lat[:, 3] < 0.4) & (lat[:, 0] > 0.5) & (lat[:, 1] > 0.4) & (lat[:, 2] < 0.2)
    r2 = (lat[:, 3] > 0.4) & (lat[:, 3] < 0.7) & (lat[:, 0] > 0.5) & (lat[:, 2] < 0.2) & (lat[:, 1] < 0.2)
    r3 = (lat[:, 3] > 0.7) & (lat[:, 3] < 1.0) & (lat[:, 0] > 0.5) & (lat[:, 2] > 0.4) & (lat[:, 1] < 0.2)
    return r1 | r2 | r3


def load_circuit(root: str, split: str = "train", image_size: int = 128,
                 simplified: bool = False) -> Dict[str, np.ndarray]:
    from PIL import Image

    root = Path(root)
    files = [root / "test.npz"] if split == "test" else [root / f"train-{k}.npz" for k in range(5)]
    images, labels = [], []
    perm = [3, 2, 1, 0]  # -> [arm, blue, green, red]
    # simplified uses both stored frames per episode (image_datasets.py:513-517)
    frames = (0, 1) if simplified else (0,)
    for f in files:
        data = np.load(f, allow_pickle=True)
        for frame in frames:
            lat = data["original_latents"][:, frame, :]
            imgs = data["imgs"][:, frame]
            keep = _circuit_regime_mask(lat) if simplified else np.ones(len(imgs), bool)
            for i in np.nonzero(keep)[0]:
                with Image.open(_io.BytesIO(imgs[i])) as im:
                    im = im.convert("RGB")
                    # torchvision Resize(int) PIL semantics (the reference's
                    # transform, `image_datasets.py:463`): smaller edge ->
                    # image_size, other edge scaled with int() truncation,
                    # no-op when the smaller edge already matches
                    w, h = im.size
                    if not ((w <= h and w == image_size) or (h <= w and h == image_size)):
                        if w < h:
                            ow, oh = image_size, int(image_size * h / w)
                        else:
                            oh, ow = image_size, int(image_size * w / h)
                        im = im.resize((ow, oh), Image.BILINEAR)
                    images.append(np.asarray(im, dtype=np.float32) / 255.0)
                labels.append(lat[i][perm])
    return {"image": np.stack(images), "c": np.asarray(labels, dtype=np.float32)}


def load_image_folder(root: str, image_size: int, class_cond: bool = False) -> Dict[str, np.ndarray]:
    """Generic folder loader (the reference's celeba path, [-1,1] scaled)."""
    from PIL import Image

    paths = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            if f.split(".")[-1].lower() in ("jpg", "jpeg", "png", "gif"):
                paths.append(os.path.join(dirpath, f))
    images, classes = [], []
    class_names = sorted({os.path.basename(p).split("_")[0] for p in paths}) if class_cond else []
    class_idx = {n: i for i, n in enumerate(class_names)}
    for p in paths:
        with Image.open(p) as im:
            im.load()
            while min(*im.size) >= 2 * image_size:
                im = im.resize(tuple(x // 2 for x in im.size), Image.BOX)
            s = image_size / min(*im.size)
            im = im.resize(tuple(round(x * s) for x in im.size), Image.BICUBIC)
            arr = np.asarray(im.convert("RGB"))
        cy = (arr.shape[0] - image_size) // 2
        cx = (arr.shape[1] - image_size) // 2
        arr = arr[cy:cy + image_size, cx:cx + image_size]
        images.append(arr.astype(np.float32) / 127.5 - 1.0)
        if class_cond:
            classes.append(class_idx[os.path.basename(p).split("_")[0]])
    out = {"image": np.stack(images)}
    if class_cond:
        out["y"] = np.asarray(classes, dtype=np.int64)
    return out


# --------------------------------------------------------------------- #
def batch_iterator(data: Dict[str, np.ndarray], batch_size: int, seed: int = 0,
                   shuffle: bool = True, drop_last: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite epoch-shuffled batch iterator (replaces torch DataLoader)."""
    n = len(data["image"])
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.permutation(n) if shuffle else np.arange(n)
        end = (n // batch_size) * batch_size if drop_last else n
        for i in range(0, end, batch_size):
            sel = idx[i:i + batch_size]
            yield {k: v[sel] for k, v in data.items()}


def _uint8_pool(images: np.ndarray):
    """Recover the 8-bit source grid from normalized float images.

    Returns ``(u8, scale, offset)`` with ``u8 * scale + offset == images``
    (to float32 rounding), or None when the images do not sit exactly on an
    8-bit grid. All four real loaders decode 8-bit sources, so this is exact
    for them; the [-1,1] folder path uses scale 1/127.5.
    """
    images = np.asarray(images)
    if images.dtype == np.uint8:
        return images, 1.0 / 255.0, 0.0
    if float(images.min()) < 0.0:
        scale, offset = 1.0 / 127.5, -1.0
    else:
        scale, offset = 1.0 / 255.0, 0.0
    u8f = np.rint((images - offset) / scale)
    if float(u8f.min()) < 0 or float(u8f.max()) > 255:
        return None
    u8 = u8f.astype(np.uint8)
    # verify exactness on a bounded random sample (full pass is wasteful for
    # multi-GB pools; any non-quantized pool fails on essentially any sample)
    rng = np.random.RandomState(0)
    sel = rng.randint(0, len(images), size=min(len(images), 256))
    recon = u8[sel].astype(np.float32) * np.float32(scale) + np.float32(offset)
    if not np.allclose(recon, images[sel], atol=2e-6):
        return None
    return u8, scale, offset


def make_data_iterator(data: Dict[str, np.ndarray], batch_size: int, seed: int = 0,
                       shuffle: bool = True, native: Optional[bool] = None,
                       threads: int = 4) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator with automatic native-C++ prefetch routing.

    When the native loader is built (`causaldiffae_tpu/native/fastloader.cpp`) and the image
    pool sits on an 8-bit grid, batches are assembled + normalized on C++
    worker threads with one batch always prefetched (uint8 pool = 4x less
    host RAM, no GIL in the feed path). Falls back to the numpy
    `batch_iterator` otherwise. ``native=False`` forces the numpy path,
    ``native=True`` raises if the native path cannot be used.
    """
    from .native_loader import NativeBatchIterator, native_available

    if native and not shuffle:
        raise ValueError("native loader is shuffle-only (epoch-permutation "
                         "prefetcher); use the numpy path for deterministic order")
    if native is not False and shuffle:
        if native_available():
            pool = _uint8_pool(data["image"])
            if pool is not None:
                u8, scale, offset = pool
                return NativeBatchIterator(
                    u8, batch_size, c=data.get("c"), y=data.get("y"),
                    scale=scale, offset=offset, seed=seed, threads=threads,
                )
            if native:
                raise ValueError("images are not 8-bit-quantized; "
                                 "native loader cannot serve this pool")
        elif native:
            raise RuntimeError("native loader unavailable (no compiler?)")
    return batch_iterator(data, batch_size, seed=seed, shuffle=shuffle)


def load_data(*, data_dir: str, batch_size: int, image_size: int,
              class_cond: bool = False, split: str = "train",
              deterministic: bool = False, seed: int = 0,
              native: Optional[bool] = None) -> Iterator[Dict[str, np.ndarray]]:
    """Dispatcher keyed on the directory name (reference `image_datasets.py:69-126`),
    with per-process sharding for multi-host training. The training feed goes
    through the native C++ prefetch loader when available (see
    `make_data_iterator`).

    ``batch_size`` is the GLOBAL batch: in multi-host mode each process keeps
    only its ``[shard::num_shards]`` dataset slice and yields
    ``batch_size // num_shards`` rows per batch, which
    ``parallel.mesh.shard_host_local`` assembles into the global on-mesh
    array. (Deviation from the reference, where the flag is per-rank and the
    global batch is batch×world, `train_util.py:78`.)
    """
    if not data_dir:
        raise ValueError("unspecified data directory")
    shard, num_shards = _proc_shard()
    if batch_size % num_shards != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by process count {num_shards}")
    batch_size //= num_shards
    if "morphomnist" in data_dir:
        data = load_morphomnist(data_dir, train=(split == "train"))
    elif "pendulum" in data_dir:
        data = load_pendulum(data_dir, split=split)
    elif "circuit" in data_dir:
        data = load_circuit(data_dir, split=split, image_size=image_size)
    else:
        data = load_image_folder(data_dir, image_size, class_cond=class_cond)
    data = _shard(data, shard, num_shards)
    return make_data_iterator(data, batch_size, seed=seed,
                              shuffle=not deterministic, native=native)
