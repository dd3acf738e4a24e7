"""Fetch / verify the three real datasets the reference was developed on.

The reference's README points at the canonical sources (MorphoMNIST:
dccastro/Morpho-MNIST; Pendulum: huawei-noah trustworthyAI CausalVAE
causal_data; CausalCircuit: developer.qualcomm.com) but ships no download
or validation tooling — every user re-derives the layout from
`image_datasets.py`. This script makes the real-data story one command:

    python scripts/fetch_data.py morphomnist --out /data/morphomnist
    python scripts/fetch_data.py --verify-only --out /data/morphomnist morphomnist

``fetch`` downloads with sha256 pinning (refusing unpinned bytes unless
--trust-unpinned, which prints the digest to pin); ``--verify-only`` checks
an already-present directory (mounted archive, manual download) against the
exact layout `causaldiffae_tpu.data.load_data` consumes and loads one batch
through the real pipeline. The archive-gated tests in
`tests/test_real_data.py` run the same validation under pytest the day an
environment has the archives (set CDAE_REAL_DATA_DIR); on air-gapped hosts
they skip cleanly.
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import zipfile
from pathlib import Path

# Canonical sources (reference README.md "Data acknowledgements").
# sha256 values are None where this environment has no egress to pin them:
# the first successful fetch prints the digest; paste it here (or pass
# --sha256) so later fetches are reproducible.
DATASETS = {
    "morphomnist": {
        # the "global" perturbation set is what the reference trains on
        # (thickness/intensity morphometrics, image_datasets.py:241-296)
        "urls": [
            "https://github.com/dccastro/Morpho-MNIST/raw/main/data/global.zip",
        ],
        "sha256": {},
        "layout": [
            "train-images-idx3-ubyte.gz", "train-labels-idx1-ubyte.gz",
            "train-morpho.csv", "t10k-images-idx3-ubyte.gz",
            "t10k-labels-idx1-ubyte.gz", "t10k-morpho.csv",
        ],
    },
    "pendulum": {
        # generated PNGs from the CausalVAE repo (filenames carry the 4
        # factors: *_angle_light_shadowlen_shadowpos.png,
        # image_datasets.py:344-391)
        "urls": [
            "https://github.com/huawei-noah/trustworthyAI/raw/master/"
            "research/CausalVAE/causal_data/pendulum.zip",
        ],
        "sha256": {},
        "layout": ["train", "test"],  # directories of PNGs
    },
    "circuit": {
        # Qualcomm CausalCircuit (Brehmer et al. 2022); hosted behind a
        # license-acceptance page, so often a manual download
        "urls": [
            "https://developer.qualcomm.com/software/ai-datasets/causalcircuit",
        ],
        "sha256": {},
        "layout": ["train-0.npz", "train-1.npz", "train-2.npz",
                   "train-3.npz", "train-4.npz", "test.npz"],
    },
}


def sha256_file(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, out: Path, trust_unpinned: bool, sha_override: str) -> int:
    import urllib.request

    spec = DATASETS[name]
    if sha_override and len(spec["urls"]) > 1:
        # one digest cannot pin several files; a blanket override would
        # checksum-reject every file but the one it was computed from
        print(f"--sha256 is ambiguous for {name} ({len(spec['urls'])} files); "
              f"pin per-file digests in DATASETS['{name}']['sha256'] instead")
        return 1
    out.mkdir(parents=True, exist_ok=True)
    for url in spec["urls"]:
        fname = url.rsplit("/", 1)[-1] or f"{name}.bin"
        dest = out / fname
        pinned = sha_override or spec["sha256"].get(fname)
        have = False
        if dest.exists():
            digest = sha256_file(dest)
            if pinned and digest == pinned:
                print(f"{dest}: already present, checksum OK")
                have = True
            elif pinned:
                print(f"{dest}: present but checksum differs "
                      f"(got {digest}, want {pinned}); re-downloading")
            elif trust_unpinned:
                print(f"{dest}: present, UNPINNED — sha256 {digest}\n"
                      f"  pin it in scripts/fetch_data.py DATASETS['{name}']")
                have = True
            else:
                # manual download without a pin: tell the user how to accept
                # it rather than re-downloading over it
                print(f"{dest}: present but no pinned sha256; re-run with "
                      f"--sha256 {digest} (after checking it against the "
                      f"publisher) or --trust-unpinned")
                return 1
        if not have:
            print(f"fetching {url} -> {dest}")
            try:
                urllib.request.urlretrieve(url, dest)  # noqa: S310 (pinned below)
            except Exception as e:
                print(f"FETCH FAILED ({e}); no egress? Download manually from\n"
                      f"  {url}\ninto {out} and re-run this same command "
                      f"(add --sha256 <digest> or --trust-unpinned to accept "
                      f"the manual file; it will be extracted and verified).")
                return 1
            digest = sha256_file(dest)
            if pinned:
                if digest != pinned:
                    dest.unlink()
                    print(f"CHECKSUM MISMATCH for {fname}: got {digest}, "
                          f"want {pinned}; file deleted")
                    return 1
                print(f"{fname}: checksum OK")
            elif trust_unpinned:
                print(f"{fname}: UNPINNED — sha256 {digest}\n"
                      f"  pin it in scripts/fetch_data.py DATASETS['{name}']")
            else:
                dest.unlink()
                print(f"{fname}: no pinned sha256 and --trust-unpinned not "
                      f"set; downloaded bytes DISCARDED (digest was {digest})")
                return 1
        if dest.suffix == ".zip":
            # always (re-)extract: idempotent, and the archive may be
            # present from an interrupted run or a manual download
            print(f"extracting {dest}")
            with zipfile.ZipFile(dest) as z:
                z.extractall(out)
    return 0


def verify(name: str, out: Path) -> int:
    """Check the on-disk layout and pull one real batch through load_data."""
    spec = DATASETS[name]
    missing = [f for f in spec["layout"] if not (out / f).exists()]
    if missing:
        # zips sometimes nest a top-level dir; look one level down
        subdirs = [d for d in out.iterdir() if d.is_dir()] if out.exists() else []
        for sub in subdirs:
            if all((sub / f).exists() for f in spec["layout"]):
                print(f"layout found under {sub}")
                out, missing = sub, []
                break
    if missing:
        print(f"{name}: MISSING {missing} under {out}")
        return 1

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from causaldiffae_tpu.config import PRESETS
    from causaldiffae_tpu.data import make_data_iterator
    from causaldiffae_tpu.data.loaders import (load_circuit, load_morphomnist,
                                               load_pendulum)

    cfg = PRESETS[f"{name}_causaldae"]
    # call the family loader directly (load_data dispatches on the directory
    # NAME, which a user's mount point need not contain)
    loader = {"morphomnist": lambda: load_morphomnist(str(out)),
              "pendulum": lambda: load_pendulum(str(out)),
              "circuit": lambda: load_circuit(str(out), image_size=cfg.image_size)}
    it = make_data_iterator(loader[name](), 8, native=False)
    batch = next(it)
    img, c = batch["image"], batch["c"]
    print(f"{name}: OK — image {img.shape} {img.dtype} "
          f"range [{img.min():.3f}, {img.max():.3f}], "
          f"c {c.shape} mean {c.mean(axis=0).round(3).tolist()}")
    assert img.shape[1] == cfg.image_size and c.shape[1] == cfg.n_vars
    return 0


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=sorted(DATASETS))
    p.add_argument("--out", required=True, type=Path)
    p.add_argument("--verify-only", action="store_true",
                   help="skip downloading; validate an existing directory")
    p.add_argument("--trust-unpinned", action="store_true",
                   help="keep downloads whose sha256 is not pinned yet "
                        "(prints the digest to pin)")
    p.add_argument("--sha256", default="",
                   help="override/provide the expected archive sha256")
    args = p.parse_args()
    if not args.verify_only:
        rc = fetch(args.dataset, args.out, args.trust_unpinned, args.sha256)
        if rc:
            return rc
    return verify(args.dataset, args.out)


if __name__ == "__main__":
    raise SystemExit(main())
