"""Self-contained serving artifacts via ``jax.export``.

Deployment story the reference lacks entirely: a trained counterfactual
generator / reconstructor / prior sampler is lowered to StableHLO with the
checkpoint's weights baked in as constants and serialized to one file. The
artifact is loadable and callable WITHOUT this package's model code (any
process with jax installed: ``causaldiffae_tpu.serving.load_artifact`` is a
thin wrapper over ``jax.export.deserialize``), pinning both the program and
the weights for reproducible serving. Built by ``scripts/export_serving.py``.

Portability note: the artifact is lowered for the platform it was exported
on (recorded in the manifest). Export on TPU for TPU serving — the Pallas
attention custom-call serializes with it; export with ``--use_pallas false``
for a pure-StableHLO program that any backend can load.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Tuple

import jax

__all__ = ["export_artifact", "load_artifact", "MANIFEST_SUFFIX"]

MANIFEST_SUFFIX = ".json"


def export_artifact(fn: Callable, example_args: Tuple, out_path: str,
                    manifest: Dict[str, Any]) -> Dict[str, Any]:
    """Lower ``fn`` at ``example_args``'s shapes/dtypes, serialize, and write
    ``out_path`` (+ a ``<out_path>.json`` manifest). Returns the manifest."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    payload = exported.serialize()
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(payload)

    def _shape(aval):
        # symbolic dims (shape-polymorphic exports) serialize as strings
        return [d if isinstance(d, int) else str(d) for d in aval.shape]

    manifest = dict(manifest)
    manifest["platforms"] = list(exported.platforms)
    manifest["inputs"] = [
        {"name": n, "shape": _shape(a), "dtype": str(a.dtype)}
        for n, a in zip(manifest.pop("input_names"), exported.in_avals)
    ]
    manifest["outputs"] = [
        {"shape": _shape(s), "dtype": str(s.dtype)}
        for s in exported.out_avals
    ]
    manifest["bytes"] = len(payload)
    Path(str(p) + MANIFEST_SUFFIX).write_text(json.dumps(manifest, indent=2))
    return manifest


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize a serving artifact -> (callable, manifest).

    The callable takes the positional array arguments described by
    ``manifest['inputs']`` and needs no model code or checkpoint files."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    mpath = Path(str(path) + MANIFEST_SUFFIX)
    manifest = json.loads(mpath.read_text()) if mpath.exists() else {}
    return jax.jit(exported.call), manifest
