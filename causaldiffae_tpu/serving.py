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

__all__ = ["export_artifact", "load_artifact", "export_compiled_artifact",
           "load_compiled_artifact", "MANIFEST_SUFFIX", "COMPILED_SUFFIX"]

MANIFEST_SUFFIX = ".json"
COMPILED_SUFFIX = ".xc"


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


def export_compiled_artifact(fn: Callable, example_args: Tuple,
                             out_path: str) -> int:
    """AOT-compile ``fn`` and serialize the COMPILED executable.

    The cold-start answer for long chains: a deserialized StableHLO
    artifact recompiles on its first call and skips the persistent
    compilation cache (minutes for a 250-step chain, RESULTS.md serving
    table); a serialized executable skips XLA entirely — load + first call
    is execute-only. The flip side is portability: the binary targets the
    platform (and device assembly) it was compiled on, so ship it NEXT TO
    the ``.shlo`` (same stem + ``.xc``), never instead of it —
    ``scripts/serve.py`` prefers the sibling ``.xc`` when the backend
    matches and falls back to the portable StableHLO otherwise.
    """
    import pickle

    from jax.experimental import serialize_executable as se

    compiled = jax.jit(fn).lower(*example_args).compile()
    payload, in_tree, out_tree = se.serialize(compiled)
    blob = pickle.dumps({
        "payload": payload, "in_tree": in_tree, "out_tree": out_tree,
        "platform": jax.default_backend(),
        # serving fns are single-device jit programs; the loader must pin
        # execution to that many devices (deserialize_and_load defaults to
        # ALL visible devices, which breaks on multi-device hosts)
        "n_devices": 1,
    })
    p = Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(blob)
    return len(blob)


def load_compiled_artifact(path: str) -> Callable:
    """Load a serialized executable -> ready-to-run callable (no compile).

    Raises ``ValueError`` when the current backend doesn't match the
    compile-time platform/device count — callers fall back to the portable
    ``.shlo`` artifact."""
    import pickle

    from jax.experimental import serialize_executable as se

    d = pickle.loads(Path(path).read_bytes())
    if d.get("platform") != jax.default_backend():
        raise ValueError(
            f"compiled artifact targets platform {d.get('platform')!r}; "
            f"current backend is {jax.default_backend()!r}")
    n = d.get("n_devices") or 1
    if n > jax.device_count():
        raise ValueError(
            f"compiled artifact targets {n} devices; "
            f"{jax.device_count()} visible")
    return se.deserialize_and_load(d["payload"], d["in_tree"], d["out_tree"],
                                   execution_devices=jax.devices()[:n])


def load_artifact(path: str) -> Tuple[Callable, Dict[str, Any]]:
    """Deserialize a serving artifact -> (callable, manifest).

    The callable takes the positional array arguments described by
    ``manifest['inputs']`` and needs no model code or checkpoint files."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    mpath = Path(str(path) + MANIFEST_SUFFIX)
    manifest = json.loads(mpath.read_text()) if mpath.exists() else {}
    return jax.jit(exported.call), manifest
