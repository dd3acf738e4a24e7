"""Tensor-parallel parameter partitioning over the mesh 'model' axis.

The reference's distributed layer is data-parallel only (DDP over gloo/NCCL,
`train_util.py:111-118`); the mesh here has always reserved a 'model' axis.
This module makes it real: Megatron-style column/row sharding of every UNet
ResBlock's conv pair, expressed purely as `PartitionSpec`s on the param
pytree — XLA's SPMD partitioner then inserts the all-reduces over ICI, and
the optimizer/EMA state inherits the same layout (so Adam's m/v and every
EMA copy are sharded too, an automatic ZeRO-3-along-'model' for the bulk of
the parameters).

The rule is data-driven, not a name table: any module whose param dict holds
``Conv3x3_0`` + ``Conv3x3_1`` + ``GroupNorm32_1`` is a ResBlock
(`models/layers.py`), and gets

- ``Conv3x3_0`` (in_layers conv, Cin->Cout): kernel sharded on **Cout**
  (column parallel), bias sharded to match;
- ``GroupNorm32_1`` (the mid GN over the sharded Cout activations):
  scale/bias sharded on the channel dim — group stats stay shard-local as
  long as the per-device channel count is a multiple of the group size,
  i.e. ``model_parallel`` divides 32;
- ``Conv3x3_1`` (out_layers conv, Cout->Cout): kernel sharded on **Cin**
  (row parallel) — its partial outputs are the one all-reduce per block.

Everything else (attention qkv/proj feeding the Pallas custom call, the
tiny time/label embeddings, the encoder, the SCM) stays replicated: the
convs are ~85% of the parameter bytes and >80% of the FLOPs
(RESULTS.md profile), and a Pallas call is opaque to the SPMD partitioner,
so sharding its operands would only buy resharding traffic.

Shapes that don't divide by the model-axis size fall back to replicated
(per-leaf, so one odd head count never poisons the whole tree).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = [
    "unet_param_specs",
    "state_partition_specs",
    "partition_state",
    "count_sharded",
]

_RESBLOCK_KEYS = {"Conv3x3_0", "Conv3x3_1", "GroupNorm32_1"}


def _is_resblock(module: Dict[str, Any]) -> bool:
    return isinstance(module, dict) and _RESBLOCK_KEYS.issubset(module.keys())


def _resblock_specs(module: Dict[str, Any], size: int) -> Dict[str, Any]:
    """Specs for one ResBlock param dict (replicated unless the pair fits)."""
    k1 = module["Conv3x3_0"]["Conv_0"]["kernel"]  # [3,3,Cin,Cout]
    k2 = module["Conv3x3_1"]["Conv_0"]["kernel"]  # [3,3,Cout,Cout]
    cout = k1.shape[-1]
    shardable = cout % size == 0 and k2.shape[2] == cout
    out: Dict[str, Any] = {}
    for name, sub in module.items():
        if shardable and name == "Conv3x3_0":
            out[name] = {"Conv_0": {"kernel": P(None, None, None, MODEL_AXIS),
                                    "bias": P(MODEL_AXIS)}}
        elif shardable and name == "Conv3x3_1":
            out[name] = {"Conv_0": {"kernel": P(None, None, MODEL_AXIS, None),
                                    "bias": P()}}
        elif shardable and name == "GroupNorm32_1":
            out[name] = {k: P(MODEL_AXIS) for k in sub}
        else:
            out[name] = jax.tree_util.tree_map(lambda _: P(), sub)
    return out


def unet_param_specs(params: Dict[str, Any], model_axis_size: int) -> Dict[str, Any]:
    """PartitionSpec pytree for a CausalUNet param tree.

    ``model_axis_size`` is the size of the mesh 'model' axis; with size 1
    everything is replicated (the specs still name no axis, so the result is
    valid on a 1-D data mesh too).
    """
    if model_axis_size <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def walk(node):
        if _is_resblock(node):
            return _resblock_specs(node, model_axis_size)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return jax.tree_util.tree_map(lambda _: P(), node)

    return walk(params)


def state_partition_specs(state, param_specs: Dict[str, Any]):
    """Extend param specs to the full TrainState pytree.

    The optimizer state (Adam m/v) and every EMA copy nest the param tree
    verbatim, so each state leaf whose key-path *ends with* a param leaf's
    key-path inherits that param's spec; everything else (step, batch_stats,
    sampler state, rng, Adam count) is replicated.
    """
    flat = jax.tree_util.tree_flatten_with_path(param_specs)[0]
    by_suffix = {}
    lengths = set()
    for path, spec in flat:
        key = tuple(str(getattr(p, "key", p)) for p in path)
        by_suffix[key] = spec
        lengths.add(len(key))
    by_len = sorted(lengths, reverse=True)

    def spec_for(path, leaf):
        names = tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        for ln in by_len:
            spec = by_suffix.get(names[-ln:]) if len(names) >= ln else None
            if spec is not None:
                # a suffix match on a scalar/odd-shaped leaf (e.g. an optax
                # count that happens to collide) must still be shape-valid
                if len(spec) <= getattr(leaf, "ndim", 0):
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, state)


def partition_state(state, mesh: Mesh, param_specs: Optional[Dict[str, Any]] = None):
    """Place a TrainState onto ``mesh`` with tensor-parallel param sharding.

    Drop-in replacement for ``device_put(state, replicated(mesh))`` in
    TrainLoop/`__graft_entry__`; with no 'model' axis (or size 1) it IS the
    replicated placement.

    Multi-process: works over a mesh spanning processes too. Each process
    holds an identical host-side state (same init seed everywhere, the
    single-controller convention); ``device_put`` accepts host values for
    non-addressable shardings (each process materializes only its own
    shards) but rejects committed device arrays, so leaves go through numpy
    first. The reference has no cross-host model sharding at all
    (`train_util.py:111-118` wraps DDP only).
    """
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if param_specs is None:
        param_specs = unet_param_specs(state.params, size)
    specs = state_partition_specs(state, param_specs)
    multiprocess = jax.process_count() > 1

    def _place(x, s):
        if multiprocess:
            x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(_place, state, specs)


def count_sharded(specs) -> int:
    """Number of leaves with at least one sharded dimension."""
    return sum(
        1
        for spec in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P))
        if isinstance(spec, P) and any(a is not None for a in spec)
    )
