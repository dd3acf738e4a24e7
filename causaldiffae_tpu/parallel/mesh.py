"""Device mesh + sharding helpers.

Replaces the reference's entire distributed layer (`dist_util.py`: MPI
rendezvous, gloo process groups, byte-broadcast of checkpoints; DDP wrapper
`train_util.py:111-118`) with the JAX single-controller model: one
``Mesh(('data',))`` over all chips, params replicated, batches sharded on
'data'. Jitting the train step with these shardings makes XLA insert the
gradient all-reduce over ICI; nothing in user code ever names a collective
(SURVEY §5.8). A 'model' axis is reserved for future tensor parallelism -
the UNets here (<60M params) don't need it, but the mesh API allows it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "shard_host_local", "host_local_batch_size", "local_eval_mesh",
           "eval_placement"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, model_parallel: int = 1) -> Mesh:
    """1-D data mesh (optionally folding a model axis for future TP)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded on the leading axis.

    The input is the GLOBAL batch; in multi-process mode every host must pass
    the same global array (each host's device_put slices out only its
    addressable shards). For per-host *different* data use
    :func:`shard_host_local` instead.
    """
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_host_local(mesh: Mesh, batch):
    """Assemble a global on-mesh batch from per-process LOCAL rows.

    Each process passes only its own ``global_batch // process_count`` rows
    (its dataset shard's batch); `jax.make_array_from_process_local_data`
    stitches them into one global array sharded on the data axis. This is the
    multi-host training feed: no host materializes or transfers rows another
    host consumes — the reference's DDP per-rank feed semantics
    (`train_util.py:78`, `image_datasets.py:120-124`) without replicating the
    loader work P times. Single-process it is identical to ``shard_batch``.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def local_eval_mesh(batch_size: int) -> Optional[Mesh]:
    """Data mesh over this process's devices for single-process eval/serving.

    A single-process host with N>1 chips (e.g. one v5e-8 VM) would otherwise
    run every sampling chain on chip 0 while N-1 chips idle; replicating the
    variables over this mesh and `shard_batch`-ing each generation batch
    makes the chains data-parallel with no change to the jitted programs.
    Returns None when multi-process (the eval scripts' per-host split path
    already decorrelates work across processes and feeds DIFFERENT per-host
    batches, which `shard_batch`'s global-array contract would corrupt),
    when there is a single device, or when the batch doesn't divide evenly.
    """
    if jax.process_count() > 1:
        return None
    devices = jax.local_devices()
    if len(devices) <= 1 or batch_size % len(devices) != 0:
        return None
    return make_mesh(devices)


def eval_placement(variables, batch_size: int):
    """Place restored model variables for eval/serving; one rule, every CLI.

    Returns ``(variables, put, mesh)``:

    - single-process multi-chip (and batch divides the device count):
      ``variables`` replicated over the local data mesh, ``put`` shards each
      generation batch on 'data' — the chains run data-parallel across every
      local chip with no change to the jitted programs;
    - otherwise: ``variables`` pinned to device 0, ``put`` is a plain
      device transfer (multi-process keeps the scripts' per-host split path,
      whose DIFFERENT per-host batches `shard_batch`'s global-array contract
      would corrupt).

    ``put`` accepts an array, a pytree of arrays, or None. ``mesh`` (None on
    the fallback) is exposed for callers that need an ``out_shardings``
    anchor (e.g. prior sampling, where the batch is internal to the chain).
    """
    import jax.numpy as jnp

    mesh = local_eval_mesh(batch_size)
    if mesh is not None:
        variables = jax.device_put(variables, replicated(mesh))
    else:
        variables = jax.device_put(variables, jax.local_devices()[0])

    def put(tree):
        if tree is None:
            return None
        if mesh is not None:
            return shard_batch(mesh, tree)
        return jax.tree_util.tree_map(jnp.asarray, tree)

    return variables, put, mesh


def host_local_batch_size(global_batch: int, num_shards: Optional[int] = None) -> int:
    """Per-host slice of the global batch (multi-host data loading).

    ``cfg.batch_size`` is the GLOBAL batch everywhere in this repo (a
    deliberate deviation from the reference, where the flag is per-rank and
    the global batch is batch×world, `train_util.py:78`); each host loads and
    feeds only this many rows.
    """
    if num_shards is None:
        num_shards = jax.process_count()
    if global_batch % num_shards != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {num_shards}"
        )
    return global_batch // num_shards
