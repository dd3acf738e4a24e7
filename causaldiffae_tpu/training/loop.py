"""Host-side training loop.

Rebuild of reference `TrainLoop` (`train_util.py:30-219`): iterate batches,
call the single jitted train step (donated state), log KVs at log_interval,
checkpoint at save_interval, resume from the latest checkpoint. The KL
anneal, LR anneal, EMA, microbatching, and metric reductions all live inside
the jitted step - the host loop only moves data and writes logs.

The reference's ``DIFFUSION_TRAINING_TEST`` early-exit hook
(`train_util.py:206-209`) is preserved for smoke tests.
"""

from __future__ import annotations

import os
import signal
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh, replicated, shard_batch, shard_host_local
from ..parallel.partition import partition_state
from ..utils import logger
from .checkpoint import CheckpointManager
from .state import create_train_state, make_optimizer
from .train_step import make_train_step

__all__ = ["TrainLoop"]


def _apply_init_variables(state, variables):
    """Overwrite a fresh TrainState's params (and batch_stats) with externally
    supplied flax variables — the torch-checkpoint warm-start path.

    Structure mismatches raise from tree_map; shapes are checked explicitly.
    Leaves are materialized on the same device as the initialized tree so the
    state stays a single-device-context pytree (jit breaks on mixed ones),
    and cast to the initialized dtype (fp32 params). EMA trees are re-seeded
    from the new params, matching a step-0 start; Adam moments stay zero.
    """
    ref_leaf = jax.tree_util.tree_leaves(state.params)[0]
    device = next(iter(ref_leaf.devices())) if hasattr(ref_leaf, "devices") else None

    def _take(ref, new):
        if tuple(ref.shape) != tuple(np.shape(new)):
            raise ValueError(f"init_variables shape mismatch: {np.shape(new)} "
                             f"vs initialized {tuple(ref.shape)}")
        return jnp.asarray(new, dtype=ref.dtype)

    def _port(ref_tree, new_tree):
        return jax.tree_util.tree_map(_take, ref_tree, new_tree)

    ctx = jax.default_device(device) if device is not None else _nullcontext()
    with ctx:
        params = _port(state.params, variables["params"])
        batch_stats = (_port(state.batch_stats, variables["batch_stats"])
                       if variables.get("batch_stats") and state.batch_stats
                       else state.batch_stats)
        ema = {r: jax.tree_util.tree_map(jnp.copy, params) for r in state.ema_params}
    return state.replace(params=params, batch_stats=batch_stats, ema_params=ema)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class TrainLoop:
    def __init__(
        self,
        cfg,
        model,
        diffusion,
        data: Iterator[Dict[str, np.ndarray]],
        ckpt_dir: Optional[str] = None,
        use_mesh: bool = True,
        resume: bool = True,
        init_variables: Optional[Dict] = None,
    ):
        self.cfg = cfg
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.tx = make_optimizer(cfg)
        mp = getattr(cfg, "model_parallel", 1)
        # mp > 1 works multi-process too: make_mesh puts 'model' on the
        # innermost (fastest-varying) axis of the global device order, so
        # TP groups land within a host whenever mp divides the local chip
        # count (all-reduces ride ICI); partition_state scatters each
        # process's identical host state onto its addressable shards, and
        # save() switches to orbax's collective sharded save.
        self.mesh = make_mesh(model_parallel=mp) if use_mesh else None

        first = {k: jnp.asarray(v) for k, v in next(data).items()}
        self.state = create_train_state(cfg, model, self.tx, jax.random.PRNGKey(cfg.seed), first)
        if init_variables is not None:
            # warm-start from externally supplied variables (e.g. a reference
            # torch checkpoint via utils.torch_port.load_torch_checkpoint);
            # applied before mesh placement so the state stays a single-
            # device-context pytree, and before resume so an existing
            # checkpoint in ckpt_dir still wins (logged below if it does).
            self.state = _apply_init_variables(self.state, init_variables)
            logger.log("initialized params from provided variables "
                       "(EMA copies re-seeded from them)")
        if self.mesh is not None:
            # mp > 1: Megatron-sharded conv pairs + matching opt/EMA layout
            # (parallel/partition.py); mp == 1: params replicated, classic DP
            self.state = (partition_state(self.state, self.mesh) if mp > 1
                          else jax.device_put(self.state, replicated(self.mesh)))

        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None
        self.resume_step = 0
        if resume and self.ckpt is not None and self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)
            self.resume_step = int(self.state.step)
            logger.log(f"resumed from checkpoint at step {self.resume_step}"
                       + (" (checkpoint overrides init_variables)"
                          if init_variables is not None else ""))

        self.step_fn = jax.jit(make_train_step(cfg, model, diffusion, self.tx), donate_argnums=0)
        self._pending_metrics = None

    def _put(self, batch):
        # multi-host: each process's loader yields only its B/P rows (the
        # load_data/synthetic_iterator per-host feed convention);
        # shard_host_local stitches them into the global on-mesh batch
        if self.mesh is not None and jax.process_count() > 1:
            return shard_host_local(self.mesh, batch)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return batch

    def run_loop(self, num_steps: Optional[int] = None):
        cfg = self.cfg
        total = num_steps if num_steps is not None else cfg.total_steps
        world_batch = cfg.batch_size
        self._t_start = time.time()
        step = int(self.state.step)
        # preemption tolerance (SURVEY §5.3): checkpoint on SIGTERM/SIGINT
        # before exiting (Cloud TPU sends SIGTERM ahead of eviction)
        preempted = {"flag": False}

        def _on_signal(signum, frame):
            preempted["flag"] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread
                pass

        # one batch in flight: issue the host->device transfer for batch k+1
        # while the device runs step k (device_put + step dispatch are async)
        next_batch = self._put(next(self.data))
        while step < total and (not cfg.lr_anneal_steps or step < cfg.lr_anneal_steps):
            if preempted["flag"]:
                logger.log("preemption signal received - checkpointing and exiting")
                self._flush_pending(world_batch)
                self.save()
                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
                return self.state
            batch = next_batch
            self.state, metrics = self.step_fn(self.state, batch)
            with logger.profile_kv("data"):
                next_batch = self._put(next(self.data))
            step += 1

            if step % cfg.log_interval == 0:
                # Lagged async metric readback: start the device->host copies
                # now, convert + log them at the NEXT interval when they have
                # long arrived. A synchronous per-value float() here costs a
                # host<->device round-trip PER METRIC and was measured to
                # nearly halve wall-clock throughput (1909 -> 909 samples/s
                # through the axon tunnel); the lagged fetch costs ~0.
                for v in metrics.values():
                    try:
                        v.copy_to_host_async()
                    except AttributeError:  # non-array (already host) metric
                        pass
                # capture the wall time NOW so the flushed rate is computed
                # against this interval's clock, not the next one's. NB this
                # stamps DISPATCH time: the host may run ahead of the device
                # by the (bounded, few-step) dispatch queue, so the first
                # interval's samples_per_sec is approximate; it converges to
                # the true device rate without ever draining the pipeline
                # (a sync here is exactly the 2x slowdown this path removes).
                pending, self._pending_metrics = (
                    self._pending_metrics, (step, metrics, time.time()))
                if pending is not None:
                    self._log_metrics(*pending, world_batch)
            if self.ckpt is not None and step % cfg.save_interval == 0:
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", "") and step > 0:
                    self._flush_pending(world_batch)
                    return self.state
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        self._flush_pending(world_batch)
        if self.ckpt is not None and step % cfg.save_interval != 0:
            self.save()
        return self.state

    def _flush_pending(self, world_batch: int):
        if self._pending_metrics is not None:
            self._log_metrics(*self._pending_metrics, world_batch)
            self._pending_metrics = None

    def _log_metrics(self, at_step: int, metrics: Dict, at_time: float,
                     world_batch: int):
        metrics = {k: float(v) for k, v in metrics.items()}  # host buffers, free
        for k, v in metrics.items():
            if k.endswith("_count"):
                continue
            logger.logkv_mean(k, v)
        logger.logkv("step", at_step)
        logger.logkv("samples", at_step * world_batch)
        dt = at_time - self._t_start
        logger.logkv("samples_per_sec",
                     (at_step - self.resume_step) * world_batch / max(dt, 1e-9))
        logger.dumpkvs()

    def save(self):
        if self.ckpt is None:
            return
        if jax.process_count() > 1:
            # collective sharded save: every process passes the on-device
            # state and orbax writes each shard from the process that
            # addresses it — a device_get here would reject leaves that are
            # TP-sharded across processes (non-addressable shards)
            step = int(jax.device_get(self.state.step))
            self.ckpt.save(step, self.state)
        else:
            state = jax.device_get(self.state)
            step = int(state.step)
            self.ckpt.save(step, state)
        logger.log(f"saved checkpoint at step {step}")
