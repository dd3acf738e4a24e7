"""Worker process for the 2-process multi-host training smoke test.

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` +
gloo CPU collectives form an 8-device global mesh across the 2 processes -
the same topology a 2-host TPU pod slice presents (SURVEY §2.12; replaces
the reference's `mpiexec -n N` + gloo rendezvous, `dist_util.py:21-41`).

Runs 2 jitted train steps over the global mesh and writes a fingerprint of
the updated params; the parent test asserts both processes' fingerprints are
identical (replicas in sync across hosts).

Invoked by tests/test_multihost.py - not a pytest module itself.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main(process_id: int, num_processes: int, port: int, outdir: str) -> None:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    import jax.numpy as jnp
    import numpy as np

    from causaldiffae_tpu.config import Config, create_diffusion, create_model
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.parallel import make_mesh, replicated, shard_batch
    from causaldiffae_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = Config(
        name="mh_smoke", dataset="morphomnist", image_size=28, in_channels=1,
        num_channels=32, num_res_blocks=1, num_heads=2, n_vars=2, rep_dim=32,
        attention_resolutions="14", class_cond=True, rep_cond=True,
        causal_modeling=True, masking=True, diffusion_steps=100,
        batch_size=16,
    )
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    tx = make_optimizer(cfg)
    mesh = make_mesh()  # global: 8 devices across 2 processes

    # identical seed on every process -> identical global batches; device_put
    # against the global sharding slices out each process's local shards
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, seed=0, pool=64,
                            native=False)
    batches = [{k: jnp.asarray(v) for k, v in next(it).items()} for _ in range(3)]

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batches[0])
    state = jax.device_put(state, replicated(mesh))
    step_fn = jax.jit(make_train_step(cfg, model, diffusion, tx))

    losses = []
    for batch in batches[:2]:
        state, metrics = step_fn(state, shard_batch(mesh, batch))
        losses.append(float(metrics["loss"]))  # fully-replicated global array

    # fingerprint: local copy of every (replicated) param leaf
    leaves = jax.tree_util.tree_leaves_with_path(state.params)
    fp = {
        jax.tree_util.keystr(path): np.asarray(leaf.addressable_shards[0].data)
        for path, leaf in leaves
    }
    fp["__losses__"] = np.asarray(losses)
    np.savez(os.path.join(outdir, f"fingerprint_{process_id}.npz"), **fp)
    print(f"worker {process_id}: OK losses={losses}")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
