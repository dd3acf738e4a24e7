"""Worker process for the 2-process multi-host training smoke tests.

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` +
gloo CPU collectives form an 8-device global mesh across the 2 processes -
the same topology a 2-host TPU pod slice presents (SURVEY §2.12; replaces
the reference's `mpiexec -n N` + gloo rendezvous, `dist_util.py:21-41`).

Two modes (argv[5]):

- ``rawstep``: identical global batches on every process fed through
  ``shard_batch`` into the raw jitted train step (the round-2 test).
- ``trainloop``: the SHIPPED path end to end - ``load_data`` reads a real
  on-disk MorphoMNIST archive (argv[6]), each process gets its own dataset
  shard and yields only global_batch/P rows per batch (asserted here: no
  host loads rows it won't consume), and ``TrainLoop`` assembles the global
  batch via ``shard_host_local`` / `jax.make_array_from_process_local_data`.
  This is the reference's DDP feed (`train_util.py:78` +
  `image_datasets.py:120-124`) done the JAX way.

Both modes write a fingerprint of the updated params; the parent test
asserts the processes' fingerprints are bitwise identical (replicas in sync
across hosts - the guarantee the reference's no-op ``sync_params``,
`dist_util.py:67-74`, never verified).

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


def _small_cfg():
    from _tiny_config import tiny_config  # tests/ is on sys.path (script dir)

    return tiny_config(name="mh_smoke", batch_size=16)


def _fingerprint(params, losses, outdir, process_id):
    import numpy as np

    leaves = jax.tree_util.tree_leaves_with_path(params)
    fp = {
        jax.tree_util.keystr(path): np.asarray(leaf.addressable_shards[0].data)
        for path, leaf in leaves
    }
    fp["__losses__"] = np.asarray(losses)
    np.savez(os.path.join(outdir, f"fingerprint_{process_id}.npz"), **fp)


def run_rawstep(cfg, outdir, process_id):
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.parallel import make_mesh, replicated, shard_batch
    from causaldiffae_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    tx = make_optimizer(cfg)
    mesh = make_mesh()  # global: 8 devices across 2 processes

    # identical seed + shard=False -> identical global batches everywhere;
    # device_put against the global sharding slices out local shards
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, seed=0, pool=64,
                            native=False, shard=False)
    batches = [{k: jnp.asarray(v) for k, v in next(it).items()} for _ in range(3)]

    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batches[0])
    state = jax.device_put(state, replicated(mesh))
    step_fn = jax.jit(make_train_step(cfg, model, diffusion, tx))

    losses = []
    for batch in batches[:2]:
        state, metrics = step_fn(state, shard_batch(mesh, batch))
        losses.append(float(metrics["loss"]))  # fully-replicated global array
    _fingerprint(state.params, losses, outdir, process_id)


def run_trainloop(cfg, outdir, process_id, data_dir):
    from causaldiffae_tpu.config import create_diffusion, create_model
    from causaldiffae_tpu.data import load_data
    from causaldiffae_tpu.training.loop import TrainLoop

    local_expect = cfg.batch_size // jax.process_count()
    data = load_data(data_dir=data_dir, batch_size=cfg.batch_size,
                     image_size=cfg.image_size, seed=0, native=False)

    consumed = {"rows": 0}

    def checked(it):
        # the no-waste property: every yielded (= loaded) batch is exactly
        # the B/P rows this host's devices will consume
        for b in it:
            assert b["image"].shape[0] == local_expect, (
                f"host loaded {b['image'].shape[0]} rows, consumes {local_expect}")
            consumed["rows"] += b["image"].shape[0]
            yield b

    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    loop = TrainLoop(cfg, model, diffusion, checked(data), ckpt_dir=None)
    state = loop.run_loop(num_steps=3)
    # global batch semantics: each jitted step consumed cfg.batch_size rows
    # globally, and this host only ever materializes B/P-row batches (the
    # per-batch shape assert above). Bound the total loosely instead of
    # pinning TrainLoop's internal prefetch depth: >= init + 3 steps, and
    # <= that plus a small in-flight allowance
    assert 4 * local_expect <= consumed["rows"] <= 7 * local_expect, consumed["rows"]
    _fingerprint(state.params, [float(state.step)], outdir, process_id)


def run_tp(cfg, outdir, process_id):
    """Multi-host tensor parallelism through the SHIPPED TrainLoop:
    model_parallel=2 over the 8-device 2-process mesh (dp=4 x tp=2; the
    'model' axis is innermost, so each TP pair sits within one process —
    the ICI-local layout a real pod slice wants). Trains 2 steps, saves a
    collective sharded orbax checkpoint, then RESUMES into the sharded
    template and trains 1 more. Fingerprints the fully-gathered params."""
    import numpy as np
    from pathlib import Path

    from causaldiffae_tpu.config import create_diffusion, create_model
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.training.loop import TrainLoop

    tp_cfg = cfg.replace(name="mh_tp", model_parallel=2, total_steps=3,
                         save_interval=2, log_interval=1)
    ckdir = str(Path(outdir) / "tp_ckpt")
    model = create_model(tp_cfg)
    diffusion = create_diffusion(tp_cfg)

    def make_it():
        return synthetic_iterator(tp_cfg.dataset, tp_cfg.batch_size,
                                  pool=tp_cfg.batch_size * 4, seed=7)

    loop = TrainLoop(tp_cfg, model, diffusion, make_it(), ckpt_dir=ckdir)
    k = loop.state.params["input_blocks_1_0"]["Conv3x3_0"]["Conv_0"]["kernel"]
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2, (
        "TP placement did not shard the column conv")
    state = loop.run_loop(num_steps=2)
    assert int(jax.device_get(state.step)) == 2

    # resume restores into the SHARDED cross-process template
    loop2 = TrainLoop(tp_cfg, model, diffusion, make_it(), ckpt_dir=ckdir)
    assert loop2.resume_step == 2, loop2.resume_step
    k = loop2.state.params["input_blocks_1_0"]["Conv3x3_0"]["Conv_0"]["kernel"]
    assert k.addressable_shards[0].data.shape[-1] == k.shape[-1] // 2
    state = loop2.run_loop(num_steps=3)
    assert int(jax.device_get(state.step)) == 3

    # every leaf is locally complete (tp within-process), so device_get
    # gathers the full values for the cross-process bitwise comparison
    leaves = jax.tree_util.tree_leaves_with_path(state.params)
    fp = {jax.tree_util.keystr(path): np.asarray(jax.device_get(leaf))
          for path, leaf in leaves}
    fp["__losses__"] = np.asarray([float(jax.device_get(state.step))])
    np.savez(os.path.join(outdir, f"fingerprint_{process_id}.npz"), **fp)


def run_cfeval(cfg, outdir, process_id):
    """The SHIPPED eval CLI end to end across 2 processes: train a few
    steps + checkpoint (collective orbax save), then drive
    ``scripts/counterfactual_test.main()`` — primary-host-trains-probes +
    barrier-then-read protocol, per-host generation splits, cross-host MAE
    gathers. The parent asserts both processes report the SAME MAE dict
    and that only the primary host wrote the artifact files."""
    import json
    import numpy as np
    from pathlib import Path

    import causaldiffae_tpu.config as config_mod
    from causaldiffae_tpu.config import create_diffusion, create_model
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.training.loop import TrainLoop

    eval_cfg = cfg.replace(
        name="mh_eval", eval_timestep_respacing="10", abduction_t=9,
        num_samples=8, total_steps=2, save_interval=2, log_interval=1,
    )
    # register so the CLI's --preset lookup resolves the tiny config
    config_mod.PRESETS["mh_eval"] = eval_cfg

    ckdir = str(Path(outdir) / "ckpt")
    evdir = str(Path(outdir) / "eval")
    model = create_model(eval_cfg)
    diffusion = create_diffusion(eval_cfg)
    # GLOBAL batch + shared seed: synthetic_iterator's shard=True default
    # gives each process its [rank::P] pool slice and B/P rows per batch —
    # the shipped per-host feed convention, exercised as-is (a pre-divided
    # batch here would be sharded AGAIN, silently halving the global batch)
    data = synthetic_iterator(eval_cfg.dataset, eval_cfg.batch_size,
                              pool=eval_cfg.batch_size * 4, seed=100)
    loop = TrainLoop(eval_cfg, model, diffusion, data, ckpt_dir=ckdir)
    loop.run_loop(num_steps=2)

    sys.argv = [
        "counterfactual_test.py", "--preset", "mh_eval",
        "--ckpt_dir", ckdir, "--synthetic",
        "--num_samples", "8", "--batch_size", "4",
        "--out_dir", evdir, "--clf_epochs", "2", "--no_recon",
    ]
    import counterfactual_test as ct_cli  # scripts/ dir on sys.path

    result = ct_cli.main()
    assert result and all(np.isfinite(v) for v in result.values()), result
    wrote = sorted(p.name for p in Path(evdir).glob("*")) if Path(evdir).exists() else []
    with open(Path(outdir) / f"cfeval_{process_id}.json", "w") as f:
        json.dump({"result": result, "wrote": wrote}, f)


def main(process_id: int, num_processes: int, port: int, outdir: str,
         mode: str, data_dir: str) -> None:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == 4 * num_processes

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    cfg = _small_cfg()
    if mode == "rawstep":
        run_rawstep(cfg, outdir, process_id)
    elif mode == "trainloop":
        run_trainloop(cfg, outdir, process_id, data_dir)
    elif mode == "tp":
        run_tp(cfg, outdir, process_id)
    elif mode == "cfeval":
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        run_cfeval(cfg, outdir, process_id)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"worker {process_id}: OK mode={mode}")


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
         sys.argv[5], sys.argv[6] if len(sys.argv) > 6 else "")
