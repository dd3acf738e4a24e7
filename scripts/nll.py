#!/usr/bin/env python
"""NLL (bits/dim) evaluation entry.

Rebuild of reference `scripts/image_nll.py` (C31): stream batches through
the full per-timestep VLB sweep (here one compiled `lax.scan` per batch
instead of T host-dispatched model calls), aggregate term means, save
``*_terms.npz``. Multi-host: each process sweeps its own data shard, then
per-sample terms are concatenated and bpd averaged across hosts
(replacing the reference's `dist.all_reduce`, `image_nll.py:63-69`).
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="morphomnist_causaldae")
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--clip_denoised", action="store_true", default=True)
    parser.add_argument("--out_dir", default="/tmp/causaldiffae_nll")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.data import load_data, synthetic_dataset
    from causaldiffae_tpu.diffusion import calc_bpd_loop
    from causaldiffae_tpu.models.unet import CausalUNet
    from causaldiffae_tpu.training import restore_eval_state
    from causaldiffae_tpu.utils import logger

    logger.configure()
    cfg = get_config(args.preset)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)  # full (non-respaced) process

    if args.synthetic or not args.data_dir:
        pool = synthetic_dataset(cfg.dataset, max(args.num_samples, 64), seed=args.seed)
    else:
        from causaldiffae_tpu.data.loaders import (
            load_circuit, load_morphomnist, load_pendulum,
        )
        pool = {"morphomnist": lambda: load_morphomnist(args.data_dir, train=False),
                "pendulum": lambda: load_pendulum(args.data_dir, split="test"),
                "circuit": lambda: load_circuit(args.data_dir, split="test")}[cfg.dataset]()
    # each process sweeps its own disjoint shard of the pool
    from causaldiffae_tpu.data.loaders import _proc_shard, _shard

    shard_i, num_shards = _proc_shard()
    pool = _shard(pool, shard_i, num_shards)

    first = {k: jnp.asarray(v[: args.batch_size]) for k, v in pool.items()}
    state = restore_eval_state(cfg, model, args.ckpt_dir, template_batch=first)
    from causaldiffae_tpu.parallel import eval_placement

    # single-process multi-chip: data-parallel bpd sweeps; multi-process
    # keeps the per-host shard split above (see eval_placement)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables, put, _ = eval_placement(variables, args.batch_size)

    # `variables` rides as a jit ARGUMENT (the eval-CLI convention), never a
    # closure: closed-over param trees get baked into the lowered module as
    # constants, and the big-UNet configs (circuit/pendulum) then exceed the
    # axon remote-compile endpoint's request-body limit (HTTP 413)
    @jax.jit
    def bpd(variables, x, cond_y, cond_c, z, rng):
        def model_fn(xx, tt):
            return model.apply(
                variables, xx, tt,
                y=cond_y if cfg.class_cond else None,
                c=cond_c if cfg.context_cond else None,
                z=z if cfg.rep_cond else None,
                train=False, method=CausalUNet.denoise,
            )
        return calc_bpd_loop(diffusion, model_fn, x, rng,
                             clip_denoised=args.clip_denoised)

    @jax.jit
    def encode_z(variables, x, rng):
        mu, _ = model.apply(variables, x, train=False, method=CausalUNet.encode)
        z_post = (model.apply(variables, mu, method=CausalUNet.causalize)
                  if cfg.causal_modeling else mu)
        return z_post + jnp.sqrt(cfg.reparam_var_scale) * jax.random.normal(rng, z_post.shape)

    all_metrics = {"vb": [], "mse": [], "xstart_mse": []}
    all_bpd = []
    # every host runs the SAME number of full-size batches over its shard
    # (wrapping if the shard is short) so the cross-host gather sees equal
    # shapes and the cross-host bpd mean weights hosts equally
    per_host = -(-args.num_samples // jax.process_count())
    n_batches = max(-(-per_host // args.batch_size), 1)
    N = len(pool["image"])
    for i in range(n_batches):
        idx = (np.arange(args.batch_size) + i * args.batch_size) % N
        x = put(pool["image"][idx])
        y = put(pool["y"][idx]) if "y" in pool else None
        c = put(pool["c"][idx]) if "c" in pool else None
        z = (encode_z(variables, x, jax.random.PRNGKey(1234 + i))
             if cfg.rep_cond else None)
        out = bpd(variables, x, y, c, z, jax.random.fold_in(
            jax.random.PRNGKey(args.seed + i), jax.process_index()))
        all_bpd.append(np.asarray(out["total_bpd"]))
        for k in all_metrics:
            all_metrics[k].append(np.asarray(out[k]))
        logger.log(f"done {(i + 1) * args.batch_size} samples: "
                   f"bpd so far = {np.concatenate(all_bpd).mean():.4f}")

    from causaldiffae_tpu.parallel import (
        gather_across_hosts, is_primary_host, mean_across_hosts,
    )

    total = mean_across_hosts(float(np.concatenate(all_bpd).mean()))
    logger.log(f"total_bpd = {total:.5f}")
    # gather on ALL hosts (process_allgather is collective); write on primary
    gathered = {name: gather_across_hosts(np.concatenate(terms, axis=0))
                for name, terms in all_metrics.items()}
    if is_primary_host():
        os.makedirs(args.out_dir, exist_ok=True)
        for name, terms in gathered.items():
            np.savez(os.path.join(args.out_dir, f"{name}_terms.npz"), terms)
    print(f'{{"total_bpd": {total}}}')


if __name__ == "__main__":
    main()
