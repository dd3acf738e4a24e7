#!/usr/bin/env python
"""Prior / unconditional sampling entry.

Rebuild of reference `scripts/image_sample_rep.py` (C30): draw z ~ N(0, I)
(rep_dim), run the sampling chain, save an .npz of samples + a PNG grid.
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
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--use_ddim", action="store_true")
    parser.add_argument("--sampler", choices=["ddim", "ddpm", "dpm++"], default=None,
                        help="dpm++ = 2nd-order DPM-Solver++ fast ODE chain")
    parser.add_argument("--sample_steps", type=int, default=None,
                        help="dpm++ node budget (e.g. 25)")
    parser.add_argument("--use_ema", type=lambda s: s.lower() in ("1", "true", "t", "y"),
                        default=False)
    parser.add_argument("--out_dir", default="/tmp/causaldiffae_samples")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.evals import make_prior_sample_fn
    from causaldiffae_tpu.training import eval_params, restore_eval_state
    from causaldiffae_tpu.utils import logger
    from counterfactual_test import save_grid

    logger.configure()
    cfg = get_config(args.preset)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg, eval_mode=True)

    state = restore_eval_state(cfg, model, args.ckpt_dir)
    if args.ckpt_dir:
        logger.log(f"restored step {int(state.step)}")
    params = eval_params(state, cfg, use_ema=args.use_ema)
    variables = {"params": params, "batch_stats": state.batch_stats}

    from jax.sharding import NamedSharding, PartitionSpec as P

    from causaldiffae_tpu.parallel import eval_placement

    # single-process multi-chip: replicate variables over the local mesh and
    # pin the chain OUTPUT sharded on 'data' - the noise/z draws are internal
    # to fn (and cond may be empty), so the out_sharding is the propagation
    # anchor that makes XLA run the whole chain batch-parallel
    variables, _, eval_mesh = eval_placement(variables, args.batch_size)
    if eval_mesh is not None:
        logger.log(f"sampling data-parallel over "
                   f"{len(jax.local_devices())} local devices")
        out_shardings = NamedSharding(eval_mesh, P("data"))
    else:
        out_shardings = None

    fn = jax.jit(make_prior_sample_fn(cfg, model, diffusion, use_ddim=args.use_ddim,
                                      sampler=args.sampler,
                                      sample_steps=args.sample_steps),
                 static_argnums=1, out_shardings=out_shardings)
    shape = (args.batch_size, cfg.image_size, cfg.image_size, cfg.in_channels)
    cond = {}
    if cfg.class_cond:
        cond["y"] = jnp.arange(args.batch_size, dtype=jnp.int32) % 10
    if cfg.context_cond:
        cond["c"] = jnp.zeros((args.batch_size, 4))

    # split the request across hosts: each generates its ceil(1/P) share
    per_host = -(-args.num_samples // jax.process_count())
    all_images = []
    i = 0
    while len(all_images) * args.batch_size < per_host:
        # fold in a purpose tag so the batch-counter stream can never collide
        # with a caller reusing seed+i for another purpose (e.g. per-variable
        # loops elsewhere reuse small integers)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), jax.process_index()),
            0x5A3F0 + i,
        )
        out = fn(variables, shape, cond, key)
        all_images.append(np.asarray(out))
        i += 1
        logger.log(f"created {len(all_images) * args.batch_size} samples (this host)")

    from causaldiffae_tpu.parallel import gather_across_hosts, is_primary_host

    # multi-host: every process samples with a process-offset seed; gather
    # (reference gathers each sample batch, `image_sample_rep.py`)
    arr = gather_across_hosts(np.concatenate(all_images, axis=0))[: args.num_samples]
    if is_primary_host():
        os.makedirs(args.out_dir, exist_ok=True)
        out_path = os.path.join(
            args.out_dir, f"samples_{arr.shape[0]}x{arr.shape[1]}x{arr.shape[2]}.npz")
        np.savez(out_path, arr_0=arr)
        save_grid(arr[:64], os.path.join(args.out_dir, "grid.png"))
        logger.log(f"saved {out_path}")


if __name__ == "__main__":
    main()
