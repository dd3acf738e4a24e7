#!/usr/bin/env python
"""Training entry point.

Rebuild of reference `scripts/image_train.py` + the per-dataset shell
launchers: one CLI over the named presets with flag overrides. No mpiexec -
multi-chip data parallelism comes from the jitted step over the device mesh
(all local devices by default; multi-host via `jax.distributed.initialize`
when JAX_COORDINATOR_ADDRESS is set).

Usage:
  python scripts/train.py --preset morphomnist_causaldae --data_dir /data/morphomnist
  python scripts/train.py --preset pendulum_causaldae --synthetic --total_steps 2000
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="morphomnist_causaldae")
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the built-in synthetic SCM data")
    parser.add_argument("--logdir", default=None)
    parser.add_argument("--ckpt_dir", default=None)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--init_from", default=None, metavar="MODEL_PT",
                        help="warm-start params from a reference torch "
                             "checkpoint (model*.pt / ema_checkpoint.pt); "
                             "an existing checkpoint in --ckpt_dir still "
                             "wins unless --no_resume")
    # common overrides (same names as the reference flags)
    for flag, typ in [
        ("batch_size", int), ("microbatch", int), ("lr", float),
        ("total_steps", int), ("lr_anneal_steps", int), ("log_interval", int),
        ("save_interval", int), ("diffusion_steps", int), ("seed", int),
        ("ema_rate", str), ("schedule_sampler", str), ("weight_decay", float),
        ("kl_anneal_steps", int), ("model_parallel", int),
    ]:
        parser.add_argument(f"--{flag}", type=typ, default=None)
    # boolean overrides (same names as the reference flags; `str2bool` style,
    # reference `script_util.py:343-354`) — these select the non-default model
    # branches: flow-based SCM prior (`unet.py:385-386`), learned sigma,
    # learnable adjacency (`nn.py:255-259`), KL loss, x0 prediction, remat.
    def str2bool(s):
        return s.lower() in ("1", "true", "yes", "t", "y")

    for flag in ("use_bf16", "flow_based", "learn_sigma", "learn_adjacency",
                 "use_kl", "predict_xstart", "use_remat", "masking",
                 "causal_modeling", "use_pallas"):
        parser.add_argument(f"--{flag}", type=str2bool, default=None)
    args = parser.parse_args()

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.data import load_data, synthetic_iterator
    from causaldiffae_tpu.training.loop import TrainLoop
    from causaldiffae_tpu.utils import logger

    cfg = get_config(args.preset)
    overrides = {
        k: v for k, v in vars(args).items()
        if v is not None and hasattr(cfg, k) and k not in ("preset",)
    }
    if overrides:
        cfg = cfg.replace(**overrides)

    logger.configure(dir=args.logdir)
    logger.log(f"config: {cfg}")

    model = create_model(cfg)
    diffusion = create_diffusion(cfg)

    if args.synthetic or not args.data_dir:
        logger.log("using synthetic SCM data")
        data = synthetic_iterator(cfg.dataset, cfg.batch_size, seed=cfg.seed)
    else:
        data = load_data(
            data_dir=args.data_dir, batch_size=cfg.batch_size,
            image_size=cfg.image_size, class_cond=cfg.class_cond, seed=cfg.seed,
        )

    ckpt_dir = args.ckpt_dir or os.path.join(
        logger.get_current().dir or "/tmp", "checkpoints", cfg.name
    )
    init_variables = None
    if args.init_from:
        from causaldiffae_tpu.utils.torch_port import load_torch_checkpoint

        logger.log(f"porting torch checkpoint {args.init_from}")
        init_variables = load_torch_checkpoint(cfg, args.init_from)
    loop = TrainLoop(cfg, model, diffusion, data, ckpt_dir=ckpt_dir,
                     resume=not args.no_resume, init_variables=init_variables)
    loop.run_loop()


if __name__ == "__main__":
    main()
