#!/usr/bin/env python
"""Anti-causal classifier training entry.

Rebuild of the reference's four `*_classifier.py` __main__ blocks (C25) as
one CLI: train a GaussianConvEncoderClf to regress one causal factor from
images (MSE, Adam 1e-3, best-val checkpoint).

  python scripts/classifier_train.py --dataset morphomnist --factor 0 --synthetic
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_VARS = {"morphomnist": 2, "pendulum": 4, "circuit": 4}
VAR_NAMES = {
    "morphomnist": ["thickness", "intensity"],
    "pendulum": ["angle", "light", "shadow_len", "shadow_pos"],
    "circuit": ["arm", "blue", "green", "red"],
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True, choices=list(N_VARS))
    parser.add_argument("--factor", type=int, required=True,
                        help="factor index; -1 trains every factor (the "
                             "fused whole-fit scan compiles once per shape, "
                             "so one process is much cheaper than N)")
    parser.add_argument("--seeds", type=int, nargs="+", default=None,
                        help="train a probe ENSEMBLE: one member per seed, "
                             "saved as classifier_<ds>_<var>_seed<k>.pkl. "
                             "rescore_counterfactuals.py picks the ensemble "
                             "up automatically and reports per-probe MAE + "
                             "spread (the instrument's error bar)")
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--pool", type=int, default=4096)
    parser.add_argument("--out_dir", default="/tmp/causaldiffae_classifiers")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from causaldiffae_tpu.data import synthetic_dataset
    from causaldiffae_tpu.evals import ClassifierTrainer
    from causaldiffae_tpu.utils import logger

    logger.configure()
    if args.synthetic or not args.data_dir:
        train = synthetic_dataset(args.dataset, args.pool, seed=args.seed)
        val = synthetic_dataset(args.dataset, max(args.pool // 10, 64), seed=args.seed + 7)
    else:
        from causaldiffae_tpu.data.loaders import (
            load_circuit, load_morphomnist, load_pendulum,
        )
        loaders = {"morphomnist": lambda s: load_morphomnist(args.data_dir, train=(s == "train")),
                   "pendulum": lambda s: load_pendulum(args.data_dir, split=s),
                   "circuit": lambda s: load_circuit(args.data_dir, split=s)}
        train = loaders[args.dataset]("train")
        val = loaders[args.dataset]("test")

    factors = (range(N_VARS[args.dataset]) if args.factor < 0
               else [args.factor])
    seeds = args.seeds if args.seeds else [args.seed]
    for factor in factors:
        for seed in seeds:
            trainer = ClassifierTrainer(args.dataset, factor,
                                        N_VARS[args.dataset],
                                        lr=args.lr, seed=seed)
            trainer.fit(train, val, epochs=args.epochs,
                        batch_size=args.batch_size)
            name = VAR_NAMES[args.dataset][factor]
            suffix = f"_seed{seed}" if args.seeds else ""
            path = os.path.join(
                args.out_dir, f"classifier_{args.dataset}_{name}{suffix}.pkl")
            trainer.save_best(path)
            logger.log(f"saved best (val {trainer.best_val:.5f}) -> {path}")


if __name__ == "__main__":
    main()
