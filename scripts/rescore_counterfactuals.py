"""Re-score saved counterfactual samples with a FIXED set of probes.

`counterfactual_test.py` trains fresh anti-causal classifiers per run; those
probes agree to ~1e-5 val MSE on real images but can diverge by ~0.1 MAE on
generated (off-distribution) counterfactuals, which swamps small effects like
the pre/post intervention-convention comparison (VERDICT r2 item 5). This
tool replays the eval's exact ground-truth stream (same RandomState draws,
reference `image_causaldae_test.py:561-607`) against the `samples_do_*.npz`
files saved by one or more eval runs, scoring every run with the SAME
classifier pickles - so differences between runs are purely generation-side.

Usage:
  python scripts/rescore_counterfactuals.py --preset morphomnist_causaldae \
      --classifier_dir /tmp/ve_where_auto --num_samples 64 --batch_size 16 \
      --runs /tmp/ve_where_auto /tmp/ve_where_post [--cpu]

Prints one JSON line per run: {run, mae_<var>...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def check_replay_stamps(archive, path: str, *, seed: int, batch_size: int,
                        num_samples: int, n_rows_expected: int):
    """Refuse to silently mis-score: the replayed RandomState stream is only
    valid if the run was generated with the same plan parameters.

    Checks the stamps counterfactual_test.py writes into samples_do_*.npz
    (older archives without a stamp pass that check, honestly unverifiable):
    seed/batch_size drive every draw; num_samples feeds BOTH the pool size
    (max(num_samples, 512) rows seeded seed+99) and n_batches, so a mismatch
    shifts every randint bound after the first - silent wrong ground truth,
    not an index error; multi-host (process_count > 1) interleaves streams
    the single-process replay can't reproduce; and the replay always
    rebuilds a SYNTHETIC pool, so real --data_dir runs would be scored
    against unrelated ground truth.
    """
    for key, want in (("seed", seed), ("batch_size", batch_size),
                      ("process_count", 1), ("num_samples", num_samples),
                      ("synthetic_pool", 1)):
        if key in archive and int(archive[key]) != want:
            raise SystemExit(
                f"{path}: run was generated with {key}={int(archive[key])} "
                f"but the replay assumes {want}; pass matching flags "
                f"(multi-host or real-data runs can't be replayed from the "
                f"synthetic process-0 stream)")
    n = len(archive["samples"])
    if n != n_rows_expected:
        raise SystemExit(
            f"{path}: {n} samples but the replay plan has {n_rows_expected} "
            f"rows; pass the run's --num_samples/--batch_size")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--classifier_dir", required=True,
                    help="dir holding classifier_<dataset>_<var>.pkl to use "
                         "as the fixed instrument for every run")
    ap.add_argument("--runs", nargs="+", required=True,
                    help="eval out_dirs containing samples_do_<var>.npz")
    ap.add_argument("--num_samples", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="score on CPU (leave a busy TPU alone)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import counterfactual_test as ct

    from causaldiffae_tpu.config import DATA_SCALES, get_config
    from causaldiffae_tpu.data import synthetic_dataset
    from causaldiffae_tpu.evals import classifier_predict_fn, load_classifier

    cfg = get_config(args.preset)
    dataset = cfg.dataset
    names = ct.VAR_NAMES[dataset]
    scale = np.asarray(DATA_SCALES[dataset])
    test_pool = synthetic_dataset(dataset, max(args.num_samples, 512),
                                  seed=args.seed + 99)
    n_batches = max(args.num_samples // args.batch_size, 1)

    # per factor: a single probe (classifier_<ds>_<var>.pkl) and/or an
    # ensemble (classifier_<ds>_<var>_seed<k>.pkl from classifier_train.py
    # --seeds). With an ensemble, every run is scored by EVERY member and
    # the report carries per-probe columns + the spread — the instrument's
    # error bar (RESULTS.md: probe retrains move MAE by ~0.1 on generated
    # images, the same order as the effects the tables adjudicate).
    import glob as _glob

    predictors = []  # per factor: list of (label, predict_fn)
    for f, name in enumerate(names):
        paths = sorted(
            _glob.glob(os.path.join(args.classifier_dir,
                                    f"classifier_{dataset}_{name}_seed*.pkl")))
        single = os.path.join(args.classifier_dir,
                              f"classifier_{dataset}_{name}.pkl")
        if os.path.exists(single):
            paths.insert(0, single)
        if not paths:
            raise SystemExit(f"no classifier pickles for factor {name!r} "
                             f"in {args.classifier_dir}")
        members = []
        for p in paths:
            m, v, _ = load_classifier(p, cfg.n_vars)
            stem = os.path.basename(p)[:-len(".pkl")]
            label = stem.split("_seed")[-1] if "_seed" in stem else "0"
            members.append((label, classifier_predict_fn(m, v)))
        predictors.append(members)

    # replay the eval's RandomState stream: one probe_sel randint (the
    # recon/traversal probe batch) first, then per batch one randint draw
    # (sel) + one uniform draw (raw intervention value), vars in order,
    # skipping vars whose INTERVENTION_RANGES entry is None - exactly the
    # consumption order of counterfactual_test.py's single rng_np
    rng_np = np.random.RandomState(args.seed)
    rng_np.randint(0, len(test_pool["image"]), args.batch_size)  # probe_sel
    plan = []  # (var_idx, [(sel, gt_norm), ...])
    for var_idx, name in enumerate(names):
        rng_range = ct.INTERVENTION_RANGES[dataset][var_idx]
        if rng_range is None:
            continue
        batches = []
        for _ in range(n_batches):
            sel = rng_np.randint(0, len(test_pool["image"]), args.batch_size)
            raw_value = rng_np.uniform(*rng_range)
            c_raw = test_pool["c"][sel] * scale[:, 1] + scale[:, 0]
            gt = ct.ground_truth_factors(dataset, c_raw, var_idx, raw_value)
            batches.append((sel, (gt - scale[:, 0]) / scale[:, 1]))
        plan.append((var_idx, name, batches))

    for run_dir in args.runs:
        # mae[factor][probe_label] -> list of per-batch MAEs
        mae = {name: {} for name in names}
        for var_idx, name, batches in plan:
            path = os.path.join(run_dir, f"samples_do_{name}.npz")
            archive = np.load(path)
            samples = archive["samples"]
            check_replay_stamps(
                archive, path, seed=args.seed, batch_size=args.batch_size,
                num_samples=args.num_samples,
                n_rows_expected=n_batches * args.batch_size)
            for b, (sel, gt_norm) in enumerate(batches):
                chunk = samples[b * args.batch_size:(b + 1) * args.batch_size]
                x = jnp.asarray(np.clip(chunk, 0, 1))
                for f, members in enumerate(predictors):
                    for label, pred in members:
                        out = np.asarray(pred(x))
                        mae[names[f]].setdefault(label, []).append(
                            np.abs(out - gt_norm[:, f]).mean())
        result = {"run": run_dir}
        for k, by_probe in mae.items():
            if not by_probe:
                continue
            per = {lbl: float(np.mean(v)) for lbl, v in by_probe.items()}
            vals = list(per.values())
            result[f"mae_{k}"] = float(np.mean(vals))
            if len(per) > 1:
                result[f"mae_{k}_probes"] = per
                result[f"mae_{k}_spread"] = float(np.max(vals) - np.min(vals))
        print(json.dumps(result))


if __name__ == "__main__":
    main()
