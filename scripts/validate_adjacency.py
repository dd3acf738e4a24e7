#!/usr/bin/env python
"""Validate --learn_adjacency as science: does a zero-init learnable A
recover the ground-truth causal graph?

The reference defines the learnable-A branch (`nn.py:255-259`) but never
validates it; neither did rounds 1-3 here beyond a grads-flow test
(VERDICT r3 weak #5). This script trains short runs with
``learn_adjacency=True`` on the synthetic SCM data (whose generator's graph
IS the preset's adjacency — ground truth by construction), then scores the
learned A against that graph: per-seed raw matrices, plus thresholded edge
precision/recall pooled over seeds. Off-diagonal scoring only (the SCM adds
u_i back outside A, so self-loops are unidentified by design).

    python scripts/validate_adjacency.py --preset morphomnist_causaldae \
        --steps 4000 --seeds 0 1 2 --out /tmp/adjacency_validation.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def learned_A(params):
    flat = __import__("jax").tree_util.tree_flatten_with_path(params)[0]
    import jax
    import numpy as np

    for path, leaf in flat:
        if jax.tree_util.keystr(path).endswith("['A']"):
            return np.asarray(leaf)
    raise KeyError("no learnable A in the param tree (learn_adjacency off?)")


def score(A, truth, threshold):
    """Off-diagonal thresholded edge precision/recall."""
    import numpy as np

    n = A.shape[0]
    off = ~np.eye(n, dtype=bool)
    pred = (np.abs(A) > threshold) & off
    true = (np.asarray(truth) != 0) & off
    tp = int((pred & true).sum())
    fp = int((pred & ~true).sum())
    fn = int((~pred & true).sum())
    return {"tp": tp, "fp": fp, "fn": fn,
            "precision": tp / max(tp + fp, 1), "recall": tp / max(tp + fn, 1)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="morphomnist_causaldae")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="|A_ij| above this counts as a predicted edge")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--out", default="/tmp/adjacency_validation.json")
    args = ap.parse_args()

    import numpy as np

    from causaldiffae_tpu.config import PRESETS, create_diffusion, create_model
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.training.loop import TrainLoop
    from causaldiffae_tpu.utils import logger

    base = PRESETS[args.preset]
    truth = np.asarray(base.adjacency, dtype=np.float32)
    cfg0 = base.replace(
        learn_adjacency=True, total_steps=args.steps,
        # anneal the KL over the short budget so the alignment/compression
        # pressure (the only signal that can move A) is actually felt
        kl_anneal_steps=args.steps,
        log_interval=max(args.steps // 10, 1),
        **({"batch_size": args.batch_size} if args.batch_size else {}),
    )
    logger.configure(dir="/tmp/adjval_log", format_strs=["stdout"])

    results = {"preset": args.preset, "steps": args.steps,
               "threshold": args.threshold,
               "truth": truth.tolist(), "runs": []}
    pooled = {"tp": 0, "fp": 0, "fn": 0}
    for seed in args.seeds:
        cfg = cfg0.replace(seed=seed)
        model = create_model(cfg)
        diffusion = create_diffusion(cfg)
        it = synthetic_iterator(cfg.dataset, cfg.batch_size, seed=seed)
        loop = TrainLoop(cfg, model, diffusion, it, ckpt_dir=None)
        state = loop.run_loop(num_steps=args.steps)
        import jax

        A = learned_A(jax.device_get(state.params))
        s = score(A, truth, args.threshold)
        for k in pooled:
            pooled[k] += s[k]
        print(f"seed {seed}: A=\n{np.round(A, 4)}\n  {s}")
        results["runs"].append({"seed": seed, "A": A.tolist(), **s})

    results["pooled"] = {
        **pooled,
        "precision": pooled["tp"] / max(pooled["tp"] + pooled["fp"], 1),
        "recall": pooled["tp"] / max(pooled["tp"] + pooled["fn"], 1),
    }
    print(json.dumps(results["pooled"]))
    Path(args.out).write_text(json.dumps(results, indent=1))
    print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
