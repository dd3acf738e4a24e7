#!/usr/bin/env python
"""Counterfactual evaluation entry.

Rebuild of reference `scripts/image_causaldae_test.py` (C27),
`image_diffae_test.py` (C28) and `image_conditional_test.py` (C29) as one
CLI with three modes:

- causaldae (default): do-interventions through the SCM latents - roots
  edit mu before masking, effects edit z_post after (`:405-453`).
- diffae: interventions directly on mu blocks (no SCM)
  (`image_diffae_test.py:298-300`).
- conditional: interventions edit the label vector c
  (`image_conditional_test.py:132,153`).

Branches:
- --eval_disentanglement: encode train+test sets, run DCI (`:161-312`).
- default: per-variable interventions at random values; effectiveness MAE =
  L1(anti-causal classifier(sample), simulator ground truth) (`:535-607`,
  MAE aggregation `:1046-1076`); sample grids saved as npz + png.
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# variable names per dataset (latent block order)
VAR_NAMES = {
    "morphomnist": ["thickness", "intensity"],
    "pendulum": ["angle", "light", "shadow_len", "shadow_pos"],
    "circuit": ["arm", "blue", "green", "red"],
}
# raw intervention ranges (dataset units) per variable. Effect variables
# (pendulum shadow_len/shadow_pos) are intervened through the z_post path
# (`image_causaldae_test.py:445-453`); ranges from the reference's sweep
# values (`:541-542` - uniform(3, 9) / uniform(3, 15)).
INTERVENTION_RANGES = {
    "morphomnist": [(1.0, 5.5), (64, 250)],
    "pendulum": [(-40, 44), (60, 148), (3, 9), (3, 15)],
    "circuit": [(0.0, 1.0), (0.0, 1.0), (0.0, 1.0), (0.0, 1.0)],
}


def ground_truth_factors(dataset, c_raw, var_idx, value):
    """Propagate do(var=value) through the ground-truth SCM -> all factors."""
    from causaldiffae_tpu.data import circuit_scm, morphomnist_scm, pendulum_scm

    c_new = np.array(c_raw, dtype=np.float64)
    c_new[:, var_idx] = value
    if dataset == "morphomnist":
        if var_idx == 0:  # thickness -> intensity
            c_new[:, 1] = morphomnist_scm(c_new[:, 0])
        return c_new
    if dataset == "pendulum":
        if var_idx in (0, 1):
            slen, spos = pendulum_scm(c_new[:, 0], c_new[:, 1])
            c_new[:, 2], c_new[:, 3] = slen, spos
        return c_new
    if dataset == "circuit":
        if var_idx == 0:
            b, g, r = circuit_scm(c_new[:, 0])
            c_new[:, 1], c_new[:, 2], c_new[:, 3] = b, g, r
        return c_new
    raise ValueError(dataset)


def save_grid(images, path, ncol=8):
    """PNG sample grid (replaces torchvision save_image)."""
    from PIL import Image

    imgs = np.asarray(images)
    n, h, w, c = imgs.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.zeros((nrow * h, ncol * w, c), dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    arr = (np.clip(grid, 0, 1) * 255).astype(np.uint8)
    if c == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="morphomnist_causaldae")
    parser.add_argument("--mode", choices=["causaldae", "diffae", "conditional"],
                        default="causaldae")
    parser.add_argument("--ckpt_dir", required=False, default=None)
    # NB the reference eval loads the RAW model checkpoint (model014000.pt),
    # not the EMA one; at 0.9999 the EMA is still ~30% random init after 12k
    # steps, so defaulting to raw matches both the reference and sanity.
    parser.add_argument("--use_ema", type=lambda s: s.lower() in ("1", "true", "t", "y"),
                        default=False)
    parser.add_argument("--data_dir", default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--guidance_w", type=float, default=None)
    parser.add_argument("--eval_disentanglement", action="store_true")
    parser.add_argument("--classifier_dir", default="")
    parser.add_argument("--out_dir", default="/tmp/causaldiffae_eval")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compute_fid", action="store_true",
                        help="FID(real test images, generated counterfactuals) "
                             "over trained classifier-trunk features")
    parser.add_argument("--inception_weights", default="",
                        help="local InceptionV3 weights file for published-FID "
                             "features (requires torchvision)")
    parser.add_argument("--traversal", action="store_true",
                        help="save per-variable latent-traversal grids "
                             "(reference image_causaldae_test.py:500-520)")
    parser.add_argument("--no_recon", action="store_true",
                        help="skip the reconstruction grid")
    parser.add_argument("--abduction", choices=["qsample", "ddim"],
                        default="qsample",
                        help="qsample: stochastic forward abduction at t=249 "
                             "(the reference's shipped path); ddim: exact "
                             "deterministic DDIM inversion")
    parser.add_argument("--where", choices=["auto", "pre", "post"], default="auto",
                        help="intervention site for causaldae mode: pre = on mu "
                             "before the SCM pass (root-variable convention, "
                             "image_causaldae_test.py:408), post = on z_post "
                             "after it (the reference's SHIPPED convention for "
                             "every variable incl. roots, :570-573), auto = "
                             "pre for roots / post for effect variables")
    parser.add_argument("--clf_epochs", type=int, default=100,
                        help="anti-causal classifier training epochs "
                             "(reference classifiers.py uses 100)")
    parser.add_argument("--sampler", choices=["ddim", "ddpm", "dpm++"],
                        default=None,
                        help="generation chain; default follows the preset's "
                             "eval_use_ddim. dpm++ = 2nd-order DPM-Solver++ "
                             "on a lambda-uniform node subset (fast serving "
                             "path, no reference counterpart)")
    parser.add_argument("--sample_steps", type=int, default=None,
                        help="dpm++ node budget (e.g. 25); abduction stays at "
                             "the respaced top node, only the descent grid "
                             "is re-spaced")
    args = parser.parse_args()
    if args.sample_steps is not None and args.sampler != "dpm++":
        parser.error("--sample_steps only applies to --sampler dpm++; "
                     "ddim/ddpm step counts come from timestep_respacing")

    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import DATA_SCALES, create_diffusion, create_model, get_config
    from causaldiffae_tpu.data import load_data, synthetic_dataset
    from causaldiffae_tpu.evals import (
        ClassifierTrainer, compute_dci, compute_irs, load_classifier,
        classifier_predict_fn, make_counterfactual_fn, make_reconstruct_fn, mcc,
    )
    from causaldiffae_tpu.evals.quality import FID, default_feature_fn
    from causaldiffae_tpu.parallel import (
        eval_placement, gather_across_hosts, is_primary_host,
        mean_across_hosts, sync_across_hosts,
    )
    from causaldiffae_tpu.models.unet import CausalUNet
    from causaldiffae_tpu.training import eval_params, restore_eval_state
    from causaldiffae_tpu.utils import logger

    logger.configure()
    cfg = get_config(args.preset)
    if args.mode == "diffae":
        cfg = cfg.replace(causal_modeling=False, masking=False)
    if args.guidance_w is not None:
        cfg = cfg.replace(guidance_w=args.guidance_w)
    num_samples = args.num_samples or cfg.num_samples
    dataset = cfg.dataset
    os.makedirs(args.out_dir, exist_ok=True)

    model = create_model(cfg)
    eval_diffusion = create_diffusion(cfg, eval_mode=True)

    # --- data ---
    if args.synthetic or not args.data_dir:
        test_pool = synthetic_dataset(dataset, max(num_samples, 512), seed=args.seed + 99)
        train_pool = synthetic_dataset(dataset, 2048, seed=args.seed + 1)
    else:
        from causaldiffae_tpu.data.loaders import (
            load_circuit, load_morphomnist, load_pendulum,
        )
        loaders = {"morphomnist": lambda s: load_morphomnist(args.data_dir, train=(s == "train")),
                   "pendulum": lambda s: load_pendulum(args.data_dir, split=s),
                   "circuit": lambda s: load_circuit(args.data_dir, split=s)}
        train_pool = loaders[dataset]("train")
        test_pool = loaders[dataset]("test")

    # --- restore model variables ---
    first = {k: jnp.asarray(v[: args.batch_size]) for k, v in test_pool.items()}
    state = restore_eval_state(cfg, model, args.ckpt_dir, template_batch=first)
    if args.ckpt_dir:
        logger.log(f"restored step {int(state.step)} from {args.ckpt_dir}")
    params = eval_params(state, cfg, use_ema=args.use_ema)
    variables = {"params": params, "batch_stats": state.batch_stats}
    # state is built/restored on host; run eval on the accelerator(s).
    # Single-process multi-chip hosts get the chains data-parallel;
    # multi-process keeps the per-host split path (see eval_placement).
    variables, put, eval_mesh = eval_placement(variables, args.batch_size)
    if eval_mesh is not None:
        logger.log(f"eval is data-parallel over {len(jax.local_devices())} "
                   f"local devices")

    scale = np.asarray(DATA_SCALES[dataset])

    # ---------------- DCI branch ---------------- #
    if args.eval_disentanglement:
        @jax.jit
        def encode_z(x, rng):
            mu, _ = model.apply(variables, x, train=False, method=CausalUNet.encode)
            z_post = (model.apply(variables, mu, method=CausalUNet.causalize)
                      if cfg.causal_modeling else mu)
            noise = jax.random.normal(rng, z_post.shape)
            return z_post + jnp.sqrt(cfg.reparam_var_scale) * noise

        def encode_pool(pool, seed):
            reps = []
            for i in range(0, len(pool["image"]) - args.batch_size + 1, args.batch_size):
                x = put(pool["image"][i:i + args.batch_size])
                reps.append(np.asarray(encode_z(x, jax.random.PRNGKey(seed + i))))
            return np.concatenate(reps, 0)

        rep_train = encode_pool(train_pool, 0)
        rep_test = encode_pool(test_pool, 10_000)
        y_train = train_pool["c"][: len(rep_train)]
        y_test = test_pool["c"][: len(rep_test)]
        scores, _, _ = compute_dci(rep_train.T, y_train.T, rep_test.T, y_test.T)
        result = {k: float(v) for k, v in scores.items()}
        # IRS + MCC: the reference DEFINES both (metrics.py:61-164,235-245)
        # but never wires them into any shipped eval; report them here next
        # to DCI. IRS groups samples by identical factor VALUES, which is
        # degenerate for continuous factors (every group is a singleton ->
        # IRS == 1.0 by construction), so factors are first discretized into
        # 20 quantile bins - the disentanglement_lib convention the metric
        # assumes. MCC needs equal dims, so the latent is reduced to its
        # per-variable block means (the SCM latent's natural block structure).
        y_np = np.asarray(y_test)
        y_binned = np.stack([
            np.digitize(col, np.quantile(col, np.linspace(0, 1, 21)[1:-1]))
            for col in y_np.T], axis=1)
        result["IRS"] = float(compute_irs(rep_test.T, y_binned.T)["IRS"])
        d_block = rep_test.shape[1] // cfg.n_vars
        block_means = rep_test.reshape(len(rep_test), cfg.n_vars, d_block).mean(-1)
        result["MCC_block_mean"] = mcc(y_np, block_means)
        logger.log(f"disentanglement: {result}")
        print(json.dumps(result))
        return result

    # ---------------- effectiveness branch ---------------- #
    # anti-causal classifiers: load if provided, else quick-train on the pool
    n_factors = len(VAR_NAMES[dataset])
    predictors, clf_mv, clf_val_mse = [], [], {}
    for f in range(n_factors):
        name = VAR_NAMES[dataset][f]
        cdir = args.classifier_dir or args.out_dir
        path = os.path.join(cdir, f"classifier_{dataset}_{name}.pkl")
        # a reference-trained probe in its own naming/format
        # (`image_causaldae_test.py:129-158` loads classifier_<factor>_best.pth)
        # is used directly when no native pickle exists
        ref_path = os.path.join(cdir, f"classifier_{name.replace('_', '')}_best.pth")
        if not os.path.exists(path) and os.path.exists(ref_path):
            logger.log(f"importing reference torch classifier {ref_path}")
            path = ref_path
        # multi-host: only the primary trains/writes the classifier file;
        # everyone else waits at the barrier then reads it (avoids N
        # redundant trainings and concurrent non-atomic pickle writes)
        if not os.path.exists(path) and is_primary_host():
            logger.log(f"training anti-causal classifier for {VAR_NAMES[dataset][f]}...")
            tr = ClassifierTrainer(dataset, f, cfg.n_vars, seed=args.seed)
            n = len(train_pool["image"])
            # shuffle before the 90/10 split: real archives can be
            # index-sorted (morpho CSV), and a sorted tail makes the val set
            # unrepresentative
            perm = np.random.RandomState(args.seed + 17).permutation(n)
            cut = int(n * 0.9)
            tr.fit({k: v[perm[:cut]] for k, v in train_pool.items()},
                   {k: v[perm[cut:]] for k, v in train_pool.items()},
                   epochs=args.clf_epochs, batch_size=64, log_every=10)
            tr.save_best(path)
        sync_across_hosts(f"clf_{f}")
        m, v, meta = load_classifier(path, cfg.n_vars, image_size=cfg.image_size)
        predictors.append(classifier_predict_fn(m, v))
        clf_mv.append((m, v))
        clf_val_mse[name] = float(meta.get("best_val", float("nan")))

    fid = None
    if args.compute_fid:
        fid = FID(default_feature_fn(
            classifier_model=clf_mv[0][0], classifier_variables=clf_mv[0][1],
            inception_weights=args.inception_weights or None,
        ))
        fid.update(np.clip(test_pool["image"][:num_samples * 2], 0, 1), real=True)

    # per-process decorrelation: each host draws different eval samples and
    # intervention values, so the cross-host gather adds coverage instead of
    # concatenating identical copies
    rng_np = np.random.RandomState(args.seed + 1000003 * jax.process_index())
    w = cfg.guidance_w
    mae = {name: [] for name in VAR_NAMES[dataset]}
    n_batches = max(num_samples // args.batch_size, 1)

    # fixed probe batch for reconstruction / traversal grids
    probe_sel = rng_np.randint(0, len(test_pool["image"]), args.batch_size)
    probe_x = put(test_pool["image"][probe_sel])
    probe_cond = {}
    if cfg.class_cond:
        probe_cond["y"] = put(test_pool["y"][probe_sel])
    if cfg.context_cond:
        probe_cond["c"] = put(test_pool["c"][probe_sel])

    if not args.no_recon and args.mode != "conditional":
        # reconstruction grid: originals (top rows) above reconstructions
        # (reference `image_causaldae_test.py:484-498`)
        recon_fn = jax.jit(make_reconstruct_fn(
            cfg, model, eval_diffusion, use_ddim=cfg.eval_use_ddim, w=w,
            sampler=args.sampler, sample_steps=args.sample_steps))
        recon = np.asarray(recon_fn(variables, probe_x, probe_cond,
                                    jax.random.PRNGKey(args.seed + 7)))
        k = min(8, len(recon))
        pair = np.concatenate([np.asarray(probe_x)[:k], recon[:k]], axis=0)
        if is_primary_host():
            save_grid(pair, os.path.join(args.out_dir, "reconstructions.png"), ncol=k)
            np.savez(os.path.join(args.out_dir, "reconstructions.npz"),
                     original=np.asarray(probe_x)[:k], recon=recon[:k])
        logger.log(f"reconstruction grid saved ({k} pairs), "
                   f"mae={np.abs(recon[:k] - np.asarray(probe_x)[:k]).mean():.4f}")

    if args.mode == "conditional":
        # interventions edit the c vector, conditioning the context model
        from causaldiffae_tpu.evals import resolve_sampler

        loop = resolve_sampler(cfg.eval_use_ddim, args.sampler, args.sample_steps)

        def gen(c_edit, y_cond, x, rng):
            def model_fn(xx, tt):
                return model.apply(variables, xx, tt, y=y_cond, c=c_edit,
                                   train=False, method=CausalUNet.denoise)
            noise = jax.random.normal(jax.random.fold_in(rng, 0), x.shape)
            t = jnp.full((x.shape[0],), cfg.abduction_t, dtype=jnp.int32)
            x_t = eval_diffusion.q_sample(x, t, noise)
            return loop(eval_diffusion, model_fn, x_t,
                        jax.random.fold_in(rng, 1),
                        clip_denoised=cfg.clip_denoised)

        gen = jax.jit(gen)

    for var_idx, name in enumerate(VAR_NAMES[dataset]):
        rng_range = INTERVENTION_RANGES[dataset][var_idx]
        if rng_range is None:
            continue
        if args.mode != "conditional":
            cf_fn = jax.jit(make_counterfactual_fn(
                cfg, model, eval_diffusion, intervene_var=var_idx,
                where="pre" if args.mode == "diffae" else args.where,
                use_ddim=cfg.eval_use_ddim, w=w, abduction=args.abduction,
                sampler=args.sampler, sample_steps=args.sample_steps,
            ))
        if args.traversal and args.mode != "conditional":
            # latent traversal: sweep the variable over its normalized range
            # on a fixed probe batch (reference sweeps value=-0.5+0.15*i,
            # `image_causaldae_test.py:500-520`); one row per sweep value.
            lo = (rng_range[0] - scale[var_idx, 0]) / scale[var_idx, 1]
            hi = (rng_range[1] - scale[var_idx, 0]) / scale[var_idx, 1]
            # sweep at the FULL probe batch (same shape as the MAE loop below
            # -> one XLA compilation per variable, not two; 3-6 min per extra
            # chain compile through the axon tunnel), display the first 8
            k8 = min(8, len(probe_x))
            rows = []
            for val in np.linspace(lo, hi, 8):
                s = cf_fn(variables, probe_x, probe_cond, float(val),
                          jax.random.PRNGKey(args.seed + 31))  # same key: only do() varies
                rows.append(np.asarray(s)[:k8])
            trav = np.concatenate(rows, axis=0)
            if is_primary_host():
                save_grid(trav, os.path.join(args.out_dir, f"traversal_{name}.png"),
                          ncol=k8)
            logger.log(f"traversal grid for {name}: 8 levels x {k8} samples")
        grids = []
        for b in range(n_batches):
            sel = rng_np.randint(0, len(test_pool["image"]), args.batch_size)
            x = put(test_pool["image"][sel])
            cond = {}
            if cfg.class_cond:
                cond["y"] = put(test_pool["y"][sel])
            if cfg.context_cond:
                cond["c"] = put(test_pool["c"][sel])

            raw_value = rng_np.uniform(*rng_range)
            norm_value = (raw_value - scale[var_idx, 0]) / scale[var_idx, 1]

            # ground truth: propagate through the true SCM, normalized
            c_raw = test_pool["c"][sel] * scale[:, 1] + scale[:, 0]
            gt = ground_truth_factors(dataset, c_raw, var_idx, raw_value)
            gt_norm = (gt - scale[:, 0]) / scale[:, 1]

            key = jax.random.fold_in(
                jax.random.PRNGKey(args.seed * 1000 + var_idx * 100 + b),
                jax.process_index(),
            )
            if args.mode == "conditional":
                c_edit = np.array(test_pool["c"][sel])
                c_edit[:, var_idx] = norm_value
                c_edit = put(c_edit)
                y_cond = put(test_pool["y"][sel]) if cfg.class_cond else None
                samples = gen(c_edit, y_cond, x, key)
            else:
                samples = cf_fn(variables, x, cond, norm_value, key)
            samples = np.asarray(samples)
            grids.append(samples)

            # one clip + host->device transfer per batch, shared by every
            # probe (a per-predictor transfer would round-trip the tunnel
            # n_factors times per batch)
            clipped = jnp.asarray(np.clip(samples, 0, 1))
            for f, pred in enumerate(predictors):
                out = np.asarray(pred(clipped))
                mae[VAR_NAMES[dataset][f]].append(
                    np.abs(out - gt_norm[:, f]).mean()
                )
        # multi-host: concatenate every host's samples before saving
        # (reference all_gathers each sample batch, `:438-440`)
        allg = gather_across_hosts(np.concatenate(grids, 0))
        if fid is not None:
            fid.update(np.clip(allg, 0, 1), real=False)
        if is_primary_host():
            # stamp the generation plan so rescore_counterfactuals.py can
            # verify its RandomState replay matches these samples
            np.savez(os.path.join(args.out_dir, f"samples_do_{name}.npz"),
                     samples=allg, seed=args.seed, batch_size=args.batch_size,
                     num_samples=num_samples,
                     process_count=jax.process_count(),
                     synthetic_pool=int(args.synthetic or not args.data_dir))
            save_grid(allg[:64], os.path.join(args.out_dir, f"grid_do_{name}.png"))
        logger.log(f"do({name}): saved {len(allg)} samples")

    # MAE averaged across hosts (reference `:1046-1076`); each MAE ships with
    # its probe's calibration (the classifier's best val MSE) so the metric's
    # trustworthiness is visible next to the number it bounds
    result = {f"mae_{k}": mean_across_hosts(float(np.mean(v)))
              for k, v in mae.items() if v}
    for k, v in clf_val_mse.items():
        result[f"clf_val_mse_{k}"] = v
    if fid is not None:
        result["fid"] = fid.compute()
        logger.log(f"FID (counterfactuals vs real): {result['fid']:.3f}")
    logger.log(f"effectiveness MAE: {result}")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
