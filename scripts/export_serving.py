#!/usr/bin/env python
"""Export a trained model as a self-contained serving artifact.

Lowers one serving program — counterfactual generation, reconstruction, or
prior sampling (the chains behind `scripts/counterfactual_test.py` /
`scripts/sample.py`) — to StableHLO via ``jax.export`` with the checkpoint's
weights baked in, and writes it to one file + a JSON manifest. The artifact
runs without this package's model code or checkpoint files:

    fn, manifest = causaldiffae_tpu.serving.load_artifact(path)
    images = fn(x, value, seed)          # per manifest['inputs']

No reference counterpart (its serving story is "run the eval script").

Usage:
  python scripts/export_serving.py --preset morphomnist_causaldae \
      --ckpt_dir /ckpts/run1 --fn counterfactual --intervene_var 0 \
      --sampler dpm++ --sample_steps 25 --out /tmp/serve/do_thickness.shlo
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_serving_fn(cfg, model, diffusion, variables, kind, *,
                     batch_size, intervene_var=0, where="auto",
                     guidance_w=None, abduction="qsample",
                     sampler=None, sample_steps=None, seed=0,
                     poly_batch=False):
    """(fn, example_args, input_names) for one serving program.

    Inputs are positional arrays: x (except prior), y/c when the config
    conditions on them, the intervention value (counterfactual only), and an
    int32 seed that derives every RNG draw inside the chain. With
    ``poly_batch`` the batch dimension is exported symbolically — one
    artifact serves every batch size (XLA attention path only; the prior
    sampler has no batched input to carry the symbol, so it stays fixed).
    """
    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.evals import (
        make_counterfactual_fn,
        make_prior_sample_fn,
        make_reconstruct_fn,
    )

    if poly_batch:
        if kind == "prior":
            raise ValueError("--poly_batch needs a batched input; the prior "
                             "sampler's shape is fixed at export time")
        from jax import export as jexport

        B = jexport.symbolic_shape("b")[0]

        def arr(shp, dt):
            return jax.ShapeDtypeStruct(shp, dt)
    else:
        B = batch_size

        def arr(shp, dt):
            return jnp.zeros(shp, dt)

    shape = (B, cfg.image_size, cfg.image_size, cfg.in_channels)
    names, example = [], []
    if kind != "prior":
        names.append("x")
        example.append(arr(shape, jnp.float32))
    if cfg.class_cond:
        names.append("y")
        example.append(arr((B,), jnp.int32))
    if cfg.context_cond:
        names.append("c")
        example.append(arr((B, 4), jnp.float32))
    if kind == "counterfactual":
        names.append("value")
        example.append(arr((), jnp.float32))
    names.append("seed")
    example.append(arr((), jnp.int32))

    common = dict(sampler=sampler, sample_steps=sample_steps)
    if kind == "counterfactual":
        inner = make_counterfactual_fn(
            cfg, model, diffusion, intervene_var=intervene_var, where=where,
            w=guidance_w, abduction=abduction, **common)
    elif kind == "reconstruct":
        inner = make_reconstruct_fn(cfg, model, diffusion, w=guidance_w, **common)
    elif kind == "prior":
        inner = make_prior_sample_fn(cfg, model, diffusion, use_ddim=True, **common)
    else:
        raise ValueError(f"unknown serving fn kind: {kind}")

    def fn(*args):
        kw = dict(zip(names, args))
        cond = {k: kw[k] for k in ("y", "c") if k in kw}
        rng = jax.random.PRNGKey(kw["seed"])
        if kind == "counterfactual":
            return inner(variables, kw["x"], cond, kw["value"], rng)
        if kind == "reconstruct":
            return inner(variables, kw["x"], cond, rng)
        return inner(variables, shape, cond, rng)

    return fn, tuple(example), names


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", required=True)
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--out", required=True, help="artifact output path")
    parser.add_argument("--fn", choices=["counterfactual", "reconstruct", "prior"],
                        default="counterfactual")
    parser.add_argument("--intervene_var", type=int, default=0)
    parser.add_argument("--where", choices=["auto", "pre", "post"], default="auto")
    parser.add_argument("--abduction", choices=["qsample", "ddim"], default="qsample")
    parser.add_argument("--guidance_w", type=float, default=None)
    parser.add_argument("--sampler", choices=["ddim", "ddpm", "dpm++"], default=None)
    parser.add_argument("--sample_steps", type=int, default=None,
                        help="dpm++ node budget (e.g. 25)")
    parser.add_argument("--batch_size", type=int, default=16,
                        help="the artifact's fixed serving batch")
    parser.add_argument("--poly_batch", action="store_true",
                        help="export the batch dimension symbolically: one "
                             "artifact serves any batch size (forces the XLA "
                             "attention path; not available for --fn prior)")
    parser.add_argument("--aot", action="store_true",
                        help="also write a serialized COMPILED executable "
                             "(<out>.xc) next to the artifact; serve.py "
                             "loads it when the platform matches and skips "
                             "the minutes-long first-call recompile. "
                             "Platform/device-count specific; requires a "
                             "fixed batch (not --poly_batch).")
    parser.add_argument("--use_ema", action="store_true")
    parser.add_argument("--use_pallas", type=lambda s: s.lower() in
                        ("1", "true", "t", "y"), default=None,
                        help="override the preset (false = pure StableHLO, "
                             "portable across backends)")
    parser.add_argument("--verify", type=lambda s: s.lower() in
                        ("1", "true", "t", "y"), default=True,
                        help="reload the artifact and check it reproduces "
                             "the direct call on zeros inputs")
    parser.add_argument("--verify_atol", type=float, default=None,
                        help="verify tolerance; default scales with the "
                             "chain length (2e-5 per UNet eval): the export "
                             "round-trip recompiles the StableHLO, XLA may "
                             "fuse differently, and per-step bf16 rounding "
                             "drift compounds over the chain. Integrity "
                             "bugs (wrong weights/chain) show as O(1) "
                             "deltas either way.")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import numpy as np

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.serving import export_artifact, load_artifact
    from causaldiffae_tpu.training import eval_params, restore_eval_state
    from causaldiffae_tpu.utils import logger

    logger.configure()
    cfg = get_config(args.preset)
    if args.use_pallas is not None:
        cfg = cfg.replace(use_pallas=args.use_pallas)
    if args.poly_batch and cfg.use_pallas:
        logger.log("poly_batch: routing attention through XLA (the Pallas "
                   "kernel's grid needs a concrete batch)")
        cfg = cfg.replace(use_pallas=False)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg, eval_mode=True)

    state = restore_eval_state(cfg, model, args.ckpt_dir)
    logger.log(f"restored step {int(state.step)}")
    variables = {"params": eval_params(state, cfg, use_ema=args.use_ema),
                 "batch_stats": state.batch_stats}

    fn, example, names = build_serving_fn(
        cfg, model, diffusion, variables, args.fn, batch_size=args.batch_size,
        intervene_var=args.intervene_var, where=args.where,
        guidance_w=args.guidance_w, abduction=args.abduction,
        sampler=args.sampler, sample_steps=args.sample_steps, seed=args.seed,
        poly_batch=args.poly_batch)

    manifest = export_artifact(fn, example, args.out, {
        "preset": cfg.name, "fn": args.fn, "input_names": names,
        "intervene_var": args.intervene_var, "where": args.where,
        "abduction": args.abduction, "guidance_w": args.guidance_w,
        "sampler": args.sampler or ("ddim" if cfg.eval_use_ddim else "ddpm"),
        "sample_steps": args.sample_steps,
        "batch_size": "polymorphic" if args.poly_batch else args.batch_size,
        "checkpoint_step": int(state.step), "use_ema": args.use_ema,
    })
    logger.log(f"wrote {args.out} ({manifest['bytes']} bytes, "
               f"platforms {manifest['platforms']})")

    if args.aot:
        if args.poly_batch:
            raise SystemExit("--aot needs concrete shapes; drop --poly_batch")
        from causaldiffae_tpu.serving import (
            COMPILED_SUFFIX,
            export_compiled_artifact,
        )

        xc_path = args.out + COMPILED_SUFFIX
        nbytes = export_compiled_artifact(fn, example, xc_path)
        logger.log(f"wrote compiled executable {xc_path} ({nbytes} bytes, "
                   f"platform {jax.default_backend()})")

    if args.verify:
        import jax.numpy as jnp

        n_evals = args.sample_steps or diffusion.num_timesteps
        atol = args.verify_atol
        if atol is None:
            atol = max(1e-5, 2e-5 * n_evals)
        loaded_fn, _ = load_artifact(args.out)
        # jit the direct call: it must go through the same compile path the
        # export lowered (eager pallas_call dispatch on the axon plugin falls
        # back to the CPU lowering rule and fails outside interpret mode)
        direct_fn = jax.jit(fn)
        # poly exports verify at two concrete batch sizes; fixed at theirs
        for b in ((2, args.batch_size) if args.poly_batch else (args.batch_size,)):
            concrete = tuple(
                jnp.zeros(tuple(b if not isinstance(d, int) else d
                                for d in a.shape), a.dtype)
                for a in example)
            direct = np.asarray(direct_fn(*concrete))
            replay = np.asarray(loaded_fn(*concrete))
            delta = float(np.abs(direct - replay).max())
            logger.log(f"verify (batch {b}): max|direct - artifact| = "
                       f"{delta:.3e} (atol {atol:.1e}, {n_evals} UNet evals)")
            if not np.allclose(direct, replay, atol=atol):
                raise SystemExit("artifact does not reproduce the direct call")
    print(f"exported {args.fn} -> {args.out}")


if __name__ == "__main__":
    main()
