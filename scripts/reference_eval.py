"""Cross-stack end-to-end eval: drive the REFERENCE's own eval script on
weights trained by THIS framework (VERDICT r4 item 1).

Every parity proof so far is per-module (eps prediction, losses, loaders) or
within this repo's own eval. This harness closes the loop at the system
level: it exports a checkpoint trained here to a reference-format ``.pt``
(`utils/torch_port.export_torch_state_dict`), fabricates a real-format
MorphoMNIST archive from the SAME synthetic pool the model evaluates on,
then runs the reference's SHIPPED eval pipeline
(`/root/reference/scripts/image_causaldae_test.py:320-607` — abduct at
t=249 -> intervene thickness pre-mask / intensity post-mask at 0.2 ->
ddim_sample_loop, torch on CPU) unmodified via ``runpy``. The exact input
batch the reference consumed is captured and replayed through this repo's
counterfactual path (`evals/counterfactual.make_counterfactual_fn`), and
BOTH stacks' samples are scored with ONE fixed probe set
(`evals/classifiers.load_classifier` pickles — also exported as torch
``classifier_*_best.pth`` so the reference script's probe loads are real
weights, `image_causaldae_test.py:134-141`).

Agreement criterion: per-factor probe MAE deltas within the documented
probe-instrument noise (RESULTS.md "The intensity shift is the
instrument"), on identical weights, identical inputs, identical probes.
The chains differ only in their RNG draws (abduction noise + encoder
reparameterization), which is the reference's own shipped stochasticity.

The reference script is executed AS-IS: no file under /root/reference is
modified; missing environment pieces are provided as import shims
(mpi4py/blobfile/torchvision/torchmetrics/munkres are absent here, and
``datasets.generators`` ships with the real archives, not the repo —
`data/simulators.py` provides the equivalent generators).

Usage (after a full-budget train + probe training):
  python scripts/reference_eval.py --preset morphomnist_causaldae \
      --ckpt_dir .runs/mm_causaldae/ckpt --classifier_dir /tmp/ve \
      --batch_size 32 --out_dir /tmp/refeval
"""

from __future__ import annotations

import argparse
import io as _stdio
import json
import os
import runpy
import sys
import types
from pathlib import Path
from typing import Dict, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE_ROOT = Path(os.environ.get("CDAE_REFERENCE_ROOT", "/root/reference"))

VAR_FACTORS = {"morphomnist": ("thickness", "intensity")}


# --------------------------------------------------------------------- #
# import shims: the environment the reference script assumes
# --------------------------------------------------------------------- #
def install_reference_shims():
    """Register stand-ins for packages the reference imports but this
    environment lacks. Only modules genuinely absent are stubbed; all
    stubs are inert in the shipped morphomnist eval path (the ``fid``
    global, TSNE/PCA and ``munkres``-backed metrics are constructed or
    imported but never called with generate_interventions=True,
    `image_causaldae_test.py:81-83,921`)."""
    import importlib.util

    if "mpi4py" not in sys.modules:
        mpi = types.ModuleType("mpi4py")

        class _Comm:
            rank = 0
            size = 1

            def Get_rank(self):
                return 0

            def Get_size(self):
                return 1

            def bcast(self, obj, root=0):
                return obj

        mpi.MPI = types.SimpleNamespace(COMM_WORLD=_Comm())
        sys.modules["mpi4py"] = mpi

    # repair an already-imported dist_util whose cached MPI object came from
    # a non-functional stub (e.g. a prior test in the same process)
    du = sys.modules.get("improved_diffusion.dist_util")
    if du is not None and getattr(getattr(du, "MPI", None), "COMM_WORLD", None) is None:
        du.MPI = sys.modules["mpi4py"].MPI

    if "blobfile" not in sys.modules:
        bf = types.ModuleType("blobfile")
        bf.basename = os.path.basename
        bf.listdir = os.listdir
        bf.join = os.path.join
        bf.isdir = os.path.isdir
        bf.BlobFile = open
        sys.modules["blobfile"] = bf

    if "munkres" not in sys.modules and importlib.util.find_spec("munkres") is None:
        mk = types.ModuleType("munkres")

        class Munkres:  # imported by improved_diffusion.metrics, unused here
            pass

        mk.Munkres = Munkres
        sys.modules["munkres"] = mk

    if ("torchmetrics" not in sys.modules
            and importlib.util.find_spec("torchmetrics") is None):
        tm = types.ModuleType("torchmetrics")
        tm_img = types.ModuleType("torchmetrics.image")
        tm_fid = types.ModuleType("torchmetrics.image.fid")

        class FrechetInceptionDistance:
            """Constructed at module scope (`image_causaldae_test.py:38`)
            but never updated/computed in the generate_interventions path;
            the real torchmetrics would download Inception weights (no
            egress here)."""

            def __init__(self, *a, **k):
                pass

        tm_fid.FrechetInceptionDistance = FrechetInceptionDistance
        tm_img.fid = tm_fid
        tm.image = tm_img
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.image"] = tm_img
        sys.modules["torchmetrics.image.fid"] = tm_fid

    _install_torchvision_stub()
    _install_datasets_generators_shim()


def _install_torchvision_stub():
    """torchvision is not installed here; the reference needs
    ``transforms`` (image_datasets import), ``utils.save_image`` (grid
    dumps) and ``models`` (imported, unused). save_image is a real PIL
    implementation so the reference's grids land on disk for inspection."""
    import importlib.util

    try:
        spec = importlib.util.find_spec("torchvision")
    except ValueError:
        # a bare stub (no __spec__) is already in sys.modules — e.g.
        # test_diffusion_branches' train_util import shim; augment it below
        spec = None
    if spec is not None:
        import torchvision  # noqa: F401

        return
    if getattr(sys.modules.get("torchvision"), "utils", None) is not None:
        return
    import torch

    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = getattr(tv, "transforms", None) or types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ToTensor:
        def __call__(self, pic):
            arr = np.array(pic, dtype=np.uint8, copy=True)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
            return t.to(dtype=torch.float32).div(255)

    tr.Compose, tr.ToTensor = Compose, ToTensor
    if not hasattr(tr, "Resize"):
        class Resize:
            def __init__(self, size):
                self.size = size

            def __call__(self, img):
                return img

        tr.Resize = Resize

    tu = types.ModuleType("torchvision.utils")

    def save_image(tensor, fp, nrow=8, **kwargs):
        from PIL import Image

        if isinstance(tensor, (list, tuple)):
            tensor = torch.stack(list(tensor))
        x = tensor.detach().cpu().float().clamp(0, 1).numpy()
        if x.ndim == 3:
            x = x[None]
        n, c, h, w = x.shape
        ncol = min(nrow, n)
        nrows = (n + ncol - 1) // ncol
        grid = np.zeros((c, nrows * h, ncol * w), dtype=np.float32)
        for i in range(n):
            r, col = divmod(i, ncol)
            grid[:, r * h:(r + 1) * h, col * w:(col + 1) * w] = x[i]
        arr = (grid * 255).astype(np.uint8).transpose(1, 2, 0)
        if c == 1:
            Image.fromarray(arr[:, :, 0], "L").save(fp)
        else:
            Image.fromarray(arr[:, :, :3]).save(fp)

    tu.save_image = save_image
    tm = types.ModuleType("torchvision.models")
    tv.transforms, tv.utils, tv.models = tr, tu, tm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.utils"] = tu
    sys.modules["torchvision.models"] = tm


def _install_datasets_generators_shim():
    """The reference imports ``datasets.generators.{pendulum,morphomnist}_
    script`` — utilities that ship with the real dataset dumps, not the
    repo. Provide the equivalent generators from `data/simulators.py`
    (ground-truth SCM push-forwards; only used by the eval's commented-out
    random-value MAE variants, but imported unconditionally)."""
    if "datasets.generators.pendulum_script" in sys.modules:
        return
    from causaldiffae_tpu.data import simulators

    ds = types.ModuleType("datasets")
    gen = types.ModuleType("datasets.generators")

    pd_mod = types.ModuleType("datasets.generators.pendulum_script")

    def pendulum_generate(angle, light):
        import torch

        angle = np.asarray(angle, dtype=np.float64)
        light = np.asarray(light, dtype=np.float64)
        imgs = simulators.render_pendulum(angle, light)
        slen, spos = simulators.pendulum_scm(angle, light)
        v = np.stack([angle, light, slen, spos], -1)
        return torch.as_tensor(imgs), v

    pd_mod.generate = pendulum_generate

    ms_mod = types.ModuleType("datasets.generators.morphomnist_script")

    def morphomnist_generate(thickness=None, intensity=None):
        thickness = np.asarray(thickness, dtype=np.float64)
        intensity_det = simulators.morphomnist_scm(thickness)
        return np.stack([thickness, intensity_det], -1)

    ms_mod.generate = morphomnist_generate

    gen.pendulum_script = pd_mod
    gen.morphomnist_script = ms_mod
    ds.generators = gen
    sys.modules["datasets"] = ds
    sys.modules["datasets.generators"] = gen
    sys.modules["datasets.generators.pendulum_script"] = pd_mod
    sys.modules["datasets.generators.morphomnist_script"] = ms_mod


# --------------------------------------------------------------------- #
# archive fabrication: synthetic pool -> real MorphoMNIST file format
# --------------------------------------------------------------------- #
def fabricate_morphomnist_archive(out_dir: str, pool: Dict[str, np.ndarray]):
    """Write a synthetic pool as train-/t10k- IDX + morpho CSV files so the
    reference's own `MorphoMNISTLike` dataset (`image_datasets.py:241-296`)
    serves the exact images/factors this repo's eval uses (loader parity is
    separately pinned in tests/test_loader_parity.py)."""
    from causaldiffae_tpu.config import DATA_SCALES
    from causaldiffae_tpu.data import save_idx

    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    images = np.rint(pool["image"][..., 0] * 255.0).astype(np.uint8)
    labels = pool["y"].astype(np.uint8)
    scale = np.asarray(DATA_SCALES["morphomnist"])
    c_raw = pool["c"] * scale[:, 1] + scale[:, 0]
    for prefix in ("train", "t10k"):
        save_idx(images, str(d / f"{prefix}-images-idx3-ubyte.gz"))
        save_idx(labels, str(d / f"{prefix}-labels-idx1-ubyte.gz"))
        rows = ["index,area,length,thickness,slant,width,height,intensity"]
        for i in range(len(images)):
            rows.append(
                f"{i},10,20,{float(c_raw[i, 0])!r},0,5,5,{float(c_raw[i, 1])!r}")
        (d / f"{prefix}-morpho.csv").write_text("\n".join(rows))
    return str(d)


# --------------------------------------------------------------------- #
# reference-side run
# --------------------------------------------------------------------- #
def run_reference_eval(*, model_pt: str, data_dir: str, sandbox: str,
                       model_args: Dict[str, str], batch_size: int,
                       seed: int = 0,
                       script: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Execute the reference's image_causaldae_test.py unmodified.

    Returns the input batch it consumed and the two intervened sample sets
    its own ddim_sample_loop produced (thickness pre-mask then intensity
    post-mask at 0.2, `image_causaldae_test.py:405-480`), captured by
    wrapping the loop entry points — chain order is the script's own.
    """
    import torch

    install_reference_shims()
    sys.path.insert(0, str(REFERENCE_ROOT))
    sys.path.insert(0, str(REFERENCE_ROOT / "scripts"))

    import improved_diffusion.image_datasets as ref_ds
    from causaldiffae_tpu.data.loaders import load_idx as our_load_idx

    ref_ds.io = types.SimpleNamespace(load_idx=our_load_idx,
                                      BytesIO=_stdio.BytesIO)

    sb = Path(sandbox)
    scripts_cwd = sb / "scripts"
    for sub in ("scripts", "results/morphomnist/causaldiffae",
                "results/morphomnist/classifier"):
        (sb / sub).mkdir(parents=True, exist_ok=True)

    recorded = {"chains": [], "batches": []}

    import improved_diffusion.script_util as ref_su
    from improved_diffusion.nn import GaussianConvEncoder
    from improved_diffusion.respace import SpacedDiffusion

    orig_cmd = ref_su.create_model_and_diffusion

    def patched_cmd(**kw):
        """The reference UNet ctor hardcodes its encoder's num_vars=4
        (`unet.py:377`), which breaks the conv-stack geometry for any other
        n_vars — its own shipped MNIST checkpoints (num_vars=2 encoder)
        cannot strict-load into the script-as-written model. Apply the same
        rebuild test_torch_parity.py documents, with the CLI's n_vars."""
        model, diffusion = orig_cmd(**kw)
        if getattr(model, "rep_dim", None) is not None:
            model.rep_emb = GaussianConvEncoder(
                in_channels=kw["in_channels"], latent_dim=model.rep_dim,
                num_vars=kw["n_vars"])
        return model, diffusion

    orig_ddim = SpacedDiffusion.ddim_sample_loop
    orig_psl = SpacedDiffusion.p_sample_loop

    def rec_ddim(self, *a, **k):
        out = orig_ddim(self, *a, **k)
        recorded["chains"].append(out.detach().cpu().numpy())
        return out

    def rec_psl(self, *a, **k):
        out = orig_psl(self, *a, **k)
        recorded["chains"].append(out.detach().cpu().numpy())
        return out

    # the reference hardcodes num_workers=1 (`image_datasets.py:336`);
    # forking a worker under an already-multithreaded JAX process risks a
    # deadlock, and one in-process worker costs nothing at eval batch sizes
    orig_dataloader = ref_ds.DataLoader

    def inline_dataloader(*a, **k):
        k["num_workers"] = 0
        return orig_dataloader(*a, **k)

    orig_load_data = ref_ds.load_data

    def rec_load_data(**kwargs):
        gen = orig_load_data(**kwargs)
        is_train = kwargs.get("split", "train") == "train"

        def wrapped():
            for batch, cond in gen:
                if is_train:
                    recorded["batches"].append(
                        (batch.detach().cpu().numpy(),
                         {k: v.detach().cpu().numpy() for k, v in cond.items()}))
                yield batch, cond

        return wrapped()

    argv = [
        "image_causaldae_test.py",
        "--data_dir", data_dir,
        "--model_path", model_pt,
        "--batch_size", str(batch_size),
        "--num_samples", str(batch_size),  # the loop breaks after one batch
        "--use_ddim", "True",
    ]
    for k, v in model_args.items():
        argv += [f"--{k}", str(v)]

    script = script or str(REFERENCE_ROOT / "scripts" / "image_causaldae_test.py")
    old_argv, old_cwd = sys.argv, os.getcwd()
    SpacedDiffusion.ddim_sample_loop = rec_ddim
    SpacedDiffusion.p_sample_loop = rec_psl
    ref_ds.load_data = rec_load_data
    ref_ds.DataLoader = inline_dataloader
    ref_su.create_model_and_diffusion = patched_cmd
    torch.manual_seed(seed)
    np.random.seed(seed)
    try:
        os.chdir(scripts_cwd)
        sys.argv = argv
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = old_argv
        os.chdir(old_cwd)
        SpacedDiffusion.ddim_sample_loop = orig_ddim
        SpacedDiffusion.p_sample_loop = orig_psl
        ref_ds.load_data = orig_load_data
        ref_ds.DataLoader = orig_dataloader
        ref_su.create_model_and_diffusion = orig_cmd

    if len(recorded["chains"]) != 2:
        raise RuntimeError(
            f"expected 2 sampling chains (thickness, intensity), saw "
            f"{len(recorded['chains'])}")
    x_nchw, cond = recorded["batches"][0]
    return {
        "x": x_nchw,
        "cond": cond,
        "thickness": recorded["chains"][0],
        "intensity": recorded["chains"][1],
    }


# --------------------------------------------------------------------- #
# our-side run on the SAME inputs
# --------------------------------------------------------------------- #
def run_our_eval(cfg, variables, x_nchw: np.ndarray,
                 cond_ref: Dict[str, np.ndarray], seed: int = 0,
                 value: float = 0.2) -> Dict[str, np.ndarray]:
    """This repo's counterfactual path on the reference's exact input batch:
    do(thickness)=0.2 pre-mask, do(intensity)=0.2 post-mask — the same two
    interventions the reference script ships."""
    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model
    from causaldiffae_tpu.evals.counterfactual import make_counterfactual_fn

    model = create_model(cfg)
    diffusion = create_diffusion(cfg, eval_mode=True)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    cond = {}
    if cfg.class_cond and "y" in cond_ref:
        cond["y"] = jnp.asarray(cond_ref["y"].astype(np.int32))

    out = {}
    for name, var_idx, where in (("thickness", 0, "pre"), ("intensity", 1, "post")):
        fn = jax.jit(make_counterfactual_fn(
            cfg, model, diffusion, intervene_var=var_idx, where=where,
            use_ddim=True,
        ), static_argnames=())
        key = jax.random.PRNGKey(seed * 1000 + var_idx * 100)
        samples = np.asarray(fn(variables, x, cond, value, key))
        out[name] = np.transpose(samples, (0, 3, 1, 2))  # NCHW like the ref
    return out


# --------------------------------------------------------------------- #
# one fixed probe set scores everything
# --------------------------------------------------------------------- #
def score_samples(sample_sets: Dict[str, np.ndarray], classifier_dir: str,
                  cfg, value: float = 0.2) -> Dict[str, float]:
    """Probe MAE per (sample set, factor) with ONE probe set — the same
    instrument discipline as scripts/rescore_counterfactuals.py. Targets:
    the intervened factor should read ``value``; for do(thickness) the
    downstream intensity target is the ground-truth SCM push-forward
    (`data/simulators.morphomnist_scm`)."""
    import jax.numpy as jnp

    from causaldiffae_tpu.config import DATA_SCALES
    from causaldiffae_tpu.data.simulators import morphomnist_scm
    from causaldiffae_tpu.evals.classifiers import (
        classifier_predict_fn,
        load_classifier,
    )

    scale = np.asarray(DATA_SCALES[cfg.dataset])
    factors = VAR_FACTORS[cfg.dataset]
    predictors = {}
    for f in factors:
        path = os.path.join(classifier_dir,
                            f"classifier_{cfg.dataset}_{f}.pkl")
        model, variables, _meta = load_classifier(path, cfg.n_vars)
        predictors[f] = classifier_predict_fn(model, variables)

    # ground-truth targets under each intervention
    raw_thickness = value * scale[0, 1] + scale[0, 0]
    intensity_after_do_thickness = float(
        (morphomnist_scm(np.asarray([raw_thickness]))[0] - scale[1, 0])
        / scale[1, 1])
    targets = {
        "thickness": {"thickness": value,
                      "intensity": intensity_after_do_thickness},
        "intensity": {"intensity": value},  # thickness keeps its factual
    }

    out = {}
    for set_name, samples in sample_sets.items():
        x = jnp.asarray(np.clip(np.transpose(samples, (0, 2, 3, 1)), 0, 1))
        intervention = set_name.split("/")[-1]
        for f in factors:
            pred = np.asarray(predictors[f](x))
            out[f"{set_name}/probe_mean_{f}"] = float(pred.mean())
            tgt = targets.get(intervention, {}).get(f)
            if tgt is not None:
                out[f"{set_name}/mae_{f}"] = float(np.abs(pred - tgt).mean())
    return out


# --------------------------------------------------------------------- #
def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="morphomnist_causaldae")
    parser.add_argument("--ckpt_dir", required=True)
    parser.add_argument("--classifier_dir", required=True,
                        help="dir with classifier_<factor>.pkl probe pickles "
                             "(from counterfactual_test.py or "
                             "classifier_train.py)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out_dir", default="/tmp/refeval")
    parser.add_argument("--use_ema", action="store_true")
    args = parser.parse_args()

    import jax

    from causaldiffae_tpu.config import create_model, get_config
    from causaldiffae_tpu.data import synthetic_dataset
    from causaldiffae_tpu.evals.classifiers import load_classifier
    from causaldiffae_tpu.training import eval_params, restore_eval_state
    from causaldiffae_tpu.utils import logger
    from causaldiffae_tpu.utils.torch_port import (
        save_torch_checkpoint,
        save_torch_classifier,
    )

    logger.configure()
    cfg = get_config(args.preset)
    if cfg.dataset != "morphomnist":
        raise SystemExit("the reference's shipped generate_interventions "
                         "path is morphomnist-only at fixed value 0.2; "
                         "pendulum/circuit use random-value MAE variants "
                         "that are commented out in the reference")

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sandbox = out / "sandbox"

    # 1. restore + export the checkpoint trained here
    model = create_model(cfg)
    state = restore_eval_state(cfg, model, args.ckpt_dir)
    logger.log(f"restored step {int(state.step)} from {args.ckpt_dir}")
    params = eval_params(state, cfg, use_ema=args.use_ema)
    variables = {"params": jax.device_get(params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    model_pt = str(out / "model_export.pt")
    save_torch_checkpoint(cfg, variables, model_pt)
    logger.log(f"exported {model_pt}")

    # 2. export our probes as reference classifier_*_best.pth
    clf_out = sandbox / "results" / cfg.dataset / "classifier"
    clf_out.mkdir(parents=True, exist_ok=True)
    for f in VAR_FACTORS[cfg.dataset]:
        _m, clf_vars, _meta = load_classifier(
            os.path.join(args.classifier_dir,
                         f"classifier_{cfg.dataset}_{f}.pkl"),
            cfg.n_vars)
        save_torch_classifier(clf_vars, str(clf_out / f"classifier_{f}_best.pth"))
    logger.log(f"exported probes to {clf_out}")

    # 3. fabricate the archive from the same synthetic pool the eval uses
    pool = synthetic_dataset(cfg.dataset, max(args.batch_size, 512),
                             seed=args.seed + 99)
    data_dir = fabricate_morphomnist_archive(
        str(out / "morphomnist_data"), pool)
    logger.log(f"fabricated archive at {data_dir}")

    # 4. reference stack (torch CPU, its own shipped eval config)
    model_args = {
        "n_vars": cfg.n_vars, "in_channels": cfg.in_channels,
        "image_size": cfg.image_size, "num_channels": cfg.num_channels,
        "num_res_blocks": cfg.num_res_blocks, "learn_sigma": cfg.learn_sigma,
        "class_cond": cfg.class_cond, "causal_modeling": cfg.causal_modeling,
        "rep_cond": cfg.rep_cond, "masking": cfg.masking,
        "diffusion_steps": cfg.diffusion_steps,
        "noise_schedule": cfg.noise_schedule,
        "rescale_timesteps": cfg.rescale_timesteps,
        "rescale_learned_sigmas": cfg.rescale_learned_sigmas,
        "timestep_respacing": cfg.eval_timestep_respacing,
    }
    logger.log("running the reference eval (torch CPU, 2x DDIM-250)...")
    ref = run_reference_eval(
        model_pt=model_pt, data_dir=data_dir, sandbox=str(sandbox),
        model_args=model_args, batch_size=args.batch_size, seed=args.seed)
    logger.log(f"reference eval done: {ref['thickness'].shape[0]} samples "
               f"per intervention")

    # 5. our stack on the SAME inputs
    ours = run_our_eval(cfg, variables, ref["x"], ref["cond"], seed=args.seed)

    # 6. one probe set scores all four sets (+ the originals as a floor)
    sets = {
        "reference/thickness": ref["thickness"],
        "ours/thickness": ours["thickness"],
        "reference/intensity": ref["intensity"],
        "ours/intensity": ours["intensity"],
        "originals/none": ref["x"],
    }
    scores = score_samples(sets, args.classifier_dir, cfg)
    np.savez(out / "cross_stack_samples.npz",
             x=ref["x"],
             ref_thickness=ref["thickness"], our_thickness=ours["thickness"],
             ref_intensity=ref["intensity"], our_intensity=ours["intensity"],
             **{k.replace("/", "__"): v for k, v in scores.items()})

    result = {"step": int(state.step), "batch_size": args.batch_size,
              "respacing": cfg.eval_timestep_respacing, **scores}
    for f in VAR_FACTORS[cfg.dataset]:
        ref_mae = scores.get(f"reference/{f}/mae_{f}")
        our_mae = scores.get(f"ours/{f}/mae_{f}")
        if ref_mae is not None and our_mae is not None:
            result[f"delta_mae_{f}"] = our_mae - ref_mae
    print(json.dumps(result))
    with open(out / "cross_stack_result.json", "w") as fjson:
        json.dump(result, fjson, indent=2)
    return result


if __name__ == "__main__":
    main()
