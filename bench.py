#!/usr/bin/env python
"""Benchmark: the three CausalDiffAE workload families on one TPU chip.

Measures (1) training throughput (samples/sec) for the full
morphomnist_causaldae preset (28px, 128ch UNet + causal encoder + SCM +
masked variational objective, batch 128), (2) DDIM sampling throughput
(respaced 250-step chain, the reference's eval config), and (3) train
step-time/TFLOPS/MFU for the pendulum (96px) and circuit (128px, T=2000)
presets so a perf regression in any family is driver-visible.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

``vs_baseline`` compares against the PyTorch reference running the same
config on this host's CPU (the only hardware the reference can use here),
measured once and cached in BASELINE_local.json.

``--presets a,b`` restricts the families (default: all three).
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

BASELINE_LOCAL = REPO / "BASELINE_local.json"
TRAIN_STEPS = 20
SAMPLE_BATCH = 16
ALL_PRESETS = ("morphomnist_causaldae", "pendulum_causaldae", "circuit_causaldae")


def measure_torch_baseline(n_steps: int = 2) -> dict:
    """One-time measurement of the reference's per-step train time (torch CPU)."""
    import numpy as np
    import torch

    sys.path.insert(0, "/root/reference")
    from improved_diffusion import gaussian_diffusion as gd
    from improved_diffusion.nn import GaussianConvEncoder
    from improved_diffusion.respace import SpacedDiffusion, space_timesteps
    from improved_diffusion.unet import UNetModel

    torch.manual_seed(0)
    model = UNetModel(
        in_channels=1, model_channels=128, out_channels=1, num_res_blocks=3,
        attention_resolutions=(1, 3), dropout=0.0, channel_mult=(1, 2, 2),
        num_classes=10, rep_dim=512, causal_modeling=True, num_heads=4,
        use_scale_shift_norm=True, masking=True, n_vars=2,
    )
    model.rep_emb = GaussianConvEncoder(in_channels=1, latent_dim=512, num_vars=2)
    diffusion = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, [1000]),
        betas=gd.get_named_beta_schedule("linear", 1000),
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_LARGE,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    B = 128
    x = torch.rand(B, 1, 28, 28)
    y = torch.randint(0, 10, (B,))
    c = torch.rand(B, 2)

    def step():
        t = torch.randint(0, 1000, (B,))
        losses = diffusion.training_losses(
            model, x, t, model_kwargs={"y": y, "c": c}, rep_cond=True,
            causal_modeling=True,
        )
        loss = losses["loss"].mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.time()
    for _ in range(n_steps):
        step()
    dt = (time.time() - t0) / n_steps
    return {"torch_cpu_train_samples_per_sec": B / dt, "torch_cpu_step_time_s": dt}


def get_baseline() -> dict:
    if BASELINE_LOCAL.exists():
        return json.loads(BASELINE_LOCAL.read_text())
    try:
        base = measure_torch_baseline()
        BASELINE_LOCAL.write_text(json.dumps(base, indent=2))
        return base
    except Exception as e:  # reference or torch unavailable
        return {"error": str(e)}


def peak_bf16_tflops(device) -> tuple:
    """Per-chip bf16 peak for the MFU denominator.

    Prefers device-reported attributes when the runtime exposes them (some
    PJRT builds publish peak-flops keys); falls back to the public datasheet
    table keyed on device_kind. Returns (peak_tflops_or_None, source).
    """
    kind = device.device_kind.lower()
    peaks = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
             "v6 lite": 918.0, "v6e": 918.0}
    datasheet = next((v for k, v in peaks.items() if k in kind), None)
    for attrs_name in ("attributes", "client_attributes"):
        attrs = getattr(device, attrs_name, None)
        if isinstance(attrs, dict):
            for key in ("peak_bf16_tflops", "peak_tflops_bf16", "peak_flops"):
                v = attrs.get(key)
                if v:
                    v = float(v)
                    if v > 1e6:  # reported in FLOP/s
                        v /= 1e12
                    # trust the runtime only when it lands near the datasheet
                    # (unit ambiguity / fp32-vs-bf16 keys otherwise corrupt
                    # the MFU denominator silently)
                    if datasheet is None or 0.5 <= v / datasheet <= 2.0:
                        return v, f"device.{attrs_name}[{key}]"
    return datasheet, "datasheet_table"


def bench_train_only(preset: str, pool: int = 0, return_handles: bool = False):
    """Step-time/TFLOPS/MFU for one preset.

    This is THE train-throughput measurement protocol (3-step warmup,
    TRAIN_STEPS timed, donated state, 3x-forward MFU convention); main()
    reuses it for the primary preset so the top-level and nested numbers
    come from one implementation. With return_handles=True also returns the
    live (cfg, model, state, it) for the feed/sampler sections.
    """
    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.training import create_train_state, make_optimizer, make_train_step
    from causaldiffae_tpu.utils.profiling import unet_flops_per_sample

    cfg = get_config(preset).replace(use_bf16=True)
    model = create_model(cfg)
    diffusion = create_diffusion(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size,
                            pool=pool or max(cfg.batch_size * 4, 128))
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
    # state is built on host CPU; pin to the chip so the step is pure-device
    state = jax.device_put(state, jax.devices()[0])
    step_fn = jax.jit(make_train_step(cfg, model, diffusion, tx), donate_argnums=0)
    for _ in range(3):  # compile + warmup
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    t0 = time.time()
    for _ in range(TRAIN_STEPS):
        state, metrics = step_fn(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.time() - t0) / TRAIN_STEPS
    sps = cfg.batch_size / dt
    tflops = 3.0 * unet_flops_per_sample(cfg) * sps / 1e12
    peak, peak_source = peak_bf16_tflops(jax.devices()[0])
    result = {
        "train_step_time_s": round(dt, 5),
        "train_samples_per_sec": round(sps, 2),
        "tflops": round(tflops, 2),
        "mfu": round(tflops / peak, 4) if peak else None,
        "batch_size": cfg.batch_size,
    }
    if not return_handles:
        return result
    handles = {"cfg": cfg, "model": model, "state": state, "it": it,
               "step_fn": step_fn, "peak": peak, "peak_source": peak_source,
               "tflops": tflops, "sps": sps, "dt": dt}
    return result, handles


def bench_primary(preset: str) -> dict:
    """Full treatment for the primary preset: train step, feed overhead,
    DDIM/dpm++ sampler chains, baseline ratio, TFLOPS/MFU.

    Runs in its own frame so every device handle it creates (TrainState incl.
    Adam/EMA, compiled step, chain params) is dropped when it returns -
    otherwise a memory-tight chip can turn the nested family benches that
    follow into a silent {"error": RESOURCE_EXHAUSTED}.
    """
    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion
    from causaldiffae_tpu.diffusion import ddim_sample_loop, dpm_solver_pp_loop
    from causaldiffae_tpu.models.unet import CausalUNet

    # --- train throughput (the shared protocol in bench_train_only) ---
    _, h = bench_train_only(preset, pool=1024, return_handles=True)
    cfg, model, state, it = h["cfg"], h["model"], h["state"], h["it"]
    step_fn = h["step_fn"]
    train_dt, train_sps = h["dt"], h["sps"]

    # --- train throughput INCLUDING the data feed (the TrainLoop pattern:
    # native C++ prefetch iterator + 1-batch-in-flight transfer overlap) ---
    def put(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    next_batch = put(next(it))
    t0 = time.time()
    for _ in range(TRAIN_STEPS):
        b = next_batch
        state, metrics = step_fn(state, b)
        next_batch = put(next(it))
    jax.block_until_ready(metrics["loss"])
    feed_dt = (time.time() - t0) / TRAIN_STEPS
    feed_sps = cfg.batch_size / feed_dt

    # --- DDIM sampler throughput (respaced 250, eval config) ---
    eval_diff = create_diffusion(cfg, eval_mode=True)
    params = state.params
    batch_stats = state.batch_stats

    def bench_chain(sample_batch: int, dpm_steps=None) -> float:
        """Mean wall time of one sampling chain at this batch size.

        Default: the 250-step DDIM chain (the reference's eval config);
        ``dpm_steps`` switches to the DPM-Solver++(2M) fast-serving chain on
        that many lambda-uniform nodes. Conditioning and image shape are
        config-driven so any preset can be the primary (profile_step.py uses
        the same construction).
        """
        y = (jnp.zeros((sample_batch,), dtype=jnp.int32)
             if cfg.class_cond else None)
        c = jnp.zeros((sample_batch, cfg.n_vars)) if cfg.context_cond else None
        z = jnp.zeros((sample_batch, cfg.rep_dim))

        def model_fn(x, t):
            return model.apply(
                {"params": params, "batch_stats": batch_stats}, x, t,
                y=y, c=c, z=z, train=False, method=CausalUNet.denoise,
            )

        @jax.jit
        def sample(noise, rng):
            if dpm_steps is not None:
                return dpm_solver_pp_loop(eval_diff, model_fn, noise,
                                          num_steps=dpm_steps)
            return ddim_sample_loop(eval_diff, model_fn, noise, rng)

        noise = jax.random.normal(
            jax.random.PRNGKey(1),
            (sample_batch, cfg.image_size, cfg.image_size, cfg.in_channels))
        out = sample(noise, jax.random.PRNGKey(2))
        jax.block_until_ready(out)
        # short chains (dpm++ 25) finish in ~60-100 ms, where per-dispatch
        # jitter through the axon tunnel is tens of ms — average more of
        # them so the key is stable run to run (RESULTS.md "Fast serving")
        n_chains = 10 if dpm_steps is not None else 3
        t0 = time.time()
        for i in range(n_chains):
            out = sample(noise, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(out)
        return (time.time() - t0) / n_chains

    # eval-config batch 16 (the reference's counterfactual-eval shape) ...
    chain_dt = bench_chain(SAMPLE_BATCH)
    ddim_steps_per_sec = eval_diff.num_timesteps / chain_dt
    ddim_images_per_sec = SAMPLE_BATCH / chain_dt
    # ... and the serving shape: train-sized batch amortizes the per-step
    # dispatch + small-matmul underutilization across 8x the images
    serving_dt = bench_chain(cfg.batch_size)
    serving_images_per_sec = cfg.batch_size / serving_dt
    # fast-serving chain: DPM-Solver++(2M) on 25 lambda-uniform nodes — a
    # capability beyond the reference (quality parity vs DDIM-250 measured
    # in RESULTS.md)
    dpm_dt = bench_chain(SAMPLE_BATCH, dpm_steps=25)
    dpm_images_per_sec = SAMPLE_BATCH / dpm_dt

    # the cached torch-CPU baseline is the MORPHOMNIST config; comparing any
    # other preset against it would be a silently meaningless ratio
    if preset == "morphomnist_causaldae":
        base = get_baseline()
        base_sps = base.get("torch_cpu_train_samples_per_sec")
        vs_baseline = (train_sps / base_sps) if base_sps else None
        baseline_note = "pytorch reference, same config, host CPU"
    else:
        vs_baseline = None
        baseline_note = "n/a (torch-CPU baseline exists for morphomnist only)"

    # absolute efficiency: achieved TFLOPS + MFU (VERDICT r1 item 7).
    # Model FLOPs per trained sample = 3x the UNet forward (fwd + ~2x bwd),
    # the standard MFU convention - remat recompute is NOT counted as useful.
    achieved_tflops = h["tflops"]
    peak, peak_source = h["peak"], h["peak_source"]
    mfu = achieved_tflops / peak if peak else None

    return {
        "metric": f"train_samples_per_sec_{preset}",
        "value": round(train_sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "baseline": baseline_note,
        "train_step_time_s": round(train_dt, 5),
        "train_samples_per_sec_with_feed": round(feed_sps, 2),
        "feed_overhead_pct": round(100.0 * (train_sps - feed_sps) / train_sps, 2),
        "tflops": round(achieved_tflops, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "peak_tflops_denominator": peak,
        "peak_tflops_source": peak_source,
        "flops_note": "flops_per_sample is the analytic UNet conv+attention "
                      "model only; encoder+SCM FLOPs are omitted, so "
                      "tflops/mfu are conservative (understated)",
        "ddim250_chain_steps_per_sec": round(ddim_steps_per_sec, 2),
        "ddim250_images_per_sec": round(ddim_images_per_sec, 3),
        "ddim250_serving_batch": cfg.batch_size,
        "ddim250_serving_images_per_sec": round(serving_images_per_sec, 3),
        "dpm25_chain_time_s": round(dpm_dt, 4),
        "dpm25_images_per_sec": round(dpm_images_per_sec, 3),
        "device": str(jax.devices()[0]),
        "batch_size": cfg.batch_size,
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=",".join(ALL_PRESETS),
                    help="comma-separated preset names (first one gets the "
                         "full feed/sampler/baseline treatment)")
    cli = ap.parse_args()
    presets = [p for p in cli.presets.split(",") if p]

    import jax

    # persistent compile cache: bench compiles once per machine, not per run
    cache_dir = str(REPO / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    result = bench_primary(presets[0])

    # the other workload families: step time / TFLOPS / MFU as nested keys
    # (morphomnist top-level keys stay stable for the driver)
    for preset in presets[1:]:
        try:
            result[preset] = bench_train_only(preset)
        except Exception as e:  # keep the primary metric even if one fails
            result[preset] = {"error": str(e)}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
