#!/usr/bin/env python
"""Op-level profile of the train step and the DDIM sampling chain.

Captures a jax.profiler trace (perfetto JSON) of N steps on the current
device and prints the top ops by total device time — the measurement VERDICT
r2 item 3 asks to publish before spending it (the reference never profiles;
its `logger.profile_kv` scope timers are dead code, SURVEY §5.1).

Usage:
  JAX_COMPILATION_CACHE_DIR=$PWD/.jax_cache python scripts/profile_step.py \
      --preset morphomnist_causaldae --what train --top 15
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_perfetto(logdir: str, steps: int):
    """Aggregate device-track event durations by op name from the trace."""
    paths = glob.glob(os.path.join(logdir, "**", "*.json.gz"), recursive=True)
    assert paths, f"no perfetto trace under {logdir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # the device timeline has three nested tracks (Steps > XLA Modules >
    # XLA Ops); aggregate ONLY the leaf "XLA Ops" thread of the TPU process
    # so nothing is double-counted
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "device" not in pid_name.get(e.get("pid"), "").lower():
            continue
        if tid_name.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        name = e.get("name", "")
        dur_by_op[name] += e["dur"]
        cnt_by_op[name] += 1
        total += e["dur"]
    rows = sorted(dur_by_op.items(), key=lambda kv: -kv[1])
    return rows, cnt_by_op, total / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="morphomnist_causaldae")
    ap.add_argument("--what", choices=["train", "sample"], default="train")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--logdir", default="/tmp/xprof_step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from causaldiffae_tpu.config import create_diffusion, create_model, get_config
    from causaldiffae_tpu.data import synthetic_iterator
    from causaldiffae_tpu.diffusion import ddim_sample_loop
    from causaldiffae_tpu.models.unet import CausalUNet
    from causaldiffae_tpu.training import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = get_config(args.preset).replace(use_bf16=True)
    model = create_model(cfg)
    it = synthetic_iterator(cfg.dataset, cfg.batch_size, pool=max(cfg.batch_size * 2, 128))
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}

    if args.what == "train":
        diffusion = create_diffusion(cfg)
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        state = jax.device_put(state, jax.devices()[0])
        step_fn = jax.jit(make_train_step(cfg, model, diffusion, tx), donate_argnums=0)
        for _ in range(3):
            state, m = step_fn(state, batch)
        jax.block_until_ready(m["loss"])

        def run():
            nonlocal state
            for _ in range(args.steps):
                state, m = step_fn(state, batch)
            jax.block_until_ready(m["loss"])
    else:
        eval_diff = create_diffusion(cfg, eval_mode=True)
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, model, tx, jax.random.PRNGKey(0), batch)
        variables = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats},
            jax.devices()[0])
        B = 16
        y = jnp.zeros((B,), dtype=jnp.int32) if cfg.class_cond else None
        c = jnp.zeros((B, cfg.n_vars)) if cfg.context_cond else None
        z = jnp.zeros((B, cfg.rep_dim))

        def model_fn(x, t):
            return model.apply(variables, x, t, y=y, c=c, z=z, train=False,
                               method=CausalUNet.denoise)

        @jax.jit
        def sample(noise, rng):
            return ddim_sample_loop(eval_diff, model_fn, noise, rng)

        noise = jax.random.normal(
            jax.random.PRNGKey(1), (B, cfg.image_size, cfg.image_size, cfg.in_channels))
        jax.block_until_ready(sample(noise, jax.random.PRNGKey(2)))

        def run():
            out = None
            for i in range(args.steps):
                out = sample(noise, jax.random.PRNGKey(3 + i))
            jax.block_until_ready(out)

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.time()
    jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
    run()
    jax.profiler.stop_trace()
    wall = (time.time() - t0) / args.steps

    rows, counts, device_us_per_step = parse_perfetto(args.logdir, args.steps)
    print(f"\n== {args.preset} {args.what}: {args.steps} steps, "
          f"{wall*1e3:.1f} ms/step wall, {device_us_per_step/1e3:.1f} ms/step device ==")
    print(f"{'op':60} {'ms/step':>9} {'%dev':>6} {'count':>7}")
    total = device_us_per_step * args.steps
    for name, us in rows[: args.top]:
        print(f"{name[:60]:60} {us/args.steps/1e3:9.3f} {100*us/total:6.1f} "
              f"{counts[name]:7d}")


if __name__ == "__main__":
    main()
