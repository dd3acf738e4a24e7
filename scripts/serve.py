#!/usr/bin/env python
"""Run a serving artifact over a batch stream.

The consumer half of the deployment story (`scripts/export_serving.py` is
the producer): load a StableHLO artifact, feed it batches from an .npz (or
a synthetic stream for smoke/latency checks), write outputs + report
throughput. Needs no model code or checkpoints — just the artifact file.

Usage:
  python scripts/serve.py --artifact /tmp/serve/do_thickness.shlo \
      --input batch.npz --value 1.0 --out /tmp/served.npz
  python scripts/serve.py --artifact ... --synthetic 64   # latency smoke
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", required=True)
    parser.add_argument("--input", default="",
                        help=".npz with arrays named per the manifest inputs "
                             "(x, and y/c when the model conditions on them)")
    parser.add_argument("--synthetic", type=int, default=0, metavar="N",
                        help="serve N synthetic rows instead of --input")
    parser.add_argument("--value", type=float, default=None,
                        help="intervention level (counterfactual artifacts)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch", type=int, default=None,
                        help="serving batch for POLYMORPHIC artifacts "
                             "(default: the whole stream in one call; set "
                             "this to get a steady-state rate from calls "
                             "after the first). Fixed-batch artifacts "
                             "dictate their own batch and ignore this. "
                             "NOTE: the pipelined loop keeps ~2 batches "
                             "live on device (batch i computing + batch "
                             "i-1 outputs); halve --batch or pass "
                             "--no_pipeline if a long chain OOMs.")
    parser.add_argument("--no_pipeline", action="store_true",
                        help="serve batches strictly sequentially (one "
                             "batch on device at a time; lower peak memory, "
                             "per-call host costs no longer overlap compute)")
    parser.add_argument("--prewarm", action="store_true",
                        help="compile-run one dummy batch before serving the "
                             "stream, so the first REAL call runs at steady "
                             "speed (compile cost lands in prewarm_s, off "
                             "the traffic path)")
    parser.add_argument("--no_aot", action="store_true",
                        help="ignore a sibling <artifact>.xc compiled "
                             "executable and always recompile the StableHLO")
    parser.add_argument("--out", default="/tmp/causaldiffae_served.npz")
    args = parser.parse_args()
    if args.batch is not None and args.batch < 1:
        raise SystemExit(f"--batch {args.batch}: must be >= 1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from causaldiffae_tpu.serving import (
        COMPILED_SUFFIX,
        load_artifact,
        load_compiled_artifact,
    )

    fn, manifest = load_artifact(args.artifact)
    inputs = manifest["inputs"]
    names = [i["name"] for i in inputs]
    # a sibling .xc (serialized compiled executable) skips the first-call
    # recompile entirely; fall back to the portable StableHLO on any
    # platform/device mismatch
    aot = False
    xc_path = args.artifact + COMPILED_SUFFIX
    if not args.no_aot and Path(xc_path).exists():
        try:
            fn = load_compiled_artifact(xc_path)
            aot = True
        except Exception as e:  # noqa: BLE001 - report, then portable path
            print(f"ignoring {xc_path}: {e}")
    print(f"artifact: {manifest.get('fn')} ({manifest.get('preset')}), "
          f"inputs {names}, platforms {manifest.get('platforms')}"
          f"{', AOT executable' if aot else ''}")

    by_name = {i["name"]: i for i in inputs}
    # fixed-batch artifacts dictate B; polymorphic ones take the stream's
    x_spec = by_name.get("x") or by_name.get("y")
    dim0 = x_spec["shape"][0]
    fixed_b = dim0 if isinstance(dim0, int) else None

    if args.synthetic:
        n = args.synthetic
        feed = {}
        if "x" in by_name:
            shp = [n] + list(by_name["x"]["shape"][1:])
            feed["x"] = np.zeros(shp, np.float32)
        if "y" in by_name:
            feed["y"] = (np.arange(n) % 10).astype(np.int32)
        if "c" in by_name:
            feed["c"] = np.zeros((n, by_name["c"]["shape"][1]), np.float32)
    else:
        if not args.input:
            raise SystemExit("one of --input / --synthetic is required")
        with np.load(args.input) as z:
            feed = {k: z[k] for k in z.files if k in by_name}
        if not feed:
            raise SystemExit(f"--input {args.input}: no arrays match the "
                             f"manifest inputs {names}")
        n = len(next(iter(feed.values())))
        if n == 0:
            raise SystemExit(f"--input {args.input}: input stream is empty")
    if "value" in by_name and args.value is None:
        raise SystemExit("this artifact takes --value (counterfactual)")

    if args.batch and fixed_b and args.batch != fixed_b:
        print(f"--batch {args.batch} ignored: artifact is fixed at {fixed_b}")
    B = fixed_b or min(args.batch or n, n)

    def dispatch(lo):
        """Stage rows [lo, lo+B) and dispatch the artifact call (async)."""
        rows = {k: v[lo:lo + B] for k, v in feed.items()}
        pad = B - len(next(iter(rows.values()))) if rows else 0
        if pad:  # fixed-batch artifact: pad the tail, trim after
            rows = {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
                    for k, v in rows.items()}
        call = [jnp.asarray(rows[name]) for name in names if name in rows]
        if "value" in by_name:
            call.append(jnp.float32(args.value))
        call.append(jnp.int32(args.seed + lo))
        return fn(*call), pad

    # One batch in flight (the training loop's lagged-readback pattern):
    # while the device runs batch i, the host harvests batch i-1 and stages
    # batch i+1, so the fixed per-call cost (feed staging + dispatch through
    # the tunnel + device->host copy) overlaps compute instead of adding to
    # it. The first call stays synchronous so compile time is attributed to
    # first_call_s, not the steady rate.
    offsets = list(range(0, n, B))
    outs = []
    prewarm_s = None
    if args.prewarm:
        # a server would do this at startup, before traffic: the dummy call
        # triggers the (only) compile, so the first real call below runs at
        # steady speed. The dummy must NOT be byte-identical to the first
        # traffic call (same rows + same seed): the remote executor can
        # short-circuit a repeated (executable, args) pair, which would make
        # the measured first_call_s a cache artifact instead of an execute.
        t0 = time.perf_counter()
        rows = {k: v[:B] for k, v in feed.items()}
        pad0 = B - len(next(iter(rows.values()))) if rows else 0
        if pad0:
            rows = {k: np.concatenate([v, np.repeat(v[-1:], pad0, 0)])
                    for k, v in rows.items()}
        call = [jnp.asarray(rows[name]) for name in names if name in rows]
        if "value" in by_name:
            call.append(jnp.float32(args.value))
        call.append(jnp.int32(args.seed - 1))  # off-traffic seed
        warm = fn(*call)
        jax.block_until_ready(warm)
        prewarm_s = time.perf_counter() - t0
        del warm
    t0 = time.perf_counter()
    pending, pad = dispatch(offsets[0])
    jax.block_until_ready(pending)
    first_call_s = time.perf_counter() - t0

    # Harvest-completion stamps: in steady state, consecutive harvests are
    # one batch period apart, so per-interval stats cover exactly one batch
    # each (not k harvests smeared over k-1 intervals) and the reported p50
    # is robust to a single straggler call skewing the mean.
    stamps = []
    if args.no_pipeline:
        # strictly sequential: one batch on device at a time (lower peak
        # memory; per-call host costs add to, instead of overlap, compute)
        for lo in offsets[1:]:
            out = np.asarray(pending)
            outs.append(out[:B - pad] if pad else out)
            stamps.append(time.perf_counter())
            pending, pad = dispatch(lo)
    else:
        # One batch in flight (the training loop's lagged-readback pattern):
        # while the device runs batch i, the host harvests batch i-1 and
        # stages batch i+1, so the fixed per-call cost (feed staging +
        # dispatch through the tunnel + device->host copy) overlaps compute
        # instead of adding to it. The first call stays synchronous so
        # compile time is attributed to first_call_s, not the steady rate.
        for lo in offsets[1:]:
            nxt, nxt_pad = dispatch(lo)
            out = np.asarray(pending)  # blocks on i-1 while i computes
            outs.append(out[:B - pad] if pad else out)
            stamps.append(time.perf_counter())
            pending, pad = nxt, nxt_pad
    out = np.asarray(pending)
    outs.append(out[:B - pad] if pad else out)
    stamps.append(time.perf_counter())
    # stamps[0] harvests the already-complete first call; the steady batch
    # periods are the gaps BETWEEN harvests
    intervals = np.diff(stamps)
    # n==B: no steady window; fall back to the (compile-laden) first call
    steady_batch_s = float(np.mean(intervals)) if len(intervals) else first_call_s
    steady_batch_p50_s = (float(np.median(intervals)) if len(intervals)
                          else first_call_s)

    images = np.concatenate(outs, 0)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, samples=images)
    report = {
        "served": int(images.shape[0]),
        "batch": B,
        "first_call_s": round(first_call_s, 4),
        "steady_batch_s": round(float(steady_batch_s), 4),
        "steady_batch_p50_s": round(float(steady_batch_p50_s), 4),
        "imgs_per_sec": round(B / float(steady_batch_s), 2),
        "pipelined": not args.no_pipeline,
        "aot": aot,
        "out": args.out,
    }
    if prewarm_s is not None:
        report["prewarm_s"] = round(prewarm_s, 4)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
