#!/usr/bin/env python
"""Serving latency/throughput sweep: flagship predict across batch sizes.

Production serving picks a batch size per deployment (the reference
recommends COURT_BATCH=18 on a V100, README.md:59); this harness sweeps
the EXACT bench.py program (``bench.build_flagship_predict`` — same
model, folded BN, output pruning, measurement protocol) over batch sizes
on one TPU chip and prints a ms/batch + frames/sec table, so a
deployment can pick its latency/throughput operating point from data.

Measurement protocol (see CLAUDE.md "Environment traps"): per batch size,
queue ``n_iters`` dispatches and sync once — steady-state pipelined
ms/batch, the number a saturated serving loop sees.  Two passes, best
kept (transient slow windows on the shared dev chip).

Usage: python scripts/bench_serving_latency.py [--batches 1,2,4,8,16,18,32,64]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8,16,18,32,64")
    ap.add_argument("--n_iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from bench import build_flagship_predict

    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        predict, variables, x, ci, cp, wt = build_flagship_predict(batch)
        out = predict(variables, x, ci, cp, wt)
        jax.block_until_ready(out)

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.n_iters):
                out = predict(variables, x, ci, cp, wt)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.n_iters)
        results.append({"batch": batch,
                        "ms_per_batch": round(best * 1e3, 2),
                        "fps": round(batch / best, 1)})
        print(f"batch {batch:3d}: {best * 1e3:7.2f} ms/batch  "
              f"{batch / best:7.1f} fps", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
