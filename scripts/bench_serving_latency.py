#!/usr/bin/env python
"""Serving latency/throughput sweep: flagship predict across batch sizes.

Production serving picks a batch size per deployment (the reference
recommends COURT_BATCH=18 on a V100, README.md:59); this harness measures
the jitted flagship predict (UNet + resnet34 @640x360 bf16, folded BN,
theta+consistency — BASELINE config #1) at a sweep of batch sizes on one
TPU chip and prints a ms/batch + frames/sec table, so a deployment can
pick its latency/throughput operating point from data.

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
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from sports_field_homography_tpu.ops.fold_bn import fold_batchnorm
    from sports_field_homography_tpu.ops.interval_warp import build_interval_table

    batches = [int(b) for b in args.batches.split(",")]
    results = []
    variables = None
    for batch in batches:
        model, court_img, court_poi, cfg = _flagship(batch, dtype=jnp.bfloat16)
        w, h = cfg.target_size
        if variables is None:
            rng = jax.random.PRNGKey(0)
            x1 = jnp.zeros((1, h, w, 3), jnp.float32)
            variables = jax.jit(lambda: model.init(
                rng, x1, court_img[:1], court_poi[:1], train=False))()
            variables = jax.device_put(fold_batchnorm(jax.device_get(variables)))
            warp_table = build_interval_table(np.asarray(court_img[:1]))
        model = model.clone(bn_folded=True)
        x = jax.device_put(np.random.RandomState(0).rand(
            batch, h, w, 3).astype(np.float32))
        ci = jax.device_put(court_img)
        cp = jax.device_put(court_poi)

        @jax.jit
        def predict(variables, x, ci, cp, wt):
            preds = model.apply(variables, x, ci, cp,
                                consistency=True, project_poi=False,
                                warp_table=wt, method=model.predict)
            return {"theta": preds["theta"],
                    "consist_score": preds["consist_score"]}

        out = predict(variables, x, ci, cp, warp_table)
        jax.block_until_ready(out)

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(args.n_iters):
                out = predict(variables, x, ci, cp, warp_table)
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
