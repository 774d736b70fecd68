#!/usr/bin/env python
"""Eval-program micro-ablations for the round-3+ inference push (299 -> 350 fps).

Times the flagship predict program (BASELINE config #1: 640x360 b32 bf16
theta+consistency, folded BN) under program-level variants:

  * warp row_chunk: the interval warp's scan granularity (default 12).
    Bigger chunks amortize the one-hot matmul's setup; the whole warp is
    ~8 ms of the 107 ms program at row_chunk=12.
  * outc_barrier: an optimization_barrier between the UNet's up4 output
    and the 1x1 logits head, preventing XLA from re-emitting up4.conv2
    inside the (batch-in-lanes) logits fusion.

Usage: python scripts/bench_eval_variants.py [--iters N]
Prints one line per variant; the measurement protocol is bench.py's
(20-iter loops, best of 2, block_until_ready on the final dict).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def build(batch=32):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _flagship
    from sports_field_homography_tpu.ops.fold_bn import fold_batchnorm
    from sports_field_homography_tpu.ops.interval_warp import build_interval_table

    model, court_img, court_poi, cfg = _flagship(batch, dtype=jnp.bfloat16)
    w, h = cfg.target_size
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(rng, x[:1], court_img[:1],
                                           court_poi[:1], train=False))()
    variables = jax.device_put(fold_batchnorm(jax.device_get(variables)))
    model = model.clone(bn_folded=True)
    court_img = jax.device_put(court_img)
    court_poi = jax.device_put(court_poi)
    warp_table = build_interval_table(np.asarray(court_img))
    return model, variables, x, court_img, court_poi, warp_table


def timeit(fn, args, iters):
    # axon sync trap (CLAUDE.md): block_until_ready does not truly sync
    # small programs through the tunnel — force a scalar host fetch
    import jax.numpy as jnp

    def sink(out):
        leaves = [v for v in jax.tree_util.tree_leaves(out)
                  if hasattr(v, "dtype")]
        return float(jnp.sum(jnp.stack([jnp.sum(l.astype(jnp.float32))
                                        for l in leaves])))

    import jax
    out = fn(*args)
    sink(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sink(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1000.0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", default="base,rc30,rc60,rc120,barrier")
    args = ap.parse_args()

    import jax
    import numpy as np
    from sports_field_homography_tpu.ops import interval_warp
    from sports_field_homography_tpu.models import unet as unet_mod

    model, variables, x, ci, cp, wt = build(args.batch)

    orig_warp = interval_warp.warp_nearest_interval
    orig_outconv_call = unet_mod.OutConv.__call__

    def make_fn():
        @jax.jit
        def predict(variables, x, ci, cp, wtab):
            preds = model.apply(variables, x, ci, cp,
                                consistency=True, project_poi=False,
                                warp_table=wtab, method=model.predict)
            return {"theta": preds["theta"],
                    "consist_score": preds["consist_score"]}
        return predict

    ref_out = None
    for name in args.variants.split(","):
        # reset patches
        interval_warp.warp_nearest_interval = orig_warp
        unet_mod.OutConv.__call__ = orig_outconv_call
        if name.startswith("rc"):
            rc = int(name[2:])
            interval_warp.warp_nearest_interval = functools.partial(
                orig_warp, row_chunk=rc)
        elif name == "barrier":
            def barrier_call(self, xin, _orig=orig_outconv_call):
                return _orig(self, jax.lax.optimization_barrier(xin))
            unet_mod.OutConv.__call__ = barrier_call
        elif name != "base":
            raise SystemExit(f"unknown variant {name}")
        # reconstructor.warp imports warp_nearest_interval inside the
        # method body, so the module-attr patch takes effect per trace
        ms, out = timeit(make_fn(), (variables, x, ci, cp, wt), args.iters)
        if ref_out is None:
            ref_out = jax.device_get(out)
        else:
            o = jax.device_get(out)
            np.testing.assert_array_equal(ref_out["theta"], o["theta"])
            np.testing.assert_array_equal(ref_out["consist_score"],
                                          o["consist_score"])
        fps = args.batch / ms * 1000.0
        print(f"{name:>10}: {ms:7.2f} ms/batch  {fps:7.1f} fps")

    interval_warp.warp_nearest_interval = orig_warp
    unet_mod.OutConv.__call__ = orig_outconv_call


if __name__ == "__main__":
    main()
