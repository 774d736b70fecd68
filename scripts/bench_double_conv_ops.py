#!/usr/bin/env python
"""Per-op timing of the production fused-DoubleConv kernels (level-1 shapes).

Times each Pallas op exactly as double_conv_train invokes it (packed
interior, prologue/stats variants) plus the XLA boundary passes
(pad, pack/unpack) — so the fused train-step cost can be reconciled
op-by-op against BASELINE.md.  TF/s are TRUE conv flops (structural-zero
work in packed mode is waste, not throughput).

Usage: python scripts/bench_double_conv_ops.py [--batch 26] [--iters 10]
       [--ops fwd_packed,wgrad_packed,...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, iters=10):
    """fn: zero-arg callable returning device arrays (jitted ONCE by the
    caller).  Syncs with a scalar host fetch (CLAUDE.md trap)."""
    out = fn()
    jax.block_until_ready(out)

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        float(jnp.sum(leaf))

    best = 1e9
    for _ in range(2):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=26)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ops", type=str, default="all")
    args = ap.parse_args()

    from sports_field_homography_tpu.ops.conv3x3_pallas import (
        conv3x3, dgrad_pair_weights, pack_pair_weights, pack_pairs,
        pack_weights, tile_pair, unpack_pairs, wgrad3x3)

    n, h, w = args.batch, 360, 640
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def mk(shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1, bf)

    x128 = mk((n, h, w, 128))             # up4 conv1 input (concat)
    xp = mk((n, h, w // 2, 128))          # packed 64-ch activation
    k1 = jnp.asarray(rng.randn(3, 3, 128, 64).astype(np.float32) * .05)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * .05)
    b64 = jnp.asarray(rng.randn(64).astype(np.float32))
    vec = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)

    gf_c1 = 2 * n * h * w * 9 * 128 * 64 / 1e9     # 128->64 conv
    gf_c2 = 2 * n * h * w * 9 * 64 * 64 / 1e9      # 64->64 conv

    # jit each case ONCE; operands are closed over (resident on device)
    w1m = pack_weights(k1).astype(bf)
    w2p = pack_pair_weights(k2).astype(bf)
    w2pd = dgrad_pair_weights(k2).astype(bf)
    w1pd = dgrad_pair_weights(k1).astype(bf)
    b2p, vt = tile_pair(b64), tile_pair(vec)
    xu = unpack_pairs(xp)

    cases = {
        # up4.conv1 fwd: native 128-in, 64-out, with stats
        "fwd_native128": (
            jax.jit(lambda: conv3x3(x128, w1m, b64, stats=True)), gf_c1),
        # conv2 fwd packed with BN prologue + stats (the K2 call)
        "fwd_packed_pro": (
            jax.jit(lambda: conv3x3(xp, w2p, b2p, prologue=(vt, vt, vt),
                                    stats=True)), gf_c2),
        # conv2 dgrad packed (dy2 -> dz1)
        "dgrad_packed": (jax.jit(lambda: conv3x3(xp, w2pd)), gf_c2),
        # conv2 wgrad packed with prologue (y1p, dy2p)
        "wgrad_packed": (
            jax.jit(lambda: wgrad3x3(xp, xp, prologue=(vt, vt, vt))),
            gf_c2),
        # up4.conv1 wgrad native (x 128-native, dy1 unpacked 64)
        "wgrad_native128": (jax.jit(lambda: wgrad3x3(x128, xu)), gf_c1),
        # up4.conv1 dgrad: packed dy1 -> native 128 out via pair weights
        "dgrad1_packed128": (jax.jit(lambda: conv3x3(xp, w1pd)), gf_c1),
        # XLA boundary passes
        "xla_pad": (
            jax.jit(lambda: jnp.pad(xp, ((0, 0), (1, 1), (1, 7), (0, 0)))),
            None),
        "xla_unpack": (jax.jit(lambda: unpack_pairs(xp) + 0), None),
        "xla_pack": (jax.jit(lambda: pack_pairs(xu) + 0), None),
        "xla_bn_bwd_passes": (
            # stand-in for one BN+ReLU backward: 2 reduction reads + 1
            # elementwise read/write over the packed activation
            jax.jit(lambda: (
                jnp.sum(jnp.where(xp > 0, xp, 0.0).astype(jnp.float32),
                        (0, 1, 2)),
                (jnp.where(xp > 0, xp, 0.0) * 0.5).astype(xp.dtype))),
            None),
    }

    wanted = (list(cases) if args.ops == "all" else args.ops.split(","))
    for name in wanted:
        fn, gflop = cases[name]
        try:
            t = timeit(fn, iters=args.iters)
            rate = f"  {gflop / t:6.1f} TF/s(true)" if gflop else ""
            print(f"{name:18s}: {t:7.2f} ms{rate}", flush=True)
        except Exception as e:
            print(f"{name:18s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
