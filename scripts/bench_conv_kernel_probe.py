#!/usr/bin/env python
"""Probe: in-kernel 3x3-conv formulations for the fused Pallas DoubleConv.

Compares, at the level-1 flagship shape (batch 26/32 @640x360, C 64->64):
  * im2col: 9 shifted slices concatenated on lanes -> ONE (ThW, 9C)x(9C, Cout) dot
  * dot9:   9 accumulated (ThW, C)x(C, Cout) dots (no concat shuffle)
against the XLA conv baseline, standalone (single conv op per program).

Input halo windows ride ``pl.Element`` block specs (overlapping (Th+2)-row
windows over the XLA-padded input; Mosaic requires the window's second-minor
dim 8-aligned, hence width padded to W+8).

Timing rule: end-to-end program + scalar host fetch (CLAUDE.md sync trap).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_conv_kernel(n, h, w, cin, cout, th, mode, dtype=jnp.bfloat16):
    """x padded (N, H+2, W+8, Cin); w (9Cin, Cout); out (N, H, W, Cout)."""
    tiles_h = h // th
    grid = (n * tiles_h,)

    def kernel(x_ref, w_ref, b_ref, y_ref):
        xblk = x_ref[0]                          # (Th+2, W+8, Cin)
        if mode == "im2col":
            cols = [xblk[ky:ky + th, kx:kx + w, :].reshape(th * w, cin)
                    for ky in range(3) for kx in range(3)]
            patch = jnp.concatenate(cols, axis=-1)     # (ThW, 9Cin)
            acc = jnp.dot(patch, w_ref[...],
                          preferred_element_type=jnp.float32)
        else:  # dot9
            acc = jnp.zeros((th * w, cout), jnp.float32)
            for t in range(9):
                ky, kx = divmod(t, 3)
                sl = xblk[ky:ky + th, kx:kx + w, :].reshape(th * w, cin)
                acc += jnp.dot(sl, w_ref[pl.ds(t * cin, cin), :],
                               preferred_element_type=jnp.float32)
        y = acc + b_ref[...]
        y_ref[...] = y.reshape(1, th, w, cout).astype(y_ref.dtype)

    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2), pl.Element(w + 8),
         pl.Element(cin)),
        lambda i: (i // tiles_h, (i % tiles_h) * th, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, th, w, cout),
        lambda i: (i // tiles_h, i % tiles_h, 0, 0),
        memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, wmat, bias):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                in_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dtype),
        )(xp, wmat, bias)

    return run


def xla_conv(x, k, bias):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(2):
        float(jnp.sum(fn(*args)[0, 0, 0]))  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0, 0, 0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=26)
    ap.add_argument("--h", type=int, default=360)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--modes", type=str, default="im2col,dot9")
    args = ap.parse_args()
    n, h, w, cin, cout, th = (args.batch, args.h, args.w, args.cin,
                              args.cout, args.th)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    # (ky, kx, cin) row-packed weight matrix
    wmat = k.reshape(9 * cin, cout)

    gflop = 2 * n * h * w * 9 * cin * cout / 1e9

    t_xla = timeit(jax.jit(xla_conv), x, k, bias, iters=args.iters)
    print(f"xla      : {t_xla:7.2f} ms  {gflop / t_xla:6.1f} TF/s", flush=True)

    for mode in args.modes.split(","):
        try:
            run = make_conv_kernel(n, h, w, cin, cout, th, mode)
            y = run(x, wmat, bias)
            ref = jax.jit(xla_conv)(x, k, bias)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = timeit(run, x, wmat, bias, iters=args.iters)
            print(f"{mode:9s}: {t:7.2f} ms  {gflop / t:6.1f} TF/s  "
                  f"maxerr {err:.4f}", flush=True)
        except Exception as e:
            print(f"{mode:9s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
