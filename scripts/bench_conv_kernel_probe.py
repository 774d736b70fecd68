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


def pack_pair_weights(k):
    """(3,3,C,Co) -> (9*2C, 2Co) block weights for the width-pair-packed view.

    Packed lanes are (parity, channel).  Output pair-pixel (w2, po) draws
    from input pairs w2-1..w2+1 (tap t, shifted rows) at parity pi via
    kx = 2(t-1) + pi + 1 - po when 0 <= kx <= 2, else a structural zero.
    """
    _, _, c, co = k.shape
    wp = np.zeros((3, 3, 2 * c, 2 * co), np.float32)
    for ky in range(3):
        for t in range(3):
            for pi in range(2):
                for po in range(2):
                    kx = 2 * (t - 1) + pi + 1 - po
                    if 0 <= kx <= 2:
                        wp[ky, t, pi * c:(pi + 1) * c, po * co:(po + 1) * co] \
                            = np.asarray(k[ky, kx], np.float32)
    return jnp.asarray(wp.reshape(9 * 2 * c, 2 * co), k.dtype)


def make_packed_conv(n, h, w, c, co, th, dtype=jnp.bfloat16):
    """x packed (N, H, W/2, 2C); w (9*2C, 2Co); out packed (N, H, W/2, 2Co)."""
    w2 = w // 2
    cp, cop = 2 * c, 2 * co
    tiles_h = h // th
    grid = (n * tiles_h,)

    def kernel(x_ref, w_ref, b_ref, y_ref):
        xblk = x_ref[0]                          # (Th+2, W2+8, 2C)
        cols = [xblk[ky:ky + th, t:t + w2, :].reshape(th * w2, cp)
                for ky in range(3) for t in range(3)]
        patch = jnp.concatenate(cols, axis=-1)   # (ThW2, 18C) tile-aligned
        acc = jnp.dot(patch, w_ref[...], preferred_element_type=jnp.float32)
        acc = acc + b_ref[...]
        y_ref[...] = acc.reshape(1, th, w2, cop).astype(y_ref.dtype)

    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(th + 2), pl.Element(w2 + 8),
         pl.Element(cp)),
        lambda i: (i // tiles_h, (i % tiles_h) * th, 0, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, th, w2, cop),
        lambda i: (i // tiles_h, i % tiles_h, 0, 0),
        memory_space=pltpu.VMEM)

    @jax.jit
    def run(xp, wmat, bias):
        xpp = jnp.pad(xp, ((0, 0), (1, 1), (1, 7), (0, 0)))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[in_spec,
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n, h, w2, cop), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
        )(xpp, wmat, bias)

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

    ref = jax.jit(xla_conv)(x, k, bias)
    for mode in args.modes.split(","):
        try:
            if mode == "packed":
                assert cin == cout == 64
                xp = x.reshape(n, h, w // 2, 2 * cin)
                wp = pack_pair_weights(k)
                bp = jnp.tile(bias, 2)
                run = make_packed_conv(n, h, w, cin, cout, args.th)
                y = run(xp, wp, bp).reshape(n, h, w, cout)
                t = timeit(run, xp, wp, bp, iters=args.iters)
            else:
                run = make_conv_kernel(n, h, w, cin, cout, th, mode)
                y = run(x, wmat, bias)
                t = timeit(run, x, wmat, bias, iters=args.iters)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            print(f"{mode:9s}: {t:7.2f} ms  {gflop / t:6.1f} TF/s  "
                  f"maxerr {err:.4f}", flush=True)
        except Exception as e:
            print(f"{mode:9s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
