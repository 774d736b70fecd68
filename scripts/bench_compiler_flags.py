#!/usr/bin/env python
"""Probe TPU compiler options on the flagship predict program.

XLA_FLAGS cannot carry TPU-backend flags on this runtime (the axon client
rejects unknown flags at startup and the compile happens behind the
tunnel), so this harness passes options per-program via
``jax.jit(...).lower(...).compile(compiler_options=...)`` and times each
compiled executable with the bench.py protocol (20-iter passes, median
of three).

Usage:
  python scripts/bench_compiler_flags.py                 # default sweep
  python scripts/bench_compiler_flags.py --opt xla_tpu_scoped_vmem_limit_kib=65536
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

DEFAULT_SWEEP = [
    None,  # baseline, no options
    {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    {"xla_tpu_scoped_vmem_limit_kib": "98304"},
]


def measure(fn_compiled, args, batch, n_iters=20, n_passes=3):
    import jax
    passes = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = fn_compiled(*args)
        jax.block_until_ready(out)
        passes.append(batch * n_iters / (time.perf_counter() - t0))
    return sorted(passes)[len(passes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", action="append", default=[],
                    help="key=value compiler option (repeatable); one "
                         "sweep point per invocation flag")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax

    from bench import build_flagship_predict

    predict, variables, x, ci, cp, wt = build_flagship_predict(args.batch)
    call_args = (variables, x, ci, cp, wt)

    sweep = DEFAULT_SWEEP
    if args.opt:
        sweep = [None,
                 {k: v for k, v in (o.split("=", 1) for o in args.opt)}]

    lowered = jax.jit(lambda *a: predict(*a)).lower(*call_args)
    for opts in sweep:
        label = "baseline" if opts is None else \
            ",".join(f"{k}={v}" for k, v in opts.items())
        try:
            t0 = time.perf_counter()
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            ct = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{label:60s}  COMPILE FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        fps = measure(compiled, call_args, args.batch)
        print(f"{label:60s}  {fps:7.1f} fps  (compile {ct:.0f}s)")


if __name__ == "__main__":
    main()
