#!/usr/bin/env python
"""Train-step throughput bench: flagship model, batch 26 @640x360, all losses.

Measures steady-state img/s of the jitted train step (forward + all 4
enabled losses + backward + RMSprop update + sync of the loss scalar),
matching the reference's training operating point
(`/root/reference/train.py:163-254`, conf example batch 26).

Usage: python scripts/bench_train_step.py [--profile] [--batch N] [--iters N]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--batch", type=int, default=26)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fused_bn", action="store_true",
                    help="Pallas fused BN+ReLU in the UNet (ops/bn_pallas)")
    ap.add_argument("--conv_kernel", type=str, default="auto",
                    choices=("auto", "xla", "pallas"),
                    help="UNet DoubleConv kernel (ops/double_conv)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="Gradient accumulation: K micro-batches of "
                         "--batch per optimizer step (effective batch "
                         "K*batch; img/s counts all K*batch images)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer

    batch = args.batch
    model, court_img, court_poi, cfg = _flagship(batch, dtype=jnp.bfloat16)
    if args.fused_bn or args.conv_kernel != "auto":
        import dataclasses
        cfg = dataclasses.replace(cfg, fused_bn=args.fused_bn,
                                  conv_kernel=args.conv_kernel)
        model = model.clone(config=cfg)
    w, h = cfg.target_size

    rng = np.random.RandomState(0)
    accum = max(1, args.grad_accum)
    lead = (batch,) if accum == 1 else (accum, batch)
    batch_data = {
        "image": jnp.asarray(rng.rand(*lead, h, w, 3).astype(np.float32)),
        "mask": jnp.asarray(
            rng.randint(0, 4, size=lead + (h, w)).astype(np.int32)),
        "poi": jnp.asarray(rng.rand(*lead, 52, 2).astype(np.float32)),
        "nonzeros": jnp.ones(lead + (52,), jnp.float32),
        "num_nonzero": jnp.full(lead, 52.0, jnp.float32),
        "weight": jnp.ones(lead + (1,), jnp.float32),
    }
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x1, court_img[:1], court_poi[:1],
        train=False))()
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss="CE", consist_start_iter=0,
                          batch_size=batch)
    optimizer = make_optimizer("RMSprop", 1e-4, 1e-8)
    state = init_train_state(variables, optimizer)
    # production train_net builds the interval table (train/loop.py:240-244);
    # without it the bilinear warp is an arbitrary-index gather — 60 ms/step
    from sports_field_homography_tpu.ops.interval_warp import (
        build_interval_table)
    warp_table = build_interval_table(np.asarray(court_img))
    court_img = jax.device_put(court_img)
    court_poi = jax.device_put(court_poi)

    step = jax.jit(make_train_step(model, optimizer, loss_cfg,
                                   grad_accum=accum),
                   donate_argnums=(0,))

    state, logs = step(state, batch_data, court_img, court_poi, warp_table)
    jax.block_until_ready(logs)

    if args.profile:
        from sports_field_homography_tpu.utils.profiling import trace
        with trace("/tmp/sfh_train_profile"):
            state, logs = step(state, batch_data, court_img, court_poi, warp_table)
            jax.block_until_ready(logs)
        print("trace written to /tmp/sfh_train_profile", file=sys.stderr)

    # best-of-two passes (see bench.py: transient slow windows on the
    # shared dev chip); each pass chains steps through the donated state.
    # block_until_ready does NOT truly sync on the tunneled runtime
    # (CLAUDE.md trap) — force a scalar host fetch to close each pass.
    best = 0.0
    imgs_per_step = batch * accum
    for _ in range(2):
        float(jax.device_get(logs["Tot_loss"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, batch_data, court_img, court_poi, warp_table)
        float(jax.device_get(logs["Tot_loss"]))
        dt = time.perf_counter() - t0
        best = max(best, imgs_per_step * args.iters / dt)
    ms = imgs_per_step / best * 1000
    print(f"train_step batch {batch} @{w}x{h}"
          f"{f' x{accum} accum' if accum > 1 else ''}"
          f"{' fused_bn' if args.fused_bn else ''}"
          f"{' conv_kernel=' + args.conv_kernel if args.conv_kernel != 'auto' else ''}"
          f": {best:.1f} img/s ({ms:.1f} ms/step)")


if __name__ == "__main__":
    main()
