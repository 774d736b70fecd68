#!/usr/bin/env python
"""Measure the PyTorch reference vs this framework on the SAME CPU.

The reference publishes no numbers and no GPU exists in this image, so
the 70-fps V100 figure in bench.py stays an estimate.  This script
executes BASELINE.md's measurement protocol on the hardware both stacks
can run: the reference's own ``Reconstructor.predict`` (torch CPU, fp32,
kornia stubbed exactly as in the parity tests) against our jitted predict
(jax CPU, fp32) on identical inputs — the production inference config
(UNet + resnet34, 640x360, theta+consistency).

Usage: python scripts/bench_reference_cpu.py [--batch 4] [--iters 3]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def bench_reference(batch, iters, x_np, court_np):
    import torch
    from torch_ref import import_reference

    ref_reconstructor, _, _ = import_reference()
    torch.manual_seed(0)
    court_poi = torch.zeros(batch, 52, 2)          # unused on this path
    model = ref_reconstructor.Reconstructor(
        torch.from_numpy(court_np),                # (B,1,H,W) in [0,1]
        court_poi,
        target_size=(640, 360), mask_classes=4,
        use_unet=True, unet_bilinear=False, unet_size=(640, 360),
        use_resnet=True, resnet_name="resnet34", resnet_input="img+mask",
        use_warper=True, warp_size=(640, 360), warp_with_nearest=True)
    model.eval()
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2).contiguous()
    with torch.no_grad():
        model.predict(x, consistency=True)         # warmup
        best = 1e9
        for _ in range(iters):
            t0 = time.perf_counter()
            model.predict(x, consistency=True)
            best = min(best, time.perf_counter() - t0)
    return batch / best


def bench_ours(batch, iters, x_np, court_np):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from sports_field_homography_tpu.models import (
        Reconstructor, ReconstructorConfig)
    from sports_field_homography_tpu.data.assets import open_court_poi
    from sports_field_homography_tpu.ops.interval_warp import (
        build_interval_table)

    cfg = ReconstructorConfig(target_size=(640, 360), unet_size=(640, 360),
                              warp_size=(640, 360), resnet_name="resnet34",
                              resnet_input="img+mask", warp_with_nearest=True)
    model = Reconstructor(cfg, dtype=jnp.float32)
    ci = jnp.asarray(np.transpose(court_np, (0, 2, 3, 1)))   # NCHW->NHWC
    cp = open_court_poi(os.path.join(REPO, "assets/template_ncaa_v4_points.json"),
                        batch)
    x = jnp.asarray(x_np)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x[:1],
                                           ci[:1], cp[:1], train=False))()
    wt = build_interval_table(np.asarray(ci))

    @jax.jit
    def predict(variables, x, ci, cp, wt):
        p = model.apply(variables, x, ci, cp, consistency=True,
                        project_poi=False, warp_table=wt,
                        method=model.predict)
        return {"theta": p["theta"], "consist_score": p["consist_score"]}

    out = predict(variables, x, ci, cp, wt)                  # warmup/compile
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = predict(variables, x, ci, cp, wt)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(0)
    x_np = rng.rand(args.batch, 360, 640, 3).astype(np.float32)
    tmpl = np.array(Image.open(os.path.join(
        REPO, "assets/mask_ncaa_v4_nc4_m_onehot.png")).resize(
            (640, 360), Image.NEAREST), np.float32)
    if tmpl.ndim == 3:
        tmpl = tmpl[..., 0]
    court_np = np.tile((tmpl / 4.0)[None, None], (args.batch, 1, 1, 1))

    ours = bench_ours(args.batch, args.iters, x_np, court_np)
    ref = bench_reference(args.batch, args.iters, x_np, court_np)
    print(f"reference torch CPU fp32: {ref:6.2f} fps "
          f"(batch {args.batch})")
    print(f"ours jax CPU fp32:        {ours:6.2f} fps "
          f"(batch {args.batch})  ratio {ours / ref:.2f}x")


if __name__ == "__main__":
    main()
