#!/usr/bin/env python
"""Measure XLA vs Pallas nearest interval-warp inside full predict programs.

Two program contexts (real TPU):
  * flagship 640x360 batch 32, theta+consist+warp_mask;
  * full-output 1280x720 warp (unet at 640x360, warp_size/court 1280x720,
    batch 8) — the context where XLA has been observed to materialize the
    one-hot to HBM (25x regression documented in ops/warp_pallas.py).

Grounds the "auto" kernel policy in models/reconstructor.py
(_select_pallas_warp).  Timing rule: end-to-end program with a
scalar host fetch per pass (block_until_ready does not truly sync on the
tunneled runtime — CLAUDE.md).
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp


def build(batch, warp_size, kernel, court_size=None):
    from sports_field_homography_tpu.data.assets import (
        open_court_poi, open_court_template)
    from sports_field_homography_tpu.models import (
        Reconstructor, ReconstructorConfig)
    from sports_field_homography_tpu.ops.interval_warp import (
        build_interval_table)

    court_size = court_size or warp_size
    cfg = ReconstructorConfig(
        target_size=(640, 360), unet_size=(640, 360), warp_size=warp_size,
        resnet_name="resnet34", resnet_input="img+mask",
        warp_with_nearest=True, warp_kernel=kernel)
    model = Reconstructor(cfg, dtype=jnp.bfloat16)
    court_img = open_court_template(
        os.path.join(_REPO, "assets", "mask_ncaa_v4_nc4_m_onehot.png"), num_classes=4,
        size=court_size, batch_size=batch)
    court_poi = open_court_poi(
        os.path.join(_REPO, "assets", "template_ncaa_v4_points.json"), batch)
    table = build_interval_table(np.asarray(court_img))
    return model, jax.device_put(court_img), jax.device_put(court_poi), table


def run(name, batch, warp_size, kernel, keep, iters=10):
    model, ci, cp, wt = build(batch, warp_size, kernel)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, 360, 640, 3))
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), x[:1], ci[:1], cp[:1], train=False))()

    @jax.jit
    def predict(variables, x, ci, cp, wt):
        preds = model.apply(variables, x, ci, cp, consistency=True,
                            project_poi=False, warp_table=wt,
                            method=model.predict)
        return {k: v for k, v in preds.items() if k in keep}

    out = predict(variables, x, ci, cp, wt)
    float(jax.device_get(out["theta"]).ravel()[0])    # true sync
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(variables, x, ci, cp, wt)
        float(jax.device_get(out["theta"]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:55s} {best * 1000:8.1f} ms/batch "
          f"({batch / best:7.1f} fps)")
    return best


def main():
    keep_flag = ("theta", "consist_score", "warp_mask")
    for kernel in ("xla", "pallas"):
        run(f"640x360 b32 theta+consist+warp_mask [{kernel}]",
            32, (640, 360), kernel, keep_flag)
    for kernel in ("xla", "pallas"):
        run(f"1280x720 warp b8 theta+consist+warp_mask [{kernel}]",
            8, (1280, 720), kernel, keep_flag)
    # the original 25x-regression context was batch 32 at 1280x720
    for kernel in ("xla", "pallas"):
        run(f"1280x720 warp b32 theta+consist+warp_mask [{kernel}]",
            32, (1280, 720), kernel, keep_flag)


if __name__ == "__main__":
    main()
