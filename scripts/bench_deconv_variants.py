#!/usr/bin/env python
"""Measure alternative Deconv2x formulations end-to-end on the flagship
predict program (round-2 perf work: the depth-to-space transposes of the
baseline einsum+d2s formulation cost ~11 ms/batch-32 in the r1 profile).

Variants (all keep the SAME param shapes/names — checkpoint compatible):
  d2s         einsum to 4*cout channels, reshape, 6D transpose (baseline)
  convt       jax.lax.conv_general_dilated with lhs_dilation=2 (true
              transposed conv; XLA's native deconv path)
  rowsplit    two einsums (one per output row parity p), each reshaping
              (n,h,w,2,cout)->(n,h,2w,cout) for free (q is adjacent to w),
              then a single stack+reshape row interleave
  onehot4     one einsum to (n,h,w,2,2,cout), two strided p-slices, then
              the same stack+reshape row interleave

Usage:
  python scripts/bench_deconv_variants.py --check   # CPU numerics parity
  python scripts/bench_deconv_variants.py           # TPU end-to-end timing
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_variants():
    import jax
    import jax.numpy as jnp

    def d2s(self, x, kernel, bias):
        n, h, w, cin = x.shape
        cout = self.out_channels
        k = kernel.astype(self.dtype).reshape(cin, 4 * cout)
        y = jnp.einsum("nhwc,ck->nhwk", x.astype(self.dtype), k)
        y = y.reshape(n, h, w, 2, 2, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
        return y + bias.astype(self.dtype)

    def convt(self, x, kernel, bias):
        cin = x.shape[-1]
        cout = self.out_channels
        # out[n,2i+p,2j+q,o] = sum_c x[c] W[c,p,q,o]; conv with lhs_dilation=2
        # and SAME-style (1,1) pads computes out[t] = sum_k K[k] X[t+k-1],
        # which hits x[i] at k = 1-p -> pass the kernel spatially flipped.
        k = kernel.transpose(1, 2, 0, 3)[::-1, ::-1].astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(1, 1),
            padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)

    def rowsplit(self, x, kernel, bias):
        n, h, w, cin = x.shape
        cout = self.out_channels
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        k0 = k[:, 0].reshape(cin, 2 * cout)
        k1 = k[:, 1].reshape(cin, 2 * cout)
        y0 = jnp.einsum("nhwc,ck->nhwk", xd, k0).reshape(n, h, 2 * w, cout)
        y1 = jnp.einsum("nhwc,ck->nhwk", xd, k1).reshape(n, h, 2 * w, cout)
        y = jnp.stack([y0, y1], axis=2).reshape(n, 2 * h, 2 * w, cout)
        return y + bias.astype(self.dtype)

    def onehot4(self, x, kernel, bias):
        n, h, w, cin = x.shape
        cout = self.out_channels
        k = kernel.astype(self.dtype).reshape(cin, 4 * cout)
        y = jnp.einsum("nhwc,ck->nhwk", x.astype(self.dtype), k)
        y = y.reshape(n, h, w, 2, 2 * cout)
        y0 = y[:, :, :, 0].reshape(n, h, 2 * w, cout)
        y1 = y[:, :, :, 1].reshape(n, h, 2 * w, cout)
        y = jnp.stack([y0, y1], axis=2).reshape(n, 2 * h, 2 * w, cout)
        return y + bias.astype(self.dtype)

    return {"d2s": d2s, "convt": convt, "rowsplit": rowsplit,
            "onehot4": onehot4}


def patch_deconv(impl):
    """Replace unet.Deconv2x with a class using the given formulation
    (same param names/shapes -> same variables tree)."""
    from typing import Any

    from flax import linen as nn
    import jax.numpy as jnp
    from sports_field_homography_tpu.models import unet as unet_mod
    from sports_field_homography_tpu.models.layers import (
        torch_conv_kernel_init, torch_bias_init)

    fn = make_variants()[impl]

    class Deconv2xV(nn.Module):
        out_channels: int
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            cin = x.shape[-1]
            cout = self.out_channels
            kernel = self.param("kernel", torch_conv_kernel_init,
                                (cin, 2, 2, cout), jnp.float32)
            bias = self.param("bias", torch_bias_init(cin * 4), (cout,),
                              jnp.float32)
            return fn(self, x, kernel, bias)

    Deconv2xV.__name__ = Deconv2xV.__qualname__ = "Deconv2x"
    unet_mod.Deconv2x = Deconv2xV


def check_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from sports_field_homography_tpu.models import unet as unet_mod

    x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 7, 8), jnp.float32)
    patch_deconv("d2s")
    m = unet_mod.Deconv2x(6)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    for name in ("convt", "rowsplit", "onehot4"):
        patch_deconv(name)
        m2 = unet_mod.Deconv2x(6)
        out = np.asarray(m2.apply(v, x))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        print(f"{name}: matches d2s (max abs diff "
              f"{np.abs(out - ref).max():.2e})")


def bench_tpu(variants, batch=32):
    import time
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sports_field_homography_tpu.ops.interval_warp import build_interval_table

    results = {}
    for name in variants:
        patch_deconv(name)
        from __graft_entry__ import _flagship
        model, court_img, court_poi, cfg = _flagship(batch, dtype=jnp.bfloat16)
        w, h = cfg.target_size
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)
        variables = jax.jit(lambda m=model, ci=court_img, cp=court_poi:
                            m.init(rng, x[:1], ci[:1], cp[:1], train=False))()
        ci = jax.device_put(court_img)
        cp = jax.device_put(court_poi)
        wt = build_interval_table(np.asarray(court_img))

        @jax.jit
        def predict(variables, x, ci, cp, wt, model=model):
            preds = model.apply(variables, x, ci, cp, consistency=True,
                                project_poi=False, warp_table=wt,
                                method=model.predict)
            return {"theta": preds["theta"],
                    "consist_score": preds["consist_score"]}

        out = predict(variables, x, ci, cp, wt)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(20):
                out = predict(variables, x, ci, cp, wt)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        fps = batch / best
        results[name] = (best * 1000, fps)
        print(f"{name:10s}  {best * 1000:7.2f} ms/batch-{batch}  {fps:7.1f} fps",
              flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants", type=str,
                    default="d2s,convt,rowsplit,onehot4")
    a = ap.parse_args()
    if a.check:
        check_cpu()
    else:
        bench_tpu(a.variants.split(","), batch=a.batch)
