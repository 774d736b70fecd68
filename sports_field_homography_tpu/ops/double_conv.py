"""Fused train-mode DoubleConv: (conv3x3 -> BN -> ReLU) x 2 with a custom
VJP built from the Pallas conv kernels (ops/conv3x3_pallas).

Capability twin of the reference hot block ``unet/unet_parts.py:7-24`` in
training mode; the TPU motivation (XLA's ``{3,0,2,1}`` conv-grad layouts
padding batch 26 to 32 and C 64 to 128) is documented in
``conv3x3_pallas``.  Semantics match ``models.layers.BatchNorm`` exactly:
biased variance normalizes, the caller folds the unbiased factor into the
running stats; mean/var outputs are detached (running stats never carry
gradient inside a step), matching torch.

Pass structure (per DoubleConv, N*H*W = M):
  fwd:  K1: y1 = conv(x, W1) + b1           [+ sum/sumsq of y1]
        (tiny XLA) stats1 -> mean1/var1/rstd1
        K2: y2 = conv(relu(bn1(y1)), W2) + b2  [+ sum/sumsq of y2]
        (XLA elementwise) out = relu(bn2(y2))
  bwd:  (XLA) BN2+ReLU backward -> dy2, dgamma2, dbeta2
        K3: dW2, db2 = wgrad(y1 -> prologue bn1+relu, dy2)
        K4: dz1 = conv(dy2, dgrad(W2))
        (XLA) BN1+ReLU backward (mask from bn1(y1)>0) -> dy1, dgamma1, dbeta1
        K5: dW1, db1 = wgrad(x, dy1)
        K6: dx = conv(dy1, dgrad(W1))

When the first conv's input is unsupported (the 3-channel stem), conv1
falls back to an XLA conv (+ fused XLA stat sums) in both directions; the
rest of the chain stays in Pallas.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .conv3x3_pallas import (
    conv3x3,
    dgrad_weights,
    pack_weights,
    supports_conv3x3,
    wgrad3x3,
)

__all__ = ["double_conv_train", "supports_double_conv"]


def supports_double_conv(shape, dtype) -> bool:
    """x (N,H,W,Cin): mid/out channel kernels must be supported; the stem
    (unsupported Cin) falls back to XLA for conv1 only."""
    n, h, w, _ = shape
    return supports_conv3x3((n, h, w, 64), dtype)


def _xla_conv_stats(x, k, b):
    """XLA fallback for an unsupported conv1: conv + bias + stat sums."""
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + b
    sums = jnp.stack([jnp.sum(y, (0, 1, 2)),
                      jnp.sum(y * y, (0, 1, 2))])
    return y.astype(x.dtype), sums


def _finalize_stats(sums, m, eps):
    mean = sums[0] / m
    var = sums[1] / m - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, var, rstd


def _bn_relu_bwd(y, g, mean, rstd, gamma, beta, m):
    """Backward of relu(bn_train(y)) given output cotangent g.

    Returns (dy, dgamma, dbeta).  XLA elementwise + reductions — all on
    row-major buffers (no conv ops, so no layout coercion).
    """
    yf = y.astype(jnp.float32)
    xhat = (yf - mean) * rstd
    pre = xhat * gamma + beta
    dyp = jnp.where(pre > 0, g.astype(jnp.float32), 0.0)
    dbeta = jnp.sum(dyp, (0, 1, 2))
    dgamma = jnp.sum(dyp * xhat, (0, 1, 2))
    dy = (gamma * rstd) * (dyp - dbeta / m - xhat * (dgamma / m))
    return dy.astype(y.dtype), dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def double_conv_train(x, k1, b1, g1, be1, k2, b2, g2, be2,
                      eps: float = 1e-5, interpret: Optional[bool] = None):
    """(conv3x3 -> train-BN -> ReLU) x 2.

    Args:
      x: (N, H, W, Cin) activation (bf16/f32).
      k1: (3, 3, Cin, Mid) f32 conv kernel; b1 (Mid,) bias.
      g1/be1: (Mid,) BN scale/shift.  k2/b2/g2/be2: same for conv2.
    Returns:
      (out (N,H,W,Cout), mean1, var1, mean2, var2) — biased variances,
      f32, for the caller's running-stat update.
    """
    out, *_rest = _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2,
                            eps, interpret)
    return (out,) + tuple(_rest[:4])


def _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret):
    n, h, w, cin = x.shape
    m = n * h * w
    dt = x.dtype
    if supports_conv3x3(x.shape, dt):
        y1, s1 = conv3x3(x, pack_weights(k1).astype(dt), b1,
                         stats=True, interpret=interpret)
    else:  # 3-channel stem
        y1, s1 = _xla_conv_stats(x, k1, b1)
    mean1, var1, rstd1 = _finalize_stats(s1, m, eps)
    inv1 = rstd1 * g1
    y2, s2 = conv3x3(y1, pack_weights(k2).astype(dt), b2,
                     prologue=(mean1, inv1, be1), stats=True,
                     interpret=interpret)
    mean2, var2, rstd2 = _finalize_stats(s2, m, eps)
    y2f = y2.astype(jnp.float32)
    out = jnp.maximum((y2f - mean2) * (rstd2 * g2) + be2, 0.0).astype(dt)
    return out, mean1, var1, mean2, var2, y1, y2, rstd1, rstd2


def _fwd_vjp(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret):
    (out, mean1, var1, mean2, var2, y1, y2,
     rstd1, rstd2) = _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2,
                               eps, interpret)
    res = (x, y1, y2, mean1, rstd1, mean2, rstd2, k1, g1, be1, k2, g2, be2)
    return (out, mean1, var1, mean2, var2), res


def _bwd_vjp(eps, interpret, res, cots):
    g, _dm1, _dv1, _dm2, _dv2 = cots      # stat cotangents detached
    x, y1, y2, mean1, rstd1, mean2, rstd2, k1, g1, be1, k2, g2, be2 = res
    n, h, w, _ = x.shape
    m = n * h * w
    dt = x.dtype

    # BN2 + ReLU backward (out = relu(bn2(y2)))
    dy2, dgamma2, dbeta2 = _bn_relu_bwd(y2, g, mean2, rstd2, g2, be2, m)

    # conv2 backward: z1 = relu(bn1(y1)) recomputed in the wgrad prologue
    inv1 = rstd1 * g1
    dw2, db2 = wgrad3x3(y1, dy2, prologue=(mean1, inv1, be1),
                        interpret=interpret)
    dk2 = dw2.reshape(k2.shape)
    dz1 = conv3x3(dy2, dgrad_weights(k2).astype(dt), interpret=interpret)

    # BN1 + ReLU backward (z1 = relu(bn1(y1)))
    dy1, dgamma1, dbeta1 = _bn_relu_bwd(y1, dz1, mean1, rstd1, g1, be1, m)

    # conv1 backward
    if supports_conv3x3(x.shape, dt):
        dw1, db1 = wgrad3x3(x, dy1, interpret=interpret)
        dk1 = dw1.reshape(k1.shape)
        dx = conv3x3(dy1, dgrad_weights(k1).astype(dt), interpret=interpret)
    else:  # stem: XLA conv vjp for conv1 only
        def f(xx, kk, bb):
            y = jax.lax.conv_general_dilated(
                xx, kk.astype(xx.dtype), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return (y + bb).astype(xx.dtype)

        _, vjp = jax.vjp(f, x, k1, jnp.zeros_like(db2, shape=k1.shape[-1:]))
        dx, dk1, db1 = vjp(dy1)
        dk1 = dk1.astype(jnp.float32)
        db1 = jnp.sum(dy1.astype(jnp.float32), (0, 1, 2))

    return (dx, dk1, db1, dgamma1, dbeta1, dk2, db2, dgamma2, dbeta2)


double_conv_train.defvjp(_fwd_vjp, _bwd_vjp)
