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
    dgrad_pair_weights,
    dgrad_weights,
    fold_pair_sums,
    fold_pair_wgrad,
    pack_pair_weights,
    pack_pairs,
    pack_weights,
    supports_conv3x3,
    supports_packed,
    tile_pair,
    unpack_pairs,
    wgrad3x3,
    wgrad_fits,
)

__all__ = ["double_conv_train", "double_conv_eval", "supports_double_conv",
           "supports_double_conv_eval"]


# Train-mode fusion level gate: each fused DoubleConv holds x/y1/y2 as
# custom-VJP residuals; fusing every eligible level at the flagship
# batch-26 config measured 16.4 GB HBM (687 MB over), and every fused
# level adds several slow-to-compile Mosaic kernels on the tunneled dev
# runtime.  Level 1 carries the whole {3,0,2,1} lane-padding tax and the
# largest share of the conv flops, so the train gate keeps H*W >= this
# (level-1 @640x360 model = 230,400 px; level-2 = 57,600; level-3 =
# 14,400).  Eval fuses every supported level (no residuals).  Lower it
# (e.g. to 50_000) to fuse level 2 as well once HBM headroom allows.
_TRAIN_MIN_PIXELS = 200_000


def supports_double_conv(shape, dtype, mid: int = 64,
                         out: int = 64) -> bool:
    """x (N,H,W,Cin): the mid/out-channel convs (and their dgrads, which
    swap channel roles) must be kernel-supported, the wgrad VMEM
    accumulators must fit (deep >=512-channel levels stay on XLA), and the
    level must clear the residual-memory gate (``_TRAIN_MIN_PIXELS``); an
    unsupported Cin (the 3-channel stem) falls back to XLA for conv1 only.
    """
    n, h, w, cin = shape
    if h * w < _TRAIN_MIN_PIXELS:
        return False
    wg_cin = cin if supports_conv3x3(shape, dtype) else mid
    return (supports_conv3x3((n, h, w, mid), dtype)
            and supports_conv3x3((n, h, w, out), dtype)
            and wgrad_fits(mid, out) and wgrad_fits(wg_cin, mid))


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


def _bn_relu_bwd(y, g, mean, rstd, gamma, beta, m, packed=False):
    """Backward of relu(bn_train(y)) given output cotangent g.

    Returns (dy, dgamma, dbeta).  XLA elementwise + reductions — all on
    row-major buffers (no conv ops, so no layout coercion).  ``packed``:
    y/g are width-pair packed (2C lanes); the per-channel vectors are
    tiled in and the stat grads folded back out.
    """
    c = mean.shape[0]
    if packed:
        mean, rstd, gamma, beta = map(tile_pair, (mean, rstd, gamma, beta))
    yf = y.astype(jnp.float32)
    xhat = (yf - mean) * rstd
    pre = xhat * gamma + beta
    dyp = jnp.where(pre > 0, g.astype(jnp.float32), 0.0)
    dbeta_l = jnp.sum(dyp, (0, 1, 2))
    dgamma_l = jnp.sum(dyp * xhat, (0, 1, 2))
    if packed:
        dbeta = fold_pair_sums(dbeta_l[None], c)[0]
        dgamma = fold_pair_sums(dgamma_l[None], c)[0]
        mb, mg = tile_pair(dbeta / m), tile_pair(dgamma / m)
    else:
        dbeta, dgamma = dbeta_l, dgamma_l
        mb, mg = dbeta / m, dgamma / m
    dy = (gamma * rstd) * (dyp - mb - xhat * mg)
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


def _use_packed(x, k1, k2):
    """The interior runs width-pair packed when both BN'd channel counts
    are 64 (the level-1 case XLA pads 2x on the lanes)."""
    n, h, w, _ = x.shape
    return (k1.shape[-1] == 64 and k2.shape[-1] == 64
            and supports_packed((n, h, w, 64), x.dtype))


def _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret):
    n, h, w, cin = x.shape
    m = n * h * w
    mid, cout = k1.shape[-1], k2.shape[-1]
    dt = x.dtype
    packed = _use_packed(x, k1, k2)
    if packed and cin == 64:
        xk = pack_pairs(x)
        y1, s1 = conv3x3(xk, pack_pair_weights(k1).astype(dt),
                         tile_pair(b1), stats=True, interpret=interpret)
        s1 = fold_pair_sums(s1, mid)
    elif supports_conv3x3(x.shape, dt):
        xk = x
        y1, s1 = conv3x3(x, pack_weights(k1).astype(dt), b1,
                         stats=True, interpret=interpret)
        if packed:
            y1 = pack_pairs(y1)
    else:  # 3-channel stem
        xk = x
        y1, s1 = _xla_conv_stats(x, k1, b1)
        if packed:
            y1 = pack_pairs(y1)
    mean1, var1, rstd1 = _finalize_stats(s1, m, eps)
    inv1 = rstd1 * g1
    if packed:
        y2, s2 = conv3x3(y1, pack_pair_weights(k2).astype(dt),
                         tile_pair(b2),
                         prologue=(tile_pair(mean1), tile_pair(inv1),
                                   tile_pair(be1)),
                         stats=True, interpret=interpret)
        s2 = fold_pair_sums(s2, cout)
    else:
        y2, s2 = conv3x3(y1, pack_weights(k2).astype(dt), b2,
                         prologue=(mean1, inv1, be1), stats=True,
                         interpret=interpret)
    mean2, var2, rstd2 = _finalize_stats(s2, m, eps)
    y2f = y2.astype(jnp.float32)
    inv2 = rstd2 * g2
    if packed:
        out = jnp.maximum((y2f - tile_pair(mean2)) * tile_pair(inv2)
                          + tile_pair(be2), 0.0).astype(dt)
        out = unpack_pairs(out)
    else:
        out = jnp.maximum((y2f - mean2) * inv2 + be2, 0.0).astype(dt)
    # y1/y2 residuals stay in the packed layout when packed; xk is the
    # conv1-input view (packed iff cin == 64 and packed)
    return out, mean1, var1, mean2, var2, xk, y1, y2, rstd1, rstd2


def _fwd_vjp(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret):
    (out, mean1, var1, mean2, var2, xk, y1, y2,
     rstd1, rstd2) = _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2,
                               eps, interpret)
    res = (xk, y1, y2, mean1, rstd1, mean2, rstd2,
           k1, g1, be1, k2, g2, be2)
    return (out, mean1, var1, mean2, var2), res


def _bwd_vjp(eps, interpret, res, cots):
    g, _dm1, _dv1, _dm2, _dv2 = cots      # stat cotangents detached
    (xk, y1, y2, mean1, rstd1, mean2, rstd2,
     k1, g1, be1, k2, g2, be2) = res
    cin = k1.shape[2]
    n, h = xk.shape[0], xk.shape[1]
    packed_x = xk.shape[-1] == 2 * cin    # xk is the pair-packed view
    w = xk.shape[2] * 2 if packed_x else xk.shape[2]
    x_shape = (n, h, w, cin)
    m = n * h * w
    mid, cout = k1.shape[-1], k2.shape[-1]
    dt = xk.dtype
    packed = y1.shape[-1] == 2 * mid      # residuals carry the layout

    # BN2 + ReLU backward (out = relu(bn2(y2)))
    gk = pack_pairs(g) if packed else g
    dy2, dgamma2, dbeta2 = _bn_relu_bwd(y2, gk, mean2, rstd2, g2, be2, m,
                                        packed=packed)

    # conv2 backward: z1 = relu(bn1(y1)) recomputed in the wgrad prologue
    inv1 = rstd1 * g1
    pro1 = ((tile_pair(mean1), tile_pair(inv1), tile_pair(be1)) if packed
            else (mean1, inv1, be1))
    dw2, db2 = wgrad3x3(y1, dy2, prologue=pro1, interpret=interpret)
    if packed:
        dk2 = fold_pair_wgrad(dw2, mid, cout)
        db2 = fold_pair_sums(db2[None], cout)[0]
        dz1 = conv3x3(dy2, dgrad_pair_weights(k2).astype(dt),
                      interpret=interpret)
    else:
        dk2 = dw2.reshape(k2.shape)
        dz1 = conv3x3(dy2, dgrad_weights(k2).astype(dt),
                      interpret=interpret)

    # BN1 + ReLU backward (z1 = relu(bn1(y1)))
    dy1, dgamma1, dbeta1 = _bn_relu_bwd(y1, dz1, mean1, rstd1, g1, be1, m,
                                        packed=packed)

    # conv1 backward
    if packed and packed_x:               # xk is the packed input view
        dw1, db1 = wgrad3x3(xk, dy1, interpret=interpret)
        dk1 = fold_pair_wgrad(dw1, cin, mid)
        db1 = fold_pair_sums(db1[None], mid)[0]
        dx = unpack_pairs(conv3x3(dy1, dgrad_pair_weights(k1).astype(dt),
                                  interpret=interpret))
    else:
        dy1u = unpack_pairs(dy1) if packed else dy1
        if supports_conv3x3(x_shape, dt):
            dw1, db1 = wgrad3x3(xk, dy1u, interpret=interpret)
            dk1 = dw1.reshape(k1.shape)
            dx = conv3x3(dy1u, dgrad_weights(k1).astype(dt),
                         interpret=interpret)
        else:  # stem: XLA conv vjp for conv1 only
            def f(xx, kk):
                # no preferred_element_type: its transpose rule rejects the
                # mixed bf16/f32 cotangent; TPU bf16 convs accumulate f32
                # internally regardless
                return jax.lax.conv_general_dilated(
                    xx, kk.astype(xx.dtype), window_strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            _, vjp = jax.vjp(f, xk, k1)
            dx, dk1 = vjp(dy1u)
            dk1 = dk1.astype(jnp.float32)
            db1 = jnp.sum(dy1u.astype(jnp.float32), (0, 1, 2))

    return (dx, dk1, db1, dgamma1, dbeta1, dk2, db2, dgamma2, dbeta2)


double_conv_train.defvjp(_fwd_vjp, _bwd_vjp)


# Eval fusion gate: levels 1-2 are where the Pallas kernels measure ahead
# of XLA (44-70 vs 17-50 TF/s standalone); deeper levels are small,
# XLA-competitive, and each adds slow tunnel-compiled Mosaic kernels.
_EVAL_MIN_PIXELS = 50_000


def supports_double_conv_eval(shape, dtype, mid: int = 64,
                              out: int = 64) -> bool:
    """Eval needs no wgrad, so only the conv kernels must be supported."""
    n, h, w, cin = shape
    if h * w < _EVAL_MIN_PIXELS:
        return False
    return (supports_conv3x3((n, h, w, mid), dtype)
            and supports_conv3x3((n, h, w, out), dtype))


def double_conv_eval(x, k1, b1, g1, be1, rm1, rv1, k2, b2, g2, be2,
                     rm2, rv2, eps: float = 1e-5,
                     interpret: Optional[bool] = None):
    """Inference DoubleConv: (conv3x3 -> eval-BN(running stats) -> ReLU) x 2.

    Same kernels as the train path minus the stat sums and the VJP; BN1 +
    ReLU ride conv2's prologue, BN2 + ReLU are one XLA elementwise pass.
    Works on folded variables too (scale=1 / mean=0 / var=1-eps degenerate
    to the same affine).
    """
    n, h, w, cin = x.shape
    mid, cout = k1.shape[-1], k2.shape[-1]
    dt = x.dtype
    packed = _use_packed(x, k1, k2)
    inv1 = g1 * jax.lax.rsqrt(rv1 + eps)
    inv2 = g2 * jax.lax.rsqrt(rv2 + eps)
    if packed and cin == 64:
        y1 = conv3x3(pack_pairs(x), pack_pair_weights(k1).astype(dt),
                     tile_pair(b1), interpret=interpret)
    elif supports_conv3x3(x.shape, dt):
        y1 = conv3x3(x, pack_weights(k1).astype(dt), b1,
                     interpret=interpret)
        if packed:
            y1 = pack_pairs(y1)
    else:  # 3-channel stem
        y1 = jax.lax.conv_general_dilated(
            x, k1.astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b1.astype(dt)
        if packed:
            y1 = pack_pairs(y1)
    if packed:
        y2 = conv3x3(y1, pack_pair_weights(k2).astype(dt), tile_pair(b2),
                     prologue=(tile_pair(rm1), tile_pair(inv1),
                               tile_pair(be1)),
                     interpret=interpret)
        out = jnp.maximum((y2.astype(jnp.float32) - tile_pair(rm2))
                          * tile_pair(inv2) + tile_pair(be2), 0.0)
        return unpack_pairs(out.astype(dt))
    y2 = conv3x3(y1, pack_weights(k2).astype(dt), b2,
                 prologue=(rm1, inv1, be1), interpret=interpret)
    out = jnp.maximum((y2.astype(jnp.float32) - rm2) * inv2 + be2, 0.0)
    return out.astype(dt)
