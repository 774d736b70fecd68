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
    _pad_input,
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
# Measured @b26 (BASELINE.md round-3 table): level-1-only = the best
# fused configuration; levels 1-2 and 1-3 lose ~3 img/s each — the
# level-N/N+1 boundary relayout does not shrink with buffer size, so
# pushing the domain deeper trades a ~35 ms boundary for equal-or-worse
# kernel+boundary costs below it.
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


def _bn_relu_bwd(y, g, mean, rstd, gamma, beta, m, packed=False,
                 interpret=None):
    """Backward of relu(bn_train(y)) given output cotangent g.

    Returns (dy, dgamma, dbeta).  ``packed``: y/g are width-pair packed
    (2C lanes); the per-channel vectors are tiled in and the stat grads
    folded back out.

    Runs on the bn_pallas reduce/dx kernels over the FREE row-major 2D
    view (N*H*W', L) whenever the lane dim is tile-full — the XLA
    elementwise+reduce formulation measured ~78 ms/step across the fused
    step's BatchNorm backwards (profile, round 3); the kernels stream the
    same bytes at full lanes with no layout games.
    """
    from .bn_pallas import _bwd_reduce_kernel, _dx_kernel, _grid_call
    from .bn_pallas import _block_rows

    c = mean.shape[0]
    if packed:
        mean, rstd, gamma, beta = map(tile_pair, (mean, rstd, gamma, beta))
    ll = y.shape[-1]
    rows = y.shape[0] * y.shape[1] * y.shape[2]
    use_kernels = (ll % 128 == 0
                   and _block_rows(rows, ll, jnp.dtype(y.dtype).itemsize) > 0)
    if use_kernels:
        itp = jax.default_backend() != "tpu" if interpret is None \
            else interpret
        y2 = y.reshape(rows, ll)
        g2 = g.reshape(rows, ll)
        vecs = [v.reshape(1, ll).astype(jnp.float32)
                for v in (mean, rstd, gamma, beta)]
        sums = _grid_call(_bwd_reduce_kernel, [y2, g2], vecs, (8, ll), itp)
        dbeta_l, dgamma_l = sums[0], sums[1]
    else:
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
    if use_kernels:
        c1 = gamma * rstd
        dy2 = _grid_call(
            _dx_kernel, [y2, g2],
            vecs + [v.reshape(1, ll).astype(jnp.float32)
                    for v in (c1, mb, mg)],
            (rows, ll), itp)
        dy = dy2.reshape(y.shape)
    else:
        dy = ((gamma * rstd) * (dyp - mb - xhat * mg)).astype(y.dtype)
    return dy.astype(y.dtype), dgamma, dbeta


def _stem_pairs(x):
    """(N, H, W, C) small-C input -> width-pair im2col (N, H, W/2, 2*9C).

    Lane order: parity-major ([u=0 taps | u=1 taps]), taps in (ky, kx, c)
    order — matching ``_stem_block_weights``.  Built from strided slices
    of the padded input, which XLA fuses into one pass; this NEVER
    reshapes 64<->128 lanes on a big buffer (the round-3 profile measured
    such reshapes at ~30 ms each).
    """
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, ky:ky + h, kx + u:kx + u + w:2, :]
            for u in (0, 1) for ky in range(3) for kx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def _stem_block_weights(k1):
    """(3, 3, C, Mid) -> (2*9C, 2*Mid) pair block-diagonal weights."""
    kh, kw, c, mid = k1.shape
    kf = k1.reshape(kh * kw * c, mid)
    z = jnp.zeros_like(kf)
    return jnp.concatenate(
        [jnp.concatenate([kf, z], axis=1),
         jnp.concatenate([z, kf], axis=1)], axis=0)


def _stem_pair_dot(x, k1, b1, dt):
    """Stem conv as a pair-packed XLA dot: y1 PACKED (N,H,W/2,2Mid) + stat
    sums.  Dots keep row-major layouts (unlike XLA convs, which would pin
    ``{3,0,2,1}`` onto the shared level-1 buffers).  The dot emits the
    compute dtype directly (MXU still accumulates f32 internally) — a
    materialized f32 level-1 buffer costs ~750 MB of transient HBM, which
    was exactly the margin that OOM'd the levels-1-2 fused step."""
    n, h, w, _ = x.shape
    mid = k1.shape[-1]
    pairs = _stem_pairs(x).astype(dt)
    k2d = pairs.shape[-1]
    y = jnp.dot(pairs.reshape(-1, k2d), _stem_block_weights(k1).astype(dt),
                preferred_element_type=dt)
    y = y + tile_pair(b1).astype(dt)
    yf = y.astype(jnp.float32)
    sums = fold_pair_sums(
        jnp.stack([jnp.sum(yf, 0), jnp.sum(yf * yf, 0)]), mid)
    return y.reshape(n, h, w // 2, 2 * mid), sums


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def double_conv_train(x, k1, b1, g1, be1, k2, b2, g2, be2,
                      eps: float = 1e-5, interpret: Optional[bool] = None,
                      io: str = "native"):
    """(conv3x3 -> train-BN -> ReLU) x 2.

    Args:
      x: (N, H, W, Cin) activation (bf16/f32) — or, for ``io`` modes
        below, the packed forms.
      k1: (3, 3, Cin, Mid) f32 conv kernel; b1 (Mid,) bias.
      g1/be1: (Mid,) BN scale/shift.  k2/b2/g2/be2: same for conv2.
      io: boundary layout (STATIC) —
        * "native": x and out are plain (N,H,W,C) arrays (the interior
          still packs 64-channel work internally).
        * "stem_packed": x is the small-C network input; conv1 runs as a
          pair-packed XLA dot and OUT IS PACKED (N,H,W/2,128).
        * "dual_packed": x is a TUPLE of two packed activations (the
          decoder skip + upsample pair — concat-free: conv(concat(a,b))
          == conv(a,W_a) + conv(b,W_b)); out is packed.
    Returns:
      (out, mean1, var1, mean2, var2) — biased variances, f32, for the
      caller's running-stat update.
    """
    out, *_rest = _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2,
                            eps, interpret, io)
    return (out,) + tuple(_rest[:4])


def _use_packed(x, k1, k2):
    """The interior runs width-pair packed when both BN'd channel counts
    are 64 (the level-1 case XLA pads 2x on the lanes)."""
    n, h, w, _ = x.shape
    return (k1.shape[-1] == 64 and k2.shape[-1] == 64
            and supports_packed((n, h, w, 64), x.dtype))


def _conv1_fwd(x, k1, b1, k2, dt, io, interpret):
    """conv1 + stat sums per io mode.  Returns (xk_residual, y1, s1,
    packed) — y1 packed iff the interior runs packed."""
    mid = k1.shape[-1]
    if io == "stem_packed":
        y1, s1 = _stem_pair_dot(x, k1, b1, dt)
        return x, y1, s1, True
    if io == "dual_packed":
        xa, xb = x
        ca = xa.shape[-1] // 2
        # pad once; the padded pair is ALSO the residual (the unpadded
        # deconv/skip buffers can then die after the pad instead of being
        # carried to the backward - the OOM dump showed both forms of both
        # inputs alive around this conv)
        xap, xbp = _pad_input(xa), _pad_input(xb)
        y1, s1 = conv3x3(xap, pack_pair_weights(k1[:, :, :ca]).astype(dt),
                         tile_pair(b1), stats=True, interpret=interpret,
                         x2=xbp,
                         wmat2=pack_pair_weights(k1[:, :, ca:]).astype(dt),
                         pre_padded=True)
        return (xap, xbp), y1, fold_pair_sums(s1, mid), True
    # io == "native"
    cin = x.shape[-1]
    packed = _use_packed(x, k1, k2)
    if packed and cin == 64:
        xk = _pad_input(pack_pairs(x))
        y1, s1 = conv3x3(xk, pack_pair_weights(k1).astype(dt),
                         tile_pair(b1), stats=True, interpret=interpret,
                         pre_padded=True)
        return xk, y1, fold_pair_sums(s1, mid), True
    if supports_conv3x3(x.shape, dt):
        xk = _pad_input(x)
        y1, s1 = conv3x3(xk, pack_weights(k1).astype(dt), b1,
                         stats=True, interpret=interpret, pre_padded=True)
        if packed:
            y1 = pack_pairs(y1)
        return xk, y1, s1, packed
    # 3-channel stem, native out
    y1, s1 = _xla_conv_stats(x, k1, b1)
    if packed:
        y1 = pack_pairs(y1)
    return x, y1, s1, packed


def _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret, io):
    mid, cout = k1.shape[-1], k2.shape[-1]
    if io != "native":
        assert mid == 64 and cout == 64, (io, mid, cout)
        # stem input is native; dual inputs are packed (W halved)
        ref = x[0] if io == "dual_packed" else x
        n, h = ref.shape[0], ref.shape[1]
        w = ref.shape[2] * 2 if io == "dual_packed" else ref.shape[2]
    else:
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
    m = n * h * w
    dt = (x[0] if isinstance(x, tuple) else x).dtype

    xk, y1, s1, packed = _conv1_fwd(x, k1, b1, k2, dt, io, interpret)
    # pad once; conv2 (fwd) and wgrad2 (bwd) share the padded residual
    y1 = _pad_input(y1)
    mean1, var1, rstd1 = _finalize_stats(s1, m, eps)
    inv1 = rstd1 * g1
    if packed:
        y2, s2 = conv3x3(y1, pack_pair_weights(k2).astype(dt),
                         tile_pair(b2),
                         prologue=(tile_pair(mean1), tile_pair(inv1),
                                   tile_pair(be1)),
                         stats=True, interpret=interpret, pre_padded=True)
        s2 = fold_pair_sums(s2, cout)
    else:
        y2, s2 = conv3x3(y1, pack_weights(k2).astype(dt), b2,
                         prologue=(mean1, inv1, be1), stats=True,
                         interpret=interpret, pre_padded=True)
    mean2, var2, rstd2 = _finalize_stats(s2, m, eps)
    y2f = y2.astype(jnp.float32)
    inv2 = rstd2 * g2
    if packed:
        out = jnp.maximum((y2f - tile_pair(mean2)) * tile_pair(inv2)
                          + tile_pair(be2), 0.0).astype(dt)
        if io == "native":
            out = unpack_pairs(out)
    else:
        out = jnp.maximum((y2f - mean2) * inv2 + be2, 0.0).astype(dt)
    # y1/y2 residuals stay in the packed layout when packed; xk is the
    # conv1-input view (packed iff the input itself is packed)
    return out, mean1, var1, mean2, var2, xk, y1, y2, rstd1, rstd2


def _fwd_vjp(x, k1, b1, g1, be1, k2, b2, g2, be2, eps, interpret, io):
    (out, mean1, var1, mean2, var2, xk, y1, y2,
     rstd1, rstd2) = _fwd_impl(x, k1, b1, g1, be1, k2, b2, g2, be2,
                               eps, interpret, io)
    res = (xk, y1, y2, mean1, rstd1, mean2, rstd2,
           k1, g1, be1, k2, g2, be2)
    return (out, mean1, var1, mean2, var2), res


def _conv1_bwd(xk, dy1, k1, dt, io, interpret):
    """dx/dk1/db1 per io mode (dy1 is packed iff the interior is)."""
    cin, mid = k1.shape[2], k1.shape[3]
    if io == "stem_packed":
        # dW via the recomputed pair-im2col; dx via an XLA conv (the
        # network input needs no grad in training — XLA DCEs it)
        pairs = _stem_pairs(xk).astype(dt)
        k2d = pairs.shape[-1]
        dwblk = jax.lax.dot_general(
            pairs.reshape(-1, k2d), dy1.reshape(-1, dy1.shape[-1]),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        nine_c = 9 * cin
        dk1 = (dwblk[:nine_c, :mid]
               + dwblk[nine_c:, mid:]).reshape(3, 3, cin, mid)
        db1 = fold_pair_sums(
            jnp.sum(dy1.astype(jnp.float32), (0, 1, 2))[None], mid)[0]
        dy1u = unpack_pairs(dy1)
        dx = jax.lax.conv_general_dilated(
            dy1u, k1[::-1, ::-1].transpose(0, 1, 3, 2).astype(dt),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return dx, dk1, db1
    if io == "dual_packed":
        xa, xb = xk                       # PADDED residuals
        ca = xa.shape[-1] // 2
        k1a, k1b = k1[:, :, :ca], k1[:, :, ca:]
        dwa, dba = wgrad3x3(xa, dy1, interpret=interpret, pre_padded=True)
        dwb, _ = wgrad3x3(xb, dy1, interpret=interpret, pre_padded=True)
        dk1 = jnp.concatenate([fold_pair_wgrad(dwa, ca, mid),
                               fold_pair_wgrad(dwb, cin - ca, mid)], axis=2)
        db1 = fold_pair_sums(dba[None], mid)[0]
        dy1p = _pad_input(dy1)            # shared by both dgrads
        dxa = conv3x3(dy1p, dgrad_pair_weights(k1a).astype(dt),
                      interpret=interpret, pre_padded=True)
        dxb = conv3x3(dy1p, dgrad_pair_weights(k1b).astype(dt),
                      interpret=interpret, pre_padded=True)
        return (dxa, dxb), dk1, db1
    raise AssertionError(io)


def _bwd_vjp(eps, interpret, io, res, cots):
    g, _dm1, _dv1, _dm2, _dv2 = cots      # stat cotangents detached
    (xk, y1, y2, mean1, rstd1, mean2, rstd2,
     k1, g1, be1, k2, g2, be2) = res
    cin = k1.shape[2]
    mid, cout = k1.shape[-1], k2.shape[-1]
    packed = y1.shape[-1] == 2 * mid      # residuals carry the layout
    # y1 residual is PADDED (N, H+2, W'+8, L): recover the true dims
    n, h = y1.shape[0], y1.shape[1] - 2
    wp = y1.shape[2] - 8
    w = wp * 2 if packed else wp
    if io == "dual_packed":
        packed_x = True
    else:
        packed_x = xk.shape[-1] == 2 * cin and io != "stem_packed"
    x_shape = (n, h, w, cin)
    m = n * h * w
    dt = (xk[0] if isinstance(xk, tuple) else xk).dtype

    # BN2 + ReLU backward (out = relu(bn2(y2)))
    gk = pack_pairs(g) if (packed and io == "native") else g
    dy2, dgamma2, dbeta2 = _bn_relu_bwd(y2, gk, mean2, rstd2, g2, be2, m,
                                        packed=packed)

    # conv2 backward: z1 = relu(bn1(y1)) recomputed in the wgrad prologue
    # (y1 is the PADDED residual shared with the forward's conv2)
    inv1 = rstd1 * g1
    pro1 = ((tile_pair(mean1), tile_pair(inv1), tile_pair(be1)) if packed
            else (mean1, inv1, be1))
    dw2, db2 = wgrad3x3(y1, dy2, prologue=pro1, interpret=interpret,
                        pre_padded=True)
    if packed:
        dk2 = fold_pair_wgrad(dw2, mid, cout)
        db2 = fold_pair_sums(db2[None], cout)[0]
        dz1 = conv3x3(dy2, dgrad_pair_weights(k2).astype(dt),
                      interpret=interpret)
    else:
        dk2 = dw2.reshape(k2.shape)
        dz1 = conv3x3(dy2, dgrad_weights(k2).astype(dt),
                      interpret=interpret)

    # BN1 + ReLU backward (z1 = relu(bn1(y1))) — the interior slice of
    # the padded residual fuses into the elementwise pass (no copy)
    y1i = y1[:, 1:y1.shape[1] - 1, 1:dz1.shape[2] + 1, :]
    dy1, dgamma1, dbeta1 = _bn_relu_bwd(y1i, dz1, mean1, rstd1, g1, be1, m,
                                        packed=packed)

    # conv1 backward
    if io != "native":
        dx, dk1, db1 = _conv1_bwd(xk, dy1, k1, dt, io, interpret)
    elif packed and packed_x:             # xk is the PADDED packed view
        dw1, db1 = wgrad3x3(xk, dy1, interpret=interpret, pre_padded=True)
        dk1 = fold_pair_wgrad(dw1, cin, mid)
        db1 = fold_pair_sums(db1[None], mid)[0]
        dx = unpack_pairs(conv3x3(dy1, dgrad_pair_weights(k1).astype(dt),
                                  interpret=interpret))
    else:
        dy1u = unpack_pairs(dy1) if packed else dy1
        if supports_conv3x3(x_shape, dt):
            dw1, db1 = wgrad3x3(xk, dy1u, interpret=interpret,
                                pre_padded=True)
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
                     interpret: Optional[bool] = None, io: str = "native"):
    """Inference DoubleConv: (conv3x3 -> eval-BN(running stats) -> ReLU) x 2.

    Same kernels as the train path minus the stat sums and the VJP; BN1 +
    ReLU ride conv2's prologue, BN2 + ReLU are one XLA elementwise pass.
    Works on folded variables too (scale=1 / mean=0 / var=1-eps degenerate
    to the same affine).  ``io`` as in ``double_conv_train`` (packed
    boundary forms for the level-1 packed domain).
    """
    mid, cout = k1.shape[-1], k2.shape[-1]
    dt = (x[0] if isinstance(x, tuple) else x).dtype
    inv1 = g1 * jax.lax.rsqrt(rv1 + eps)
    inv2 = g2 * jax.lax.rsqrt(rv2 + eps)
    if io == "stem_packed":
        y1, _ = _stem_pair_dot(x, k1, b1, dt)
        packed = True
    elif io == "dual_packed":
        xa, xb = x
        ca = xa.shape[-1] // 2
        y1 = conv3x3(xa, pack_pair_weights(k1[:, :, :ca]).astype(dt),
                     tile_pair(b1), interpret=interpret, x2=xb,
                     wmat2=pack_pair_weights(k1[:, :, ca:]).astype(dt))
        packed = True
    else:
        cin = x.shape[-1]
        packed = _use_packed(x, k1, k2)
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
        out = out.astype(dt)
        return unpack_pairs(out) if io == "native" else out
    y2 = conv3x3(y1, pack_weights(k2).astype(dt), b2,
                 prologue=(rm1, inv1, be1), interpret=interpret)
    out = jnp.maximum((y2.astype(jnp.float32) - rm2) * inv2 + be2, 0.0)
    return out.astype(dt)
