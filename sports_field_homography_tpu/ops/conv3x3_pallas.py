"""Pallas 3x3-convolution kernels owning their layouts end to end.

Why these exist (round-2 diagnosis, BASELINE.md "Training step"): XLA's
convolution gradients pin every large UNet activation to the ``{3,0,2,1}``
layout — C on the 128 lanes (2x padded at C=64) and N on the 8 sublanes
(batch 26 padded to 32) — so the flagship batch-26 train step runs
batch-32 tiles end to end, and any Pallas kernel dropped between XLA convs
pays relayout copies of GB-scale buffers (ops/bn_pallas.py's measured
negative result).  The only way to win is to replace the convolutions
themselves: these kernels express conv3x3 as MXU matmuls over row-major
(N, H, W, C) blocks, tile the batch on the GRID (no N-padding at any batch
size), and fuse the BatchNorm+ReLU epilogue/prologue and the BN batch-stat
reductions into the same pass (reference hot loop ``unet/unet_parts.py:7-24``).

Kernel shape strategy:
  * grid = (N * H/Th,): one program per Th-row strip of one image — batch
    never touches sublanes, so batch 26 does exactly 26/32 of batch 32's
    work.
  * input strips are overlapping (Th+2)-row halo windows over the
    XLA-padded (H+2, W+8) input, expressed with ``pl.Element`` block
    specs (Mosaic requires the window's second-minor dim 8-aligned,
    hence width padded by 8: 1 left + 7 right, interior columns [1, W]).
  * the 3x3 conv runs as 9 accumulated (Th*W, Cin) x (Cin, Cout) MXU
    dots from shifted in-window slices ("dot9") or as one
    (Th*W, 9Cin) x (9Cin, Cout) dot over a lane-concatenated im2col
    patch — selected by measurement (scripts/bench_conv_kernel_probe.py).
  * optional prologue applies train-mode BatchNorm+ReLU to the INPUT
    while it sits in VMEM (the previous conv's normalize pass costs no
    HBM round-trip); padding cells are re-zeroed after the affine since
    relu(beta - mean*inv) != 0.
  * optional epilogue accumulates per-channel sum / sum-of-squares of the
    OUTPUT across the grid (f32), giving the next BatchNorm its batch
    stats without another pass over HBM.

``wgrad3x3`` computes dW = sum_i patch_i^T dy_i (and db = sum dy) with the
same window machinery, accumulating into a revisited (9Cin, Cout) f32
block — K = Th*W-deep MXU contractions.

A transposed-conv gradient needs no kernel of its own: dgrad is
``conv3x3`` over the padded cotangent with spatially-flipped,
channel-transposed weights (``dgrad_weights``).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pack_weights", "dgrad_weights", "conv3x3", "wgrad3x3",
           "supports_conv3x3", "best_th", "pack_pairs", "unpack_pairs",
           "pack_pair_weights", "fold_pair_wgrad", "supports_packed"]

_LANES = 128
# VMEM budget for the dominant per-block buffers (input window double
# buffer + patch slices + f32 accumulator); keeps the scoped limit safe.
_BLOCK_BUDGET = 6 << 20


def pack_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO -> (9*Cin, Cout), (ky, kx, cin) row order."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), kernel.shape
    return kernel.reshape(9 * cin, cout)


def dgrad_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (9*Cout, Cin) packed dgrad weights.

    dx[p] = sum_k dy[p + 1 - k] W[k]  =>  conv3x3(pad(dy), rot180(W)^T).
    """
    return pack_weights(kernel[::-1, ::-1].transpose(0, 1, 3, 2))


def best_th(h: int, w: int, cin: int, cout: int, itemsize: int = 2,
            mode: str = "im2col") -> int:
    """Largest Th dividing h whose block buffers fit the VMEM budget."""
    best = 0
    taps = 9 if mode == "im2col" else 1      # im2col materializes all 9
    for th in range(1, h + 1):
        if h % th:
            continue
        window = 2 * (th + 2) * (w + 8) * cin * itemsize
        patch = taps * th * w * cin * itemsize
        acc = th * w * cout * 4
        outb = 2 * th * w * cout * itemsize
        if window + patch + acc + outb <= _BLOCK_BUDGET:
            best = th
    return best


def supports_conv3x3(shape: Tuple[int, ...], dtype) -> bool:
    """Static check: can these kernels handle this activation?"""
    if len(shape) != 4 or jnp.dtype(dtype) not in (jnp.dtype(jnp.bfloat16),
                                                   jnp.dtype(jnp.float32)):
        return False
    n, h, w, c = shape
    if w % 8 or c % _LANES and c % 64:
        return False
    return best_th(h, w, c, c, jnp.dtype(dtype).itemsize) > 0


def wgrad_fits(cin: int, cout: int) -> bool:
    """The wgrad kernel accumulates a revisited (9*Cin, Cout) f32 block in
    VMEM; deep UNet levels (C >= 512) blow the budget and stay on XLA."""
    return 9 * cin * cout * 4 <= _BLOCK_BUDGET


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _pad_input(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad H by (1,1) and W by (1,7): interior cols [1, W]."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))


def _valid_mask(th: int, w: int, h: int, hs):
    """(Th+2, W+8, 1) bool: True on interior (non-padding) cells.

    ``hs`` is the window's start row in the padded (H+2)-row array; padded
    rows are 0 and H+1, padded cols are 0 and W+1..W+7.
    """
    rid = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 8, 1), 0) + hs
    cid = jax.lax.broadcasted_iota(jnp.int32, (th + 2, w + 8, 1), 1)
    return (rid > 0) & (rid < h + 1) & (cid >= 1) & (cid <= w)


def _apply_prologue(xblk, mean_ref, inv_ref, beta_ref, th, w, h, hs, dtype):
    """relu((x - mean) * inv + beta) with padding cells re-zeroed."""
    z = (xblk.astype(jnp.float32) - mean_ref[0]) * inv_ref[0] + beta_ref[0]
    z = jnp.maximum(z, 0.0)
    return jnp.where(_valid_mask(th, w, h, hs), z, 0.0).astype(dtype)


def _taps(xblk, th, w, cin):
    """The 9 shifted (Th*W, Cin) in-window views of a (Th+2, W+8, C) block."""
    return [xblk[ky:ky + th, kx:kx + w, :].reshape(th * w, cin)
            for ky in range(3) for kx in range(3)]


@functools.partial(
    jax.jit,
    static_argnames=("stats", "th", "mode", "out_dtype", "interpret",
                     "pre_padded"))
def conv3x3(x: jnp.ndarray, wmat: jnp.ndarray,
            bias: Optional[jnp.ndarray] = None,
            prologue: Optional[Tuple] = None,
            stats: bool = False, th: Optional[int] = None,
            mode: str = "im2col", out_dtype=None,
            interpret: Optional[bool] = None,
            x2: Optional[jnp.ndarray] = None,
            wmat2: Optional[jnp.ndarray] = None,
            pre_padded: bool = False):
    """y = conv3x3(relu_bn?(x), W) [+ conv3x3(x2, W2)] + b, with optional
    output stat sums.

    Args:
      x: (N, H, W, Cin) bf16/f32 activation (unpadded; padding is internal).
      wmat: (9*Cin, Cout) packed weights (``pack_weights``), x.dtype.
      bias: (Cout,) f32 or None.
      prologue: optional (mean, inv, beta) per-channel f32 vectors; applies
        train-mode BN+ReLU to x inside the kernel (inv = gamma * rstd).
      stats: also return (2, Cout) f32 [sum(y), sum(y*y)] over N*H*W.
      x2/wmat2: optional second input/weights accumulated into the same
        output — the concat-free decoder conv (conv(concat(a,b)) ==
        conv(a,Wa)+conv(b,Wb)) in ONE kernel pass.
      pre_padded: x (and x2) already carry the (H+2, W+8) zero border
        (``_pad_input``) — callers that reuse one padded buffer across
        the forward conv and the backward wgrad skip the extra pad pass.
    Returns:
      y (N, H, W, Cout) — or (y, sums) when ``stats``.
    """
    n, h, w, cin = x.shape
    if pre_padded:                # x arrives (N, H+2, W+8, C)
        h, w = h - 2, w - 8
    cout = wmat.shape[1]
    assert wmat.shape[0] == 9 * cin, (wmat.shape, cin)
    dtype = out_dtype or x.dtype
    cin2 = 0 if x2 is None else x2.shape[-1]
    th = th or best_th(h, w, cin + cin2, cout,
                       jnp.dtype(x.dtype).itemsize, mode)
    assert th and h % th == 0, (h, th)
    tiles_h = h // th

    have_bias = bias is not None
    have_pro = prologue is not None
    have_x2 = x2 is not None

    def kernel(*refs):
        i = pl.program_id(0)
        it = 0
        x_ref = refs[it]; it += 1
        w_ref = refs[it]; it += 1
        x2_ref = w2_ref = None
        if have_x2:
            x2_ref = refs[it]; it += 1
            w2_ref = refs[it]; it += 1
        b_ref = None
        if have_bias:
            b_ref = refs[it]; it += 1
        if have_pro:
            mean_ref, inv_ref, beta_ref = refs[it:it + 3]; it += 3
        y_ref = refs[it]; it += 1
        s_ref = refs[it] if stats else None

        hs = (i % tiles_h) * th
        xblk = x_ref[0]                                   # (Th+2, W+8, Cin)
        if have_pro:
            xblk = _apply_prologue(xblk, mean_ref, inv_ref, beta_ref,
                                   th, w, h, hs, xblk.dtype)
        if mode == "im2col":
            patch = jnp.concatenate(_taps(xblk, th, w, cin), axis=-1)
            acc = jnp.dot(patch, w_ref[...],
                          preferred_element_type=jnp.float32)
            if have_x2:
                patch2 = jnp.concatenate(_taps(x2_ref[0], th, w, cin2),
                                         axis=-1)
                acc += jnp.dot(patch2, w2_ref[...],
                               preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((th * w, cout), jnp.float32)
            for t, sl in enumerate(_taps(xblk, th, w, cin)):
                acc += jnp.dot(sl, w_ref[pl.ds(t * cin, cin), :],
                               preferred_element_type=jnp.float32)
            if have_x2:
                for t, sl in enumerate(_taps(x2_ref[0], th, w, cin2)):
                    acc += jnp.dot(sl, w2_ref[pl.ds(t * cin2, cin2), :],
                                   preferred_element_type=jnp.float32)
        if have_bias:
            acc = acc + b_ref[...]
        y_ref[...] = acc.reshape(1, th, w, cout).astype(y_ref.dtype)
        if stats:
            @pl.when(i == 0)
            def _():
                s_ref[...] = jnp.zeros_like(s_ref)
            s_ref[0, :] += jnp.sum(acc, axis=0)
            s_ref[1, :] += jnp.sum(acc * acc, axis=0)

    def win_spec(c):
        return pl.BlockSpec(
            (pl.Element(1), pl.Element(th + 2), pl.Element(w + 8),
             pl.Element(c)),
            lambda i: (i // tiles_h, (i % tiles_h) * th, 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [win_spec(cin), pl.BlockSpec(memory_space=pltpu.VMEM)]
    args = [x if pre_padded else _pad_input(x), wmat]
    if have_x2:
        assert wmat2 is not None and wmat2.shape == (9 * cin2, cout)
        in_specs += [win_spec(cin2), pl.BlockSpec(memory_space=pltpu.VMEM)]
        args += [x2 if pre_padded else _pad_input(x2), wmat2]
    if have_bias:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(bias.astype(jnp.float32).reshape(1, cout))
    if have_pro:
        mean, inv, beta = prologue
        for v in (mean, inv, beta):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(v.astype(jnp.float32).reshape(1, cin))

    out_shapes = [jax.ShapeDtypeStruct((n, h, w, cout), dtype)]
    out_specs = [pl.BlockSpec((1, th, w, cout),
                              lambda i: (i // tiles_h, i % tiles_h, 0, 0),
                              memory_space=pltpu.VMEM)]
    if stats:
        out_shapes.append(jax.ShapeDtypeStruct((8, cout), jnp.float32))
        out_specs.append(pl.BlockSpec((8, cout), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(n * tiles_h,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interp(interpret),
    )(*args)
    if stats:
        return out[0], out[1][:2]
    return out[0]


@functools.partial(jax.jit, static_argnames=("th", "interpret",
                                             "pre_padded"))
def wgrad3x3(x: jnp.ndarray, dy: jnp.ndarray,
             prologue: Optional[Tuple] = None,
             th: Optional[int] = None,
             interpret: Optional[bool] = None,
             pre_padded: bool = False):
    """Weight/bias gradients: dW[(ky,kx,ci), co] = sum patches(x)^T dy.

    Args:
      x: (N, H, W, Cin) forward input (pre-prologue if ``prologue``).
      dy: (N, H, W, Cout) output cotangent.
      prologue: optional (mean, inv, beta) — recomputes z = relu(bn(x))
        in-window so the forward needn't materialize it.
    Returns:
      (dW (9*Cin, Cout) f32, db (Cout,) f32)
    """
    n, h, w, cin = x.shape
    if pre_padded:                # x arrives (N, H+2, W+8, C)
        h, w = h - 2, w - 8
    cout = dy.shape[-1]
    th = th or best_th(h, w, cin, cout, jnp.dtype(x.dtype).itemsize, "dot9")
    assert th and h % th == 0, (h, th)
    tiles_h = h // th
    have_pro = prologue is not None

    def kernel(*refs):
        i = pl.program_id(0)
        it = 0
        x_ref = refs[it]; it += 1
        dy_ref = refs[it]; it += 1
        if have_pro:
            mean_ref, inv_ref, beta_ref = refs[it:it + 3]; it += 3
        dw_ref = refs[it]; db_ref = refs[it + 1]

        hs = (i % tiles_h) * th
        xblk = x_ref[0]
        if have_pro:
            xblk = _apply_prologue(xblk, mean_ref, inv_ref, beta_ref,
                                   th, w, h, hs, xblk.dtype)
        dyb = dy_ref[0].reshape(th * w, cout)

        @pl.when(i == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        for t, sl in enumerate(_taps(xblk, th, w, cin)):
            dw_ref[pl.ds(t * cin, cin), :] += jax.lax.dot_general(
                sl, dyb, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        db_ref[0, :] += jnp.sum(dyb.astype(jnp.float32), axis=0)

    in_specs = [
        pl.BlockSpec((pl.Element(1), pl.Element(th + 2), pl.Element(w + 8),
                      pl.Element(cin)),
                     lambda i: (i // tiles_h, (i % tiles_h) * th, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, th, w, cout),
                     lambda i: (i // tiles_h, i % tiles_h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x if pre_padded else _pad_input(x), dy]
    if have_pro:
        mean, inv, beta = prologue
        for v in (mean, inv, beta):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(v.astype(jnp.float32).reshape(1, cin))

    dw, db = pl.pallas_call(
        kernel,
        grid=(n * tiles_h,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((8, cout), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(*args)
    return dw, db[0]


# ---- width-pair lane packing ----------------------------------------------
#
# A (N, H, W, 64) activation stores only 64 of the 128 lanes per tile — 2x
# padded in HBM and half-idle on the VPU/MXU.  Viewing it as
# (N, H, W/2, 128) (two adjacent width pixels side by side on the lanes,
# minor-dim order (parity, channel)) removes all of that, and a 3x3 conv on
# the ORIGINAL array is EXACTLY a 3x3 conv on the packed array with the
# block weights below (2x structural-zero MXU flops, but at full lane/tile
# utilization — measured 44 vs 21 TF/s standalone at the level-1 flagship
# shape, scripts/bench_conv_kernel_probe.py).  So the packed path reuses
# conv3x3/wgrad3x3 verbatim; only the weight/vector transforms differ.

def supports_packed(shape: Tuple[int, ...], dtype) -> bool:
    """Can this activation run the width-pair-packed kernels?"""
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c != 64 or w % 16:
        return False
    return supports_conv3x3((n, h, w // 2, 2 * c), dtype)


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W/2, 2C): row-major reshape = pair packing."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def unpack_pairs(xp: jnp.ndarray) -> jnp.ndarray:
    n, h, w2, c2 = xp.shape
    return xp.reshape(n, h, w2 * 2, c2 // 2)


def pack_pair_weights(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) -> (9*2Cin, 2Cout) pair-packed block weights.

    Packed lanes are (parity, channel); output pair-pixel (w2, po) draws
    from input pairs w2-1..w2+1 (pair tap t) at parity pi via
    kx = 2(t-1) + pi + 1 - po when 0 <= kx <= 2, else a structural zero.
    """
    _, _, cin, cout = k.shape
    z = jnp.zeros((cin, cout), k.dtype)
    rows = []
    for ky in range(3):
        for t in range(3):
            po_blocks = []
            for po in range(2):
                pi_blocks = []
                for pi in range(2):
                    kx = 2 * (t - 1) + pi + 1 - po
                    pi_blocks.append(k[ky, kx] if 0 <= kx <= 2 else z)
                po_blocks.append(jnp.concatenate(pi_blocks, axis=0))
            rows.append(jnp.concatenate(po_blocks, axis=1))
    return jnp.concatenate(rows, axis=0)


def dgrad_pair_weights(k: jnp.ndarray) -> jnp.ndarray:
    """Pair-packed dgrad weights: pack_pair_weights of the flipped/
    channel-transposed kernel (dgrad IS a conv3x3 — see dgrad_weights)."""
    return pack_pair_weights(k[::-1, ::-1].transpose(0, 1, 3, 2))


def fold_pair_wgrad(dwp: jnp.ndarray, cin: int, cout: int) -> jnp.ndarray:
    """(9*2Cin, 2Cout) pair-packed weight grads -> (3, 3, Cin, Cout).

    Each true (ky, kx, ci, co) entry was computed twice in packed space —
    once per output parity po, at (t, pi) with 2t + pi = kx + 1 + po —
    so the fold sums exactly those two slots.
    """
    d = dwp.reshape(3, 3, 2, cin, 2, cout)    # [ky, t, pi, ci, po, co]
    cols = []
    for kx in range(3):
        t0, pi0 = divmod(kx + 1, 2)           # po = 0
        t1, pi1 = divmod(kx + 2, 2)           # po = 1
        cols.append(d[:, t0, pi0, :, 0, :] + d[:, t1, pi1, :, 1, :])
    return jnp.stack(cols, axis=1)            # (3, 3, cin, cout)


def tile_pair(v: jnp.ndarray) -> jnp.ndarray:
    """Per-channel (C,) vector -> (2C,) matching the (parity, channel) lanes."""
    return jnp.tile(v, 2)


def fold_pair_sums(s: jnp.ndarray, c: int) -> jnp.ndarray:
    """(k, 2C) per-packed-lane sums -> (k, C) per-channel sums."""
    return s[:, :c] + s[:, c:]
