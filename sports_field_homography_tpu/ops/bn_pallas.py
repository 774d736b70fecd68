"""Pallas fused train-mode BatchNorm + ReLU (stats, normalize, backward).

Why: in the profiled train step the level-1 (B,360,640,64) BatchNorms are
the dominant non-conv cost.  XLA assigns those tensors a ``{3,0,2,1}``
layout (C on the 128 lanes — half-wasted at C=64 — and N on the 8
sublanes — padded 26->32), so every stat reduction and normalize fusion
runs at a fraction of HBM bandwidth (measured 8-12 ms where ~1 ms of
traffic exists; a batch-32 step costs exactly as much as batch 26).

These kernels view the activation as (H*W, N*C): all N*C lanes carry
data — no batch-sublane padding, no half-lane waste at C == 64.
Statistics accumulate in f32 exactly like the XLA path (same formulas;
reduction order differs, so results agree to f32 rounding, not bitwise).

Status (measured 2026-08-16, v5e, flagship train step batch 26): OFF by
default.  The kernels are correct (tests/test_bn_pallas.py) and the
in-kernel math is lane-optimal, but Pallas custom calls constrain their
operands to the default row-major layout while XLA's convolution
gradients keep these activations in ``{3,0,2,1}`` (2.5x padded: N 26->32
on sublanes x C 64->128 on lanes).  XLA therefore materializes relayout
copies around every call — both 2D-view formulations were tried, (N*H*W,
C) and the {3,0,2,1}-memory-order (H*W, N*C) — and the duplicated
731 MB-unpadded / 1.76 GB-padded level-1 buffers push the batch-26 step
over the 16 GB HBM (16.09 / 17.59 GB respectively); at batch 8, where
everything fits, the kernels compile and run via Mosaic but the step
measures 148.8 vs 112.6 ms — the relayout copies cost more than the
kernels save.  Winning here
requires replacing the level-1 *convolutions* too (a fused Pallas
DoubleConv fwd+bwd that owns its layouts end-to-end) — see ROADMAP.md.
The flag remains usable at smaller batches/resolutions.

Semantics match ``models.layers.BatchNorm`` in train mode followed by
ReLU (reference ``unet/unet_parts.py:7-24`` BN2d+ReLU pairs):
  mean = E[x], var = E[x^2] - E[x]^2 (biased), y = relu((x-mean)*rsqrt(
  var+eps)*gamma + beta).  The returned (mean, var) feed the running-stat
  update; like torch, they are treated as detached (their cotangents are
  ignored — the loss never depends on running stats within a step).

Used by ``models.unet.DoubleConv`` when ``fused_bn`` is enabled; the
sync-BN (axis_name) and eval paths keep the XLA implementation.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_relu_train", "supports_fused_bn"]

_LANES = 128
# VMEM budget per input block (bytes of x); blocks are (rows, C).  The dx
# kernel holds 2 data blocks (x, dy) double-buffered plus f32
# intermediates inside a 16 MB scoped-vmem limit — 512 KB keeps the worst
# kernel at ~6 MB of blocks (2 MB blocks OOMed at 22.7 MB scoped).
_BLOCK_BYTES = 512 << 10


def _block_rows(p: int, c: int, itemsize: int) -> int:
    """Largest multiple-of-8 divisor of p with rows*c*itemsize <= budget."""
    cap = max(8, _BLOCK_BYTES // (c * itemsize))
    for rows in range(min(cap, p), 7, -1):
        if p % rows == 0 and rows % 8 == 0:
            return rows
    return 0


def supports_fused_bn(shape: Tuple[int, ...], dtype) -> bool:
    """Static check: can bn_relu_train handle this activation?"""
    if len(shape) != 4 or dtype not in (jnp.bfloat16, jnp.float32):
        return False
    n, h, w, c = shape
    if (n * c) % _LANES:
        return False
    return _block_rows(h * w, n * c, jnp.dtype(dtype).itemsize) > 0


def _view2d(x):
    """(N, H, W, C) -> (H*W, N*C) view.

    This is the memory order of the {3,0,2,1} layout XLA assigns these
    activations (minor-to-major C, N, W, H), so when that layout holds the
    transpose+reshape lowers to a bitcast; XLA's algebraic simplifier
    folds it either way."""
    n, h, w, c = x.shape
    return x.transpose(1, 2, 0, 3).reshape(h * w, n * c)


def _unview2d(x2, shape):
    n, h, w, c = shape
    return x2.reshape(h, w, n, c).transpose(2, 0, 1, 3)


def _tile(vec, n):
    """Per-channel (C,) f32 vector -> (1, N*C) row matching the view."""
    return jnp.tile(vec, n).reshape(1, -1).astype(jnp.float32)


def _untile(row, n, c):
    """(1, N*C) f32 sums -> (C,) (fold the N repeats)."""
    return jnp.sum(row.reshape(n, c), axis=0)


# ---- kernels ---------------------------------------------------------------

def _stats_kernel(x_ref, out_ref):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)                  # (BR, L)
    s = jnp.sum(xf, axis=0)                              # (L,)
    sq = jnp.sum(xf * xf, axis=0)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, :] += s
    out_ref[1, :] += sq


def _norm_relu_kernel(x_ref, mean_ref, inv_ref, beta_ref, y_ref):
    xf = x_ref[...].astype(jnp.float32)
    y = (xf - mean_ref[0, :]) * inv_ref[0, :] + beta_ref[0, :]
    y_ref[...] = jnp.maximum(y, 0.0).astype(y_ref.dtype)


def _bwd_reduce_kernel(x_ref, dy_ref, mean_ref, rstd_ref, gamma_ref,
                       beta_ref, out_ref):
    i = pl.program_id(0)
    xf = x_ref[...].astype(jnp.float32)
    xhat = (xf - mean_ref[0, :]) * rstd_ref[0, :]
    # recompute the relu mask from x (saving y as a residual extended its
    # liveness across the whole backward pass -> HBM OOM at batch 26);
    # compare in f32 (Mosaic has no bf16 vector compare)
    pre = xhat * gamma_ref[0, :] + beta_ref[0, :]
    dyp = jnp.where(pre > 0, dy_ref[...].astype(jnp.float32), 0.0)
    s1 = jnp.sum(dyp, axis=0)                            # sum(dy')
    s2 = jnp.sum(dyp * xhat, axis=0)                     # sum(dy' * xhat)

    @pl.when(i == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[0, :] += s1
    out_ref[1, :] += s2


def _dx_kernel(x_ref, dy_ref, mean_ref, rstd_ref, gamma_ref, beta_ref,
               c1_ref, m1_ref, m2_ref, dx_ref):
    xf = x_ref[...].astype(jnp.float32)
    xhat = (xf - mean_ref[0, :]) * rstd_ref[0, :]
    pre = xhat * gamma_ref[0, :] + beta_ref[0, :]
    dyp = jnp.where(pre > 0, dy_ref[...].astype(jnp.float32), 0.0)
    dx = c1_ref[0, :] * (dyp - m1_ref[0, :] - xhat * m2_ref[0, :])
    dx_ref[...] = dx.astype(dx_ref.dtype)


# ---- host-side plumbing ----------------------------------------------------

def _grid_call(kernel, x2s, vecs, out_shape, interpret):
    """Run `kernel` over row blocks of the (P, L) arrays in `x2s`, with
    per-channel (1, L) f32 vectors `vecs` resident across blocks.

    `out_shape` (P, L) -> elementwise output in the data dtype;
    anything else (the (8, L) accumulators) -> f32, revisited every step.
    """
    p, l = x2s[0].shape
    br = _block_rows(p, l, x2s[0].dtype.itemsize)
    assert br, (p, l)
    data_spec = pl.BlockSpec((br, l), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, l), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    elementwise = out_shape[0] == p
    out_spec = (data_spec if elementwise else
                pl.BlockSpec(out_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
    out_dtype = x2s[0].dtype if elementwise else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(p // br,),
        in_specs=[data_spec] * len(x2s) + [vec_spec] * len(vecs),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        interpret=interpret,
    )(*x2s, *vecs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x, gamma, beta, eps: float = 1e-5,
                  interpret: bool = None):
    """relu(batchnorm_train(x)) with batch statistics as aux outputs.

    Args:
      x: (N, H, W, C) activation, bf16 or f32.
      gamma, beta: (C,) f32 scale/shift.
    Returns:
      (y, mean, var): y same shape/dtype as x; mean/var (C,) f32, biased
      variance (the caller applies the unbiased factor for running stats).
    """
    y, mean, var, _ = _fwd_impl(x, gamma, beta, eps, interpret)
    return y, mean, var


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _fwd_impl(x, gamma, beta, eps, interpret):
    interpret = _interp(interpret)
    nb, c = x.shape[0], x.shape[-1]
    n = x.shape[0] * x.shape[1] * x.shape[2]
    x2 = _view2d(x)

    sums = _grid_call(_stats_kernel, [x2], [], (8, x2.shape[1]), interpret)
    s = _untile(sums[0:1], nb, c)
    sq = _untile(sums[1:2], nb, c)
    mean = s / n
    var = sq / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)

    inv = rstd * gamma
    y2 = _grid_call(_norm_relu_kernel,
                    [x2],
                    [_tile(mean, nb), _tile(inv, nb), _tile(beta, nb)],
                    x2.shape, interpret)
    return _unview2d(y2, x.shape), mean, var, rstd


def _fwd_vjp(x, gamma, beta, eps, interpret):
    y, mean, var, rstd = _fwd_impl(x, gamma, beta, eps, interpret)
    return (y, mean, var), (x, gamma, beta, mean, rstd)


def _bwd_vjp(eps, interpret, res, cots):
    dy, _dmean, _dvar = cots          # running-stat cotangents: detached
    x, gamma, beta, mean, rstd = res
    interpret = _interp(interpret)
    nb, c = x.shape[0], x.shape[-1]
    n = x.shape[0] * x.shape[1] * x.shape[2]
    x2 = _view2d(x)
    dy2 = _view2d(dy)
    mean_t = _tile(mean, nb)
    rstd_t = _tile(rstd, nb)
    gamma_t = _tile(gamma, nb)
    beta_t = _tile(beta, nb)

    sums = _grid_call(_bwd_reduce_kernel, [x2, dy2],
                      [mean_t, rstd_t, gamma_t, beta_t],
                      (8, x2.shape[1]), interpret)
    dbeta = _untile(sums[0:1], nb, c)                   # sum(dy')
    dgamma = _untile(sums[1:2], nb, c)                  # sum(dy' * xhat)

    c1 = gamma * rstd
    m1 = dbeta / n
    m2 = dgamma / n
    dx2 = _grid_call(_dx_kernel, [x2, dy2],
                     [mean_t, rstd_t, gamma_t, beta_t, _tile(c1, nb),
                      _tile(m1, nb), _tile(m2, nb)],
                     x2.shape, interpret)
    return _unview2d(dx2, x.shape), dgamma, dbeta


bn_relu_train.defvjp(_fwd_vjp, _bwd_vjp)
