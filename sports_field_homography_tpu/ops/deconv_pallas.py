"""Pallas k2s2 transposed convolution emitting width-pair-packed output.

The UNet decoder's ``ConvTranspose2d(cin, cout, 2, 2)`` (reference
``unet/unet_parts.py:49-57``) computes

    out[n, 2i+p, 2j+q, o] = sum_c x[n, i, j, c] * W[c, p, q, o] + b[o]

— no halo, no padding: every output pixel is one matmul row.  The packed
formulation keeps the (q, o) pair on the lanes:

    out_packed[n, 2i+p, j, q*Cout+o] = x[n, i, j, :] @ Wp[p][:, q*Cout+o]

so the kernel is two clean (Th*W, Cin) x (Cin, 2Cout) MXU dots per block
(one per output row parity) and a major-dim row interleave — and the
result is ALREADY in the width-pair-packed layout the fused level-1
DoubleConv consumes (ops/double_conv).  This keeps the level-1 buffers
inside the row-major Pallas domain: the round-3 train-step profile showed
XLA's transposed-conv otherwise forces ``{3,0,2,1}`` on its operands and
charges ~30 ms relayouts against every shared buffer.

The custom VJP mirrors the forward: dgrad = two dots against the
transposed parity weights from the de-interleaved cotangent; wgrad
accumulates (Cin, 2Cout) f32 blocks across the grid.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["deconv2x2_packed", "supports_deconv_packed"]

_BUDGET = 4 << 20


def _interp(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return bool(interpret)


def _best_th(hin: int, win: int, cin: int, cout: int, itemsize: int) -> int:
    best = 0
    for th in range(1, hin + 1):
        if hin % th:
            continue
        need = (2 * th * win * cin * itemsize          # x window (2 bufs)
                + 2 * 2 * th * win * 2 * cout * itemsize  # out (2 bufs)
                + th * win * 2 * cout * 4 * 2)         # f32 parity dots
        if need <= _BUDGET:
            best = th
    return best


def supports_deconv_packed(shape, cout: int, dtype) -> bool:
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if w % 8 or c % 64 or (2 * cout) % 64:
        return False
    return _best_th(h, w, c, cout, jnp.dtype(dtype).itemsize) > 0


def _parity_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """(Cin, 2, 2, Cout) -> (Cin, 4Cout): columns [p=0 | p=1], each
    (q*Cout + o)."""
    cin, _, _, cout = kernel.shape
    return kernel.transpose(1, 2, 0, 3).reshape(2, 2, cin, cout) \
        .transpose(0, 2, 1, 3).reshape(2, cin, 2 * cout) \
        .transpose(1, 0, 2).reshape(cin, 4 * cout)


def _fwd_call(x, wmat, bias2, th, interpret, native_out=False):
    n, hin, win, cin = x.shape
    co2 = wmat.shape[1] // 2
    co = co2 // 2
    dt = x.dtype

    def kernel(x_ref, w_ref, b_ref, y_ref):
        xb = x_ref[0].reshape(th * win, cin)
        z0 = jnp.dot(xb, w_ref[:, :co2],
                     preferred_element_type=jnp.float32) + b_ref[...]
        z1 = jnp.dot(xb, w_ref[:, co2:],
                     preferred_element_type=jnp.float32) + b_ref[...]
        z = jnp.stack([z0.reshape(th, win, co2),
                       z1.reshape(th, win, co2)], axis=1)   # (th,2,w,2co)
        if native_out:
            # unpack the width pairs in VMEM: (.., w, 2co) -> (.., 2w, co)
            y_ref[...] = z.reshape(1, 2 * th, 2 * win, co).astype(
                y_ref.dtype)
        else:
            y_ref[...] = z.reshape(1, 2 * th, win, co2).astype(y_ref.dtype)

    wout = 2 * win if native_out else win
    cout_dim = co if native_out else co2
    return pl.pallas_call(
        kernel,
        grid=(n * (hin // th),),
        in_specs=[
            pl.BlockSpec((1, th, win, cin),
                         lambda i, t=hin // th: (i // t, i % t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, wout, cout_dim),
                               lambda i, t=hin // th: (i // t, i % t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * hin, wout, cout_dim), dt),
        interpret=_interp(interpret),
    )(x, wmat, bias2)


def _bwd_call(x, dy, wmat_t, th, cin, interpret, native_dy=False):
    """dx + (dW parity blocks, db rows) in one grid sweep."""
    n, hin, win, _ = x.shape
    co2 = wmat_t.shape[0] // 2          # 2*Cout
    dt = x.dtype

    def kernel(x_ref, dy_ref, wt_ref, dx_ref, dw_ref, db_ref):
        i = pl.program_id(0)
        xb = x_ref[0].reshape(th * win, cin)
        # native dy (1, 2th, 2W, C): merge the width pairs in VMEM
        d = dy_ref[0].reshape(th, 2, win, co2)
        d0 = d[:, 0].reshape(th * win, co2)
        d1 = d[:, 1].reshape(th * win, co2)
        dx = (jnp.dot(d0, wt_ref[:co2, :],
                      preferred_element_type=jnp.float32)
              + jnp.dot(d1, wt_ref[co2:, :],
                        preferred_element_type=jnp.float32))
        dx_ref[...] = dx.reshape(1, th, win, cin).astype(dx_ref.dtype)

        @pl.when(i == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        for p, dp in enumerate((d0, d1)):
            dw_ref[pl.ds(p * cin, cin), :] += jax.lax.dot_general(
                xb, dp, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        db_ref[0, :] += (jnp.sum(d0.astype(jnp.float32), axis=0)
                         + jnp.sum(d1.astype(jnp.float32), axis=0))

    t = hin // th
    dy_spec = (pl.BlockSpec((1, 2 * th, 2 * win, co2 // 2),
                            lambda i: (i // t, i % t, 0, 0),
                            memory_space=pltpu.VMEM)
               if native_dy else
               pl.BlockSpec((1, 2 * th, win, co2),
                            lambda i: (i // t, i % t, 0, 0),
                            memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(n * t,),
        in_specs=[
            pl.BlockSpec((1, th, win, cin),
                         lambda i: (i // t, i % t, 0, 0),
                         memory_space=pltpu.VMEM),
            dy_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, win, cin),
                         lambda i: (i // t, i % t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * cin, co2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, co2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hin, win, cin), dt),
            jax.ShapeDtypeStruct((2 * cin, co2), jnp.float32),
            jax.ShapeDtypeStruct((8, co2), jnp.float32),
        ],
        interpret=_interp(interpret),
    )(x, dy, wmat_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deconv2x2_packed(x, kernel, bias, interpret: Optional[bool] = None,
                     native_out: bool = False):
    """k2s2 transposed conv, width-pair-packed (or native) output.

    Args:
      x: (N, Hin, Win, Cin) activation.
      kernel: (Cin, 2, 2, Cout) f32 param (``Deconv2x`` layout).
      bias: (Cout,) f32.
      native_out: emit the plain (N, 2Hin, 2Win, Cout) result (the width
        pairs unpack in VMEM) — for consumers outside the packed domain
        that still must avoid XLA's transposed-conv layout opinions.
    Returns:
      (N, 2*Hin, Win, 2*Cout) packed output — ``unpack_pairs`` of it is
      exactly the native (N, 2*Hin, 2*Win, Cout) deconv result — or the
      native form when ``native_out``.
    """
    return _fwd_impl(x, kernel, bias, interpret, native_out)


def _fwd_impl(x, kernel, bias, interpret, native_out=False):
    cin, _, _, cout = kernel.shape
    dt = x.dtype
    th = _best_th(x.shape[1], x.shape[2], cin, cout,
                  jnp.dtype(dt).itemsize)
    assert th, x.shape
    wmat = _parity_weights(kernel).astype(dt)
    bias2 = jnp.tile(bias, 2).astype(jnp.float32).reshape(1, 2 * cout)
    return _fwd_call(x, wmat, bias2, th, interpret, native_out)


def _fwd_vjp(x, kernel, bias, interpret, native_out):
    return _fwd_impl(x, kernel, bias, interpret, native_out), (x, kernel)


def _bwd_vjp(interpret, native_out, res, dy):
    x, kernel = res
    cin, _, _, cout = kernel.shape
    dt = x.dtype
    th = _best_th(x.shape[1], x.shape[2], cin, cout,
                  jnp.dtype(dt).itemsize)
    # (2*2Cout, Cin): rows [p=0 | p=1] of the parity weights, transposed
    wmat_t = _parity_weights(kernel).astype(dt).reshape(
        cin, 2, 2 * cout).transpose(1, 2, 0).reshape(4 * cout, cin)
    # a native cotangent merges its width pairs inside the kernel — never
    # a 64<->128-lane XLA reshape
    dx, dwp, dbp = _bwd_call(x, dy, wmat_t, th, cin, interpret,
                             native_dy=native_out)
    # (2*Cin, 2Cout) parity blocks -> (Cin, 2, 2, Cout)
    dk = dwp.reshape(2, cin, 2, cout).transpose(1, 0, 2, 3)
    db = dbp[0, :cout] + dbp[0, cout:]
    return dx, dk, db


deconv2x2_packed.defvjp(_fwd_vjp, _bwd_vjp)
