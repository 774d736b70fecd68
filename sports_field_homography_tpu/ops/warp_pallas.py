"""Pallas TPU kernel: fused interval-table nearest warp.

The XLA formulation of the interval warp (``ops/interval_warp.py``) relies
on the compiler fusing the (P x Ht) one-hot into its matmul; at large
output sizes XLA materializes it to HBM and the warp regresses ~25x
(measured 1.45 s inside the 1280x720 predict program vs ~59 ms standalone).
This kernel makes the fusion structural: the one-hot never exists outside
VMEM/registers.

Layout strategy (no cross-lane reshapes):
  * queries (rounded source row `iv` and column `iu` per output pixel) are
    fed as (8, 128) tiles — the natural f32 vreg shape;
  * per tile sublane s, the one-hot of its 128 lane-queries is built
    *transposed*: onehot[r, l] = (r == iv[s, l]), shape (Ht, 128), from a
    broadcasted iota — pure VPU compares;
  * rowdata = onehot^T @ table via ``dot_general`` contracting dim 0 of
    both operands -> (128 queries, 128 table cols) on the MXU;
  * interval search + value pick are VPU compares/sums per sublane.

The whole (Ht, 128) table lives in VMEM (<=184 KB at 720 rows).

Encoding matches ``interval_warp.IntervalTable`` (bound_hi | bound_lo |
scaled values, bf16-exact); results are bit-identical to
``warp_nearest_interval`` (tested in interpret mode and on device).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.warp import warp_grid, _unnormalize
from .interval_warp import IntervalTable, _warp_grid_subsampled

__all__ = ["warp_nearest_interval_pallas"]

_TILE_S = 8            # sublanes per tile (f32 vreg)
_LANES = 128


def _kernel(tab_ref, iv_ref, iu_ref, out_ref, *, ht: int, K: int):
    """One (8, 128) query tile -> one (8, 128) output tile."""
    tab = tab_ref[:]                                       # (Ht, 128) bf16
    # Mosaic iota is integer-only; compare in int32
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ht, _LANES), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, K + 1), 1)

    for s in range(_TILE_S):
        q = iv_ref[s, :].astype(jnp.int32)                 # (128,) rows
        u = iu_ref[s, :]                                   # (128,) f32 cols
        onehot = (row_iota == q[None, :]).astype(jnp.bfloat16)   # (Ht, 128)
        # rowdata[l, c] = sum_r onehot[r, l] * tab[r, c]
        rowdata = jax.lax.dot_general(
            onehot, tab, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (128, 128)
        bounds = rowdata[:, :K] + rowdata[:, K:2 * K]      # (128, K) exact
        vals = rowdata[:, 2 * K:2 * K + K + 1]             # (128, K+1)
        idx = jnp.sum((u[:, None] >= bounds).astype(jnp.int32),
                      axis=1)                              # (128,) int32
        picked = jnp.sum(vals * (col_iota == idx[:, None]).astype(jnp.float32),
                         axis=1)                           # (128,)
        out_ref[s, :] = picked


def warp_nearest_interval_pallas(table: IntervalTable, theta: jnp.ndarray,
                                 out_hw, sample_hw=None,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused-kernel equivalent of ``warp_nearest_interval``."""
    if theta.ndim == 4:
        theta = theta[:, 0]
    ht, wt = table.src_hw
    K = table.K
    b = theta.shape[0]

    if sample_hw is not None:
        grid = _warp_grid_subsampled(theta, out_hw, sample_hw)
        ho, wo = sample_hw
    else:
        ho, wo = out_hw
        grid = warp_grid(theta, ho, wo)
    u = _unnormalize(grid[..., 0], wt, False)
    v = _unnormalize(grid[..., 1], ht, False)
    iu = jnp.round(u)
    iv = jnp.round(v)
    valid = (iu >= 0) & (iu < wt) & (iv >= 0) & (iv < ht)
    ivc = jnp.clip(iv, 0, ht - 1)
    iuc = jnp.clip(iu, 0, wt - 1)

    # lay queries out as (n_tiles*8, 128)
    q_total = b * ho * wo
    tile_q = _TILE_S * _LANES
    pad = (-q_total) % tile_q
    def to_tiles(a):
        flat = a.reshape(-1)
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        return flat.reshape(-1, _LANES)
    iv_t = to_tiles(ivc)
    iu_t = to_tiles(iuc)
    n_tiles = iv_t.shape[0] // _TILE_S

    # pad table cols (3K+1 -> 128 lanes); zeros are inert for all fields
    tab = table.table
    if tab.shape[1] < _LANES:
        tab = jnp.pad(tab, ((0, 0), (0, _LANES - tab.shape[1])))

    out = pl.pallas_call(
        functools.partial(_kernel, ht=ht, K=K),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # table
            pl.BlockSpec((_TILE_S, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # iv
            pl.BlockSpec((_TILE_S, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # iu
        ],
        out_specs=pl.BlockSpec((_TILE_S, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * _TILE_S, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(tab, iv_t, iu_t)

    out = out.reshape(-1)
    if pad:
        out = out[:q_total]
    out = out.reshape(b, ho, wo) * jnp.float32(table.value_step)
    return jnp.where(valid, out, 0.0)
