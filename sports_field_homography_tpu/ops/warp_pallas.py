"""Pallas TPU kernel: fused interval-table nearest warp.

The XLA formulation of the interval warp (``ops/interval_warp.py``) relies
on the compiler fusing the (P x Ht) one-hot into its matmul; at large
output sizes XLA materializes it to HBM and the warp regresses ~25x
(measured 1.45 s inside the 1280x720 predict program vs ~59 ms standalone).
This kernel makes the fusion structural: the one-hot never exists outside
VMEM/registers.

Layout strategy (no cross-lane reshapes):
  * queries (rounded source row `iv` and column `iu` per output pixel) are
    fed as (1, 1024) lane-major tiles — 8 vregs wide, so the whole tile's
    one-hot builds in one broadcasted compare and feeds ONE MXU dot with
    M=1024 (an earlier (8, 128) variant ran 8 small dots and was ~4x
    slower);
  * the one-hot is built *transposed*: onehot[r, q] = (r == iv[q]),
    shape (Ht, 1024), from an integer iota — pure VPU compares;
  * rowdata = onehot^T @ table via ``dot_general`` contracting dim 0 of
    both operands -> (1024 queries, 128 table cols) on the MXU;
  * interval search + value pick are (1024, K) VPU compares/sums.

The whole (Ht, 128) table lives in VMEM (<=184 KB at 720 rows); the
per-tile one-hot is ~1.5 MB of VMEM and never touches HBM.

Encoding matches ``interval_warp.IntervalTable`` (bound_hi | bound_lo |
scaled values, bf16-exact); results are bit-identical to
``warp_nearest_interval`` (tested in interpret mode and on device).

Status (measured 2026-08-16 in FULL predict programs on v5e,
scripts/bench_warp_variants.py): XLA's fused formulation wins in every
current program context — 109.5 vs 130.4 ms (640x360 b32), 44.9 vs
64.6 ms (1280x720 b8), 164.4 vs 228.8 ms (1280x720 b32) — because the
consistency-subsample rework removed the program shape where XLA
materialized the one-hot to HBM (the 25x regression this kernel guards
against).  Wired as ``ReconstructorConfig.warp_kernel`` /
``--warp_kernel pallas`` (CLI); the default "auto" policy selects XLA
(see ``models/reconstructor._select_pallas_warp``).  Keep this kernel: it
is the guaranteed-fusion fallback if a future program shape re-triggers
the materialization, and its outputs are bit-identical.
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

_TILE_Q = 1024         # queries per tile (8 vregs wide, lane-major)
_LANES = 128


_BLOCK_ROWS = 8        # sublane divisibility requirement for block specs


def _kernel(tab_ref, iv_ref, iu_ref, out_ref, *, ht: int, K: int):
    """One (8, 1024) query block -> one (8, 1024) output block.

    Each of the 8 rows is an independent 1024-query stripe; each stripe is
    ONE M=1024 MXU dot (vs 8 M=128 dots in the first kernel iteration,
    which ran ~4x slower)."""
    tab = tab_ref[:]                                       # (Ht, 128) bf16
    # Mosaic iota is integer-only; compare in int32
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE_Q, ht), 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_TILE_Q, K + 1), 1)

    def make_onehot(s):
        q = iv_ref[s, :].astype(jnp.int32)                 # (1024,) rows
        # MXU-natural orientation: onehot (M=1024, K=Ht) @ tab (Ht, 128)
        return (row_iota == q[:, None]).astype(jnp.bfloat16)    # (1024, Ht)

    # software pipeline: emit stripe s+1's one-hot (VPU) before consuming
    # stripe s's dot so the scheduler can overlap VPU and MXU work
    onehot = make_onehot(0)
    for s in range(_BLOCK_ROWS):
        rowdata = jnp.dot(onehot, tab,
                          preferred_element_type=jnp.float32)   # (1024, 128)
        if s + 1 < _BLOCK_ROWS:
            onehot = make_onehot(s + 1)
        u = iu_ref[s, :]                                   # (1024,) f32 cols
        bounds = rowdata[:, :K] + rowdata[:, K:2 * K]      # (1024, K) exact
        vals = rowdata[:, 2 * K:2 * K + K + 1]             # (1024, K+1)
        idx = jnp.sum((u[:, None] >= bounds).astype(jnp.int32),
                      axis=1)                              # (1024,) int32
        picked = jnp.sum(vals * (col_iota == idx[:, None]).astype(jnp.float32),
                         axis=1)                           # (1024,)
        out_ref[s, :] = picked


def warp_nearest_interval_pallas(table: IntervalTable, theta: jnp.ndarray,
                                 out_hw, sample_hw=None,
                                 interpret: bool = None) -> jnp.ndarray:
    """Drop-in fused-kernel equivalent of ``warp_nearest_interval``.

    ``interpret`` defaults to True on non-TPU backends (the CPU test
    platform) so configs selecting this kernel stay runnable everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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

    # lay queries out lane-major: (n_rows, 1024), n_rows % 8 == 0
    q_total = b * ho * wo
    block_q = _BLOCK_ROWS * _TILE_Q
    pad = (-q_total) % block_q
    def to_tiles(a):
        flat = a.reshape(-1)
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        return flat.reshape(-1, _TILE_Q)
    iv_t = to_tiles(ivc)
    iu_t = to_tiles(iuc)
    n_blocks = iv_t.shape[0] // _BLOCK_ROWS

    # pad table cols (3K+1 -> 128 lanes); zeros are inert for all fields
    tab = table.table
    if tab.shape[1] < _LANES:
        tab = jnp.pad(tab, ((0, 0), (0, _LANES - tab.shape[1])))

    out = pl.pallas_call(
        functools.partial(_kernel, ht=ht, K=K),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # table
            pl.BlockSpec((_BLOCK_ROWS, _TILE_Q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # iv
            pl.BlockSpec((_BLOCK_ROWS, _TILE_Q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),                 # iu
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _TILE_Q), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * _BLOCK_ROWS, _TILE_Q),
                                       jnp.float32),
        interpret=interpret,
    )(tab, iv_t, iu_t)

    out = out.reshape(-1)
    if pad:
        out = out[:q_total]
    out = out.reshape(b, ho, wo) * jnp.float32(table.value_step)
    return jnp.where(valid, out, 0.0)
