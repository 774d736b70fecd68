"""Gather-free nearest homography warp via per-row interval tables.

Arbitrary-index gathers serialize on TPU (~10 ns/element: the exact
nearest warp costs ~76 ms for a 32x360x640 batch).  But the court template
is a *label map with few transitions per row* (NCAA template: <=28, soccer
pitch: <=4).  Encode each template row as a step function — sorted
boundary columns + per-interval values — and the warp becomes:

  1. row fetch:  one-hot(round(v)) @ table     — an MXU matmul
     (P x Ht) @ (Ht x (2K+1)), no gather;
  2. interval search:  idx = sum_k (round(u) >= boundary_k)  — VPU compares;
  3. value pick:  sum_k value_k * (idx == k)               — VPU selects.

Exact (not approximate): reproduces single-pass nearest sampling
bit-for-bit wherever the table capacity K covers the row's transitions
(asserted at build time).  Zero padding outside the template matches
``grid_sample``'s zeros mode.

Used by ``Reconstructor.warp`` when ``config.fast_warp`` is set; the
table is built once per template on the host (``build_interval_table``).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.warp import warp_grid, _unnormalize

__all__ = ["IntervalTable", "build_interval_table", "warp_nearest_interval",
           "warp_bilinear_interval"]


@jax.tree_util.register_pytree_node_class
class IntervalTable:
    """Pytree wrapper: the table array is a leaf, the geometry is static."""

    def __init__(self, table, src_hw: Tuple[int, int], K: int,
                 value_scale: float):
        # value_scale arg kept positionally for tree_unflatten compat
        self.table = table        # (Ht, 3K+1) bf16: [b_hi | b_lo | scaled vals]
        self.src_hw = tuple(src_hw)
        self.K = int(K)
        self.value_step = float(value_scale)   # multiply selected values back

    def tree_flatten(self):
        return (self.table,), (self.src_hw, self.K, self.value_step)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def build_interval_table(template: np.ndarray, max_transitions: int = 32,
                         value_scale: float = None) -> IntervalTable:
    """Encode a (Ht, Wt) piecewise-constant image as per-row intervals.

    ``template`` is the float template (label/num_classes values).  Raises
    if any row has more than ``max_transitions`` value changes.

    bf16 exactness: the table rides through a bf16 MXU matmul, so every
    entry must be bf16-exact.  Boundary columns (ints up to Wt) are split
    into hi (multiple of 256) + lo (<256) components; values are stored
    scaled to small integers (``value_scale`` defaults to the reciprocal
    of the smallest value spacing, e.g. num_classes for label templates)
    and divided back after selection.
    """
    t = np.asarray(template)
    if t.ndim == 4:          # (B, Ht, Wt, 1) device-constant layout
        t = t[0, :, :, 0]
    elif t.ndim == 3:
        t = t[..., 0]
    ht, wt = t.shape
    K = max_transitions
    boundaries = np.full((ht, K), float(wt + 1), dtype=np.float32)
    values = np.zeros((ht, K + 1), dtype=np.float32)
    for r in range(ht):
        row = t[r]
        change = np.nonzero(np.diff(row))[0] + 1      # columns where value changes
        if len(change) > K:
            raise ValueError(
                f"row {r} has {len(change)} transitions > table capacity {K}")
        boundaries[r, :len(change)] = change.astype(np.float32)
        vals = np.concatenate([[row[0]], row[change]]) if len(change) else np.asarray([row[0]])
        values[r, :len(vals)] = vals
        # replicate last value so clamped interval indices stay correct
        values[r, len(vals):] = vals[-1]

    if value_scale is None:
        uniq = np.unique(values)
        diffs = np.diff(uniq)
        step = diffs[diffs > 0].min() if (diffs > 0).any() else 1.0
    else:
        step = 1.0 / value_scale
    # store the multiply-back step exactly (float64 -> float32 once); a
    # reciprocal round-trip would cost an ulp and break bit-exactness
    step = np.float32(step)
    scaled = values / step
    assert np.allclose(scaled, np.round(scaled), atol=1e-4), \
        "values not integral at chosen scale"
    scaled = np.round(scaled)
    assert scaled.max() < 256, "scaled values exceed bf16-exact range"

    b_hi = np.floor(boundaries / 256.0) * 256.0
    b_lo = boundaries - b_hi
    tab = np.concatenate([b_hi, b_lo, scaled], axis=1).astype(np.float32)
    # every entry must survive the bf16 round-trip exactly
    assert np.array_equal(tab, np.asarray(jnp.asarray(tab, jnp.bfloat16),
                                          np.float32)), "table not bf16-exact"
    return IntervalTable(jnp.asarray(tab, jnp.bfloat16), (ht, wt), K,
                         float(step))


def _nearest_subsample_idx(n_full: int, n_sub: int):
    """torch nearest-resize source indices: floor(i * full / sub)."""
    import jax
    i = jax.lax.iota(jnp.float32, n_sub)
    return jnp.minimum(jnp.floor(i * (n_full / n_sub)), n_full - 1)


def _warp_grid_subsampled(theta, out_hw, sample_hw):
    """The out_hw warp grid evaluated only at the nearest-resize sample
    points of sample_hw — warping with it is bit-equal to warping at
    out_hw then nearest-resizing to sample_hw."""
    ho, wo = out_hw
    hs, ws = sample_hw
    iy = _nearest_subsample_idx(ho, hs)                   # (Hs,)
    ix = _nearest_subsample_idx(wo, ws)                   # (Ws,)
    xn = ix * (2.0 / (wo - 1)) - 1.0
    yn = iy * (2.0 / (ho - 1)) - 1.0
    gx = jnp.broadcast_to(xn[None, :], (hs, ws))
    gy = jnp.broadcast_to(yn[:, None], (hs, ws))
    grid = jnp.stack([gx, gy], axis=-1).reshape(1, -1, 2)
    if theta.ndim == 4:
        theta = theta[:, 0]
    from ..geometry.homography import transform_points
    b = theta.shape[0]
    pts = transform_points(theta, jnp.broadcast_to(grid, (b, hs * ws, 2)))
    return pts.reshape(b, hs, ws, 2)


def warp_nearest_interval(table: IntervalTable, theta: jnp.ndarray,
                          out_hw, row_chunk: int = 12,
                          sample_hw=None) -> jnp.ndarray:
    """Nearest homography warp of the encoded template.

    Args:
      theta: (B, 3, 3) or (B, 1, 3, 3) frame->court homographies.
      out_hw: (Ho, Wo).
      row_chunk: output rows processed per scan step (bounds the one-hot
        intermediate to B*row_chunk*Wo x Ht).
      sample_hw: optional (Hs, Ws) — evaluate only the nearest-resize
        sample points of the out_hw grid; the result is bit-equal to
        warping at out_hw then nearest-resizing to sample_hw, at
        (Hs*Ws)/(Ho*Wo) of the cost.  Used to fuse the consistency-score
        downsample into the warp.
    Returns:
      (B, Ho, Wo) (or (B, Hs, Ws)) warped values, zeros outside the source.
    """
    if theta.ndim == 4:
        theta = theta[:, 0]
    ht, wt = table.src_hw
    b = theta.shape[0]
    K = table.K

    if sample_hw is not None:
        grid = _warp_grid_subsampled(theta, out_hw, sample_hw)
        ho, wo = sample_hw
    else:
        ho, wo = out_hw
        grid = warp_grid(theta, ho, wo)                   # (B, Ho, Wo, 2)
    u = _unnormalize(grid[..., 0], wt, False)
    v = _unnormalize(grid[..., 1], ht, False)
    iu = jnp.round(u)                                     # f32 column
    iv = jnp.round(v)
    valid = (iu >= 0) & (iu < wt) & (iv >= 0) & (iv < ht)
    ivc = jnp.clip(iv, 0, ht - 1)

    tab = table.table                                     # (Ht, 3K+1) bf16

    if ho % row_chunk != 0:            # fall back to a divisor of Ho
        for rc in (8, 6, 5, 4, 3, 2, 1):
            if ho % rc == 0:
                row_chunk = rc
                break
    n_chunks = ho // row_chunk

    ivc_c = ivc.reshape(b, n_chunks, row_chunk, wo).transpose(1, 0, 2, 3)
    iu_c = iu.reshape(b, n_chunks, row_chunk, wo).transpose(1, 0, 2, 3)

    def chunk_fn(carry, args):
        ivk, iuk = args                                   # (B, rc, Wo)
        q = ivk.reshape(-1)                               # (P,)
        # one-hot over template rows: iota compare, fused into the matmul
        rows = jax.lax.broadcasted_iota(jnp.float32, (q.shape[0], ht), 1)
        onehot = (rows == q[:, None]).astype(jnp.bfloat16)
        rowdata = jnp.dot(onehot, tab,
                          preferred_element_type=jnp.float32)   # (P, 3K+1)
        bounds = rowdata[:, :K] + rowdata[:, K:2 * K]           # hi + lo, exact
        vals = rowdata[:, 2 * K:]
        uq = iuk.reshape(-1, 1)
        idx = jnp.sum((uq >= bounds).astype(jnp.float32), axis=1)   # (P,)
        kk = jax.lax.broadcasted_iota(jnp.float32, (q.shape[0], K + 1), 1)
        picked = jnp.sum(vals * (kk == idx[:, None]), axis=1)
        return carry, (picked * table.value_step).reshape(ivk.shape)

    _, out = jax.lax.scan(chunk_fn, 0, (ivc_c, iu_c))
    out = out.transpose(1, 0, 2, 3).reshape(b, ho, wo)
    return jnp.where(valid, out, 0.0)


def warp_bilinear_interval(table: IntervalTable, theta: jnp.ndarray,
                           out_hw, row_chunk: int = 12) -> jnp.ndarray:
    """Gather-free *bilinear* homography warp of the encoded template.

    Same machinery as ``warp_nearest_interval`` but fetches the two
    bracketing template rows (floor(v), floor(v)+1) per query — one
    one-hot matmul each — picks the two bracketing columns per row via the
    interval search, and lerps.  Matches ``grid_sample(mode='bilinear',
    padding_mode='zeros', align_corners=False)`` on the encoded template,
    with the standard grid_sample gradient structure w.r.t. theta (value
    picks are piecewise constant; gradients flow through the lerp weights).

    Used on the training path (the reference trains with the bilinear
    warper; ``models/reconstructor.py:104-107``).
    """
    if theta.ndim == 4:
        theta = theta[:, 0]
    ht, wt = table.src_hw
    ho, wo = out_hw
    b = theta.shape[0]
    K = table.K

    grid = warp_grid(theta, ho, wo)
    u = _unnormalize(grid[..., 0], wt, False)
    v = _unnormalize(grid[..., 1], ht, False)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    tx = u - u0
    ty = v - v0

    tab = table.table

    if ho % row_chunk != 0:
        for rc in (8, 6, 5, 4, 3, 2, 1):
            if ho % rc == 0:
                row_chunk = rc
                break
    n_chunks = ho // row_chunk

    def reshape_c(a):
        return a.reshape(b, n_chunks, row_chunk, wo).transpose(1, 0, 2, 3)

    step = jnp.float32(table.value_step)

    def row_values(q_rows, u0q, txq):
        """Fetch one template row per query; return x-lerped value + valid."""
        valid_r = (q_rows >= 0) & (q_rows < ht)
        q = jnp.clip(q_rows, 0, ht - 1).reshape(-1)
        rows = jax.lax.broadcasted_iota(jnp.float32, (q.shape[0], ht), 1)
        onehot = (rows == q[:, None]).astype(jnp.bfloat16)
        rowdata = jnp.dot(onehot, tab, preferred_element_type=jnp.float32)
        bounds = rowdata[:, :K] + rowdata[:, K:2 * K]
        vals = rowdata[:, 2 * K:]

        def pick(cols):
            valid_c = (cols >= 0) & (cols < wt)
            cq = jnp.clip(cols, 0, wt - 1).reshape(-1, 1)
            idx = jnp.sum((cq >= bounds).astype(jnp.float32), axis=1)
            kk = jax.lax.broadcasted_iota(jnp.float32, (q.shape[0], K + 1), 1)
            picked = jnp.sum(vals * (kk == idx[:, None]), axis=1)
            picked = picked.reshape(cols.shape) * step
            return jnp.where(valid_c, picked, 0.0)

        left = pick(u0q)
        right = pick(u0q + 1.0)
        out = left * (1.0 - txq) + right * txq
        return jnp.where(valid_r, out, 0.0)

    def chunk_fn(carry, args):
        v0q, tyq, u0q, txq = args
        top = row_values(v0q, u0q, txq)
        bot = row_values(v0q + 1.0, u0q, txq)
        return carry, top * (1.0 - tyq) + bot * tyq

    _, out = jax.lax.scan(chunk_fn, 0,
                          (reshape_c(v0), reshape_c(ty),
                           reshape_c(u0), reshape_c(tx)))
    return out.transpose(1, 0, 2, 3).reshape(b, ho, wo)
