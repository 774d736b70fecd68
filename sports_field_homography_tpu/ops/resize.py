"""Device-side image resizing with exact ``torch.nn.functional.interpolate``
semantics, formulated the TPU way.

The reference resizes activations inside the forward pass
(``models/reconstructor.py:132-158``: bilinear align_corners=False on the
way into the UNet, nearest on the way out and in the consistency score) and
uses ``nn.Upsample(scale_factor=2, bilinear, align_corners=True)`` inside
the UNet decoder (``unet/unet_parts.py:49``).

Instead of gather-based sampling, separable resizes are expressed as two
small dense matmuls (one per axis).  The interpolation-weight matrices are
tiny ((H_out, H_in) etc.), are built once on the host and cached, and the
contractions run on the MXU — this is both exact (weights replicate the
PyTorch coordinate math bit-for-bit in f32) and fast, and it fuses cleanly
under jit.  Nearest resizing is a pure row/column gather.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_nearest", "upsample2x_bilinear"]


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool,
                     dtype_name: str):
    """(out_size, in_size) row-interpolation matrix matching torch."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        # torch maps the single output to src index 0 for align_corners=True
        # and to scale*0.5-0.5 (clamped) otherwise; both land on pixel 0 when
        # in_size is 1, and on the clamped coordinate generally.
        if align_corners:
            m[0, 0] = 1.0
        else:
            src = max(0.0, (in_size / out_size) * 0.5 - 0.5)
            i0 = int(np.floor(src))
            i1 = min(i0 + 1, in_size - 1)
            lam = src - i0
            m[0, i0] += 1.0 - lam
            m[0, i1] += lam
    else:
        for i in range(out_size):
            if align_corners:
                src = i * (in_size - 1) / (out_size - 1)
            else:
                src = (i + 0.5) * in_size / out_size - 0.5
                src = max(src, 0.0)
            i0 = int(np.floor(src))
            i0 = min(i0, in_size - 1)
            i1 = min(i0 + 1, in_size - 1)
            lam = src - i0
            m[i, i0] += 1.0 - lam
            m[i, i1] += lam
    # cache numpy, not jnp: avoids leaking trace-time constants
    return m.astype(dtype_name)


@functools.lru_cache(maxsize=64)
def _nearest_indices(in_size: int, out_size: int):
    """int32 source indices matching torch mode='nearest' (floor of i*scale)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) images; exact torch.interpolate math."""
    ho, wo = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if (h, w) == (ho, wo):
        return x
    dtype = jnp.dtype(x.dtype).name
    if h != ho:
        mh = jnp.asarray(_bilinear_matrix(h, ho, align_corners, dtype))
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision="highest")
    if w != wo:
        mw = jnp.asarray(_bilinear_matrix(w, wo, align_corners, dtype))
        x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision="highest")
    return x


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize of (B, H, W, C) images; exact torch mode='nearest'."""
    ho, wo = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if (h, w) == (ho, wo):
        return x
    if h != ho:
        x = jnp.take(x, jnp.asarray(_nearest_indices(h, ho)), axis=1)
    if w != wo:
        x = jnp.take(x, jnp.asarray(_nearest_indices(w, wo)), axis=2)
    return x


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``.

    Used by the bilinear UNet decoder variant (``unet/unet_parts.py:49``).
    """
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
