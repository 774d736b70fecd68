"""Device-side image resizing with exact ``torch.nn.functional.interpolate``
semantics.

The reference resizes activations inside the forward pass
(``models/reconstructor.py:132-158``: bilinear align_corners=False on the
way into the UNet, nearest on the way out and in the consistency score) and
uses ``nn.Upsample(scale_factor=2, bilinear, align_corners=True)`` inside
the UNet decoder (``unet/unet_parts.py:49``).

Separable bilinear resize = per-axis two-tap gather + lerp; nearest =
per-axis row/column gather.  Indices and weights are generated **on
device** from iotas (replicating PyTorch's coordinate math exactly in
f32) — host-side constants would be embedded in the executable and, on
tunneled TPU runtimes, re-uploaded on every dispatch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_nearest", "upsample2x_bilinear"]


def _source_coords(in_size: int, out_size: int, align_corners: bool):
    """torch bilinear source coordinates, clamped; f32 iota math on device."""
    i = jax.lax.iota(jnp.float32, out_size)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = i * (float(in_size - 1) / float(out_size - 1))
    else:
        src = (i + 0.5) * (in_size / out_size) - 0.5
        src = jnp.maximum(src, 0.0)
    i0 = jnp.minimum(jnp.floor(src), in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    lam = src - i0
    return i0.astype(jnp.int32), i1.astype(jnp.int32), lam


def _resize_axis_bilinear(x: jnp.ndarray, axis: int, out_size: int,
                          align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, lam = _source_coords(in_size, out_size, align_corners)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    lam = lam.reshape(shape).astype(x.dtype)
    return a * (1 - lam) + b * lam


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) images; exact torch.interpolate math."""
    ho, wo = int(out_hw[0]), int(out_hw[1])
    x = _resize_axis_bilinear(x, 1, ho, align_corners)
    x = _resize_axis_bilinear(x, 2, wo, align_corners)
    return x


def _nearest_indices(in_size: int, out_size: int) -> jnp.ndarray:
    """torch mode='nearest': floor(i * in/out), on device."""
    i = jax.lax.iota(jnp.float32, out_size)
    idx = jnp.floor(i * (in_size / out_size)).astype(jnp.int32)
    return jnp.minimum(idx, in_size - 1)


def resize_nearest(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """Nearest resize of (B, H, W, C) images; exact torch mode='nearest'."""
    ho, wo = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    if (h, w) == (ho, wo):
        return x
    if h != ho:
        x = jnp.take(x, _nearest_indices(h, ho), axis=1)
    if w != wo:
        x = jnp.take(x, _nearest_indices(w, wo), axis=2)
    return x


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``.

    Used by the bilinear UNet decoder variant (``unet/unet_parts.py:49``).
    """
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
