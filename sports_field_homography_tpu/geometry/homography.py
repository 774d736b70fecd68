"""Pure-JAX homography algebra in normalized ([-1, 1]) coordinates.

This is the foundation layer of the TPU-native rebuild of
darkAlert/sports-field-homography.  The reference delegates all of this to
kornia (``kornia.geometry.linalg.transform_points``, ``torch.inverse``; see
reference ``models/reconstructor.py:120-130`` and ``utils/transform.py``).
Here it is a small set of pure functions that XLA can fuse into the
surrounding computation.

Conventions (identical to the reference):
  * ``theta`` is a (..., 3, 3) homography mapping *frame* -> *court* in
    normalized [-1, 1] coordinates (kornia "dst -> src" convention used to
    warp the court template into the frame).
  * Points of interest are transformed with ``inverse(theta)``
    (court -> frame) and then mapped from [-1, 1] to [0, 1]
    (reference ``models/reconstructor.py:120-130``).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "inverse_3x3",
    "transform_points",
    "transform_poi",
    "normalize_points",
    "denormalize_points",
    "rescale_theta",
]


def inverse_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    Equivalent to ``torch.inverse`` on (..., 3, 3) inputs
    (reference ``models/reconstructor.py:123``) but avoids an LU
    factorization: on TPU this stays entirely in vector registers and
    fuses with neighbours under jit.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C

    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(*m.shape[:-2], 3, 3)
    return adj / det[..., None, None]


def transform_points(trans: jnp.ndarray, points: jnp.ndarray,
                     eps: float = 1e-8) -> jnp.ndarray:
    """Apply batched homographies to 2D points with perspective division.

    Matches kornia's ``transform_points`` (used by the reference warper and
    PoI projection): promote to homogeneous coordinates, multiply, then
    divide by ``z`` guarding near-zero denominators.

    Args:
      trans:  (..., 3, 3) homographies.
      points: (..., N, 2) points.
    Returns:
      (..., N, 2) transformed points.
    """
    ones = jnp.ones(points.shape[:-1] + (1,), dtype=points.dtype)
    ph = jnp.concatenate([points, ones], axis=-1)           # (..., N, 3)
    # precision='highest': keep full f32 on the MXU — theta parity (<=1e-3 vs
    # the f32 PyTorch reference) does not survive bf16 passthrough.
    out = jnp.einsum("...ij,...nj->...ni", trans, ph,
                     precision="highest")                    # (..., N, 3)
    z = out[..., 2:3]
    # kornia guards |z| <= eps by passing the point through unscaled.
    scale = jnp.where(jnp.abs(z) > eps, 1.0 / (z + eps), jnp.ones_like(z))
    return out[..., :2] * scale


def transform_poi(theta: jnp.ndarray, court_poi: jnp.ndarray,
                  normalize: bool = True) -> jnp.ndarray:
    """Project court points of interest into the frame.

    Mirrors reference ``Reconstructor.transform_poi``
    (``models/reconstructor.py:120-130``): apply ``inverse(theta)``
    (court -> frame) and optionally map [-1, 1] -> [0, 1].

    Args:
      theta:     (B, 3, 3) or (B, 1, 3, 3) frame->court homographies.
      court_poi: (B, N, 2) court PoI in [-1, 1].
    """
    if theta.ndim == 4:            # (B, 1, 3, 3) layout used by the model head
        theta = theta[:, 0]
    poi = transform_points(inverse_3x3(theta), court_poi)
    if normalize:
        poi = poi / 2.0 + 0.5
    return poi


def normalize_points(points: jnp.ndarray, size) -> jnp.ndarray:
    """Map pixel coordinates to [-1, 1] (reference ``utils/transform.py:33-51``).

    ``size`` is (W, H) to match the reference argument order.
    """
    w, h = size[0], size[1]
    scale = jnp.asarray([2.0 / w, 2.0 / h], dtype=points.dtype)
    return points * scale - 1.0


def denormalize_points(points: jnp.ndarray, size) -> jnp.ndarray:
    """Map [0, 1] coordinates to pixels.  ``size`` is (W, H)."""
    w, h = size[0], size[1]
    return points * jnp.asarray([w, h], dtype=points.dtype)


def rescale_theta(theta: jnp.ndarray, src_size, dst_size) -> jnp.ndarray:
    """Rescale a *pixel-space* homography between image resolutions.

    TPU twin of the dataset-preparation helper
    (reference ``dataset_utils/preparation.py:129-137``):
    ``theta' = S_dst @ theta @ S_src^{-1}`` with per-axis scale factors.
    Sizes are (W, H).
    """
    dst = jnp.asarray([[dst_size[0], 0.0, 0.0], [0.0, dst_size[1], 0.0],
                       [0.0, 0.0, 1.0]], dtype=theta.dtype)
    src_inv = jnp.asarray([[1.0 / src_size[0], 0.0, 0.0],
                           [0.0, 1.0 / src_size[1], 0.0],
                           [0.0, 0.0, 1.0]], dtype=theta.dtype)
    return jnp.matmul(jnp.matmul(dst, theta, precision="highest"), src_inv,
                      precision="highest")
