"""Loss zoo (pure functions over NHWC tensors).

Covers every criterion the reference training loop can select
(``train.py:100-144`` + ``models/losses.py`` + kornia FocalLoss):
segmentation CE / focal, reconstruction MSE / SmoothL1, PoI reprojection
RMSE, UV MSE / SmoothL1, consistency CE / focal, per-sample weighting and
the legacy dice coefficient (``models/dice_loss.py``).

All return unreduced maps where the reference uses ``reduction='none'`` so
that ``per_sample_weighted`` can apply the annotation-quality weights
(reference ``models/losses.py:33-40``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cross_entropy_map",
    "focal_loss_map",
    "mse_map",
    "smooth_l1_map",
    "reprojection_loss",
    "per_sample_weighted",
    "dice_coeff",
]


def cross_entropy_map(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel softmax cross entropy.

    logits: (B, H, W, C) raw scores; labels: (B, H, W) int.
    Equivalent to ``F.cross_entropy(logits_nchw, labels, reduction='none')``.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    if logits.shape[-1] <= 16:
        # one-hot multiply-sum: gathers along the minor (lane) dim are very
        # slow on TPU (measured 166 ms vs ~2 ms for a 32x360x640x4 batch)
        one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
        picked = jnp.sum(logits * one_hot, axis=-1)
    else:
        picked = jnp.take_along_axis(
            logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse - picked


def focal_loss_map(logits: jnp.ndarray, labels: jnp.ndarray,
                   alpha: float = 1.0, gamma: float = 2.0,
                   eps: float = 1e-8) -> jnp.ndarray:
    """kornia.losses.FocalLoss(reduction='none') summed over classes.

    FL = -alpha * (1 - p_t)^gamma * log(p_t) with p = softmax(logits) + eps,
    matching kornia 0.5's implementation used at ``train.py:106,134``.
    """
    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1) + eps
    weight = jnp.power(1.0 - p, gamma)
    focal = -alpha * weight * jnp.log(p)
    one_hot = jax.nn.one_hot(labels, logits.shape[-1], dtype=jnp.float32)
    return jnp.sum(one_hot * focal, axis=-1)


def mse_map(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))


def smooth_l1_map(pred: jnp.ndarray, target: jnp.ndarray,
                  beta: float = 1.0) -> jnp.ndarray:
    """``nn.SmoothL1Loss(reduction='none')`` with torch's default beta=1."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def reprojection_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                      nonzeros: jnp.ndarray, num_nonzero: jnp.ndarray,
                      reduction: str = "mean") -> jnp.ndarray:
    """Masked mean point-to-point distance (reference ``models/losses.py:6-18``).

    inputs/targets: (B, N, 2); nonzeros: (B, N) {0,1}; num_nonzero: (B,).
    """
    dist = jnp.sqrt(jnp.sum(jnp.square(targets - inputs), axis=2))
    loss = jnp.sum(dist * nonzeros, axis=1) / num_nonzero
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def per_sample_weighted(loss_map: jnp.ndarray,
                        weights: jnp.ndarray) -> jnp.ndarray:
    """Per-sample mean x per-sample weight, then batch mean
    (reference ``models/losses.py:33-40``)."""
    axes = tuple(range(1, loss_map.ndim))
    per_sample = jnp.mean(loss_map, axis=axes)
    w = weights.reshape(-1).astype(per_sample.dtype)
    return jnp.mean(per_sample * w)


def dice_coeff(pred: jnp.ndarray, target: jnp.ndarray,
               eps: float = 1e-4) -> jnp.ndarray:
    """Batch-mean dice coefficient (legacy; reference ``models/dice_loss.py``)."""
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    target = target.reshape(target.shape[0], -1).astype(jnp.float32)
    inter = jnp.sum(pred * target, axis=1)
    union = jnp.sum(pred, axis=1) + jnp.sum(target, axis=1) + eps
    return jnp.mean((2.0 * inter + eps) / union)
