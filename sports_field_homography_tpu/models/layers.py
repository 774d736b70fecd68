"""Shared NN building blocks (flax.linen, NHWC) with PyTorch-compatible
numerics.

Everything computes in NHWC — the natural TPU layout (channels on the
128-lane minor dimension) — while checkpoints converted from the PyTorch
reference transpose OIHW -> HWIO once at load time (``compat/torch_import``).

Initializers replicate PyTorch defaults so that training-from-scratch
behaves like the reference:
  * ``nn.Conv2d`` / ``nn.Linear`` default: kaiming_uniform(a=sqrt(5)) on
    weights + uniform(+-1/sqrt(fan_in)) bias.
  * The reference additionally re-initializes every conv inside ResNetSTN
    with kaiming_normal(fan_out, relu) (reference ``models/resnet.py:189-194``).

``BatchNorm`` matches ``torch.nn.BatchNorm2d`` exactly: biased variance for
normalization, *unbiased* variance folded into the running estimate, torch
momentum convention (0.1 = weight of the new batch statistic).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "torch_conv_kernel_init",
    "torch_bias_init",
    "kaiming_normal_fanout",
    "BatchNorm",
    "batch_norm_apply",
    "Conv3x3Params",
    "BatchNormParams",
    "max_pool",
]


class Conv3x3Params(nn.Module):
    """Param-only twin of ``nn.Conv(features, (3,3), padding=1)``: same
    variable names/shapes/initializers, no compute.  Lets a parent module
    (``unet.DoubleConv``) drive either the XLA or the fused Pallas path
    from one checkpoint-compatible parameter set."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_conv_kernel_init,
                       (3, 3, self.in_features, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(9 * self.in_features),
                       (self.features,), jnp.float32)
        return k, b


class Conv1x1Params(nn.Module):
    """Param-only twin of ``nn.Conv(features, (1,1))`` (``OutConv``)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_conv_kernel_init,
                       (1, 1, self.in_features, self.features), jnp.float32)
        b = self.param("bias", torch_bias_init(self.in_features),
                       (self.features,), jnp.float32)
        return k, b


class BatchNormParams(nn.Module):
    """Param/variable-only twin of ``BatchNorm`` (same names/shapes/inits)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, ra_mean, ra_var


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """PyTorch default conv/linear weight init: kaiming_uniform(a=sqrt(5)).

    For HWIO conv kernels fan_in = kh * kw * in_ch; for (in, out) dense
    kernels fan_in = in.  Equivalent to uniform(+-sqrt(1 / fan_in)).
    """
    fan_in = int(math.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# kaiming_normal_(mode='fan_out', nonlinearity='relu'): N(0, sqrt(2/fan_out)).
kaiming_normal_fanout = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")


class BatchNorm(nn.Module):
    """``torch.nn.BatchNorm2d`` semantics over NHWC inputs.

    Parameters live in f32 regardless of compute dtype; normalization is
    performed in f32 then cast back (bf16-safe).

    ``axis_name``: when set (running under shard_map data parallelism),
    batch statistics are pmean-reduced across that mesh axis — cross-replica
    ("sync") BatchNorm.  A DP step then matches the single-device step on
    the same global batch exactly, instead of normalizing per-shard.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1      # torch convention: weight of the new batch stat
    dtype: Any = jnp.float32
    axis_name: Any = None
    # set after ops.fold_bn.fold_batchnorm rewrote the variables: the
    # normalization is then exactly x + bias (scale=1, mean=0, var=1-eps),
    # so eval mode degenerates to a per-channel add (zero for biased convs)
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 fuse_relu: bool = False, valid=None) -> jnp.ndarray:
        """``fuse_relu``: return relu(bn(x)) instead of bn(x).  In train
        mode on supported shapes this runs the Pallas fused kernels
        (ops/bn_pallas: lane-packed, batch-padding-free — measured 8-12 ms
        -> ~1 ms per level-1 BN); all other paths compute relu here so the
        contract is uniform.

        ``valid``: optional (B,) 0/1 mask — train-mode batch moments count
        only valid samples (reference-exact tail batches; see
        ``batch_norm_apply``)."""
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        return batch_norm_apply(
            x, scale, bias, ra_mean, ra_var, train=train,
            fuse_relu=fuse_relu, eps=self.eps, momentum=self.momentum,
            dtype=self.dtype, axis_name=self.axis_name, folded=self.folded,
            initializing=self.is_initializing(), valid=valid)


def batch_norm_apply(x, scale, bias, ra_mean, ra_var, *, train, fuse_relu,
                     eps, momentum, dtype, axis_name, folded, initializing,
                     valid=None):
    """The full ``BatchNorm`` body as a function of explicit params.

    ``ra_mean`` / ``ra_var`` are flax ``Variable`` handles (written in
    train mode unless ``initializing``).  Shared by the BatchNorm module
    and by modules that own BN params directly (``unet.DoubleConv``'s
    fused-kernel path needs param access, so it declares params itself and
    routes its unfused path through this same single source of truth).

    ``valid``: optional (B,) 0/1 sample mask.  The loader pads tail
    batches to the static shape with replicas; the reference's DataLoader
    instead yields a SMALLER batch whose BN moments see only real samples
    (``/root/reference/train.py:33-36``).  With ``valid`` given, train-mode
    moments are valid-weighted: padded samples are zeroed out of the sums
    and the means rescale by B_global/n_valid_global (psum'd across a
    sync-BN axis), so padded-tail steps are reference-exact.  On full
    batches the weights are all 1.0 and the rescale is exactly 1.0 —
    bit-identical values to the unmasked computation (incl. the unbiased
    n/(n-1) factor, which for counts < 2^24 divides identically in f32).
    """
    if folded and not train:
        # same f32 accumulate + downcast as the general path below, so
        # folded outputs are bit-identical to scale=1/mean=0/var=1-eps
        y = (x.astype(jnp.float32) + bias).astype(dtype)
        return nn.relu(y) if fuse_relu else y

    if fuse_relu and train and axis_name is None and not initializing \
            and valid is None:
        from ..ops.bn_pallas import bn_relu_train, supports_fused_bn
        if supports_fused_bn(x.shape, x.dtype):
            y, mean, var = bn_relu_train(x, scale, bias, eps)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            m = momentum
            unbiased = var * (n / max(n - 1, 1))
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
            return y

    if train:
        xf = x.astype(jnp.float32)
        if valid is None:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        else:
            w = valid.astype(jnp.float32)[:, None, None, None]
            mean = jnp.mean(xf * w, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(xf) * w, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None and not initializing:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
            n = n * jax.lax.psum(1, axis_name)
        if valid is None:
            n_f = None
        else:
            n_valid = jnp.sum(valid.astype(jnp.float32))
            if axis_name is not None and not initializing:
                n_valid = jax.lax.psum(n_valid, axis_name)
            b_global = (x.shape[0] if axis_name is None or initializing
                        else x.shape[0] * jax.lax.psum(1, axis_name))
            rescale = b_global / n_valid    # exactly 1.0 on full batches
            mean = mean * rescale
            mean_sq = mean_sq * rescale
            n_f = n_valid * (x.shape[1] * x.shape[2])
        var = mean_sq - jnp.square(mean)
        if n_f is None:
            unbiased = var * (n / max(n - 1, 1))
        else:
            unbiased = var * (n_f / jnp.maximum(n_f - 1.0, 1.0))
        if not initializing:
            m = momentum
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
            ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
    else:
        mean, var = ra_mean.value, ra_var.value

    inv = jax.lax.rsqrt(var + eps) * scale
    y = (x.astype(jnp.float32) - mean) * inv + bias
    y = y.astype(dtype)
    return nn.relu(y) if fuse_relu else y


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int = 0) -> jnp.ndarray:
    """torch ``MaxPool2d`` (ceil_mode=False); padded cells never win (-inf)."""
    pads = ((padding, padding), (padding, padding))
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding=pads)
