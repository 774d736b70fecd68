"""Pallas fused BN+ReLU vs the XLA BatchNorm path.

Interpret mode on the CPU test platform; the same kernels compile via
Mosaic on TPU (measured in scripts/bench_train_step.py --fused_bn).
"""
import numpy as np

import jax

import pytest
import jax.numpy as jnp

from sports_field_homography_tpu.models.layers import BatchNorm
from sports_field_homography_tpu.ops.bn_pallas import (
    bn_relu_train, supports_fused_bn)


def _data(c=64, n=3, h=8, w=16, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(dtype))
    g = jnp.asarray((rng.rand(c) + 0.5).astype(np.float32))
    b = jnp.asarray((rng.randn(c) * 0.1).astype(np.float32))
    return x, g, b


def _xla_bn_relu(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    y = (xf - mean) * (jax.lax.rsqrt(var + eps) * g) + b
    return jnp.maximum(y.astype(x.dtype), 0), mean, var


def test_supports():
    assert supports_fused_bn((26, 360, 640, 64), jnp.bfloat16)
    assert supports_fused_bn((2, 8, 16, 128), jnp.float32)
    assert not supports_fused_bn((2, 8, 16, 3), jnp.float32)     # stem input
    assert not supports_fused_bn((2, 8, 16, 64), jnp.int32)


def test_forward_matches_xla_lane_packed_and_wide():
    for c in (64, 128):
        x, g, b = _data(c=c)
        y, mean, var = bn_relu_train(x, g, b)
        yr, mr, vr = _xla_bn_relu(x, g, b)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(mr), atol=1e-6)
        np.testing.assert_allclose(np.asarray(var), np.asarray(vr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-5)


def test_gradients_match_xla():
    x, g, b = _data()

    def loss_fused(x, g, b):
        y, _, _ = bn_relu_train(x, g, b)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def loss_xla(x, g, b):
        y, _, _ = _xla_bn_relu(x, g, b)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_xla, argnums=(0, 1, 2))(x, g, b)
    for a, e, tol in zip(gf, gr, (1e-5, 5e-4, 5e-4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=tol)


def test_batchnorm_module_fuse_relu_path():
    """BatchNorm(fuse_relu=True) must match relu(BatchNorm(...)) and update
    the running statistics identically (to f32 rounding)."""
    x, _, _ = _data(c=64, seed=1)
    bn = BatchNorm(64)
    variables = bn.init(jax.random.PRNGKey(0), x, train=False)

    y_ref, st_ref = bn.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    y_ref = jax.nn.relu(y_ref)
    y_fused, st_fused = bn.apply(variables, x, train=True, fuse_relu=True,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(st_fused["batch_stats"][k]),
            np.asarray(st_ref["batch_stats"][k]), atol=1e-5)


@pytest.mark.full
def test_unet_fused_bn_train_step_matches():
    """A UNet forward+backward with fused_bn on/off agrees to bf16-train
    tolerances (same params, same batch)."""
    from sports_field_homography_tpu.models.unet import UNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    tgt = jnp.asarray(rng.rand(2, 32, 64, 4).astype(np.float32))

    def run(fused):
        model = UNet(mask_classes=4, fused_bn=fused)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            (logits, _, _), _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.mean((logits - tgt) ** 2)

        val, grads = jax.value_and_grad(loss)(variables["params"])
        return val, grads

    v0, g0 = run(False)
    v1, g1 = run(True)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
