"""Correctness of the Pallas conv3x3 kernel family (interpret mode on CPU)
against XLA references — forward (both modes), prologue fusion, stat sums,
wgrad, and the dgrad weight transform.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.ops.conv3x3_pallas import (
    best_th,
    conv3x3,
    dgrad_weights,
    pack_weights,
    supports_conv3x3,
    wgrad3x3,
)

N, H, W, CIN, COUT = 2, 12, 16, 64, 64


def xla_conv(x, k, bias=None):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, CIN).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, CIN, COUT).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32))
    return x, k, b


@pytest.mark.parametrize("mode", ["dot9", "im2col"])
def test_forward_matches_xla(data, mode):
    x, k, b = data
    y = conv3x3(x, pack_weights(k), b, mode=mode, interpret=True)
    ref = xla_conv(x, k, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_forward_no_bias(data):
    x, k, _ = data
    y = conv3x3(x, pack_weights(k), interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(xla_conv(x, k)),
                               rtol=1e-5, atol=1e-4)


def test_stats_sums(data):
    x, k, b = data
    y, sums = conv3x3(x, pack_weights(k), b, stats=True, interpret=True)
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(np.asarray(sums[0]), yf.sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sums[1]),
                               (yf * yf).sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-3)


def test_prologue_bn_relu(data):
    """Prologue must normalize the interior and keep conv padding zero."""
    x, k, b = data
    rng = np.random.RandomState(1)
    mean = jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.5)
    inv = jnp.asarray(1.0 + rng.rand(CIN).astype(np.float32))
    beta = jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.5)
    y = conv3x3(x, pack_weights(k), b, prologue=(mean, inv, beta),
                interpret=True)
    z = jnp.maximum((x - mean) * inv + beta, 0.0)
    ref = xla_conv(z, k, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_dgrad_weights_full_conv(data):
    """conv3x3(pad-by-1 semantics) with dgrad weights == XLA conv dgrad."""
    x, k, b = data
    rng = np.random.RandomState(7)
    dy = jnp.asarray(rng.randn(N, H, W, COUT).astype(np.float32))
    f = lambda xx: jnp.sum(xla_conv(xx, k, b) * dy)
    dx_ref = jax.grad(f)(x)
    dx = conv3x3(dy, dgrad_weights(k), interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-3)


def test_wgrad_matches_autodiff(data):
    x, k, b = data
    rng = np.random.RandomState(2)
    dy = jnp.asarray(rng.randn(N, H, W, COUT).astype(np.float32))

    def f(kk, bb):
        return jnp.sum(xla_conv(x, kk, bb) * dy)

    dk_ref, db_ref = jax.grad(f, argnums=(0, 1))(k, b)
    dw, db = wgrad3x3(x, dy, interpret=True)
    np.testing.assert_allclose(np.asarray(dw),
                               np.asarray(pack_weights(dk_ref)),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=1e-4, atol=1e-2)


def test_wgrad_with_prologue(data):
    x, k, b = data
    rng = np.random.RandomState(3)
    dy = jnp.asarray(rng.randn(N, H, W, COUT).astype(np.float32))
    mean = jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.5)
    inv = jnp.asarray(1.0 + rng.rand(CIN).astype(np.float32))
    beta = jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.5)
    z = jnp.maximum((x - mean) * inv + beta, 0.0)

    def f(kk, bb):
        return jnp.sum(xla_conv(z, kk, bb) * dy)

    dk_ref, db_ref = jax.grad(f, argnums=(0, 1))(k, b)
    dw, db = wgrad3x3(x, dy, prologue=(mean, inv, beta), interpret=True)
    np.testing.assert_allclose(np.asarray(dw),
                               np.asarray(pack_weights(dk_ref)),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=1e-4, atol=1e-2)


def test_support_predicates():
    assert supports_conv3x3((2, 12, 16, 64), jnp.float32)
    assert supports_conv3x3((26, 360, 640, 64), jnp.bfloat16)
    assert supports_conv3x3((26, 180, 320, 128), jnp.bfloat16)
    assert not supports_conv3x3((2, 12, 16, 3), jnp.float32)   # stem
    assert not supports_conv3x3((2, 12, 18, 64), jnp.float32)  # W % 8
    assert best_th(360, 640, 64, 64) in {k for k in range(1, 361)
                                         if 360 % k == 0}
