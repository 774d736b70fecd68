"""Packed Pallas k2s2 deconv vs the XLA Deconv2x formulation (interpret)."""
import numpy as np

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.ops.conv3x3_pallas import unpack_pairs
from sports_field_homography_tpu.ops.deconv_pallas import (
    deconv2x2_packed,
    supports_deconv_packed,
)

N, H, W, CIN, COUT = 2, 6, 16, 128, 64


def xla_deconv(x, kernel, bias):
    """The Deconv2x math (models/unet.py): input-dilated conv."""
    k = kernel.transpose(1, 2, 0, 3)[::-1, ::-1].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


def _data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, CIN).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(CIN, 2, 2, COUT).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(COUT).astype(np.float32) * 0.1)
    return x, k, b


def test_forward_matches_xla():
    x, k, b = _data()
    yp = deconv2x2_packed(x, k, b, True)
    assert yp.shape == (N, 2 * H, W, 2 * COUT)
    ref = xla_deconv(x, k, b)
    np.testing.assert_allclose(np.asarray(unpack_pairs(yp)),
                               np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_gradients_match_xla():
    x, k, b = _data()
    rng = np.random.RandomState(1)
    cot = jnp.asarray(rng.randn(N, 2 * H, 2 * W, COUT).astype(np.float32))

    def loss_p(x, k, b):
        return jnp.sum(unpack_pairs(deconv2x2_packed(x, k, b, True)) * cot)

    def loss_r(x, k, b):
        return jnp.sum(xla_deconv(x, k, b) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, r, tag in zip(gp, gr, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-3, err_msg=tag)


def test_supports():
    assert supports_deconv_packed((26, 180, 320, 128), 64, jnp.bfloat16)
    assert not supports_deconv_packed((26, 180, 321, 128), 64, jnp.bfloat16)


def test_native_out_forward_and_grads():
    x, k, b = _data()
    yn = deconv2x2_packed(x, k, b, True, True)
    ref = xla_deconv(x, k, b)
    assert yn.shape == ref.shape
    np.testing.assert_allclose(np.asarray(yn), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    rng = np.random.RandomState(2)
    cot = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))

    def loss_p(x, k, b):
        return jnp.sum(deconv2x2_packed(x, k, b, True, True) * cot)

    def loss_r(x, k, b):
        return jnp.sum(xla_deconv(x, k, b) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, k, b)
    for a, r, tag in zip(gp, gr, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-3, err_msg=tag)
