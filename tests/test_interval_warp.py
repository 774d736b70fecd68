"""Interval-table warp must be bit-exact vs the gather-based sampler."""
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from sports_field_homography_tpu.geometry.warp import warp_homography
from sports_field_homography_tpu.ops.interval_warp import (
    build_interval_table, warp_nearest_interval)

NCAA = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
PITCH = "/root/repo/assets/pitch_mask_nc4_hd.png"


def load(path, size=(320, 180)):
    t = np.array(Image.open(path).resize(size, Image.NEAREST), np.float32)
    if t.ndim == 3:
        t = t[..., 0]
    return t / 4.0


def realistic_thetas(b, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[1.4, 0.1, 0.05], [0.02, 2.2, 0.6], [0.01, 0.9, 1.0]])
    out = [base + 0.05 * rng.randn(3, 3) * [[1, 1, 1], [1, 1, 1], [.1, .3, .3]]
           for _ in range(b)]
    return jnp.asarray(np.stack(out).astype(np.float32))


@pytest.mark.parametrize("path", [NCAA, PITCH])
def test_bit_exact_vs_gather_warp(path):
    tmpl = load(path)
    b = 4
    src = jnp.asarray(np.tile(tmpl[None, :, :, None], (b, 1, 1, 1)))
    table = build_interval_table(tmpl)
    theta = realistic_thetas(b)
    exact = np.asarray(warp_homography(src, theta, (180, 320), "nearest"))[..., 0]
    fast = np.asarray(warp_nearest_interval(table, theta, (180, 320)))
    np.testing.assert_array_equal(fast, exact)


def test_zero_padding_outside_template():
    tmpl = load(NCAA)
    table = build_interval_table(tmpl)
    # strong zoom-out: most of the output lies outside the template
    theta = jnp.asarray([[[6.0, 0.0, 0.0], [0.0, 6.0, 0.0], [0.0, 0.0, 1.0]]],
                        jnp.float32)
    out = np.asarray(warp_nearest_interval(table, theta, (180, 320)))
    assert out[0, 0, 0] == 0.0 and out[0, -1, -1] == 0.0
    assert out.max() > 0          # center still samples the court


def test_table_capacity_error():
    rng = np.random.RandomState(0)
    noisy = (rng.randint(0, 4, (64, 128)) / 4.0).astype(np.float32)
    with pytest.raises(ValueError):
        build_interval_table(noisy, max_transitions=8)


def test_theta_b133_shape_accepted():
    tmpl = load(NCAA)
    table = build_interval_table(tmpl)
    theta = realistic_thetas(2)[:, None]      # (B, 1, 3, 3)
    out = warp_nearest_interval(table, theta, (180, 320))
    assert out.shape == (2, 180, 320)


def test_bilinear_interval_matches_gather_bilinear():
    from sports_field_homography_tpu.ops.interval_warp import warp_bilinear_interval

    tmpl = load(NCAA)
    b = 4
    src = jnp.asarray(np.tile(tmpl[None, :, :, None], (b, 1, 1, 1)))
    table = build_interval_table(tmpl)
    theta = realistic_thetas(b, seed=3)
    exact = np.asarray(warp_homography(src, theta, (180, 320), "bilinear"))[..., 0]
    fast = np.asarray(warp_bilinear_interval(table, theta, (180, 320)))
    np.testing.assert_allclose(fast, exact, rtol=1e-5, atol=1e-6)


def test_bilinear_interval_gradient_matches_gather():
    """d(warp)/d(theta) must match the gather-based sampler's gradient."""
    import jax
    from sports_field_homography_tpu.ops.interval_warp import warp_bilinear_interval

    tmpl = load(NCAA, size=(64, 36))
    src = jnp.asarray(tmpl[None, :, :, None])
    table = build_interval_table(tmpl)
    theta0 = realistic_thetas(1, seed=5)
    tgt = jnp.zeros((1, 36, 64))

    def loss_gather(th):
        w = warp_homography(src, th, (36, 64), "bilinear")[..., 0]
        return jnp.mean((w - tgt) ** 2)

    def loss_interval(th):
        w = warp_bilinear_interval(table, th, (36, 64))
        return jnp.mean((w - tgt) ** 2)

    g1 = np.asarray(jax.grad(loss_gather)(theta0))
    g2 = np.asarray(jax.grad(loss_interval)(theta0))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-6)


def test_subsampled_warp_equals_warp_then_nearest_resize():
    from sports_field_homography_tpu.ops.interval_warp import warp_nearest_interval
    from sports_field_homography_tpu.ops.resize import resize_nearest

    tmpl = load(NCAA, size=(320, 180))
    table = build_interval_table(tmpl)
    theta = realistic_thetas(3, seed=9)
    full = warp_nearest_interval(table, theta, (180, 320))
    down = np.asarray(resize_nearest(full[..., None], (90, 160))[..., 0])
    fused = np.asarray(warp_nearest_interval(table, theta, (180, 320),
                                             sample_hw=(90, 160)))
    np.testing.assert_array_equal(fused, down)


def test_two_pass_fast_warp_close_to_exact():
    """The optional 2-pass aligned-gather warp (fast_warp config flag)
    deviates only on knife-edge pixels for broadcast-style thetas."""
    from sports_field_homography_tpu.geometry.warp import (
        warp_homography_nearest_2pass)

    tmpl = load(NCAA, size=(320, 180))
    b = 4
    src = jnp.asarray(np.tile(tmpl[None, :, :, None], (b, 1, 1, 1)))
    theta = realistic_thetas(b, seed=11)
    exact = np.asarray(warp_homography(src, theta, (180, 320), "nearest"))
    fast = np.asarray(warp_homography_nearest_2pass(src, theta, (180, 320)))
    mismatch = (np.abs(exact - fast) > 1e-6).mean()
    assert mismatch < 0.005, mismatch
