"""Pallas fused interval warp must match the XLA interval warp bit-for-bit.

Runs in interpret mode on the CPU test platform; the same kernel compiles
via Mosaic on TPU.
"""
import numpy as np
from PIL import Image

import jax.numpy as jnp

from sports_field_homography_tpu.ops.interval_warp import (
    build_interval_table, warp_nearest_interval)
from sports_field_homography_tpu.ops.warp_pallas import (
    warp_nearest_interval_pallas)

NCAA = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"


def load(size=(320, 180)):
    t = np.array(Image.open(NCAA).resize(size, Image.NEAREST), np.float32)
    return t / 4.0


def thetas(b, seed=0):
    rng = np.random.RandomState(seed)
    base = np.array([[1.4, 0.1, 0.05], [0.02, 2.2, 0.6], [0.01, 0.9, 1.0]])
    return jnp.asarray(np.stack(
        [base + 0.05 * rng.randn(3, 3) * [[1, 1, 1], [1, 1, 1], [.1, .3, .3]]
         for _ in range(b)]).astype(np.float32))


def test_pallas_matches_xla_interval_warp():
    table = build_interval_table(load())
    th = thetas(3)
    ref = np.asarray(warp_nearest_interval(table, th, (180, 320)))
    out = np.asarray(warp_nearest_interval_pallas(table, th, (180, 320),
                                                  interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_subsampled_matches():
    table = build_interval_table(load())
    th = thetas(2, seed=4)
    ref = np.asarray(warp_nearest_interval(table, th, (180, 320),
                                           sample_hw=(90, 160)))
    out = np.asarray(warp_nearest_interval_pallas(table, th, (180, 320),
                                                  sample_hw=(90, 160),
                                                  interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_pallas_nondivisible_query_count():
    """Query count not a multiple of the 8x128 tile gets padded/sliced."""
    table = build_interval_table(load(size=(96, 48)))
    th = thetas(1, seed=7)
    ref = np.asarray(warp_nearest_interval(table, th, (30, 50), row_chunk=5))
    out = np.asarray(warp_nearest_interval_pallas(table, th, (30, 50),
                                                  interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_warp_kernel_config_dispatch():
    """warp_kernel='pallas' must be reachable from ReconstructorConfig and
    produce outputs identical to the XLA kernel (interpret mode on CPU)."""
    import jax
    from sports_field_homography_tpu.models import (
        Reconstructor, ReconstructorConfig)

    table = build_interval_table(load((64, 32)))
    th = thetas(2)

    def warp_with(kernel):
        cfg = ReconstructorConfig(
            target_size=(64, 32), unet_size=(64, 32), warp_size=(64, 32),
            warp_with_nearest=True, warp_kernel=kernel)
        model = Reconstructor(cfg)
        return model.apply({}, th, jnp.zeros((2, 32, 64, 1)),
                           warp_table=table, method=model.warp)

    out_x = np.asarray(warp_with("xla"))
    out_p = np.asarray(warp_with("pallas"))
    assert out_x.shape == (2, 32, 64)
    np.testing.assert_array_equal(out_x, out_p)
