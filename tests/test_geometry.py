"""Golden tests for the geometry layer against PyTorch / OpenCV references.

The PyTorch reference stack (kornia's HomographyWarper) is:
meshgrid(-1..1, endpoints) -> transform_points -> grid_sample(align_corners
=False, zeros padding).  torch + cv2 are available in this image, so we test
directly against ``torch.nn.functional.grid_sample`` / ``interpolate`` and
``cv2.perspectiveTransform`` — the exact primitives the reference rides on.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from sports_field_homography_tpu.geometry import (
    inverse_3x3,
    transform_points,
    transform_poi,
    grid_sample,
    warp_homography,
    normalized_grid,
    rescale_theta,
)
from sports_field_homography_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)

RNG = np.random.RandomState(0)


def rand_theta(b):
    """Random near-identity homographies (well-conditioned)."""
    eye = np.eye(3)[None].repeat(b, 0)
    return (eye + 0.2 * RNG.randn(b, 3, 3) * np.array([[1, 1, 1], [1, 1, 1], [0.1, 0.1, 0.2]])).astype(np.float32)


class TestHomographyAlgebra:
    def test_inverse_3x3_matches_torch(self):
        theta = rand_theta(8)
        ours = np.asarray(inverse_3x3(jnp.asarray(theta)))
        ref = torch.inverse(torch.from_numpy(theta)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_transform_points_matches_cv2(self):
        import cv2

        theta = rand_theta(4)
        pts = RNG.uniform(-1, 1, size=(4, 30, 2)).astype(np.float32)
        ours = np.asarray(transform_points(jnp.asarray(theta), jnp.asarray(pts)))
        for i in range(4):
            ref = cv2.perspectiveTransform(pts[i:i + 1].astype(np.float64), theta[i].astype(np.float64))[0]
            np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-4)

    def test_transform_poi_roundtrip(self):
        """inverse(theta) applied after theta recovers the points."""
        theta = rand_theta(3)
        pts = RNG.uniform(-0.8, 0.8, size=(3, 20, 2)).astype(np.float32)
        fwd = transform_points(jnp.asarray(theta), jnp.asarray(pts))
        back = transform_points(inverse_3x3(jnp.asarray(theta)), fwd)
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-4)

    def test_transform_poi_normalization(self):
        theta = jnp.eye(3)[None]
        pts = jnp.asarray([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]]])
        out = np.asarray(transform_poi(theta, pts, normalize=True))
        np.testing.assert_allclose(out[0], [[0, 0], [1, 1], [0.5, 0.5]], atol=1e-6)

    def test_rescale_theta_matches_reference_math(self):
        """S_dst @ theta @ S_src^-1 (reference dataset_utils/preparation.py:129-137)."""
        theta = rand_theta(1)[0].astype(np.float64)
        src, dst = (640, 360), (1280, 720)
        ours = np.asarray(rescale_theta(jnp.asarray(theta), src, dst))
        src_scale = np.array([[dst[0], 0, 0], [0, dst[1], 0], [0, 0, 1]], dtype=np.float64)
        dst_scale_inv = np.array([[1 / src[0], 0, 0], [0, 1 / src[1], 0], [0, 0, 1]], dtype=np.float64)
        ref = src_scale @ theta @ dst_scale_inv
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    @pytest.mark.parametrize("align_corners", [False, True])
    def test_matches_torch_grid_sample(self, mode, align_corners):
        b, h, w, c = 2, 23, 31, 3
        img = RNG.rand(b, h, w, c).astype(np.float32)
        # include far out-of-bounds coords to exercise zero padding
        grid = RNG.uniform(-1.6, 1.6, size=(b, 17, 19, 2)).astype(np.float32)

        ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                      mode=mode, align_corners=align_corners))
        ref = TF.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode=mode, padding_mode="zeros", align_corners=align_corners,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_warp_homography_matches_kornia_semantics(self, mode):
        """Rebuild kornia HomographyWarper from its primitives in torch."""
        b, ht, wt = 3, 45, 80
        ho, wo = 36, 64
        template = RNG.rand(b, ht, wt, 1).astype(np.float32)
        theta = rand_theta(b)

        ours = np.asarray(warp_homography(jnp.asarray(template), jnp.asarray(theta),
                                          (ho, wo), mode=mode))

        # torch reference: inclusive-endpoint meshgrid + transform + grid_sample
        xs = torch.linspace(-1, 1, wo)
        ys = torch.linspace(-1, 1, ho)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        grid = torch.stack([gx, gy], dim=-1).reshape(1, -1, 2).repeat(b, 1, 1)
        ones = torch.ones(b, grid.shape[1], 1)
        ph = torch.cat([grid, ones], dim=-1)
        t = torch.from_numpy(theta)
        out = torch.einsum("bij,bnj->bni", t, ph)
        z = out[..., 2:3]
        flow = (out[..., :2] / (z + 1e-8)).reshape(b, ho, wo, 2)
        ref = TF.grid_sample(
            torch.from_numpy(template).permute(0, 3, 1, 2), flow,
            mode=mode, padding_mode="zeros", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_identity_warp_bilinear_on_linear_ramp(self):
        """On a linear ramp, bilinear sampling reproduces the analytic value
        regardless of the sub-pixel shift kornia's grid convention implies."""
        h = w = 64
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        img = (xx + 2.0 * yy).astype(np.float32)[None, :, :, None]
        out = np.asarray(warp_homography(jnp.asarray(img), jnp.eye(3)[None], (h, w)))
        # expected: sample at pixel coords px = i*w/(w-1) - 0.5 (interior only)
        fx = np.linspace(-1, 1, w)
        fy = np.linspace(-1, 1, h)
        px = ((fx + 1) * w - 1) / 2
        py = ((fy + 1) * h - 1) / 2
        exp = px[None, :] + 2.0 * py[:, None]
        np.testing.assert_allclose(out[0, 1:-1, 1:-1, 0], exp[1:-1, 1:-1], atol=1e-3)


class TestResize:
    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("shape", [((9, 13), (18, 26)), ((45, 80), (22, 40)),
                                       ((360, 640), (90, 160)), ((7, 5), (1, 1))])
    def test_bilinear_matches_torch(self, align_corners, shape):
        (h, w), (ho, wo) = shape
        x = RNG.rand(2, h, w, 3).astype(np.float32)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), (ho, wo), align_corners))
        ref = TF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(ho, wo),
                             mode="bilinear", align_corners=align_corners)
        ref = ref.permute(0, 2, 3, 1).numpy()
        # matmul accumulation order differs from torch's 2-tap formula: ~1e-5
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4)

    @pytest.mark.parametrize("shape", [((9, 13), (18, 26)), ((45, 80), (22, 40)),
                                       ((360, 640), (720, 1280))])
    def test_nearest_matches_torch(self, shape):
        (h, w), (ho, wo) = shape
        x = RNG.rand(1, h, w, 2).astype(np.float32)
        ours = np.asarray(resize_nearest(jnp.asarray(x), (ho, wo)))
        ref = TF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(ho, wo),
                             mode="nearest").permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_upsample2x_matches_torch_unet_up(self):
        x = RNG.rand(2, 22, 40, 8).astype(np.float32)
        ours = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
        ref = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_normalized_grid_endpoints():
    g = np.asarray(normalized_grid(5, 9))
    assert g.shape == (5, 9, 2)
    np.testing.assert_allclose(g[0, 0], [-1, -1])
    np.testing.assert_allclose(g[-1, -1], [1, 1])
    np.testing.assert_allclose(g[2, 4], [0, 0], atol=1e-7)
