"""Legacy model family (reference ``unet/unet_model.py``).

These classes are exported by the reference but unused on its main path
(SURVEY §2 #2): a standalone segmentation ``UNet``, an affine-STN
``UNetSTN`` (2x3 theta, ``F.affine_grid``-style sampling) and a
bottleneck-regressed ``CourtReconstruction`` (3x3 theta + warper).  Kept
for API completeness; the production path is ``models.Reconstructor``.

Note: like the reference, the legacy regression heads hardcode an
8 x 22 x 40 bottleneck (i.e. 640x360 input; reference
``unet/unet_model.py:61,133``).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.warp import grid_sample, warp_homography
from .layers import torch_conv_kernel_init, torch_bias_init
from .unet import UNet as _UNetCore, DoubleConv, Down, Up, OutConv  # noqa: F401

__all__ = ["UNet", "UNetSTN", "CourtReconstruction"]


class UNet(nn.Module):
    """Standalone segmentation UNet (reference ``unet/unet_model.py:6-36``)."""

    n_classes: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        logits, _, _ = _UNetCore(mask_classes=self.n_classes,
                                 bilinear=self.bilinear, dtype=self.dtype,
                                 name="core")(x, train)
        return logits


class _BottleneckReg(nn.Module):
    """conv1x1(->8) -> flatten -> Linear(8*22*40, 32) -> ReLU -> Linear(n).

    Identity-initialized final layer; assumes a 22x40 bottleneck.
    """

    out_dim: int
    identity: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (1, 1), dtype=self.dtype,
                    kernel_init=torch_conv_kernel_init,
                    bias_init=torch_bias_init(x.shape[-1]),
                    name="conv_reg")(x)
        # torch flattens NCHW (c, h, w); transpose to match that ordering
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        x = nn.Dense(32, dtype=self.dtype,
                     kernel_init=torch_conv_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]), name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda k, s, d=jnp.float32: jnp.asarray(
                         self.identity, d),
                     name="fc2")(x.astype(jnp.float32))
        return x


class UNetSTN(nn.Module):
    """UNet + affine (2x3) STN projecting a template
    (reference ``unet/unet_model.py:39-102``)."""

    n_classes: int
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, template, train: bool = False):
        core = _UNetCore(mask_classes=self.n_classes, bilinear=self.bilinear,
                         dtype=self.dtype, name="core")
        logits, x_top, _ = core(x, train)
        theta = _BottleneckReg(6, (1, 0, 0, 0, 1, 0), dtype=self.dtype,
                               name="reg")(x_top).reshape(-1, 2, 3)
        n = x.shape[0]
        t = template[:n]
        th, tw = t.shape[1], t.shape[2]
        # F.affine_grid(align_corners=False) + grid_sample: base grid of
        # output pixel centers in [-1, 1], transformed by the affine theta
        ys = (jnp.arange(th, dtype=jnp.float32) + 0.5) / th * 2.0 - 1.0
        xs = (jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw * 2.0 - 1.0
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)
        grid = jnp.einsum("bij,hwj->bhwi", theta, base)
        proj = grid_sample(t, grid, mode="bilinear", align_corners=False)
        return logits, proj[..., 0]


class CourtReconstruction(nn.Module):
    """UNet + bottleneck-regressed 3x3 homography + template warp
    (reference ``unet/unet_model.py:105-178``)."""

    n_classes: int
    target_size: tuple = (640, 360)     # (W, H)
    bilinear: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, template, train: bool = False):
        core = _UNetCore(mask_classes=self.n_classes, bilinear=self.bilinear,
                         dtype=self.dtype, name="core")
        logits, x_top, _ = core(x, train)
        theta = _BottleneckReg(9, (1, 0, 0, 0, 1, 0, 0, 0, 1),
                               dtype=self.dtype,
                               name="reg")(x_top).reshape(-1, 3, 3)
        bs = x.shape[0]
        w, h = self.target_size
        proj = warp_homography(template[:bs].astype(jnp.float32), theta,
                               (h, w), mode="bilinear")
        return logits, proj[..., 0]
