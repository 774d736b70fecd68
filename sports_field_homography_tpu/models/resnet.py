"""ResNet-family Spatial Transformer head (flax.linen, NHWC).

Capability twin of the reference ``models/resnet.py``: torchvision-style
ResNet with a parametric-in-channels stem conv and a 9-way linear
regression head emitting a 3x3 homography, identity-initialized
(reference ``models/resnet.py:143-257``).  Factories cover
resnet18/34/50/101/152, resnext50_32x4d/101_32x8d, wide_resnet50_2/101_2
(reference :273-359) and the registry reproduces the reference's
``'resnet52' -> resnet152`` alias quirk (reference :366).

All convs are bias-free + BatchNorm, NHWC, kaiming_normal(fan_out) init —
exactly the reference's re-initialization (:189-194).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, kaiming_normal_fanout, max_pool

__all__ = ["ResNetSTN", "resnet_stn", "resnet_models", "RESNET_SPECS"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, valid=None) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype,
                      kernel_init=kaiming_normal_fanout, name="conv1")(x)
        out = BatchNorm(self.planes, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn1")(out, train, valid=valid)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, kernel_init=kaiming_normal_fanout,
                      name="conv2")(out)
        out = BatchNorm(self.planes, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn2")(out, train, valid=valid)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_normal_fanout,
                               name="downsample_conv")(x)
            identity = BatchNorm(self.planes, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="downsample_bn")(identity, train, valid=valid)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, valid=None) -> jnp.ndarray:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=kaiming_normal_fanout, name="conv1")(x)
        out = BatchNorm(width, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn1")(out, train, valid=valid)
        out = nn.relu(out)
        # stride on the 3x3 (torchvision "v1.5" placement)
        out = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      dtype=self.dtype, kernel_init=kaiming_normal_fanout,
                      name="conv2")(out)
        out = BatchNorm(width, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn2")(out, train, valid=valid)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=kaiming_normal_fanout, name="conv3")(out)
        out = BatchNorm(out_ch, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn3")(out, train, valid=valid)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               kernel_init=kaiming_normal_fanout,
                               name="downsample_conv")(x)
            identity = BatchNorm(out_ch, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="downsample_bn")(identity, train, valid=valid)
        return nn.relu(out + identity)


_IDENTITY_THETA = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


class ResNetSTN(nn.Module):
    """ResNet backbone + 3x3 homography regression head.

    ``__call__`` returns theta of shape (B, 1, 3, 3), matching the
    reference's ``x.view(-1, 1, 3, 3)`` (``models/resnet.py:252``).
    """

    block: str                      # 'basic' | 'bottleneck'
    layers: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid=None) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_normal_fanout,
                    name="conv0")(x)
        x = BatchNorm(64, dtype=self.dtype, axis_name=self.axis_name, folded=self.folded, name="bn1")(x, train, valid=valid)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)

        basic = self.block == "basic"
        expansion = BasicBlock.expansion if basic else Bottleneck.expansion
        inplanes = 64
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                need_ds = bi == 0 and (s != 1 or inplanes != planes * expansion)
                name = f"layer{stage + 1}_{bi}"
                if basic:
                    x = BasicBlock(planes, s, need_ds, dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   folded=self.folded, name=name)(x, train, valid)
                else:
                    x = Bottleneck(planes, s, need_ds, self.groups,
                                   self.width_per_group, dtype=self.dtype,
                                   axis_name=self.axis_name,
                                   folded=self.folded, name=name)(x, train, valid)
                inplanes = planes * expansion

        x = jnp.mean(x, axis=(1, 2))            # AdaptiveAvgPool2d((1,1))
        # Identity-initialized regression head (reference :206-208).
        theta = nn.Dense(
            9, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _IDENTITY_THETA, dtype=dtype),
            name="reg")(x.astype(jnp.float32))
        return theta.reshape(-1, 1, 3, 3)


RESNET_SPECS = {
    "resnet18": dict(block="basic", layers=(2, 2, 2, 2)),
    "resnet34": dict(block="basic", layers=(3, 4, 6, 3)),
    "resnet50": dict(block="bottleneck", layers=(3, 4, 6, 3)),
    "resnet101": dict(block="bottleneck", layers=(3, 4, 23, 3)),
    "resnet152": dict(block="bottleneck", layers=(3, 8, 36, 3)),
    "resnext50_32x4d": dict(block="bottleneck", layers=(3, 4, 6, 3),
                            groups=32, width_per_group=4),
    "resnext101_32x8d": dict(block="bottleneck", layers=(3, 4, 23, 3),
                             groups=32, width_per_group=8),
    "wide_resnet50_2": dict(block="bottleneck", layers=(3, 4, 6, 3),
                            width_per_group=128),
    "wide_resnet101_2": dict(block="bottleneck", layers=(3, 4, 23, 3),
                             width_per_group=128),
}

# Registry exposed under the reference's names, including its
# 'resnet52' -> resnet152 alias (reference models/resnet.py:366).
resnet_models = dict(RESNET_SPECS)
resnet_models["resnet52"] = RESNET_SPECS["resnet152"]


def resnet_stn(name: str, dtype: Any = jnp.float32) -> ResNetSTN:
    """Build a ResNetSTN by registry name (reference ``models/resnet.py:373``)."""
    spec = resnet_models[name]
    return ResNetSTN(dtype=dtype, **spec)
