"""UNet court-segmentation model (flax.linen, NHWC).

Capability twin of the reference UNet (``unet/unet_parts.py``,
``models/reconstructor.py:66-79``): 5-level encoder 64->1024, skip-connected
decoder, deconv or bilinear upsampling, optional UV regression head.

TPU-first choices:
  * NHWC throughout; channel counts are multiples of 64 -> lane-aligned.
  * The k2s2 ``ConvTranspose2d`` decoder is expressed as a 1x1-matmul to
    4x channels followed by depth-to-space.  This is *algebraically
    identical* to torch's transposed conv for kernel 2 / stride 2, but it
    lowers to a single MXU matmul + reshape instead of a strided transposed
    convolution.
  * The asymmetric skip-alignment padding (reference ``unet/unet_parts.py:59-63``)
    becomes a static jnp.pad — shapes are static under jit, so the pad
    amounts are Python ints resolved at trace time.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample2x_bilinear
from .layers import (BatchNormParams, Conv1x1Params, Conv3x3Params,
                     batch_norm_apply, max_pool, torch_conv_kernel_init,
                     torch_bias_init)

__all__ = ["DoubleConv", "Down", "Up", "OutConv", "UNet"]

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


def max_pool_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """2x2 maxpool of a width-pair-packed (N, H, W/2, 2C) activation.

    The W-direction pair IS the packed lane pair (a lane-half max) and the
    H-direction pair is a major-dim strided max — cheaper than the native
    reduce-window, and it keeps the packed level-1 buffer away from XLA
    layout opinions.  Output is the NATIVE (N, H/2, W/2, C) result.

    ``where`` chains (not jnp.maximum) so the GRADIENT picks the row-major
    -first max cell on ties — ReLU inputs tie at 0.0 constantly, and
    jnp.maximum's split-the-tie subgradient would diverge from the
    reduce-window (and torch) semantics of the native path.
    """
    c = xp.shape[-1] // 2
    left, right = xp[..., :c], xp[..., c:]
    m = jnp.where(left >= right, left, right)
    top, bot = m[:, 0::2], m[:, 1::2]
    return jnp.where(top >= bot, top, bot)


class DoubleConv(nn.Module):
    """(conv3x3 pad1 -> BN -> ReLU) x 2 (reference ``unet/unet_parts.py:7-24``).

    Owns its conv/BN parameters directly (``Conv3x3Params`` /
    ``BatchNormParams`` — checkpoint-identical to the nn.Conv/BatchNorm
    layout) so the same variables drive either execution path:

      * ``conv_kernel='xla'`` — functional twin of the original
        nn.Conv + BatchNorm stack (bit-identical math).
      * ``conv_kernel='pallas'`` — train-mode fused Pallas DoubleConv
        (``ops.double_conv``): batch on the grid (no 26->32 sublane
        padding), BN stats fused into the conv epilogue, BN+ReLU fused
        into the next conv's prologue.  Falls back to the XLA path in
        eval mode, under sync-BN (``axis_name``), and on unsupported
        shapes.
    """

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False
    # route the BN+ReLU pairs through the Pallas fused train kernels
    # (ops/bn_pallas) when shapes allow; f32-rounding-level equivalent
    fused_bn: bool = False
    conv_kernel: str = "xla"        # xla | pallas
    # boundary layout for the fused kernels: "native" | "stem_packed" |
    # "dual_packed" (see ops.double_conv).  Non-native ios are set by
    # UNet when the packed level-1 domain is active; the caller has
    # already verified kernel support, and the OUTPUT IS PACKED.
    io: str = "native"

    @nn.compact
    def __call__(self, x, train: bool, valid=None) -> jnp.ndarray:
        mid = self.mid_channels or self.out_channels
        if isinstance(x, tuple):        # dual_packed: (skip_p, up_p)
            in_ch = sum(t.shape[-1] for t in x) // 2
        else:
            in_ch = x.shape[-1]
        k1, cb1 = Conv3x3Params(mid, in_ch, name="conv1")()
        s1, b1, rm1, rv1 = BatchNormParams(mid, name="bn1")()
        k2, cb2 = Conv3x3Params(self.out_channels, mid, name="conv2")()
        s2, b2, rm2, rv2 = BatchNormParams(self.out_channels, name="bn2")()
        dt = self.dtype

        if (self.conv_kernel == "pallas" or self.io != "native") \
                and not self.is_initializing():
            from ..ops.double_conv import (double_conv_eval,
                                           double_conv_train,
                                           supports_double_conv,
                                           supports_double_conv_eval)
            xin = jax.tree.map(lambda t: t.astype(dt), x)
            if self.io != "native":
                if train:
                    # packed io cannot fall back (tuple inputs); UNet gates
                    # it off when a valid mask needs masked BN moments
                    assert self.axis_name is None and valid is None, \
                        "packed io is gated"
                    out, m1, v1, m2, v2 = double_conv_train(
                        xin, k1, cb1, s1, b1, k2, cb2, s2, b2,
                        _BN_EPS, None, self.io)
                    self._update_stats(x, rm1, rv1, rm2, rv2,
                                       m1, v1, m2, v2)
                    return out
                return double_conv_eval(
                    xin, k1, cb1, s1, b1, rm1.value, rv1.value,
                    k2, cb2, s2, b2, rm2.value, rv2.value, _BN_EPS,
                    None, self.io)
            # folded variables degenerate to the same affine exactly
            # (scale=1, mean=0, var+eps=1), so eval fusion covers both
            if (not train and supports_double_conv_eval(
                    x.shape, dt, mid, self.out_channels)):
                return double_conv_eval(
                    x.astype(dt), k1, cb1, s1, b1, rm1.value, rv1.value,
                    k2, cb2, s2, b2, rm2.value, rv2.value, _BN_EPS)
            # the fused train kernel computes unmasked moments: with a
            # valid mask (padded-tail masked BN) use the XLA path below
            if (train and self.axis_name is None and valid is None
                    and supports_double_conv(x.shape, dt, mid,
                                             self.out_channels)):
                out, m1, v1, m2, v2 = double_conv_train(
                    x.astype(dt), k1, cb1, s1, b1, k2, cb2, s2, b2,
                    _BN_EPS, None)
                self._update_stats(x, rm1, rv1, rm2, rv2, m1, v1, m2, v2)
                return out

        fuse = self.fused_bn

        def conv(h, k, cb):
            y = jax.lax.conv_general_dilated(
                h.astype(dt), k.astype(dt), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + cb.astype(dt)

        def bn(h, scale, bias, rm, rv):
            return batch_norm_apply(
                h, scale, bias, rm, rv, train=train, fuse_relu=fuse,
                eps=_BN_EPS, momentum=_BN_MOMENTUM, dtype=dt,
                axis_name=self.axis_name, folded=self.folded,
                initializing=self.is_initializing(), valid=valid)

        x = bn(conv(x, k1, cb1), s1, b1, rm1, rv1)
        if not fuse:
            x = nn.relu(x)
        x = bn(conv(x, k2, cb2), s2, b2, rm2, rv2)
        return x if fuse else nn.relu(x)

    @staticmethod
    def _update_stats(x, rm1, rv1, rm2, rv2, m1, v1, m2, v2):
        ref = x[0] if isinstance(x, tuple) else x
        n = ref.shape[0] * ref.shape[1] * ref.shape[2]
        if isinstance(x, tuple):
            n *= 2      # packed refs halve W; recover the true pixel count
        unb = n / max(n - 1, 1)
        mom = _BN_MOMENTUM
        rm1.value = (1 - mom) * rm1.value + mom * m1
        rv1.value = (1 - mom) * rv1.value + mom * (v1 * unb)
        rm2.value = (1 - mom) * rm2.value + mom * m2
        rv2.value = (1 - mom) * rv2.value + mom * (v2 * unb)


class Down(nn.Module):
    """maxpool2 then DoubleConv (reference ``unet/unet_parts.py:27-38``)."""

    out_channels: int
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False
    fused_bn: bool = False
    conv_kernel: str = "xla"
    in_packed: bool = False         # input is width-pair packed (level 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool, valid=None) -> jnp.ndarray:
        x = max_pool_packed(x) if self.in_packed else max_pool(x, 2, 2)
        return DoubleConv(self.out_channels, dtype=self.dtype,
                          axis_name=self.axis_name, folded=self.folded,
                          fused_bn=self.fused_bn,
                          conv_kernel=self.conv_kernel,
                          name="conv")(x, train, valid)


class Deconv2x(nn.Module):
    """k2s2 transposed conv via XLA's native input-dilated convolution.

    out[n, 2i+p, 2j+q, o] = sum_c x[n, i, j, c] * W[c, p, q, o] + b[o]
    — identical to ``nn.ConvTranspose2d(cin, cout, 2, 2)``; the weight is
    the torch IOHW tensor transposed to (I, H, W, O).

    A conv over the 2x-dilated input with (1,1) pads computes
    out[t] = sum_k K[k] X[t+k-1], which hits x[i] at tap k = 1-p, so the
    kernel is passed spatially flipped.  Measured on v5e @640x360 b32 this
    formulation runs the whole flagship predict at 107 ms vs 123 ms for
    an einsum+depth-to-space expansion — the 6D interleave transposes of
    the latter cost ~11 ms/batch that XLA's deconv path avoids entirely
    (see scripts/bench_deconv_variants.py).
    """

    out_channels: int
    dtype: Any = jnp.float32
    # emit the width-pair-packed (N, 2H, W, 2Cout) form via the Pallas
    # parity-matmul kernel (ops/deconv_pallas) for the fused level-1 domain
    packed_out: bool = False
    # Pallas kernel with NATIVE output — for fused levels whose DoubleConv
    # consumes the plain layout but must not touch XLA's transposed conv
    native_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        cout = self.out_channels
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (cin, 2, 2, cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(cin * 4), (cout,), jnp.float32)
        if self.packed_out or self.native_pallas:
            from ..ops.deconv_pallas import deconv2x2_packed
            return deconv2x2_packed(x.astype(self.dtype), kernel, bias,
                                    None, self.native_pallas)
        k = kernel.transpose(1, 2, 0, 3)[::-1, ::-1].astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(1, 1),
            padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class Up(nn.Module):
    """Upsample x1, pad to match skip x2, concat, DoubleConv
    (reference ``unet/unet_parts.py:41-68``)."""

    out_channels: int
    bilinear: bool = False
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False
    fused_bn: bool = False
    conv_kernel: str = "xla"
    # fused level-1 packed domain: x2 (skip) arrives packed, the deconv
    # emits packed, and the DoubleConv runs concat-free on the pair
    packed_io: bool = False

    def _pallas_deconv(self, x1, x2, train: bool) -> bool:
        """Use the Pallas native-out deconv when this Up's DoubleConv will
        fuse — XLA's transposed conv would otherwise pin {3,0,2,1} onto
        the buffer the fused conv reads row-major (~40 ms relayout on the
        level-2 boundary, round-3 profile)."""
        if self.bilinear or self.is_initializing() \
                or self.conv_kernel != "pallas":
            return False
        from ..ops.deconv_pallas import supports_deconv_packed
        from ..ops.double_conv import (supports_double_conv,
                                       supports_double_conv_eval)
        cin = x1.shape[-1]
        if not supports_deconv_packed(x1.shape, cin // 2, self.dtype):
            return False
        n, h, w = x2.shape[0], x2.shape[1], x2.shape[2]
        if (h, w) != (2 * x1.shape[1], 2 * x1.shape[2]):
            return False          # skip-alignment pad breaks the pairing
        shape = (n, h, w, x2.shape[-1] + cin // 2)
        if train:
            return (self.axis_name is None
                    and supports_double_conv(shape, self.dtype,
                                             self.out_channels,
                                             self.out_channels))
        return supports_double_conv_eval(shape, self.dtype,
                                         self.out_channels,
                                         self.out_channels)

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool,
                 valid=None) -> jnp.ndarray:
        in_channels = x1.shape[-1]
        if self.packed_io:
            assert not self.bilinear
            x1p = Deconv2x(in_channels // 2, dtype=self.dtype,
                           packed_out=True, name="up")(x1)
            return DoubleConv(self.out_channels, dtype=self.dtype,
                              axis_name=self.axis_name, folded=self.folded,
                              conv_kernel=self.conv_kernel,
                              io="dual_packed", name="conv")((x2, x1p), train,
                                                             valid)
        if self.bilinear:
            x1 = upsample2x_bilinear(x1)
            mid = in_channels  # DoubleConv(mid=in_channels // 2) after concat
        else:
            x1 = Deconv2x(in_channels // 2, dtype=self.dtype,
                          native_pallas=self._pallas_deconv(x1, x2, train),
                          name="up")(x1)
            mid = None

        # Align to skip resolution: F.pad([dx//2, dx-dx//2, dy//2, dy-dy//2])
        dy = x2.shape[1] - x1.shape[1]
        dx = x2.shape[2] - x1.shape[2]
        if dy or dx:
            x1 = jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2),
                              (dx // 2, dx - dx // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        if self.bilinear:
            return DoubleConv(self.out_channels, mid_channels=x.shape[-1] // 2,
                              dtype=self.dtype, axis_name=self.axis_name,
                              folded=self.folded, fused_bn=self.fused_bn,
                              conv_kernel=self.conv_kernel,
                              name="conv")(x, train, valid)
        return DoubleConv(self.out_channels, dtype=self.dtype,
                          axis_name=self.axis_name, folded=self.folded,
                          fused_bn=self.fused_bn,
                          conv_kernel=self.conv_kernel,
                          name="conv")(x, train, valid)


class OutConv(nn.Module):
    """1x1 projection head (reference ``unet/unet_parts.py:71-77``).

    ``in_packed``: the input is width-pair packed (N, H, W/2, 2Cin); the
    1x1 conv becomes a block-diagonal lane matmul and only the SMALL
    (2*out_channels-lane) logits pay the unpack reshape — never the
    64-channel level-1 activation.
    """

    out_channels: int
    dtype: Any = jnp.float32
    in_packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.in_packed:
            cin = x.shape[-1] // 2
            k, b = Conv1x1Params(self.out_channels, cin, name="conv")()
            w2d = k[0, 0].astype(self.dtype)          # (cin, cout)
            z = jnp.zeros_like(w2d)
            blk = jnp.concatenate(
                [jnp.concatenate([w2d, z], 1),
                 jnp.concatenate([z, w2d], 1)], 0)    # (2cin, 2cout)
            y = jnp.dot(x.astype(self.dtype), blk,
                        preferred_element_type=jnp.float32)
            y = (y + jnp.tile(b, 2)).astype(self.dtype)
            n, h, w2, co2 = y.shape
            return y.reshape(n, h, w2 * 2, co2 // 2)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       kernel_init=torch_conv_kernel_init,
                       bias_init=torch_bias_init(x.shape[-1]), name="conv")(x)


class UNet(nn.Module):
    """Full UNet: logits (+ optional UV) + bottleneck feature.

    Mirrors the layer stack the reference inlines into its Reconstructor
    (``models/reconstructor.py:66-79``): channels 64/128/256/512/1024
    (top halved when bilinear), 4 skip levels, 1x1 output heads.
    """

    mask_classes: int = 4
    bilinear: bool = False
    uv: bool = False
    dtype: Any = jnp.float32
    axis_name: Any = None
    folded: bool = False
    fused_bn: bool = False
    conv_kernel: str = "xla"

    def _packed_l1(self, x: jnp.ndarray, train: bool) -> bool:
        """Run level 1 as a closed width-pair-packed Pallas domain?

        Boundary relayouts are what the packed domain eliminates (round-3
        profile: ~30 ms per {3,0,2,1}<->row-major transpose on level-1
        buffers), so it only engages when EVERY piece is supported: the
        packed DoubleConv kernels (+ wgrad fit in train), the packed
        deconv, and even spatial dims for the maxpool/deconv pairing.
        """
        if self.bilinear or self.is_initializing():
            return False
        if self.conv_kernel != "pallas":
            return False
        from ..ops.deconv_pallas import supports_deconv_packed
        from ..ops.double_conv import (supports_double_conv,
                                       supports_double_conv_eval)
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        if h % 2 or w % 16:
            return False
        if not supports_deconv_packed((n, h // 2, w // 2, 128), 64,
                                      self.dtype):
            return False
        if train:
            return (self.axis_name is None
                    and supports_double_conv((n, h, w, 64), self.dtype))
        return supports_double_conv_eval((n, h, w, 64), self.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False, valid=None):
        factor = 2 if self.bilinear else 1
        # the packed Pallas domain computes unmasked BN moments — with a
        # valid mask (padded-tail masked BN) run the native XLA levels
        packed_l1 = self._packed_l1(x, train) and not (train and
                                                       valid is not None)
        common = dict(dtype=self.dtype, axis_name=self.axis_name,
                      folded=self.folded, fused_bn=self.fused_bn,
                      conv_kernel=self.conv_kernel)
        x1 = DoubleConv(64, io="stem_packed" if packed_l1 else "native",
                        name="inc", **common)(x, train, valid)
        x2 = Down(128, name="down1", in_packed=packed_l1,
                  **common)(x1, train, valid)
        x3 = Down(256, name="down2", **common)(x2, train, valid)
        x4 = Down(512, name="down3", **common)(x3, train, valid)
        x_top = Down(1024 // factor, name="down4", **common)(x4, train, valid)
        y = Up(512 // factor, self.bilinear, name="up1", **common)(x_top, x4,
                                                                   train, valid)
        y = Up(256 // factor, self.bilinear, name="up2", **common)(y, x3,
                                                                   train, valid)
        y = Up(128 // factor, self.bilinear, name="up3", **common)(y, x2,
                                                                   train, valid)
        y = Up(64, self.bilinear, name="up4", packed_io=packed_l1,
               **common)(y, x1, train, valid)
        logits = OutConv(self.mask_classes, dtype=self.dtype,
                         in_packed=packed_l1, name="outc")(y)
        uv = (OutConv(2, dtype=self.dtype, in_packed=packed_l1,
                      name="outuv")(y) if self.uv else None)
        return logits, x_top, uv
