"""Reconstructor: UNet segmentation + ResNet STN + homography warper.

Composition root of the framework — capability twin of the reference
``models/reconstructor.py:30-246`` re-designed as a flax module whose
forward is one fused, statically-shaped XLA program:

  * All resolution adaptation (``forward_unet``'s in/out interpolates,
    reference :132-158) resolves at trace time — mismatched sizes become
    matmul-resizes, matched sizes compile to nothing.
  * Output pruning: the reference returns a runtime-filtered dict; here the
    requested outputs are static config, so XLA dead-code-eliminates
    everything not requested (e.g. the warper when only theta is needed).
  * The consistency score fuses the warp with per-pixel cross-entropy.

Conventions: images NHWC in [0, 1]; theta (B, 1, 3, 3) maps frame->court
in normalized [-1, 1] coordinates; ``court_img`` is the (B, Ht, Wt, 1)
template scaled to [0, 1/classes..1]; ``court_poi`` is (B, N, 2) in [-1, 1].
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..geometry.homography import transform_poi
from ..geometry.warp import warp_homography, warp_homography_nearest_2pass
from ..ops.resize import resize_bilinear, resize_nearest
from .losses import cross_entropy_map
from .resnet import ResNetSTN, resnet_models
from .unet import UNet

__all__ = ["Input", "ReconstructorConfig", "Reconstructor"]


class Input(enum.Enum):
    """STN input selector (reference ``models/reconstructor.py:9-28``)."""

    IMG = 1
    MASK = 2
    IMG_AND_MASK = 3
    IMG_AND_MASK_AND_UV = 4

    @classmethod
    def parse(cls, value):
        if value is None:
            return None
        if isinstance(value, cls):
            return value
        mapping = {"img": cls.IMG, "mask": cls.MASK,
                   "img+mask": cls.IMG_AND_MASK,
                   "img+mask+uv": cls.IMG_AND_MASK_AND_UV}
        if value not in mapping:
            raise NotImplementedError(value)
        return mapping[value]


@dataclasses.dataclass(frozen=True)
class ReconstructorConfig:
    """Static model configuration (mirrors the reference ctor args,
    ``models/reconstructor.py:36-49``).  Sizes are (W, H) like the reference.
    """

    target_size: Tuple[int, int] = (640, 360)
    mask_classes: int = 4
    use_unet: bool = True
    unet_bilinear: bool = False
    unet_size: Tuple[int, int] = (640, 360)
    unet_uv: bool = False
    use_resnet: bool = True
    resnet_name: str = "resnet34"
    resnet_input: str = "img+mask"
    use_warper: bool = True
    warp_size: Tuple[int, int] = (640, 360)
    warp_with_nearest: bool = False
    # TPU fast path: two-pass aligned-gather nearest warp (see
    # geometry.warp.warp_homography_nearest_2pass). Off by default for
    # bit-parity with the reference sampler.
    fast_warp: bool = False
    # Nearest interval-warp kernel: "xla" (scan + fused one-hot matmul),
    # "pallas" (ops/warp_pallas — the one-hot never leaves VMEM), or
    # "auto" (measured policy; see _select_pallas_warp).  Bit-identical
    # outputs either way.
    warp_kernel: str = "auto"
    # Pallas fused train-mode BN+ReLU in the UNet (ops/bn_pallas):
    # f32-rounding-level equivalent to the XLA path (reduction order
    # differs), inactive at eval and under sync-BN.
    fused_bn: bool = False
    # UNet DoubleConv execution: "xla", "pallas" (fused train-mode Pallas
    # DoubleConv, ops/double_conv — batch on the grid, BN fused into the
    # convs), or "auto" (measured policy, see _select_pallas_conv).
    conv_kernel: str = "auto"

    def __post_init__(self):
        assert self.warp_kernel in ("auto", "xla", "pallas"), self.warp_kernel
        assert self.conv_kernel in ("auto", "xla", "pallas"), self.conv_kernel
        assert self.use_unet or self.use_resnet
        mode = Input.parse(self.resnet_input)
        if self.use_resnet:
            assert mode is not None
            if mode in (Input.MASK, Input.IMG_AND_MASK, Input.IMG_AND_MASK_AND_UV):
                assert self.use_unet
            if mode == Input.IMG_AND_MASK_AND_UV:
                assert self.unet_uv

    @property
    def stn_in_channels(self) -> int:
        mode = Input.parse(self.resnet_input)
        return {Input.IMG: 3, Input.MASK: self.mask_classes,
                Input.IMG_AND_MASK: self.mask_classes + 3,
                Input.IMG_AND_MASK_AND_UV: self.mask_classes + 5}[mode]


def _match_batch(const: jnp.ndarray, n) -> jnp.ndarray:
    """Slice a batch-replicated court constant to the live batch size.

    Batch-1 constants pass through unsliced and broadcast downstream —
    this is what makes the model exportable with a SYMBOLIC batch
    dimension (compat/serving ``poly_batch``): ``const[:n]`` with a
    symbolic ``n`` cannot be proven in-bounds against a fixed-size
    constant, but shape-(1, ...) constants broadcast against any ``n``.
    """
    return const if const.shape[0] == 1 else const[:n]


def _select_pallas_conv(kernel: str) -> str:
    """Static DoubleConv kernel choice.  "auto" currently resolves to the
    XLA path; flip after the fused train-step measurement lands (the fused
    path is train-only and shape-gated inside DoubleConv either way)."""
    if kernel == "pallas":
        return "pallas"
    return "xla"


def _select_pallas_warp(kernel: str) -> bool:
    """Static (trace-time) kernel choice for the nearest interval warp.

    Measured in full predict programs on v5e (scripts/bench_warp_variants.py,
    2026-08-16): XLA's fused one-hot formulation wins in every current
    program context — 109.5 vs 130.4 ms (640x360 b32), 44.9 vs 64.6 ms
    (1280x720 b8), 164.4 vs 228.8 ms (1280x720 b32) — because the round-1
    consistency-subsample rework removed the context where XLA materialized
    the one-hot to HBM (a 25x regression).  So "auto" selects XLA; the
    Pallas kernel (one-hot structurally confined to VMEM) stays reachable
    via --warp_kernel pallas as the guaranteed-fusion fallback if a future
    program shape re-triggers the materialization.
    """
    if kernel == "pallas":
        return True
    return False


class Reconstructor(nn.Module):
    config: ReconstructorConfig
    dtype: Any = jnp.float32
    # mesh axis for cross-replica (sync) BatchNorm under shard_map DP
    bn_axis_name: Any = None
    # inference-only: BatchNorms were folded into conv weights
    # (ops.fold_bn.fold_batchnorm), so eval BN degenerates to x + bias
    bn_folded: bool = False

    def setup(self):
        cfg = self.config
        if cfg.use_unet:
            self.unet = UNet(mask_classes=cfg.mask_classes,
                             bilinear=cfg.unet_bilinear, uv=cfg.unet_uv,
                             dtype=self.dtype, axis_name=self.bn_axis_name,
                             folded=self.bn_folded, fused_bn=cfg.fused_bn,
                             conv_kernel=_select_pallas_conv(cfg.conv_kernel))
        if cfg.use_resnet:
            spec = resnet_models[cfg.resnet_name]
            self.resnet_reg = ResNetSTN(dtype=self.dtype,
                                        axis_name=self.bn_axis_name,
                                        folded=self.bn_folded, **spec)

    # ---- submodule forwards -------------------------------------------------

    def forward_unet(self, x: jnp.ndarray, train: bool, bn_valid=None):
        """UNet with in/out resolution fitting (reference :132-158)."""
        cfg = self.config
        uw, uh = cfg.unet_size
        if x.shape[2] != uw or x.shape[1] != uh:
            x = resize_bilinear(x, (uh, uw), align_corners=False)
        logits, x_top, uv = self.unet(x, train, bn_valid)
        tw, th = cfg.target_size
        if logits.shape[2] != tw or logits.shape[1] != th:
            logits = resize_nearest(logits, (th, tw))
        if uv is not None and (uv.shape[2] != tw or uv.shape[1] != th):
            uv = resize_nearest(uv, (th, tw))
        return logits, x_top, uv

    def _stn_input(self, x, logits, uv):
        mode = Input.parse(self.config.resnet_input)
        if mode == Input.IMG:
            return x
        if mode == Input.MASK:
            return logits
        if mode == Input.IMG_AND_MASK:
            return jnp.concatenate([logits, x], axis=-1)
        if mode == Input.IMG_AND_MASK_AND_UV:
            return jnp.concatenate([logits, x, uv], axis=-1)
        raise NotImplementedError

    def warp(self, theta: jnp.ndarray, court_img: jnp.ndarray,
             nearest: Optional[bool] = None, warp_table=None) -> jnp.ndarray:
        """Warp the court template by predicted theta (reference :109-118).

        Returns (B, H, W) like the reference's ``squeeze(1)``.
        """
        cfg = self.config
        bs = theta.shape[0]
        template = _match_batch(court_img, bs)
        mode = "nearest" if (cfg.warp_with_nearest if nearest is None else nearest) \
            else "bilinear"
        w, h = cfg.warp_size
        if warp_table is not None:
            # gather-free interval warps (ops/interval_warp); bit-exact vs
            # the gather sampler, built host-side from the same template
            from ..ops.interval_warp import (warp_bilinear_interval,
                                             warp_nearest_interval)
            if mode == "nearest":
                if _select_pallas_warp(cfg.warp_kernel):
                    from ..ops.warp_pallas import warp_nearest_interval_pallas
                    return warp_nearest_interval_pallas(warp_table, theta,
                                                        (h, w))
                return warp_nearest_interval(warp_table, theta, (h, w))
            return warp_bilinear_interval(warp_table, theta, (h, w))
        src = template.astype(jnp.float32)
        if src.shape[0] == 1:
            # batch-1 court constant (poly-batch export): broadcast to the
            # live batch for the gather samplers (the interval warps above
            # are template-batch-free already)
            src = jnp.broadcast_to(src, (bs,) + src.shape[1:])
        if mode == "nearest" and cfg.fast_warp:
            out = warp_homography_nearest_2pass(src, theta, (h, w))
        else:
            out = warp_homography(src, theta, (h, w), mode=mode)
        return out[..., 0]

    # ---- public entry points ------------------------------------------------

    def __call__(self, x: jnp.ndarray, court_img: jnp.ndarray,
                 court_poi: jnp.ndarray, train: bool = False,
                 warp_table=None, bn_valid=None) -> dict:
        """Training/eval forward (reference ``forward``, :160-194).

        ``bn_valid``: optional (B,) 0/1 mask — train-mode BatchNorm batch
        moments count only valid samples, so a replica-padded tail batch
        normalizes exactly like the reference's smaller true tail batch
        (``/root/reference/train.py:33-36``; see ``layers.batch_norm_apply``).
        """
        cfg = self.config
        ret = {}
        logits = uv = None
        if cfg.use_unet:
            logits, _, uv = self.forward_unet(x, train, bn_valid)
            ret["logits"] = logits
            if uv is not None:
                ret["uv"] = uv
        if cfg.use_resnet:
            y = self._stn_input(x, logits, uv)
            theta = self.resnet_reg(y, train, bn_valid)
            ret["theta"] = theta
            ret["poi"] = transform_poi(
                theta, _match_batch(court_poi, theta.shape[0]))
            if cfg.use_warper:
                # training uses bilinear: nearest is flagged buggy in the
                # reference during training (models/reconstructor.py:104-105)
                ret["warp_mask"] = self.warp(theta, court_img,
                                             warp_table=warp_table)
        return ret

    def predict(self, x: jnp.ndarray, court_img: jnp.ndarray,
                court_poi: jnp.ndarray, consistency: bool = True,
                project_poi: bool = False, warp_table=None,
                score_from_warp_mask: bool = False) -> dict:
        """Inference forward (reference ``predict``, :196-246).

        ``warp_mask`` is returned as int32 class labels (template values *
        mask_classes) and ``consist_score`` is the per-sample mean per-pixel
        cross entropy between UNet logits and the warped labels.

        ``score_from_warp_mask``: when the caller KEEPS the full-res
        ``warp_mask`` (so it cannot be dead-code-eliminated anyway), derive
        the consistency labels from it by nearest resize — bit-equal to the
        fused subsampled-grid warp, but sharing the one full-res warp
        instead of running a second warp at the logits grid.
        """
        cfg = self.config
        ret = {}
        logits = None
        if cfg.use_unet:
            logits, _, _ = self.forward_unet(x, train=False)
            ret["logits"] = logits
        if cfg.use_resnet:
            y = self._stn_input(x, logits, None)
            theta = self.resnet_reg(y, train=False)
            ret["theta"] = theta
            if cfg.use_warper:
                warp_mask = self.warp(theta, court_img,
                                      warp_table=warp_table) * cfg.mask_classes
                if consistency and cfg.use_unet:
                    if (logits.shape[1:3] != warp_mask.shape[1:3]
                            and score_from_warp_mask):
                        wm = resize_nearest(warp_mask[..., None],
                                            logits.shape[1:3])[..., 0]
                    elif (logits.shape[1:3] != warp_mask.shape[1:3]
                            and warp_table is not None):
                        # fuse the nearest downsample into the warp grid:
                        # bit-equal to resize_nearest(warp_mask), and it
                        # decouples the score from the full-res warp so XLA
                        # can DCE it when warp_mask isn't requested
                        from ..ops.interval_warp import warp_nearest_interval
                        w_, h_ = cfg.warp_size
                        wm = warp_nearest_interval(
                            warp_table, theta, (h_, w_),
                            sample_hw=logits.shape[1:3]) * cfg.mask_classes
                    elif logits.shape[1:3] != warp_mask.shape[1:3]:
                        wm = resize_nearest(warp_mask[..., None],
                                            logits.shape[1:3])[..., 0]
                    else:
                        wm = warp_mask
                    labels = wm.astype(jnp.int32)
                    scores = cross_entropy_map(logits, labels)
                    ret["consist_score"] = jnp.mean(scores, axis=(1, 2))
                ret["warp_mask"] = warp_mask.astype(jnp.int32)
            if project_poi:
                ret["poi"] = transform_poi(
                    theta, _match_batch(court_poi, theta.shape[0]))
        return ret
