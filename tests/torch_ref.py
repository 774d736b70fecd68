"""Import helper for the PyTorch reference at /root/reference.

kornia is not installed in this image, so we register a minimal stub that
re-implements the three kornia entry points the reference uses, with
kornia-0.5 semantics (validated against torch.grid_sample in
test_geometry.py).  With the stub in place the reference's own
``Reconstructor`` imports and runs on CPU, giving us a true end-to-end
parity oracle.
"""
import sys
import types

import torch
import torch.nn.functional as F

REFERENCE_PATH = "/root/reference"


def _transform_points(trans, points, eps=1e-8):
    # kornia reshapes higher-rank transforms (e.g. (B,1,3,3)) down to (B,3,3)
    trans = trans.reshape(-1, trans.shape[-2], trans.shape[-1])
    points = points.reshape(-1, points.shape[-2], points.shape[-1])
    if trans.shape[0] != points.shape[0]:
        trans = trans.expand(points.shape[0], -1, -1)
    ones = torch.ones(*points.shape[:-1], 1, dtype=points.dtype)
    ph = torch.cat([points, ones], dim=-1)
    out = torch.einsum("bij,bnj->bni", trans, ph)
    z = out[..., 2:3]
    scale = torch.where(z.abs() > eps, 1.0 / (z + eps), torch.ones_like(z))
    return out[..., :2] * scale


class _HomographyWarper(torch.nn.Module):
    def __init__(self, height, width, mode="bilinear", padding_mode="zeros",
                 normalized_coordinates=True, align_corners=False):
        super().__init__()
        assert normalized_coordinates
        self.height, self.width = height, width
        self.mode, self.padding_mode = mode, padding_mode
        self.align_corners = align_corners
        xs = torch.linspace(-1, 1, width)
        ys = torch.linspace(-1, 1, height)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        # kornia 0.5 assigns the grid as a PLAIN attribute (not a
        # registered buffer), so it never appears in state_dicts — the
        # reference's strict load of train-time checkpoints into
        # differently-sized predict-time warpers depends on this.
        self.grid = torch.stack([gx, gy], -1).reshape(1, -1, 2)

    def forward(self, patch_src, src_homo_dst):
        if src_homo_dst.dim() == 4:
            src_homo_dst = src_homo_dst[:, 0]
        b = patch_src.shape[0]
        grid = self.grid.to(patch_src.dtype).expand(b, -1, -1)
        flow = _transform_points(src_homo_dst, grid)
        flow = flow.reshape(b, self.height, self.width, 2)
        return F.grid_sample(patch_src, flow, mode=self.mode,
                             padding_mode=self.padding_mode,
                             align_corners=self.align_corners)


class _FocalLoss(torch.nn.Module):
    """kornia 0.5 focal loss: -alpha * (1-p)^gamma * log(p), p = softmax+eps."""

    def __init__(self, alpha, gamma=2.0, reduction="none", eps=1e-8):
        super().__init__()
        self.alpha, self.gamma, self.reduction, self.eps = alpha, gamma, reduction, eps

    def forward(self, input, target):
        p = F.softmax(input, dim=1) + self.eps
        weight = torch.pow(1.0 - p, self.gamma)
        focal = -self.alpha * weight * torch.log(p)
        one_hot = F.one_hot(target, input.shape[1]).permute(0, 3, 1, 2).float()
        loss = torch.sum(one_hot * focal, dim=1)
        if self.reduction == "mean":
            return loss.mean()
        if self.reduction == "sum":
            return loss.sum()
        return loss


def install_kornia_stub():
    if "kornia" in sys.modules:
        return sys.modules["kornia"]
    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    transform = types.ModuleType("kornia.geometry.transform")
    linalg = types.ModuleType("kornia.geometry.linalg")
    losses = types.ModuleType("kornia.losses")
    transform.HomographyWarper = _HomographyWarper
    linalg.transform_points = _transform_points
    losses.FocalLoss = _FocalLoss
    geometry.transform = transform
    geometry.linalg = linalg
    kornia.geometry = geometry
    kornia.losses = losses
    kornia.HomographyWarper = _HomographyWarper
    for name, mod in [("kornia", kornia), ("kornia.geometry", geometry),
                      ("kornia.geometry.transform", transform),
                      ("kornia.geometry.linalg", linalg),
                      ("kornia.losses", losses)]:
        sys.modules[name] = mod
    return kornia


def import_reference():
    """Import the reference's models/unet packages (with kornia stubbed)."""
    install_kornia_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import models.reconstructor as ref_reconstructor  # noqa: F401
    import models.resnet as ref_resnet  # noqa: F401
    import unet.unet_parts as ref_unet_parts  # noqa: F401
    return ref_reconstructor, ref_resnet, ref_unet_parts
