"""Convert reference PyTorch checkpoints to this framework's param pytrees.

The reference saves flat ``state_dict``s (``train.py:314-323``) with names
like ``inc.double_conv.0.weight`` or ``resnet_reg.layer2.1.conv1.weight``.
This module maps them onto the flax variable tree of
``models.Reconstructor`` for parity testing and for serving reference-
trained weights on TPU.

Layout conversions:
  * conv weight            OIHW    -> HWIO
  * conv-transpose weight  IOHW    -> I,H,W,O (see ``models.unet.Deconv2x``)
  * linear weight          (out,in)-> (in,out)
  * BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats
    (``num_batches_tracked`` is dropped).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

__all__ = ["convert_state_dict", "load_torch_checkpoint",
           "convert_torchvision_resnet"]

_BN_KEYS = {"weight": ("params", "scale"), "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var")}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(out, prefix_path, sd, name):
    if name + ".weight" not in sd:      # tolerate partial state dicts
        return
    _set(out, ("params",) + prefix_path + ("kernel",),
         _to_np(sd[name + ".weight"]).transpose(2, 3, 1, 0))
    if name + ".bias" in sd:
        _set(out, ("params",) + prefix_path + ("bias",), _to_np(sd[name + ".bias"]))


def _bn(out, prefix_path, sd, name):
    for tk, (col, fk) in _BN_KEYS.items():
        key = f"{name}.{tk}"
        if key in sd:
            _set(out, (col,) + prefix_path + (fk,), _to_np(sd[key]))


def _double_conv(out, prefix_path, sd, name):
    """torch Sequential indices: 0=conv1, 1=bn1, 3=conv2, 4=bn2."""
    _conv(out, prefix_path + ("conv1",), sd, f"{name}.0")
    _bn(out, prefix_path + ("bn1",), sd, f"{name}.1")
    _conv(out, prefix_path + ("conv2",), sd, f"{name}.3")
    _bn(out, prefix_path + ("bn2",), sd, f"{name}.4")


def convert_state_dict(sd: Mapping[str, "object"],
                       unet_bilinear: bool = False) -> Dict:
    """Convert a reference Reconstructor state_dict to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching
    ``models.Reconstructor`` with submodules ``unet`` / ``resnet_reg``.
    """
    out: Dict = {"params": {}, "batch_stats": {}}
    has_unet = any(k.startswith("inc.") for k in sd)
    has_resnet = any(k.startswith("resnet_reg.") for k in sd)

    if has_unet:
        u = ("unet",)
        _double_conv(out, u + ("inc",), sd, "inc.double_conv")
        for i in range(1, 5):
            _double_conv(out, u + (f"down{i}", "conv"), sd,
                         f"down{i}.maxpool_conv.1.double_conv")
        for i in range(1, 5):
            if not unet_bilinear and f"up{i}.up.weight" in sd:
                w = _to_np(sd[f"up{i}.up.weight"])     # (I, O, 2, 2)
                _set(out, ("params",) + u + (f"up{i}", "up", "kernel"),
                     w.transpose(0, 2, 3, 1))
                _set(out, ("params",) + u + (f"up{i}", "up", "bias"),
                     _to_np(sd[f"up{i}.up.bias"]))
            _double_conv(out, u + (f"up{i}", "conv"), sd, f"up{i}.conv.double_conv")
        _conv(out, u + ("outc", "conv"), sd, "outc.conv")
        if "outuv.conv.weight" in sd:
            _conv(out, u + ("outuv", "conv"), sd, "outuv.conv")

    if has_resnet:
        r = ("resnet_reg",)
        _conv(out, r + ("conv0",), sd, "resnet_reg.conv0")
        _bn(out, r + ("bn1",), sd, "resnet_reg.bn1")
        for stage in range(1, 5):
            bi = 0
            while f"resnet_reg.layer{stage}.{bi}.conv1.weight" in sd:
                tname = f"resnet_reg.layer{stage}.{bi}"
                fname = f"layer{stage}_{bi}"
                for ci in (1, 2, 3):
                    if f"{tname}.conv{ci}.weight" in sd:
                        _conv(out, r + (fname, f"conv{ci}"), sd, f"{tname}.conv{ci}")
                        _bn(out, r + (fname, f"bn{ci}"), sd, f"{tname}.bn{ci}")
                if f"{tname}.downsample.0.weight" in sd:
                    _conv(out, r + (fname, "downsample_conv"), sd, f"{tname}.downsample.0")
                    _bn(out, r + (fname, "downsample_bn"), sd, f"{tname}.downsample.1")
                bi += 1
        if "resnet_reg.reg.weight" in sd:   # absent in warm-start dicts
            _set(out, ("params",) + r + ("reg", "kernel"),
                 _to_np(sd["resnet_reg.reg.weight"]).T)
            _set(out, ("params",) + r + ("reg", "bias"),
                 _to_np(sd["resnet_reg.reg.bias"]))

    return out


def load_torch_checkpoint(path: str, unet_bilinear: bool = False) -> Dict:
    """Load a reference ``.pth`` checkpoint into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(sd, unet_bilinear=unet_bilinear)


def convert_torchvision_resnet(sd: Mapping[str, "object"]) -> Dict:
    """Convert a *torchvision* ResNet state_dict for STN warm-starting.

    The reference warm-starts its STN from torchvision weights with
    ``strict=False`` (``models/resnet.py:265-270``): torchvision's
    ``conv1`` and ``fc`` don't match its ``conv0``/``reg`` and are
    dropped; everything else loads.  We reproduce that: remap keys into
    the reference naming (``resnet_reg.*``), drop ``fc``, and skip
    ``conv1`` (its in-channels rarely match the STN input).
    """
    remapped = {}
    for k, v in sd.items():
        if k.startswith("fc.") or k.startswith("conv1."):
            continue
        remapped["resnet_reg." + k] = v
    return convert_state_dict(remapped)


# Public torchvision weight URLs (the table the reference carries in
# ``models/resnet.py:13-23``); used when --resnet_pretrained names a
# variant instead of a local file.
TORCHVISION_URLS = {
    "resnet18": "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-333f7ec4.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-19c8e357.pth",
    "resnet101": "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth",
    "resnet152": "https://download.pytorch.org/models/resnet152-b121ed2d.pth",
    "resnext50_32x4d":
        "https://download.pytorch.org/models/resnext50_32x4d-7cdf4587.pth",
    "resnext101_32x8d":
        "https://download.pytorch.org/models/resnext101_32x8d-8ba56ff5.pth",
    "wide_resnet50_2":
        "https://download.pytorch.org/models/wide_resnet50_2-95faca4d.pth",
    "wide_resnet101_2":
        "https://download.pytorch.org/models/wide_resnet101_2-32ee1156.pth",
}


def load_torchvision_resnet(source: str) -> Dict:
    """STN warm-start weights from a local torchvision ``.pth``, a variant
    name (``resnet34`` — resolved through ``TORCHVISION_URLS`` and fetched
    via torch.hub's cache), or a direct URL."""
    import torch

    url = TORCHVISION_URLS.get(source, source)
    if url.startswith(("http://", "https://")):
        try:
            sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
        except Exception as e:  # no network: actionable message
            raise RuntimeError(
                f"could not download torchvision weights from {url} "
                f"(offline?). Download the file manually and pass its "
                f"local path to --resnet_pretrained.") from e
    else:
        sd = torch.load(source, map_location="cpu", weights_only=True)
    return convert_torchvision_resnet(sd)
