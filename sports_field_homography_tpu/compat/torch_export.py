"""Convert this framework's param pytrees to reference PyTorch checkpoints.

Inverse of :mod:`compat.torch_import`: walks the flax variable tree of
``models.Reconstructor`` and emits a flat ``state_dict`` with the
reference's key names (``inc.double_conv.0.weight``,
``resnet_reg.layer2.1.conv1.weight``, ... — the format its
``train.py:314-323`` saves and ``predict.py``/``test.py`` load), so
models trained here can be served by the reference stack (and
round-trip: ``convert_state_dict(export_state_dict(v)) == v``).

Layout conversions (inverse of torch_import):
  * conv kernel            HWIO          -> OIHW
  * conv-transpose kernel  (I, H, W, O)  -> IOHW
  * linear kernel          (in, out)     -> (out, in)
  * BatchNorm: scale->weight, bias->bias, batch_stats mean/var ->
    running_mean/running_var, plus ``num_batches_tracked`` zeros (torch
    BatchNorm state_dicts carry it; strict loads require the key).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["export_state_dict", "save_torch_checkpoint"]


def _get(tree, path):
    node = tree
    for p in path:
        if node is None or p not in node:
            return None
        node = node[p]
    return node


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _conv(out, variables, prefix_path, name):
    p = _get(variables, ("params",) + prefix_path)
    if p is None or "kernel" not in p:
        return
    out[name + ".weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        out[name + ".bias"] = _np(p["bias"])


def _bn(out, variables, prefix_path, name):
    p = _get(variables, ("params",) + prefix_path)
    s = _get(variables, ("batch_stats",) + prefix_path)
    if p is None:
        return
    out[name + ".weight"] = _np(p["scale"])
    out[name + ".bias"] = _np(p["bias"])
    if s is not None:
        out[name + ".running_mean"] = _np(s["mean"])
        out[name + ".running_var"] = _np(s["var"])
        out[name + ".num_batches_tracked"] = np.zeros((), np.int64)


def _double_conv(out, variables, prefix_path, name):
    """torch Sequential indices: 0=conv1, 1=bn1, 3=conv2, 4=bn2."""
    _conv(out, variables, prefix_path + ("conv1",), f"{name}.0")
    _bn(out, variables, prefix_path + ("bn1",), f"{name}.1")
    _conv(out, variables, prefix_path + ("conv2",), f"{name}.3")
    _bn(out, variables, prefix_path + ("bn2",), f"{name}.4")


def export_state_dict(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax ``{"params": ..., "batch_stats": ...}`` of
    ``models.Reconstructor`` -> reference-keyed flat dict of numpy arrays.
    """
    out: Dict[str, np.ndarray] = {}
    params = variables.get("params", {})

    if "unet" in params:
        u = ("unet",)
        _double_conv(out, variables, u + ("inc",), "inc.double_conv")
        for i in range(1, 5):
            _double_conv(out, variables, u + (f"down{i}", "conv"),
                         f"down{i}.maxpool_conv.1.double_conv")
        for i in range(1, 5):
            up = _get(variables, ("params",) + u + (f"up{i}", "up"))
            if up is not None:        # deconv path (unet_bilinear=False)
                out[f"up{i}.up.weight"] = \
                    _np(up["kernel"]).transpose(0, 3, 1, 2)
                out[f"up{i}.up.bias"] = _np(up["bias"])
            _double_conv(out, variables, u + (f"up{i}", "conv"),
                         f"up{i}.conv.double_conv")
        _conv(out, variables, u + ("outc", "conv"), "outc.conv")
        _conv(out, variables, u + ("outuv", "conv"), "outuv.conv")

    if "resnet_reg" in params:
        r = ("resnet_reg",)
        _conv(out, variables, r + ("conv0",), "resnet_reg.conv0")
        _bn(out, variables, r + ("bn1",), "resnet_reg.bn1")
        for fname in sorted(params["resnet_reg"]):
            if not fname.startswith("layer"):
                continue
            stage, bi = fname[len("layer"):].split("_")
            tname = f"resnet_reg.layer{stage}.{bi}"
            for ci in (1, 2, 3):
                _conv(out, variables, r + (fname, f"conv{ci}"),
                      f"{tname}.conv{ci}")
                _bn(out, variables, r + (fname, f"bn{ci}"), f"{tname}.bn{ci}")
            _conv(out, variables, r + (fname, "downsample_conv"),
                  f"{tname}.downsample.0")
            _bn(out, variables, r + (fname, "downsample_bn"),
                f"{tname}.downsample.1")
        reg = _get(variables, ("params",) + r + ("reg",))
        if reg is not None:
            out["resnet_reg.reg.weight"] = _np(reg["kernel"]).T
            out["resnet_reg.reg.bias"] = _np(reg["bias"])

    return out


def save_torch_checkpoint(path: str, variables: Dict):
    """Save flax Reconstructor variables as a reference-loadable ``.pth``.

    Tensors are saved float32 (the reference trains/loads fp32; our
    checkpoints may hold bf16 params).
    """
    import torch

    sd = export_state_dict(variables)
    tensors = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if arr.dtype != np.int64:
            arr = arr.astype(np.float32)
        tensors[k] = torch.from_numpy(np.ascontiguousarray(arr))
    torch.save(tensors, path)
