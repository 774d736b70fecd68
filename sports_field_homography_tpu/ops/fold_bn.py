"""Inference-time BatchNorm folding.

Folds eval-mode BatchNorm (running stats) into the preceding conv /
deconv weights:

    y = (conv(x) + b - mean) * gamma / sqrt(var + eps) + beta
      =  conv'(x) + b'      with  W' = W * s,  b' = (b - mean) * s + beta,
                                  s  = gamma / sqrt(var + eps)

and resets the BN parameters to an exact no-op (scale=1, bias=0, mean=0,
var=1-eps), so the same model graph runs with identical results but the
normalization multiplies/adds disappear from the hot path.  Valid only
for inference (train=True would update the neutralized stats).

Covers every conv->BN pair in the UNet (DoubleConv conv1/bn1, conv2/bn2)
and ResNetSTN (conv0/bn1, block conv{1,2,3}/bn{1,2,3}, downsample).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["fold_batchnorm"]

_EPS = 1e-5

# (conv child, bn child) pairs by parent-node shape
_PAIRS = [
    ("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
    ("conv0", "bn1"),
    ("downsample_conv", "downsample_bn"),
]


def _fold_pair(params_node: Dict, stats_node: Dict, conv: str, bn: str):
    p_conv = params_node[conv]
    p_bn = params_node[bn]
    s_bn = stats_node[bn]
    scale = np.asarray(p_bn["scale"], np.float64)
    bias = np.asarray(p_bn["bias"], np.float64)
    mean = np.asarray(s_bn["mean"], np.float64)
    var = np.asarray(s_bn["var"], np.float64)
    s = scale / np.sqrt(var + _EPS)

    kernel = np.asarray(p_conv["kernel"], np.float64)
    new_kernel = (kernel * s).astype(np.float32)      # broadcast over out-ch

    if "bias" in p_conv:
        b = np.asarray(p_conv["bias"], np.float64)
        new_bias = ((b - mean) * s + bias).astype(np.float32)
        params_node[conv] = dict(p_conv, kernel=new_kernel, bias=new_bias)
        bn_bias = np.zeros_like(bias, dtype=np.float32)
    else:
        # bias-free conv (ResNet): the additive term stays in the BN,
        # which degenerates to a single per-channel add.
        params_node[conv] = dict(p_conv, kernel=new_kernel)
        bn_bias = (bias - mean * s).astype(np.float32)

    params_node[bn] = {"scale": np.ones_like(scale, dtype=np.float32),
                       "bias": bn_bias}
    stats_node[bn] = {"mean": np.zeros_like(mean, dtype=np.float32),
                      "var": np.full_like(var, 1.0 - _EPS, dtype=np.float32)}


def _walk(params_node: Dict, stats_node: Dict):
    if not isinstance(params_node, dict):
        return
    for conv, bn in _PAIRS:
        if (conv in params_node and bn in params_node
                and isinstance(stats_node, dict) and bn in stats_node
                and "kernel" in params_node.get(conv, {})):
            _fold_pair(params_node, stats_node, conv, bn)
    for k, v in params_node.items():
        if isinstance(v, dict):
            _walk(v, stats_node.get(k, {}) if isinstance(stats_node, dict) else {})


def fold_batchnorm(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new variables pytree with conv->BN pairs folded.

    Input/output layout: {"params": ..., "batch_stats": ...} as produced by
    ``Reconstructor.init`` / the checkpoint loaders.
    """
    import jax

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    # deep-copy dict structure (tree.map keeps dicts fresh already)
    _walk(params, stats)
    return {"params": params, "batch_stats": stats}
