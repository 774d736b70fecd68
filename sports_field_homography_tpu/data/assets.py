"""Device-constant loaders: court template image and points of interest.

Twins of reference ``utils/dataset.py:47-96`` returning NHWC host arrays:
the template is divided by ``num_classes`` (so warped values live in
[0, 1]) and batch-replicated; PoI are normalized to [-1, 1].
"""
from __future__ import annotations

import numpy as np
from PIL import Image

from ..geometry.court import load_court_poi

__all__ = ["open_court_template", "open_court_poi"]


def open_court_template(path: str, num_classes: int, size=None,
                        batch_size: int = 1) -> np.ndarray:
    """Load the court template as (B, H, W, 1) float32 in [0, 1].

    ``size`` is (W, H); NEAREST resize preserves the one-hot class labels
    (reference ``utils/dataset.py:47-61``).
    """
    template = Image.open(path)
    if size is not None:
        template = template.resize(tuple(size), resample=Image.NEAREST)
    arr = np.array(template).astype(np.float32) / float(num_classes)
    if arr.ndim == 3:           # tolerate RGB-saved templates: first channel
        arr = arr[..., 0]
    t = arr[None, :, :, None]
    # host numpy: callers device_put once; fetching device arrays back to
    # host is pathologically slow on tunneled runtimes
    return np.tile(t, (batch_size, 1, 1, 1))


def open_court_poi(path: str, batch_size: int = 1, normalize: bool = True,
                   homogeneous: bool = False) -> np.ndarray:
    """Load court PoI as (B, N, 2[,3]) float32 in [-1, 1]
    (reference ``utils/dataset.py:63-96``)."""
    points = load_court_poi(path, normalize=normalize, homogeneous=homogeneous)
    t = points.astype(np.float32)[None]
    return np.tile(t, (batch_size, 1, 1))
