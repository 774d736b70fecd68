"""Host-side post-processing: logits -> labels, palettes, overlays.

Twin of reference ``utils/postprocess.py``.  ``preds_to_masks`` accepts the
device output (NHWC logits) and is vectorized; the palette application uses
a lookup table instead of the reference's per-color boolean scan.
"""
from __future__ import annotations

import numpy as np

__all__ = ["preds_to_masks", "onehot_to_image", "overlay", "draw_text",
           "CLASS_PALETTES"]

# id -> BGR color, per class count (reference utils/postprocess.py:30-51)
CLASS_PALETTES = {
    4: {1: (0, 255, 0), 2: (255, 0, 0), 3: (0, 0, 255)},
    7: {1: (0, 255, 0), 2: (255, 0, 0), 3: (0, 0, 255), 4: (255, 255, 255),
        5: (255, 0, 255), 6: (0, 255, 255)},
    8: {1: (0, 255, 0), 2: (255, 0, 0), 3: (0, 0, 255), 4: (255, 255, 255),
        5: (255, 0, 255), 6: (0, 255, 255), 7: (255, 255, 0)},
}


def preds_to_masks(preds, n_classes: int = 1, to_ndarray: bool = True):
    """Logits -> label masks (softmax/argmax; sigmoid when single-class).

    ``preds``: (B, H, W, C) array-like logits (device or host).
    Reference ``utils/postprocess.py:7-18``.
    """
    preds = np.asarray(preds)
    if n_classes > 1:
        masks = np.argmax(preds, axis=-1)
    else:
        masks = 1.0 / (1.0 + np.exp(-preds[..., 0]))
    if to_ndarray:
        masks = masks.astype(np.uint8)
    return masks


def onehot_to_image(masks, n_classes: int = 4) -> np.ndarray:
    """Grayscale label mask -> RGB image via the class palette
    (reference ``utils/postprocess.py:21-58``)."""
    masks = np.asarray(masks)
    if masks.ndim == 2:
        masks = masks[None]
    if n_classes not in CLASS_PALETTES:
        raise NotImplementedError(f"no palette for {n_classes} classes")
    lut = np.zeros((256, 3), dtype=np.uint8)
    for cid, color in CLASS_PALETTES[n_classes].items():
        lut[cid] = color
    return lut[masks.astype(np.uint8)]


def overlay(frame: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """50/50 blend of a colored mask over a frame; pixels where the mask is
    pure black keep the frame untouched (observable behavior of reference
    ``utils/postprocess.py:60-65``, pure numpy here)."""
    frame = np.asarray(frame)
    mask = np.asarray(mask)
    background = np.all(mask == 0, axis=-1, keepdims=True)
    blended = 0.5 * frame.astype(np.float32) + 0.5 * mask.astype(np.float32)
    out = np.where(background, frame.astype(np.float32), blended)
    return np.ascontiguousarray(out.astype(np.uint8))


def draw_text(img, text, pos, color=(255, 255, 255), scale=0.75, lineType=1,
              font=None):
    """Draw text on an image (reference ``utils/postprocess.py:67-71``)."""
    import cv2

    if font is None:
        font = cv2.FONT_HERSHEY_COMPLEX_SMALL
    cv2.putText(img, text, pos, font, scale, color, lineType)
