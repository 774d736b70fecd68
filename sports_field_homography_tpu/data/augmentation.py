"""Training-time data augmentation (host-side numpy/PIL, torch-free).

Behavioral twin of reference ``utils/augmentation.py``: appearance
(color jitter + gaussian blur, torchvision semantics) and geometric
(RandomResizedCrop with fixed aspect + horizontal flip) streams, with the
mask/UV/PoI streams geometrically synchronized with the image stream.

Re-design note: the reference synchronizes streams by re-seeding torch's
global RNG before each stream (``utils/augmentation.py:254-278``).  Here a
single ``numpy.random.Generator`` draws every random parameter *once* per
sample and the same parameters are applied to image, mask, UV and PoI —
same behavior, no global-state tricks, and trivially safe to parallelize
across loader workers.

UV flip additionally inverts the u channel (u -> 1-u on court pixels),
and PoI flips go through the court symmetry index mapping — the hardcoded
28-pair NCAA table (reference :27-41) or a JSON-provided one (:208-216).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

__all__ = ["AugmentationPipeline", "ncaa_poi_flip_mapping", "load_poi_flip_mapping"]


def ncaa_poi_flip_mapping() -> np.ndarray:
    """Hardcoded NCAA court left/right PoI symmetry pairs
    (reference ``utils/augmentation.py:27-41``): mapping[i] = index of the
    mirrored point for the first 28 slots."""
    mapping = np.zeros(28, dtype=np.int64)
    for i in range(0, 4):
        mapping[i] = i
    for i in range(0, 4):
        mapping[4 + i] = 51 - i
    for i in range(0, 14):
        mapping[8 + i] = 45 - i
    for i in range(0, 2):
        mapping[22 + i] = 47 - i
    for i in range(0, 4):
        mapping[24 + i] = 31 - i
    return mapping


def load_poi_flip_mapping(path: str) -> np.ndarray:
    import json
    with open(path, "r") as f:
        data = json.load(f)
    return np.asarray(data["hflip"], dtype=np.int64)


def flip_poi(poi: np.ndarray, nonzeros: np.ndarray,
             mapping: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Mirror PoI horizontally and permute indices by the symmetry map
    (reference ``utils/augmentation.py:53-66``)."""
    t_poi = poi.copy()
    t_nonzeros = nonzeros.copy()
    for idx1 in range(mapping.shape[0]):
        idx2 = int(mapping[idx1])
        t_poi[idx1, 0] = 1.0 - poi[idx2, 0]
        t_poi[idx1, 1] = poi[idx2, 1]
        t_poi[idx2, 0] = 1.0 - poi[idx1, 0]
        t_poi[idx2, 1] = poi[idx1, 1]
        t_nonzeros[idx1] = nonzeros[idx2]
        t_nonzeros[idx2] = nonzeros[idx1]
    return t_poi, t_nonzeros


# ---------------- appearance ----------------

def _blend(a: np.ndarray, b, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


def _grayscale(img: np.ndarray) -> np.ndarray:
    # itu-r 601-2 luma, same as torchvision rgb_to_grayscale
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2])[..., None]


def _adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """Shift hue by ``factor`` (in turns, |factor| <= 0.5), RGB<->HSV."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = np.max(img, axis=-1)
    minc = np.min(img, axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    dz = np.maximum(delta, 1e-12)
    rc = (maxc - r) / dz
    gc = (maxc - g) / dz
    bc = (maxc - b) / dz
    h = np.where(r == maxc, bc - gc,
                 np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)

    h = (h + factor) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.stack([
        np.choose(i, [v, q, p, p, t, v]),
        np.choose(i, [t, v, v, q, p, p]),
        np.choose(i, [p, p, t, v, v, q]),
    ], axis=-1)
    return np.clip(out, 0.0, 1.0)


def _gaussian_blur(img: np.ndarray, kernel_size: int, sigma: float) -> np.ndarray:
    """Separable gaussian blur, reflect padding (torchvision semantics)."""
    half = kernel_size // 2
    xs = np.arange(kernel_size, dtype=np.float32) - half
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    pad = [(half, half), (0, 0), (0, 0)]
    out = np.pad(img, pad, mode="reflect")
    out = sum(k[i] * out[i:i + img.shape[0]] for i in range(kernel_size))
    pad = [(0, 0), (half, half), (0, 0)]
    out = np.pad(out, pad, mode="reflect")
    out = sum(k[i] * out[:, i:i + img.shape[1]] for i in range(kernel_size))
    return out.astype(img.dtype)


# ---------------- pipeline ----------------

class AugmentationPipeline:
    """Callable augmentation applying the reference's aug-config dict.

    ``aug`` layout (reference conf example):
      {'apperance': {'jitter': {...}, 'blur': k}, 'geometric':
       {'scale': [lo, hi], 'hflip': p, 'poi_flip_map': path}}
    """

    def __init__(self, aug: Dict, target_size: Tuple[int, int],
                 use_uv: bool = False):
        self.target_size = tuple(target_size)      # (W, H)
        self.use_uv = use_uv
        self.jitter = None
        self.blur = None
        self.scale = None
        self.hflip = None
        self.poi_mapping = None

        app = aug.get("apperance") if aug else None
        if app:
            if "jitter" in app:
                j = app["jitter"]
                self.jitter = dict(
                    brightness=j.get("brightness", 0.35),
                    contrast=j.get("contrast", 0.35),
                    saturation=j.get("saturation", 0.25),
                    hue=j.get("hue", 0.25))
            if "blur" in app:
                self.blur = int(app["blur"])
            assert self.jitter is not None or self.blur is not None, (
                "List of apperance transformations is empty. If you do not "
                "want any apperance transformations, set aug['apperance'] to None.")

        geo = aug.get("geometric") if aug else None
        if geo:
            if "scale" in geo:
                self.scale = tuple(geo["scale"])
            if "hflip" in geo:
                self.hflip = float(geo["hflip"])
            assert self.scale is not None or self.hflip is not None, (
                "List of geometric transformations is empty. If you do not "
                "want any geometric transformations, set aug['geometric'] to None.")
            if "poi_flip_map" in geo:
                self.poi_mapping = load_poi_flip_mapping(geo["poi_flip_map"])
            else:
                self.poi_mapping = ncaa_poi_flip_mapping()

    # -- appearance ---------------------------------------------------------

    def _apply_appearance(self, img: np.ndarray, rng: np.random.Generator):
        if self.jitter is not None:
            j = self.jitter
            ops = rng.permutation(4)
            for op in ops:
                if op == 0 and j["brightness"] > 0:
                    f = rng.uniform(max(0.0, 1 - j["brightness"]), 1 + j["brightness"])
                    img = np.clip(img * f, 0, 1)
                elif op == 1 and j["contrast"] > 0:
                    f = rng.uniform(max(0.0, 1 - j["contrast"]), 1 + j["contrast"])
                    img = _blend(img, _grayscale(img).mean(), f)
                elif op == 2 and j["saturation"] > 0:
                    f = rng.uniform(max(0.0, 1 - j["saturation"]), 1 + j["saturation"])
                    img = _blend(img, _grayscale(img), f)
                elif op == 3 and j["hue"] > 0:
                    f = rng.uniform(-j["hue"], j["hue"])
                    img = _adjust_hue(img, f)
        if self.blur is not None:
            sigma = rng.uniform(0.1, 2.0)     # torchvision GaussianBlur default
            img = _gaussian_blur(img, self.blur, sigma)
        return img

    # -- geometric ----------------------------------------------------------

    def _draw_crop(self, rng: np.random.Generator, w: int, h: int):
        """RandomResizedCrop parameters with a fixed aspect ratio
        (torchvision get_params with ratio=(r, r))."""
        area = w * h
        ratio = self.target_size[0] / float(self.target_size[1])
        for _ in range(10):
            target_area = area * rng.uniform(*self.scale)
            cw = int(round(np.sqrt(target_area * ratio)))
            ch = int(round(np.sqrt(target_area / ratio)))
            if 0 < cw <= w and 0 < ch <= h:
                top = rng.integers(0, h - ch + 1)
                left = rng.integers(0, w - cw + 1)
                return top, left, ch, cw
        # fallback: center crop at the valid aspect
        cw = min(w, int(round(h * ratio)))
        ch = min(h, int(round(cw / ratio)))
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    @staticmethod
    def _crop_resize(arr: np.ndarray, box, out_size, resample) -> np.ndarray:
        top, left, ch, cw = box
        crop = arr[top:top + ch, left:left + cw]
        if crop.ndim == 3 and crop.shape[-1] in (1, 2):
            chans = [Image.fromarray(crop[..., c]).resize(out_size, resample)
                     for c in range(crop.shape[-1])]
            return np.stack([np.array(c) for c in chans], axis=-1)
        pil = Image.fromarray(
            (crop * 255).astype(np.uint8) if crop.dtype in (np.float32, np.float64)
            and crop.ndim == 3 else crop)
        out = np.array(pil.resize(out_size, resample))
        if crop.dtype in (np.float32, np.float64) and crop.ndim == 3:
            out = out.astype(np.float32) / 255.0
        return out

    # -- entry point --------------------------------------------------------

    def __call__(self, img: np.ndarray, mask: Optional[np.ndarray],
                 uv: Optional[np.ndarray], poi: Optional[np.ndarray],
                 nonzeros: Optional[np.ndarray], seed: int):
        rng = np.random.default_rng(seed)
        if self.jitter is not None or self.blur is not None:
            img = self._apply_appearance(img, rng)

        if self.scale is not None:
            assert poi is None, \
                "PoI do not support RandomResizedCrop (reference parity: " \
                "make_points_transform raises NotImplementedError for 'scale')"
            h, w = img.shape[:2]
            box = self._draw_crop(rng, w, h)
            img = self._crop_resize(img, box, self.target_size, Image.BILINEAR)
            if mask is not None:
                mask = self._crop_resize(mask.astype(np.uint8), box,
                                         self.target_size,
                                         Image.NEAREST).astype(np.int64)
            if uv is not None:
                uv = self._crop_resize(uv, box, self.target_size, Image.NEAREST)

        if self.hflip is not None and rng.random() < self.hflip:
            img = img[:, ::-1].copy()
            if mask is not None:
                mask = mask[:, ::-1].copy()
            if uv is not None:
                uv = uv[:, ::-1].copy()
                # invert u on court pixels (reference UVHorizontalFlip :94-98)
                uv[..., 0] = (uv[..., 0] > 0).astype(uv.dtype) - uv[..., 0]
            if poi is not None:
                poi, nonzeros = flip_poi(poi, nonzeros, self.poi_mapping)

        return img, mask, uv, poi, nonzeros
