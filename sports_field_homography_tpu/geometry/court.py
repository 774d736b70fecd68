"""Court constants, template/PoI loaders and per-frame homography mapping.

Host-side (numpy) twins of the reference's ``utils/court.py`` and the
frame<->court mapping helpers of ``utils/transform.py:23-51``.  These are
I/O + bookkeeping utilities, deliberately kept off the jit path.
"""
from __future__ import annotations

import json

import numpy as np

__all__ = [
    "Warper",
    "CourtSizes",
    "FrameMapping",
    "CourtMapping",
    "load_court_mask",
    "load_court_poi",
    "generate_uv_template",
    "transform_poi_np",
    "map_frame_to_court",
    "map_court_to_frame",
]


class CourtSizes:
    """Court dimension constants (reference ``utils/court.py:6-17``)."""

    COURT_IN_PIXELS = (1280, 720)
    FRAME_IN_PIXELS = (1280, 720)
    COURT_IN_METERS = (32.2326, 17.145)
    METERS2FEET = 3.28084
    METERS2PIXELS = (COURT_IN_PIXELS[0] / COURT_IN_METERS[0],
                     COURT_IN_PIXELS[1] / COURT_IN_METERS[1])
    PIXELS2METERS = (COURT_IN_METERS[0] / COURT_IN_PIXELS[0],
                     COURT_IN_METERS[1] / COURT_IN_PIXELS[1])


class FrameMapping:
    """Per-frame homographies + prediction score."""

    def __init__(self, theta_f2c: np.ndarray, theta_c2f: np.ndarray, score: float):
        self.theta_f2c = theta_f2c      # frame -> court
        self.theta_c2f = theta_c2f      # court -> frame
        self.score = score


class CourtMapping:
    """Parses a ``{game}_court.json`` prediction file into per-frame thetas.

    Reference ``utils/court.py:20-53``.
    """

    def __init__(self, path: str):
        with open(path, "r") as f:
            raw = json.load(f)
        self.frames = {}
        if "model" in raw:
            model_name = raw.pop("model")
            print("Court homography was predicted by the {} model".format(model_name))
        for frame_id, data in raw.items():
            score = float(data["score"])
            theta_f2c = np.array(data["theta"])[0]
            theta_c2f = np.linalg.inv(theta_f2c)
            self.frames[frame_id] = FrameMapping(theta_f2c, theta_c2f, score)


def load_court_mask(path: str, court_size, inter=None) -> np.ndarray:
    """Load + resize a court template image (reference ``utils/court.py:56-67``)."""
    import cv2

    court_mask = cv2.imread(path, cv2.IMREAD_COLOR)
    if court_mask.shape[0] != court_size[1] or court_mask.shape[1] != court_size[0]:
        if inter is None:
            inter = cv2.INTER_AREA if court_mask.shape[1] > court_size[0] else cv2.INTER_CUBIC
        court_mask = cv2.resize(court_mask, tuple(court_size), interpolation=inter)
    return court_mask


def load_court_poi(path: str, normalize: bool = True,
                   homogeneous: bool = False) -> np.ndarray:
    """Load court points of interest from JSON (reference ``utils/court.py:70-99``).

    The JSON stores points in [0, 1]; ``normalize`` maps them to [-1, 1].
    """
    with open(path) as f:
        try:
            points_data = json.load(f)
            points_raw = points_data["points"]
            ranges = points_data["ranges"]
            assert ranges[0] == 1.0 and ranges[1] == 1.0
            points = []
            for p in points_raw:
                if normalize:
                    x, y = (p["coords"][0] - 0.5) * 2, (p["coords"][1] - 0.5) * 2
                else:
                    x, y = p["coords"][0], p["coords"][1]
                points.append((x, y, 1.0) if homogeneous else (x, y))
            return np.array(points)
        except Exception as e:  # noqa: BLE001 - match reference error surface
            raise ValueError(f"Cannot read {path}: {str(e)}")


def generate_uv_template(size, dtype=np.float32, x_offset=(0, 0), y_offset=(0, 0)):
    """Generate a (u, v) coordinate-ramp template pair of shape (H, W).

    Behavior matches reference ``utils/court.py:102-129``: float dtypes ramp
    (1/N .. 1], integer dtypes ramp [1 .. N]; pixels outside the
    offset-trimmed interior are zeroed (the per-axis offsets trim
    ``offset[0]`` leading and ``offset[1] + 1`` trailing pixels).
    """
    w, h = int(size[0]), int(size[1])
    dt = np.dtype(dtype)
    if dt.kind == "f":
        u_ramp = np.linspace(1.0 / w, 1.0, num=w, dtype=dt)
        v_ramp = np.linspace(1.0 / h, 1.0, num=h, dtype=dt)
    elif dt in (np.dtype(np.uint16), np.dtype(np.int16)):
        u_ramp = np.linspace(1, w, num=w, dtype=dt)
        v_ramp = np.linspace(1, h, num=h, dtype=dt)
    else:
        raise NotImplementedError(dt)

    col_keep = np.zeros(w, bool)
    col_keep[x_offset[0]:w - x_offset[1] - 1] = True
    row_keep = np.zeros(h, bool)
    row_keep[y_offset[0]:h - y_offset[1] - 1] = True
    keep = row_keep[:, None] & col_keep[None, :]
    u = np.where(keep, u_ramp[None, :], 0).astype(dt)
    v = np.where(keep, v_ramp[:, None], 0).astype(dt)
    return u, v


def transform_poi_np(theta: np.ndarray, poi: np.ndarray,
                     normalize: bool = False) -> np.ndarray:
    """Numpy perspective transform of 2D points (reference ``utils/transform.py:23-30``)."""
    pts = np.asarray(poi, dtype=np.float64)
    ones = np.ones((pts.shape[0], 1), dtype=pts.dtype)
    ph = np.concatenate([pts, ones], axis=1)
    out = ph @ np.asarray(theta, dtype=pts.dtype).T
    proj = out[:, :2] / out[:, 2:3]
    if normalize:
        proj = proj / 2.0 + 0.5
    return proj


def map_frame_to_court(theta_f2c, frame_loc, frame_size=None):
    """Map frame pixel locations to [0, 1] court coordinates
    (reference ``utils/transform.py:33-41``)."""
    if not isinstance(frame_loc, np.ndarray):
        frame_loc = np.array([frame_loc], dtype=np.float32)
    frame_loc = frame_loc.astype(np.float64, copy=True)
    if frame_size is not None:
        frame_loc[:, 0] = (frame_loc[:, 0] / frame_size[0] - 0.5) * 2.0
        frame_loc[:, 1] = (frame_loc[:, 1] / frame_size[1] - 0.5) * 2.0
    return transform_poi_np(theta_f2c, frame_loc, normalize=True)


def map_court_to_frame(theta_c2f, court_loc, court_size=None):
    """Map court pixel locations to [0, 1] frame coordinates
    (reference ``utils/transform.py:44-51``)."""
    if not isinstance(court_loc, np.ndarray):
        court_loc = np.array([court_loc], dtype=np.float32)
    court_loc = court_loc.astype(np.float64, copy=True)
    if court_size is not None:
        court_loc[:, 0] = (court_loc[:, 0] / court_size[0] - 0.5) * 2.0
        court_loc[:, 1] = (court_loc[:, 1] / court_size[1] - 0.5) * 2.0
    return transform_poi_np(theta_c2f, court_loc, normalize=True)


class Warper:
    """Numpy-facing nearest homography warper (reference ``utils/transform.py:7-20``).

    Wraps the jitted JAX warp for downstream host-side consumers: takes an
    (H, W, C) numpy projection image + a 3x3 numpy theta, returns numpy.
    """

    def __init__(self, size, cuda=None):  # `cuda` kept for API parity; unused
        self.size = tuple(size)           # (W, H)
        self._fn = None

    def warp(self, theta: np.ndarray, proj: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from .warp import warp_homography

        if self._fn is None:
            w, h = self.size

            @jax.jit
            def fn(img, th):
                return warp_homography(img, th, (h, w), mode="nearest")

            self._fn = fn
        img = jnp.asarray(np.asarray(proj, np.float32))[None]
        th = jnp.asarray(np.asarray(theta, np.float32))[None]
        return np.asarray(self._fn(img, th)[0])
