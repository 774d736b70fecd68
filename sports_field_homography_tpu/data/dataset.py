"""Host-side datasets: image folders, annotated training samples, video.

Torch-free re-design of reference ``utils/dataset.py``.  Samples are plain
dicts of numpy arrays in NHWC / (H, W) layouts; batching, padding and
device transfer live in ``data/loader.py``.

Preprocessing parity notes (these decide theta parity end-to-end):
  * images: ``PIL.Image.resize(size)`` — PIL's default (bicubic) filter,
    exactly like reference ``utils/dataset.py:147``; then /255 float32.
  * masks: PIL NEAREST resize, int64 (reference :165).
  * video frames: cv2 INTER_AREA when downscaling else INTER_LINEAR
    (reference :316).
"""
from __future__ import annotations

import json
import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "split_on_train_val",
    "BasicDataset",
    "VideoDataset",
    "preprocess_img",
    "preprocess_mask",
    "preprocess_weight",
]

MAX_VALUE_UINT16 = np.iinfo(np.uint16).max


def split_on_train_val(img_dir: str, val_names: Sequence[str],
                       only_ncaam: bool = False) -> Tuple[List[str], List[str]]:
    """Split game sub-directories into train/val id lists
    (reference ``utils/dataset.py:26-45``)."""
    names = [n for n in os.listdir(img_dir)
             if os.path.isdir(os.path.join(img_dir, n))]
    train_ids: List[str] = []
    val_ids: List[str] = []
    for name in names:
        subdir = os.path.join(img_dir, name)
        ids = [os.path.join(name, f) for f in os.listdir(subdir)
               if not f.endswith(".")]
        if any(name == n for n in val_names):
            val_ids += ids
        else:
            if only_ncaam and name[0] == "2":
                print("Skip", name)
                continue
            train_ids += ids
    return train_ids, val_ids


def preprocess_img(pil_img: Image.Image, target_size,
                   normalize: bool = True) -> np.ndarray:
    """PIL image -> (H, W, C) float32 in [0, 1] (reference :145-161, NHWC)."""
    pil_img = pil_img.resize(tuple(target_size))
    arr = np.array(pil_img)
    if arr.ndim == 2:
        arr = arr[..., None]
    arr = arr.astype(np.float32)
    if normalize:
        arr = arr / 255.0
    return arr


def preprocess_mask(pil_mask: Image.Image, target_size) -> np.ndarray:
    """PIL mask -> (H, W) int64 labels, NEAREST resize (reference :163-169)."""
    pil_mask = pil_mask.resize(tuple(target_size), resample=Image.NEAREST)
    return np.array(pil_mask).astype(np.int64)


def preprocess_uv_mask(uv_mask: np.ndarray, target_size):
    """uint16 3-channel tiff -> (mask int64 (H,W), uv float32 (H,W,2))
    (reference :171-185)."""
    import cv2

    assert uv_mask.dtype == np.uint16
    uv_mask = cv2.resize(uv_mask, dsize=tuple(target_size),
                         interpolation=cv2.INTER_NEAREST)
    mask = uv_mask[:, :, 0].astype(np.int64)
    uv = (uv_mask[:, :, 1:3] / float(MAX_VALUE_UINT16)).astype(np.float32)
    return mask, uv


def preprocess_poi(np_poi: np.ndarray):
    """(N, 3) anno -> poi (N,2), nonzeros (N,), num_nonzero scalar
    (reference :187-194)."""
    anno = np.asarray(np_poi, dtype=np.float32)
    nonzeros = anno[:, 2]
    poi = anno[:, :2]
    num_nonzero = np.float32(np.count_nonzero(nonzeros))
    return poi, nonzeros, num_nonzero


def preprocess_weight(reproj_mse: float) -> np.ndarray:
    """Annotation-quality weight: shaped sigmoid of reprojection MSE
    (reference ``utils/dataset.py:196-209``)."""
    x = reproj_mse / 0.01
    x = x * 12 - 6
    x = x * 1.25 + 1
    y = 1 - 1 / (1 + np.exp(-x))
    return np.array([y], dtype=np.float32)


class BasicDataset:
    """Image(+mask+anno) dataset over game sub-directories
    (reference ``utils/dataset.py:99-293``).

    ``raw_uint8``: emit images as uint8 (normalization happens on device:
    ``u8/255`` in f32 is bit-identical and cuts host->device traffic 4x).
    With augmentation the float augmented image is rounded back to uint8
    (max rounding error 1/510 per pixel — the source frames are 8-bit, so
    only jitter/blur-created fractional values are quantized).
    """

    def __init__(self, ids: Sequence[str], img_dir: str,
                 mask_dir: Optional[str] = None, anno_dir: Optional[str] = None,
                 anno_keys: Optional[Sequence[str]] = None, num_classes: int = 1,
                 use_uv: bool = False, target_size=(1280, 720), aug=None,
                 keep_orig_img: bool = False, raw_uint8: bool = False,
                 aug_seed: Optional[int] = None):
        self.raw_uint8 = raw_uint8
        # deterministic augmentation: each sample's aug parameters derive
        # from (aug_seed, epoch, index) instead of the global numpy RNG —
        # immune to loader-thread scheduling, so same-seed augmented runs
        # (and exact mid-epoch resume) are bit-identical.  None keeps the
        # legacy global-RNG draw.  Loader.set_epoch forwards the epoch.
        self.aug_seed = aug_seed
        self._aug_epoch = 0
        assert (anno_dir is not None and anno_keys is not None) or anno_dir is None
        self.ids = list(ids)
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.anno_dir = anno_dir
        self.anno_keys = anno_keys
        self.num_classes = num_classes
        self.use_uv = use_uv
        self.target_size = tuple(target_size)
        self.keep_orig_img = keep_orig_img
        self.aug = None
        if aug is not None:
            from .augmentation import AugmentationPipeline
            self.aug = AugmentationPipeline(aug, self.target_size, use_uv=use_uv)

    def __len__(self) -> int:
        return len(self.ids)

    def set_epoch(self, epoch: int):
        """Epoch for the derived per-sample augmentation seed (no-op
        without ``aug_seed``)."""
        self._aug_epoch = int(epoch)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        name = self.ids[i]
        name_wo_ext = name[: name.rfind(".")]
        sample: Dict[str, np.ndarray] = {"name": name_wo_ext,
                                         "weight": np.float32(1.0)}

        img_file = glob(os.path.join(self.img_dir, name))
        anno_file = (glob(os.path.join(self.anno_dir, name_wo_ext + ".json"))
                     if self.anno_dir is not None else None)
        ext = ".tif" if self.use_uv else ".png"
        mask_file = (glob(os.path.join(self.mask_dir, name_wo_ext + ext))
                     if self.mask_dir is not None else None)

        assert len(img_file) == 1, \
            f"Either no image or multiple images found for the ID {name}: {img_file}"
        assert mask_file is None or len(mask_file) == 1, \
            f"Either no mask or multiple masks found for the ID {name_wo_ext + ext}: {mask_file}"
        assert anno_file is None or len(anno_file) == 1, \
            f"Either no json or multiple json found for the ID {name_wo_ext}.json: {anno_file}"

        orig_img = Image.open(img_file[0])
        # augmentation runs on the normalized float image; without it the
        # uint8 path skips the host-side /255 entirely
        normalize = not self.raw_uint8 or self.aug is not None
        img = preprocess_img(orig_img, self.target_size, normalize=normalize)
        if self.raw_uint8 and self.aug is None:
            img = img.astype(np.uint8)

        mask = uv = None
        if self.use_uv and mask_file is not None:
            import cv2
            uv_mask = cv2.imread(mask_file[0], -1)
            mask, uv = preprocess_uv_mask(uv_mask, self.target_size)
        elif mask_file is not None:
            mask = preprocess_mask(Image.open(mask_file[0]), self.target_size)

        poi = nonzeros = num_nonzero = None
        if anno_file is not None:
            with open(anno_file[0], "r") as f:
                json_data = json.load(f)
            for k in self.anno_keys:
                anno = np.asarray(json_data[k], dtype="float")
                if k == "poi":
                    poi, nonzeros, num_nonzero = preprocess_poi(anno)
                elif k == "reproj_mse":
                    sample["weight"] = preprocess_weight(anno)
                else:
                    sample[k] = anno.astype(np.float32)

        if self.aug is not None:
            if self.aug_seed is not None:
                seed = int(np.random.default_rng(
                    [int(self.aug_seed), self._aug_epoch, int(i)]
                ).integers(2147483647))
            else:
                # legacy: global-RNG draw — thread-schedule-dependent under
                # the loader's worker pool (nondeterministic across runs)
                seed = np.random.randint(2147483647)
            img, mask, uv, poi, nonzeros = self.aug(
                img, mask, uv, poi, nonzeros, seed=seed)
            if self.raw_uint8:
                img = np.clip(np.rint(img * 255.0), 0.0, 255.0).astype(np.uint8)

        sample["image"] = img
        if mask is not None:
            sample["mask"] = mask
        if uv is not None:
            sample["uv"] = uv
        if poi is not None:
            sample["poi"] = poi
            sample["nonzeros"] = nonzeros
            sample["num_nonzero"] = num_nonzero
        if self.keep_orig_img:
            import cv2
            sample["orig_img"] = cv2.cvtColor(np.array(orig_img), cv2.COLOR_RGB2BGR)
        return sample


class VideoDataset:
    """Sequential-read video dataset (reference ``utils/dataset.py:296-358``).

    ``__getitem__`` assumes in-order access (frames are read sequentially
    with a seek-and-retry fallback and a black-frame last resort).

    ``decode_workers > 1`` turns on parallel decode: the frame range is
    split into contiguous chunks, one decoder thread per chunk, each with
    its own ``cv2.VideoCapture`` seeked once to its chunk start.  Decoded
    (and preprocessed) frames land in a shared ordered buffer with a
    bounded decode-ahead window, so ``__getitem__`` stays correct under
    the Loader's concurrent in-order access.  Host decode is the
    reference pipeline's bottleneck hidden behind DataLoader workers
    (reference ``predict.py:219-226``); here it scales the same way
    without torch.
    """

    def __init__(self, path: str, target_size=(640, 360),
                 max_frames: Optional[int] = None, keep_orig_img: bool = False,
                 raw_uint8: bool = False, decode_workers: int = 1,
                 decode_ahead: int = 64):
        import cv2

        self.raw_uint8 = raw_uint8
        self.cap = None
        self.path = path
        self.target_size = tuple(target_size)
        self.keep_orig_img = keep_orig_img
        t = os.path.basename(path)
        self.name = t[: t.rfind(".")]
        num_frames = int(cv2.VideoCapture(self.path).get(cv2.CAP_PROP_FRAME_COUNT))
        self.num_frames = (min(num_frames, max_frames)
                           if max_frames is not None else num_frames)
        self.decode_workers = max(1, int(decode_workers))
        self.decode_ahead = max(self.decode_workers * 4, int(decode_ahead))
        self._pool = None
        self._range = (0, self.num_frames)

    def set_range(self, lo: int, hi: int):
        """Restrict consumption to frames ``[lo, hi)`` (multi-host predict
        shards).  The sequential capture pre-seeks to ``lo``; the decode
        pool (if enabled) chunks, buffers, and decode-ahead-windows only
        this range — without this the pool would cover ``[0, n)`` with
        ``next_needed = 0`` and a shard starting mid-video would deadlock
        against the decode-ahead window."""
        import cv2

        lo = max(0, min(int(lo), self.num_frames))
        hi = max(lo, min(int(hi), self.num_frames))
        assert self._pool is None, "set_range must precede first access"
        self._range = (lo, hi)
        if self.decode_workers == 1 and lo:
            if self.cap is not None:
                self.cap.release()
            self.cap = cv2.VideoCapture(self.path)
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, lo)

    def __len__(self) -> int:
        return self.num_frames

    @staticmethod
    def preprocess_frame(frame: np.ndarray, target_size,
                         normalize: bool = True) -> np.ndarray:
        import cv2

        target_w, target_h = target_size
        h, w = frame.shape[:2]
        if w != target_w or h != target_h:
            inter = cv2.INTER_AREA if w > target_w else cv2.INTER_LINEAR
            frame = cv2.resize(frame, (target_w, target_h), interpolation=inter)
        if frame.ndim == 2:
            frame = frame[..., None]
        frame = frame.astype(np.float32)
        if normalize:
            frame = frame / 255.0
        return frame

    def _read_with_fallback(self, cap, i: int) -> np.ndarray:
        """One sequential read with the reference's seek-retry + black-frame
        fallback (reference ``utils/dataset.py:330-344``)."""
        import cv2

        ret, frame = cap.read()
        if ret is False:
            cap.set(cv2.CAP_PROP_POS_FRAMES, i)
            ret, frame = cap.read()
            if ret is False:
                w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                frame = np.zeros((h, w, 3), dtype=np.uint8)
        return frame

    def _to_sample(self, frame: np.ndarray, i: int) -> Dict[str, np.ndarray]:
        img = self.preprocess_frame(frame, self.target_size,
                                    normalize=not self.raw_uint8)
        if self.raw_uint8:
            img = img.astype(np.uint8)
        sample = {"image": img, "name": self.name + "/" + str(i).zfill(6)}
        if self.keep_orig_img:
            sample["orig_img"] = frame
        return sample

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        import cv2

        if self.decode_workers > 1:
            if self._pool is None:
                self._pool = _VideoDecodePool(self)
            return self._pool.get(i)
        if self.cap is None:
            self.cap = cv2.VideoCapture(self.path)
        frame = self._read_with_fallback(self.cap, i)
        return self._to_sample(frame, i)

    def close(self):
        if self.cap is not None:
            self.cap.release()
            self.cap = None
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def __del__(self):
        self.close()


class _VideoDecodePool:
    """Chunked multi-capture decoder behind ``VideoDataset.__getitem__``.

    Each worker owns frames [w*chunk, min((w+1)*chunk, n)), seeks its own
    capture once, then reads sequentially — seeks are what make random
    access slow, so each worker pays exactly one.  Decoded samples are
    published to an ordered dict under a condition variable; each worker
    stalls once it has ``decode_ahead / workers`` of its own frames
    buffered unconsumed, so every chunk decodes ahead in parallel while
    total buffered memory stays bounded.
    """

    def __init__(self, ds: "VideoDataset"):
        import threading

        self.ds = ds
        base, limit = ds._range       # consumed frame range [base, limit)
        self.n = limit - base
        self.cond = threading.Condition()
        self.ready: Dict[int, object] = {}
        self.next_needed = base       # lowest index not yet consumed
        self.last = None              # (i, sample): tail-padding replays
        self.error = None
        self.stop = False
        workers = min(ds.decode_workers, max(1, self.n))
        chunk = (self.n + workers - 1) // workers
        self.per_ahead = max(4, ds.decode_ahead // workers)
        self.threads = []
        for w in range(workers):
            lo, hi = base + w * chunk, min(base + (w + 1) * chunk, limit)
            if lo >= hi:
                break
            t = threading.Thread(target=self._decode_range, args=(lo, hi),
                                 daemon=True)
            t.start()
            self.threads.append(t)

    def _decode_range(self, lo: int, hi: int):
        import cv2

        cap = None
        try:
            cap = cv2.VideoCapture(self.ds.path)
            if lo:
                cap.set(cv2.CAP_PROP_POS_FRAMES, lo)
            for i in range(lo, hi):
                frame = self.ds._read_with_fallback(cap, i)
                sample = self.ds._to_sample(frame, i)
                with self.cond:
                    # per-worker decode-ahead window over its own chunk
                    while (self.error is None and not self.stop and
                           i - max(self.next_needed, lo) >= self.per_ahead):
                        self.cond.wait()
                    if self.error is not None or self.stop:
                        return
                    self.ready[i] = sample
                    self.cond.notify_all()
        except BaseException as e:      # surface to consumers
            with self.cond:
                self.error = e
                self.cond.notify_all()
        finally:
            if cap is not None:
                cap.release()

    def get(self, i: int):
        with self.cond:
            # The last-replay check must stay inside the wait loop: when two
            # consumers request the same not-yet-consumed index (tail-padding
            # duplicates with num_workers>1), the first pops ready[i] — the
            # second can then only be satisfied from self.last.
            while True:
                if i in self.ready:
                    break
                if self.error is not None:
                    raise self.error
                # the Loader pads tail batches by repeating the last index
                if self.last is not None and self.last[0] == i:
                    return self.last[1]
                self.cond.wait()
            sample = self.ready.pop(i)
            self.last = (i, sample)
            if i >= self.next_needed:
                self.next_needed = i + 1
            self.cond.notify_all()
            return sample

    def close(self):
        """Unblock and join the decode threads (each releases its capture)."""
        with self.cond:
            self.stop = True
            self.cond.notify_all()
        for t in self.threads:
            t.join(timeout=5.0)
