"""Dynamic request batching for the online serving endpoint.

XLA programs are compiled per static shape, and the chip reaches peak
throughput only at multiple-of-8 batches (BASELINE.md serving sweep:
batch 1 = 7.0 ms / 143 fps, batch 32 = 107 ms / 299 fps) — so an online
endpoint must coalesce concurrent single-frame requests into padded
static-shape batches.  The reference has no serving layer (its
production path is the offline batch CLI, ``/root/reference/predict.py``);
this is the TPU-native piece that turns the same jitted predict program
into an online service.

Protocol: each request thread calls :meth:`DynamicBatcher.submit`, which
enqueues the frame and blocks.  One device thread drains the queue —
taking whatever is waiting, up to ``max_batch``, waiting at most
``max_delay_ms`` after the first frame arrives — pads the group to the
smallest compiled batch bucket, runs the program once, and distributes
the per-request slices.  Under load, batches fill to ``max_batch`` and
the delay never triggers; at low rates a request pays at most
``max_delay_ms`` of coalescing latency.
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np

__all__ = ["DynamicBatcher", "default_buckets"]


def default_buckets(max_batch: int) -> tuple:
    """Powers of two up to ``max_batch`` (plus ``max_batch`` itself).

    Small buckets keep low-rate latency near the batch-1 floor; the top
    bucket carries the throughput.  Each bucket is one XLA compilation
    (cached persistently across server restarts).
    """
    buckets = []
    b = 1
    while b < max_batch:
        buckets.append(b)
        b *= 2
    buckets.append(max_batch)
    return tuple(buckets)


class _Pending:
    __slots__ = ("frame", "event", "result", "error", "t_submit")

    def __init__(self, frame: np.ndarray):
        self.frame = frame
        self.event = threading.Event()
        self.result: Optional[Dict[str, np.ndarray]] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()


class DynamicBatcher:
    """Coalesce concurrent ``submit`` calls into batched ``run_batch`` calls.

    ``run_batch(frames)``: ``(B, H, W, C)`` batch -> dict of arrays with
    leading batch dim (the jitted predict; B is always one of
    ``buckets``).  ``frame_shape``: the per-frame ``(H, W, C)`` shape
    every submit must match.  ``warmup()`` compiles every bucket up
    front (first-request compiles through a TPU tunnel take minutes).
    """

    def __init__(self, run_batch: Callable, frame_shape, dtype=np.uint8,
                 max_batch: int = 32, max_delay_ms: float = 8.0,
                 buckets: Optional[Sequence[int]] = None):
        self.run_batch = run_batch
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.max_delay = max_delay_ms / 1000.0
        self.buckets = tuple(sorted(buckets)) if buckets \
            else default_buckets(max_batch)
        assert all(b > 0 for b in self.buckets)
        self.max_batch = self.buckets[-1]
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._lock = threading.Lock()
        self._closed = False
        # stats (under _lock): request/batch counters, per-bucket batch
        # counts, occupancy sum, rolling latency window
        self.n_requests = 0
        self.n_batches = 0
        self.n_errors = 0
        self.batch_hist: collections.Counter = collections.Counter()
        self.occupancy_sum = 0
        self._latencies: collections.deque = collections.deque(maxlen=1024)
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="sfh-batcher")
        self._worker.start()

    # ------------------------------------------------------------- client
    def submit(self, frame: np.ndarray,
               timeout: Optional[float] = None) -> Dict[str, np.ndarray]:
        """Block until the frame's slice of a batched predict returns.

        Raises whatever the device worker raised for the batch, or
        ``TimeoutError`` after ``timeout`` seconds.
        """
        frame = np.asarray(frame, dtype=self.dtype)
        if frame.shape != self.frame_shape:
            raise ValueError(f"frame shape {frame.shape} != expected "
                             f"{self.frame_shape}")
        if self._closed:
            raise RuntimeError("batcher is closed")
        item = _Pending(frame)
        self._q.put(item)
        if not item.event.wait(timeout):
            # orphan the item: the worker still fills it, nobody reads it
            raise TimeoutError("predict timed out")
        if item.error is not None:
            raise item.error
        return item.result

    def close(self):
        self._closed = True
        self._q.put(None)
        self._worker.join(timeout=30)
        # a submit that passed the _closed check but enqueued only after
        # the worker's own shutdown drain returned would block its caller
        # forever — nobody is consuming the queue anymore, so fail any
        # such straggler here
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                return
            if p is not None:
                p.error = RuntimeError("batcher is closed")
                p.event.set()

    # ------------------------------------------------------------- worker
    def _collect(self):
        """One group: first item blocking, then whatever arrives within
        ``max_delay`` of it, capped at ``max_batch``.  None = shutdown."""
        item = self._q.get()
        if item is None:
            return None
        group = [item]
        deadline = time.perf_counter() + self.max_delay
        while len(group) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:         # shutdown after serving this group
                self._q.put(None)
                break
            group.append(nxt)
        return group

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _loop(self):
        import jax
        while True:
            group = self._collect()
            if group is None:
                # shutdown: anything that raced past the _closed check and
                # enqueued BEHIND the sentinel would block its submitter
                # until timeout — fail those requests explicitly instead
                while True:
                    try:
                        p = self._q.get_nowait()
                    except queue.Empty:
                        return
                    if p is not None:
                        p.error = RuntimeError("batcher is closed")
                        p.event.set()
            t0 = time.perf_counter()
            n = len(group)
            bucket = self._bucket_for(n)
            frames = np.stack([p.frame for p in group], axis=0)
            if bucket > n:
                # pad by repeating frame 0: keeps every lane a valid image
                # (an all-zeros pad would be fine too; repeats are free)
                pad = np.broadcast_to(frames[:1],
                                      (bucket - n,) + frames.shape[1:])
                frames = np.concatenate([frames, pad], axis=0)
            try:
                preds = jax.device_get(self.run_batch(frames))
                for i, p in enumerate(group):
                    p.result = {k: np.asarray(v[i]) for k, v in preds.items()}
            except BaseException as e:          # deliver, don't die
                with self._lock:
                    self.n_errors += 1
                for p in group:
                    p.error = e
            t1 = time.perf_counter()
            with self._lock:
                self.n_requests += n
                self.n_batches += 1
                self.batch_hist[bucket] += 1
                self.occupancy_sum += n
                for p in group:
                    self._latencies.append(t1 - p.t_submit)
            for p in group:
                p.event.set()

    # -------------------------------------------------------------- stats
    def warmup(self):
        """Compile every bucket (zero frames, results discarded)."""
        import jax
        for b in self.buckets:
            x = np.zeros((b,) + self.frame_shape, self.dtype)
            jax.block_until_ready(self.run_batch(x))

    def stats(self) -> dict:
        with self._lock:
            lat = sorted(self._latencies)
            q = (lambda f: lat[min(len(lat) - 1, int(f * len(lat)))]
                 if lat else None)
            return {
                "requests": self.n_requests,
                "batches": self.n_batches,
                "errors": self.n_errors,
                "batch_hist": dict(sorted(self.batch_hist.items())),
                "mean_occupancy": (self.occupancy_sum / self.n_batches
                                   if self.n_batches else None),
                "buckets": list(self.buckets),
                "max_delay_ms": self.max_delay * 1000.0,
                "latency_ms": {
                    "p50": None if not lat else round(q(0.50) * 1000, 2),
                    "p90": None if not lat else round(q(0.90) * 1000, 2),
                    "p99": None if not lat else round(q(0.99) * 1000, 2),
                },
            }
