"""Host input pipeline: threaded decode, static-shape batching, prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (``train.py:33-36``) with a TPU-appropriate design:

  * decode/augment in a thread pool (PIL/cv2 release the GIL on the hot
    paths), preserving sample order;
  * batches are padded to a *static* batch size — XLA compiles one program
    per shape, so the tail batch is padded with replicas and carries a
    ``valid`` mask + true count instead of a different shape;
  * ``device_prefetch`` overlaps H2D transfer with device compute by
    keeping ``depth`` batches in flight (the host pipeline analog of the
    reference's 3-process predict pipeline, ``predict.py:45-122``).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

__all__ = ["Loader", "device_prefetch"]

_ARRAY_KEYS = ("image", "mask", "uv", "poi", "nonzeros", "num_nonzero",
               "weight", "orig_img")


def _collate(samples) -> Dict[str, object]:
    batch: Dict[str, object] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s[k] for s in samples]
        if k in _ARRAY_KEYS:
            batch[k] = np.stack([np.asarray(v) for v in vals], axis=0)
        else:
            batch[k] = vals          # e.g. 'name': list of str
    return batch


class Loader:
    """Ordered, optionally shuffled, padded-batch loader.

    Yields dicts of stacked numpy arrays plus:
      * ``valid``: (B,) bool — False on padding replicas of the tail batch;
      * ``num_valid``: int — true sample count;
      * ``pad_global``: 0-d bool ndarray — True iff the GLOBAL batch
        (before any host sharding) contains padding.  Multi-host processes
        see only their shard's ``valid``, which can be all-True while
        another host's shard holds the padding; every host derives
        ``pad_global`` from the same pre-shard mask, so program-variant
        decisions keyed on it (train_net's masked-BN tail step) agree
        across hosts.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 8, drop_last: bool = False,
                 pad_last: bool = True, seed: Optional[int] = None,
                 prefetch_batches: int = 2, shard=None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = max(1, int(num_workers))
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.prefetch_batches = prefetch_batches
        self.seed = seed
        self._rng = np.random.default_rng(seed)
        # epoch-derived ordering (set_epoch) + one-shot batch skip: the
        # exact mid-epoch resume machinery (see train/loop.py)
        self._epoch: Optional[int] = None
        self._skip_batches = 0
        # multi-host input sharding: (host_index, host_count).  batch_size
        # stays the GLOBAL batch; every host draws the same (seeded) index
        # order but decodes only its contiguous slice of each batch —
        # assemble with parallel.distributed.host_local_batch_to_global.
        self.shard = shard
        if shard is not None:
            idx, cnt = shard
            assert self.batch_size % cnt == 0, (self.batch_size, cnt)
            assert 0 <= idx < cnt, shard
            assert pad_last or drop_last, \
                "sharded loading needs even batches (pad_last or drop_last)"

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        """Derive the shuffle order from ``(seed, epoch)`` instead of the
        mutating stream — every epoch's order is then a pure function of
        the seed, so an interrupted epoch can be replayed exactly on
        resume (and sharded hosts agree without consuming the same number
        of epochs).  Requires a seeded loader; without a seed the call is
        a no-op and ordering stays legacy-nondeterministic."""
        self._epoch = int(epoch)
        if hasattr(self.dataset, "set_epoch"):
            # deterministic augmentation: per-sample aug seeds derive from
            # (aug_seed, epoch, index) inside the dataset
            self.dataset.set_epoch(epoch)

    def skip_next_batches(self, k: int):
        """One-shot: the next ``__iter__`` starts ``k`` batches into the
        epoch (mid-epoch resume — the skipped batches are not decoded)."""
        self._skip_batches = max(0, int(k))

    def _index_order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            if self._epoch is not None and self.seed is not None:
                rng = np.random.default_rng([int(self.seed), self._epoch])
                rng.shuffle(order)
            else:
                self._rng.shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, object]]:
        order = self._index_order()
        bs = self.batch_size
        n = len(order)
        first = self._skip_batches * bs
        self._skip_batches = 0

        def batches_of_indices():
            """Yield (local_indices, local_valid, global_has_pad) per batch."""
            for start in range(first, n, bs):
                idx = order[start:start + bs]
                if len(idx) < bs and self.drop_last:
                    return
                valid = np.ones(len(idx), bool)
                # padding exists only when pad_last actually pads: with
                # pad_last=False the tail batch is RAGGED but unpadded and
                # must keep dispatching to the unmasked program
                pad = (bs - len(idx)) if self.pad_last else 0
                if pad:
                    idx = np.concatenate([idx, np.full(pad, idx[-1])])
                    valid = np.concatenate([valid, np.zeros(pad, bool)])
                if self.shard is not None:
                    si, sc = self.shard
                    per = len(idx) // sc       # == bs // sc (padded above)
                    idx = idx[si * per:(si + 1) * per]
                    valid = valid[si * per:(si + 1) * per]
                yield idx, valid, pad > 0

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that aborts when the consumer abandoned the
            iterator (an unchecked blocking put on the full queue would
            leave this thread stuck forever)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as ex:
                    for idx, valid, has_pad in batches_of_indices():
                        if stop.is_set():
                            break
                        if self.num_workers > 1:
                            samples = list(ex.map(self.dataset.__getitem__, idx))
                        else:
                            samples = [self.dataset[i] for i in idx]
                        batch = _collate(samples)
                        batch["valid"] = valid
                        batch["num_valid"] = int(valid.sum())
                        # 0-d ndarray (not a python bool) so array-only
                        # batch filters and np.stack'd accum groups keep it
                        batch["pad_global"] = np.asarray(has_pad)
                        if not put_or_stop(batch):
                            return
                put_or_stop(None)
            except BaseException as e:  # surface worker errors to the consumer
                if put_or_stop(e):
                    put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True,
                             name="sfh-loader-producer")
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=5)


def device_prefetch(iterator, depth: int = 2, sharding=None, keys=("image",)):
    """Overlap host->device transfer with device compute.

    Eagerly ``jax.device_put``s the arrays named in ``keys`` for up to
    ``depth`` upcoming batches (optionally with a ``Sharding`` for
    multi-chip data parallelism) while the caller consumes the current one.
    (A dedicated transfer thread was measured SLOWER on the tunneled
    runtime — the link serializes and the thread adds contention.)
    """
    import collections
    import jax

    buf = collections.deque()

    def put(batch):
        if batch is None:
            return None
        for k in keys:
            if k in batch and isinstance(batch[k], np.ndarray):
                batch[k] = (jax.device_put(batch[k], sharding) if sharding is not None
                            else jax.device_put(batch[k]))
        return batch

    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
