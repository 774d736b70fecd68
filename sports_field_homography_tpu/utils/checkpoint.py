"""Checkpoint I/O: msgpack (flax), orbax directories, and reference .pth.

The reference saves per-epoch ``CP_epoch{n}.pth`` state_dicts plus an
interrupt ``last.pth`` (``train.py:314-323, 437-442``).  This framework's
native formats are:

  * ``*.msgpack`` — single-file flax serialization (fast, portable); the
    train loop writes ``CP_epoch{n}.msgpack`` keeping the reference's
    naming scheme;
  * an orbax checkpoint directory — for async, sharded, multi-host saves;
  * ``*.pth`` — read-only import of reference PyTorch checkpoints via
    ``compat.torch_import`` (layout conversion done at load).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

__all__ = ["save_checkpoint", "load_checkpoint", "save_train_state",
           "load_train_state", "AsyncSaver"]


class AsyncSaver:
    """Non-blocking orbax checkpoint writes.

    Epoch checkpoints return immediately and serialize to disk while the
    next epoch trains; ``wait()`` joins all pending writes (call before
    process exit and before reading a just-written checkpoint).  Under a
    ``jax.distributed`` multi-host runtime, orbax's async machinery
    coordinates the processes (each writes its shards; host 0 commits),
    which is why train saves route through one shared instance.
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, variables) -> None:
        import jax

        # device arrays serialize directly; host numpy works too
        self._ckptr.save(os.path.abspath(path),
                         args=self._ocp.args.StandardSave(
                             jax.tree.map(lambda x: x, variables)),
                         force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()


def _atomic_write(path: str, data: bytes) -> None:
    """Serialize-then-rename: a failure mid-save (deleted device buffer,
    OOM, kill -9) must never truncate an existing good checkpoint."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(path: str, variables: Dict[str, Any]) -> None:
    """Save model variables; format chosen by path (.msgpack or orbax dir)."""
    if path.endswith(".msgpack"):
        from flax import serialization

        _atomic_write(path, serialization.to_bytes(variables))
        return
    # orbax directory
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(lambda x: x, variables), force=True)


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None,
                    unet_bilinear: bool = False) -> Dict[str, Any]:
    """Load model variables from .msgpack / orbax dir / reference .pth.

    ``target`` (a template pytree, e.g. from ``model.init``) is required
    for msgpack and recommended for orbax; .pth import is self-describing.
    """
    if path.endswith(".pth"):
        from ..compat.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path, unet_bilinear=unet_bilinear)
    if path.endswith(".msgpack"):
        from flax import serialization

        assert target is not None, "msgpack load needs a target pytree"
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            import jax

            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_train_state(path: str, state) -> None:
    """Save a FULL training state (params + batch_stats + opt_state + step).

    The reference checkpoints only the model state_dict (``train.py:314-323``)
    so resumed runs restart the optimizer; this preserves true resume.
    """
    from flax import serialization

    _atomic_write(path, serialization.to_bytes(state))


def load_train_state(path: str, target):
    """Restore a full training state saved by ``save_train_state``."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())
