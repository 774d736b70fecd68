"""Multi-chip scale-out: device meshes, data-parallel and spatial sharding.

The reference is strictly single-GPU (SURVEY §2: no torch.distributed /
NCCL anywhere).  This module is the TPU-native scaling layer that replaces
what the reference never had:

  * **DP (data parallel)** — 1-D ``data`` axis.  The train step runs under
    ``jax.shard_map``: each chip computes grads on its batch shard and
    all-reduces them over ICI with ``psum`` (see ``loop.make_train_step``'s
    ``axis_name`` path).  Inference shards the batch with a jit
    in_sharding and needs no collectives at all.
  * **SP (spatial partitioning)** — 2-D ``(data, spatial)`` mesh.  This
    CNN has no sequence axis; its long-context analog is the image height.
    Annotating activations as ``P('data', 'spatial')`` lets XLA's SPMD
    partitioner shard H across chips and insert conv halo exchanges
    automatically — the idiomatic XLA route (do not hand-schedule halos).
  * TP/PP/EP are intentionally out of scope for this <100M-param CNN
    (SURVEY §2 parallelism table): activations, not weights, dominate
    memory, so DP x SP covers the useful scaling space.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "check_batch_divisible", "data_sharding",
           "replicated", "shard_train_step", "shard_predict_fn",
           "spatial_forward_fn"]


def check_batch_divisible(batchsize: int, num_devices: int, flag="--batchsize"):
    """Fail fast (clear message) before XLA's opaque uneven-sharding error.

    Every batch array is sharded ``P('data')`` over the mesh, which
    requires ``batchsize % num_devices == 0`` (the Loader pads only the
    tail batch, not every batch, so auto-rounding silently would change
    the per-step batch semantics — make the user pick).
    """
    if batchsize % num_devices:
        ok = batchsize - batchsize % num_devices
        raise SystemExit(
            f"{flag} {batchsize} is not divisible by num_devices "
            f"{num_devices}: data-parallel sharding needs equal per-device "
            f"shards. Use e.g. {flag} {ok or num_devices} or "
            f"{ok + num_devices}.")


def make_mesh(num_devices: Optional[int] = None, spatial: int = 1,
              local: bool = False) -> Mesh:
    """Build a (data, spatial) mesh over the first ``num_devices`` devices.

    ``local=True`` meshes over this process's addressable devices only —
    the multi-host inference combination (each host batches over its own
    chips; no cross-host collectives, so a per-host local mesh composes
    with the ``process_slice`` input split instead of a global mesh).
    """
    devices = jax.local_devices() if local else jax.devices()
    n = num_devices or len(devices)
    assert n <= len(devices), (n, len(devices))
    assert n % spatial == 0, (n, spatial)
    arr = np.array(devices[:n]).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(step_fn, mesh: Mesh, n_outputs: int = 2,
                     batch_axis: int = 0):
    """Wrap a train step (built with ``axis_name='data'``) in shard_map.

    State is replicated; every batch array is sharded on its batch
    dimension — axis 0 normally, axis 1 for gradient-accumulation
    super-batches whose leaves are ``(K, B, ...)`` (the micro-batch scan
    stays per-device; only B is split).  Gradients are psum-averaged
    inside ``step_fn``, so the returned state stays replica-identical.
    ``n_outputs`` is the number of step outputs, all replicated — 3 for
    the ``with_grads`` histogram variant (grads are pmean'd inside the
    step too).
    """
    spec = P(*([None] * batch_axis + ["data"]))

    def wrapped(state, batch, court_img, court_poi, warp_table=None):
        batch_specs = {k: spec for k in batch}
        f = jax.shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), batch_specs, P(), P(), P()),
            out_specs=(P(),) * n_outputs,
            check_vma=False,
        )
        return f(state, batch, court_img, court_poi, warp_table)

    return jax.jit(wrapped)


def shard_predict_fn(bundle, mesh: Mesh, consistency: bool,
                     project_poi: bool, keep=None):
    """Batch-sharded inference: each chip predicts its batch shard.

    Pure data parallelism — no collectives; XLA splits the program by the
    input sharding alone.  This is the SAME jitted body as single-chip
    ``cli.engine.jit_predict_fn`` (uint8 normalization, interval warp
    table, device-side argmax, static ``keep`` pruning) — only the input
    sharding constraint differs, so multi-chip outputs are value-identical
    to single-chip by construction.

    Returns ``(fn, in_sharding, replicated_sharding)``; place the batch
    with ``in_sharding`` and the variables with ``replicated_sharding``.
    """
    from ..cli.engine import jit_predict_fn

    fn = jit_predict_fn(bundle, consistency=consistency,
                        project_poi=project_poi, keep=keep, mesh=mesh)
    return fn, NamedSharding(mesh, P("data")), NamedSharding(mesh, P())


def spatial_forward_fn(model, mesh: Mesh, court_img, court_poi,
                       train: bool = False):
    """Forward with activations sharded over (data, spatial) = (B, H).

    XLA's SPMD partitioner inserts the conv halo exchanges; we only
    annotate the desired layout on the input and let the compiler
    propagate it through the UNet/ResNet.
    """
    x_sharding = NamedSharding(mesh, P("data", "spatial"))

    ci = jax.device_put(court_img)
    cp = jax.device_put(court_poi)

    @jax.jit
    def _fn(variables, x, ci, cp):
        x = jax.lax.with_sharding_constraint(x, x_sharding)
        return model.apply(variables, x, ci, cp, train=train)

    def fn(variables, x):
        return _fn(variables, x, ci, cp)

    return fn
