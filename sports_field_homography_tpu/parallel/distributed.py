"""Multi-host (DCN) scale-out: jax.distributed runtime plumbing.

The reference is single-GPU with no communication backend (SURVEY §5);
within one TPU slice this framework scales over ICI via ``parallel.mesh``.
This module adds the cross-host axis: ``jax.distributed.initialize()``
wiring, a global mesh over every host's devices, and the host-local ->
global array assembly for per-host input pipelines.

Design (standard JAX multi-controller SPMD):
  * every host runs the SAME program; ``initialize_distributed`` connects
    them through a coordinator (auto-detected on Cloud TPU pods, explicit
    host/port elsewhere — including multi-process CPU for tests, which
    rides gloo);
  * each host loads its own batch shard (``process_slice``) and assembles
    a global jax.Array with ``host_local_array_to_global_array``;
  * the jitted train step is compiled against the GLOBAL mesh; XLA routes
    gradient reductions over ICI within a slice and DCN across slices.

Smoke-testable without TPUs:  ``python -m
sports_field_homography_tpu.parallel.distributed --smoke <pid> <nprocs>``
runs one real Reconstructor train step on a global CPU mesh; the test
suite launches two such processes and checks they agree on the loss.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "global_mesh", "process_slice",
           "host_local_batch_to_global"]


def initialize_distributed(coordinator: Optional[str] = None,
                           num_hosts: Optional[int] = None,
                           host_id: Optional[int] = None) -> bool:
    """Connect this process to the jax.distributed runtime.

    With no arguments, relies on JAX's cluster auto-detection (Cloud TPU
    pod metadata / SLURM / env).  Explicit args — or the environment
    variables ``SFH_COORDINATOR`` / ``SFH_NUM_HOSTS`` / ``SFH_HOST_ID`` —
    override.  Returns True if a multi-host runtime was initialized,
    False for the single-host no-op.
    """
    coordinator = coordinator or os.environ.get("SFH_COORDINATOR")
    if num_hosts is None and os.environ.get("SFH_NUM_HOSTS"):
        num_hosts = int(os.environ["SFH_NUM_HOSTS"])
    if host_id is None and os.environ.get("SFH_HOST_ID"):
        host_id = int(os.environ["SFH_HOST_ID"])

    if coordinator is None and num_hosts is None:
        return False  # single-host: nothing to do
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_hosts is not None:
        kwargs["num_processes"] = num_hosts
    if host_id is not None:
        kwargs["process_id"] = host_id
    jax.distributed.initialize(**kwargs)
    return True


def global_mesh(spatial: int = 1):
    """(data, spatial) mesh over ALL hosts' devices (cf. mesh.make_mesh,
    which builds over the local/default device list)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    assert n % spatial == 0, (n, spatial)
    arr = np.array(devices).reshape(n // spatial, spatial)
    return Mesh(arr, ("data", "spatial"))


def process_slice(global_batch_size: int):
    """(start, size) of this host's slice of the global batch: each host's
    input pipeline loads only its own samples."""
    n = jax.process_count()
    i = jax.process_index()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    return i * per, per


def host_local_batch_to_global(batch: dict, mesh, batch_axis: str = "data",
                               leading_accum: bool = False):
    """Assemble per-host batch shards into global jax.Arrays.

    Each host passes its LOCAL shard (leading dim = global/num_hosts);
    the result is a dict of global arrays sharded over ``batch_axis``,
    ready for a jitted step compiled against the global mesh.

    ``leading_accum``: the leaves are gradient-accumulation super-batches
    ``(K, B_local, ...)`` — glue/shard on axis 1 (the batch), keeping the
    micro-batch scan axis K replicated (cf. ``mesh.shard_train_step``'s
    ``batch_axis=1``).
    """
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    spec = P(None, batch_axis) if leading_accum else P(batch_axis)
    specs = {k: spec for k in batch}
    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, specs)


def _smoke(pid: int, nprocs: int, port: int = 12411,
           grad_accum: int = 1) -> None:
    """One real train step on a global multi-process CPU mesh.

    ``grad_accum=K``: run the gradient-accumulation variant — each host
    stacks K local micro-batches into a ``(K, B_local, ...)`` super-batch,
    assembly glues the batch axis (axis 1) across hosts, and the step
    scans the K micro-batches (``loop.make_train_step(grad_accum=K)``).
    Also runs the same K*B batch single-device (replicated) and prints
    both losses so the test can check cross-host agreement AND local
    value parity of the distributed accumulation path."""
    jax.config.update("jax_platforms", "cpu")
    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_hosts=nprocs, host_id=pid)
    assert jax.process_count() == nprocs

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from __graft_entry__ import _flagship
    from ..train.loop import LossConfig, init_train_state, make_train_step
    from ..train.optim import make_optimizer

    gbs = 2 * nprocs
    w, h = 64, 32
    model, court_img, court_poi, cfg = _flagship(
        gbs, size=(w, h), dtype=jnp.float32, warp_with_nearest=False)
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, court_img[:1],
                           court_poi[:1], train=False)

    mesh = global_mesh(spatial=1)
    start, per = process_slice(gbs)
    k = max(1, grad_accum)
    rng = np.random.RandomState(0)  # same stream everywhere; slice locally
    full = {
        "image": rng.rand(k * gbs, h, w, 3).astype(np.float32),
        "mask": rng.randint(0, 4, size=(k * gbs, h, w)).astype(np.int64),
        "poi": rng.rand(k * gbs, 52, 2).astype(np.float32),
        "nonzeros": np.ones((k * gbs, 52), np.float32),
        "num_nonzero": np.full((k * gbs,), 52.0, np.float32),
        "weight": np.ones((k * gbs, 1), np.float32),
    }
    if k > 1:   # (K, gbs, ...) super-batches; hosts slice the batch axis
        full = {key: v.reshape((k, gbs) + v.shape[1:])
                for key, v in full.items()}
        local = {key: v[:, start:start + per] for key, v in full.items()}
    else:
        local = {key: v[start:start + per] for key, v in full.items()}
    gbatch = host_local_batch_to_global(local, mesh, leading_accum=k > 1)

    optimizer = make_optimizer("RMSprop", 1e-4, 1e-8)
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss="CE", consist_start_iter=0,
                          batch_size=gbs)
    repl = NamedSharding(mesh, P())
    # form the gloo clique before the big compile (see _multistep: the
    # context-init handshake has a hard 30 s window, smaller than the
    # possible cross-process compile skew on a loaded host)
    warm = host_local_batch_to_global(
        {"x": np.ones((per,), np.float32)}, mesh)["x"]
    jax.block_until_ready(jax.jit(lambda a: a.sum(),
                                  out_shardings=repl)(warm))
    state = jax.device_put(init_train_state(variables, optimizer), repl)
    ci = jax.device_put(court_img, repl)
    cp = jax.device_put(court_poi, repl)
    step_fn = jax.jit(make_train_step(model, optimizer, loss_cfg,
                                      grad_accum=k))
    state, logs = step_fn(state, gbatch, ci, cp)
    jax.block_until_ready(logs)
    loss = float(logs["Tot_loss"])     # fully replicated -> host-readable
    if k == 1:
        print(f"DIST_SMOKE pid={pid} loss={loss:.6f}", flush=True)
        return
    # local value-parity reference: the SAME (K, gbs) super-batch on this
    # host's single device, outside the distributed mesh
    local_state = init_train_state(variables, optimizer)
    local_step = jax.jit(make_train_step(model, optimizer, loss_cfg,
                                         grad_accum=k))
    _, local_logs = local_step(local_state, full, court_img, court_poi)
    print(f"DIST_SMOKE_ACCUM pid={pid} loss={loss:.6f} "
          f"local={float(local_logs['Tot_loss']):.6f}", flush=True)


def _multistep(pid: int, nprocs: int, port: int, steps: int = 4,
               ckpt_dir: str = "/tmp") -> None:
    """N-step multi-host training e2e value test (one process of it).

    Three contracts, all checked in-process and reported on one line:
      * cross-host agreement: both processes print the same sha256 digest
        of the final parameters (multi-controller SPMD determinism);
      * checkpoint/resume: the full train state is saved mid-run via
        ``utils.checkpoint.save_train_state`` and restored into the global
        mesh; the resumed run's final params must be BIT-equal to the
        uninterrupted distributed run;
      * value parity vs single-process: the same N steps on the full
        (unsharded) batches on one local device — mathematically identical,
        floating-point different only through psum/pmean reduction order —
        must match to tight tolerance (printed as maxabs over params).

    The trajectory uses SGD: adaptive optimizers (RMSprop's
    ``g/sqrt(square_avg)``) turn ulp-level reduction-order noise on
    near-zero gradients into full-magnitude sign-flipped updates, making
    cross-reduction-order comparison chaotic by construction; SGD is
    linear in g so the true distributed drift stays observable (measured
    ~7e-6 after 4 steps).  RMSprop cross-host loss agreement is covered
    by the one-step smokes above.
    """
    # the resume leg restores the checkpoint written at step half-1;
    # steps < 2 would make that step -1 (nothing saved, load fails)
    assert steps >= 2, f"--steps must be >= 2, got {steps}"
    jax.config.update("jax_platforms", "cpu")
    initialize_distributed(coordinator=f"127.0.0.1:{port}",
                           num_hosts=nprocs, host_id=pid)
    assert jax.process_count() == nprocs

    import hashlib

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from __graft_entry__ import _flagship
    from ..train.loop import LossConfig, init_train_state, make_train_step
    from ..train.optim import make_optimizer
    from ..utils.checkpoint import load_train_state, save_train_state

    gbs = 2 * nprocs
    w, h = 64, 32
    model, court_img, court_poi, cfg = _flagship(
        gbs, size=(w, h), dtype=jnp.float32, warp_with_nearest=False)
    x1 = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x1, court_img[:1],
                           court_poi[:1], train=False)

    mesh = global_mesh(spatial=1)
    start, per = process_slice(gbs)

    def make_full_batch(step: int) -> dict:
        # Every host derives the SAME global batch from the step number
        # (the seeded-epoch-order schedule alignment), then slices locally.
        rng = np.random.RandomState(1000 + step)
        return {
            "image": rng.rand(gbs, h, w, 3).astype(np.float32),
            "mask": rng.randint(0, 4, size=(gbs, h, w)).astype(np.int64),
            "poi": rng.rand(gbs, 52, 2).astype(np.float32),
            "nonzeros": np.ones((gbs, 52), np.float32),
            "num_nonzero": np.full((gbs,), 52.0, np.float32),
            "weight": np.ones((gbs, 1), np.float32),
        }

    optimizer = make_optimizer("SGD", 1e-3)
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss="CE", consist_start_iter=0,
                          batch_size=gbs)
    repl = NamedSharding(mesh, P())

    # Establish the gloo clique with a trivial collective BEFORE the
    # expensive train-step compile: gloo's context-init handshake has a
    # hard 30 s window, and on a loaded host the per-process compile-time
    # skew of the big program can exceed it (observed: the fast process
    # dies with "Gloo context initialization failed: DEADLINE_EXCEEDED"
    # while the slow one is still compiling).  The tiny program compiles
    # in seconds on both, so the clique forms inside the window and later
    # collectives reuse it.
    warm = host_local_batch_to_global(
        {"x": np.ones((per,), np.float32)}, mesh)["x"]
    jax.block_until_ready(jax.jit(lambda a: a.sum(),
                                  out_shardings=repl)(warm))

    ci = jax.device_put(court_img, repl)
    cp = jax.device_put(court_poi, repl)
    step_fn = jax.jit(make_train_step(model, optimizer, loss_cfg))

    def run_dist(state, first: int, last: int, save_at: int = -1):
        for s in range(first, last):
            local = {k: v[start:start + per]
                     for k, v in make_full_batch(s).items()}
            gbatch = host_local_batch_to_global(local, mesh)
            state, logs = step_fn(state, gbatch, ci, cp)
            if s == save_at:
                jax.block_until_ready(state)
                save_train_state(ckpt_path, jax.device_get(state))
        jax.block_until_ready(state)
        return state, logs

    # (1) uninterrupted distributed run, checkpointing after step `half`
    ckpt_path = os.path.join(ckpt_dir, f"dist_multistep_{pid}.msgpack")
    half = steps // 2
    state = jax.device_put(init_train_state(variables, optimizer), repl)
    state, logs = run_dist(state, 0, steps, save_at=half - 1)
    final = jax.device_get(state)
    loss = float(logs["Tot_loss"])

    # (2) resume from the mid-run checkpoint, finish the schedule
    target = init_train_state(variables, optimizer)
    restored = jax.device_put(load_train_state(ckpt_path, target), repl)
    state2, _ = run_dist(restored, half, steps)
    final2 = jax.device_get(state2)
    leaves1 = jax.tree.leaves(final)
    leaves2 = jax.tree.leaves(final2)
    resume_bit_equal = all(
        np.asarray(a).tobytes() == np.asarray(b).tobytes()
        for a, b in zip(leaves1, leaves2))

    # (3) single-process reference: full batches on one local device
    lstate = init_train_state(variables, optimizer)
    lstep = jax.jit(make_train_step(model, optimizer, loss_cfg))
    for s in range(steps):
        lstate, _ = lstep(lstate, make_full_batch(s), court_img, court_poi)
    lfinal = jax.device_get(lstate)
    maxabs = 0.0
    for a, b in zip(jax.tree.leaves(final["params"]),
                    jax.tree.leaves(lfinal["params"])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        maxabs = max(maxabs, float(np.max(np.abs(a - b))))

    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(final["params"]):
        digest.update(np.asarray(leaf).tobytes())
    print(f"DIST_MULTISTEP pid={pid} digest={digest.hexdigest()[:16]} "
          f"resume_bit_equal={resume_bit_equal} maxabs={maxabs:.3e} "
          f"loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    import sys

    if "--smoke" in sys.argv:
        i = sys.argv.index("--smoke")
        accum = 1
        if "--grad_accum" in sys.argv:
            accum = int(sys.argv[sys.argv.index("--grad_accum") + 1])
        if "--steps" in sys.argv:
            ckpt_dir = "/tmp"
            if "--ckpt_dir" in sys.argv:
                ckpt_dir = sys.argv[sys.argv.index("--ckpt_dir") + 1]
            _multistep(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                       port=int(sys.argv[i + 3]),
                       steps=int(sys.argv[sys.argv.index("--steps") + 1]),
                       ckpt_dir=ckpt_dir)
        else:
            _smoke(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                   port=int(sys.argv[i + 3]) if len(sys.argv) > i + 3
                   else 12411,
                   grad_accum=accum)
