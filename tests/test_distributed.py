"""Multi-host (DCN) runtime: 2-process CPU smoke of the real train step.

Launches two fresh processes that ``jax.distributed.initialize`` against a
local coordinator (gloo collectives on CPU), build a GLOBAL 2-device mesh
(one device per process), assemble per-host batch shards into global
arrays, and run one real Reconstructor train step.  Both hosts must agree
on the (fully replicated) loss — the multi-controller SPMD contract.
"""
import os
import pytest
import re
import socket
import subprocess
import sys

pytestmark = pytest.mark.full


def _child_env():
    """Strip the test session's 8-virtual-device XLA flag: each smoke
    process must expose exactly ONE local CPU device."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_smoke():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "sports_field_homography_tpu.parallel.distributed",
             "--smoke", str(i), "2", str(port)],
            cwd="/root/repo", env=_child_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    losses = []
    for out in outs:
        m = re.search(r"DIST_SMOKE pid=\d loss=([\d.]+)", out)
        assert m, out[-2000:]
        losses.append(m.group(1))
    assert losses[0] == losses[1], losses


def test_two_process_grad_accum_step_smoke():
    """Multi-host x grad_accum: (K, B_local) super-batches glue on the
    batch axis; distributed loss must agree across hosts AND match the
    same K*B batch run single-device (value parity of the composition)."""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "sports_field_homography_tpu.parallel.distributed",
             "--smoke", str(i), "2", str(port), "--grad_accum", "2"],
            cwd="/root/repo", env=_child_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        assert p.returncode == 0, out[-4000:]
    dist, local = [], []
    for out in outs:
        m = re.search(r"DIST_SMOKE_ACCUM pid=\d loss=([\d.]+) "
                      r"local=([\d.]+)", out)
        assert m, out[-2000:]
        dist.append(float(m.group(1)))
        local.append(float(m.group(2)))
    assert dist[0] == dist[1], dist
    # single-device reference: same math, different reduction order
    assert abs(dist[0] - local[0]) < 1e-4 * max(1.0, abs(local[0])), \
        (dist, local)


def test_two_process_multistep_ckpt_value_parity(tmp_path):
    """Multi-host train e2e value test: a 4-step 2-process run must (a)
    agree bit-wise across hosts (same final-params digest), (b) be
    bit-identical when interrupted by a mid-run full-state checkpoint and
    resumed, and (c) match the same schedule run single-process to tight
    tolerance (only psum/pmean reduction order differs; SGD trajectory —
    see the _multistep docstring for why adaptive optimizers cannot be
    compared across reduction orders)."""
    for attempt in range(3):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-m",
                 "sports_field_homography_tpu.parallel.distributed",
                 "--smoke", str(i), "2", str(port), "--steps", "4",
                 "--ckpt_dir", str(tmp_path)],
                cwd="/root/repo", env=_child_env(), stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for i in range(2)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out)
        finally:
            # a TimeoutExpired above would otherwise leak the live
            # 2-process gloo pair (and its port) for the rest of the run
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        if all(p.returncode == 0 for p in procs):
            break
        # loaded-host infra flake: compile-time skew can still blow gloo's
        # 30 s context-init window despite the in-process warmup — retry
        # the pair (twice: under a saturated host even back-to-back
        # attempts can both blow the window) before declaring failure
        gloo_flake = any("Gloo context initialization failed" in o
                         for o in outs)
        assert attempt < 2 and gloo_flake, outs[0][-2000:] + outs[1][-2000:]
    rows = []
    for out in outs:
        m = re.search(r"DIST_MULTISTEP pid=\d digest=([0-9a-f]+) "
                      r"resume_bit_equal=(\w+) maxabs=([\d.e+-]+)", out)
        assert m, out[-2000:]
        rows.append((m.group(1), m.group(2), float(m.group(3))))
    assert rows[0][0] == rows[1][0], rows          # cross-host digest
    for digest, bit_equal, maxabs in rows:
        assert bit_equal == "True", rows           # ckpt/resume bit parity
        # measured drift after 4 SGD steps: ~7e-6 on a virtual 2-device
        # mesh (pure reduction order), ~1.1e-4 in the real 2-process gloo
        # run (partitioned codegen differs too); 1e-3 bounds both with
        # margin while still catching any real divergence (a misrouted
        # sample shifts params by ~the update size, 1e-2+)
        assert maxabs < 1e-3, rows                 # vs single-process run
