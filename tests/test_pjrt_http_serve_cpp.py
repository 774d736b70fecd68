"""C++ online HTTP serving runtime (cpp/pjrt_http_serve.cc) on the real TPU.

The binary dlopens the PJRT plugin, compiles one StableHLO artifact per
batch bucket, and serves POST /predict with dynamic batching — the native
analog of serve.py.  This test exports batch-1 and batch-2 buckets of the
same tiny model, starts the server in a subprocess (independent of this
process's forced-CPU jax), POSTs PNG frames, and checks the JSON responses
against an in-process CPU artifact of the same program.

Skipped when the plugin, g++, OpenCV dev files, or the PJRT header are
unavailable.  The cheap ``--selftest`` (HTTP parser, base64, JSON floats)
runs whenever the binary can be built.
"""
import base64
import http.client
import json
import os
import signal
import subprocess
import threading
import time
import uuid

import numpy as np
import pytest

pytestmark = pytest.mark.full

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"
from cpp_build import PLUGIN, build, have_build_deps, have_plugin

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "cpp", "pjrt_http_serve")


@pytest.mark.skipif(
    not have_build_deps(),
    reason="needs g++, OpenCV dev files, and the PJRT C API header")
def test_selftest():
    """HTTP parsing / base64 / JSON-float units baked into the binary."""
    build("pjrt_http_serve")
    r = subprocess.run([BINARY, "--selftest"], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]


class _Args:
    batchsize = 2
    target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
    court_size = (W, H); mask_classes = 4
    use_unet = True; unet_bilinear = False; unet_uv = False
    use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
    use_warper = True; compute_dtype = "float32"
    court_img = COURT_IMG; court_poi = COURT_POI


def _get(conn_addr, path):
    conn = http.client.HTTPConnection(*conn_addr, timeout=60)
    try:
        conn.request("GET", path)
        r = conn.getresponse()
        return r.status, r.read()
    finally:
        conn.close()


def _post_predict(conn_addr, body, timeout=120):
    conn = http.client.HTTPConnection(*conn_addr, timeout=timeout)
    try:
        conn.request("POST", "/predict", body=body,
                     headers={"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        return r.status, r.read()
    finally:
        conn.close()


@pytest.mark.skipif(
    not (have_plugin() and have_build_deps()),
    reason="needs the axon PJRT plugin, g++, OpenCV dev, PJRT header")
def test_http_server_serves_tpu_artifact(tmp_path):
    import cv2
    import jax
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.compat.serving import (
        export_predict, load_serving, save_serving)

    build("pjrt_http_serve")
    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta", "poi", "segm_mask")
    # two TPU buckets (batch 1 and 2) served by C++, one CPU batch-2
    # reference evaluated in-process — same weights, same program
    for b in (1, 2):
        exp, meta = export_predict(bundle, consistency=True,
                                   project_poi=True, keep=keep,
                                   batch_size=b, platforms=("tpu",))
        save_serving(str(tmp_path / f"tpu_b{b}"), exp, meta)
    exp_cpu, meta_cpu = export_predict(bundle, consistency=True,
                                       project_poi=True, keep=keep,
                                       batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path / "cpu"), exp_cpu, meta_cpu)

    x = np.random.RandomState(3).randint(0, 255, (2, H, W, 3), np.uint8)
    fn, _ = load_serving(str(tmp_path / "cpu"))
    ref = jax.device_get(fn(x))

    env = dict(os.environ)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    proc = subprocess.Popen(
        [BINARY, str(tmp_path / "tpu_b1"), str(tmp_path / "tpu_b2"),
         "--port", "0", "--host", "127.0.0.1", "--max_delay_ms", "500",
         "--opt", "topology=v5e:1x1x1", "--opt", "remote_compile=1",
         "--opt", "n_slices=1", "--opt", f"session_id=cxh-{uuid.uuid4()}",
         "--opt", "rank=4294967295"],
        env=env, stdout=subprocess.PIPE, text=True)
    watchdog = threading.Timer(840, proc.kill)  # readline() blocks; bound it
    watchdog.start()
    try:
        # stdout announces the bound port once compiles + warmup finish
        # (minutes through the tunnel)
        port = None
        while True:
            line = proc.stdout.readline()
            if not line:
                break
            if "listening on port" in line:
                port = int(line.rsplit(" ", 1)[1])
                break
        assert port, "server never announced its port (compile failed/hung?)"
        addr = ("127.0.0.1", port)

        status, body = _get(addr, "/healthz")
        assert status == 200 and json.loads(body)["ok"] is True

        # --- single request: values must match the CPU artifact ---------
        ok0, png0 = cv2.imencode(".png", x[0])
        assert ok0
        status, body = _post_predict(addr, png0.tobytes())
        assert status == 200, body[-500:]
        out = json.loads(body)
        np.testing.assert_allclose(
            np.asarray(out["theta"], np.float32).reshape(-1),
            np.asarray(ref["theta"])[0].reshape(-1), rtol=0, atol=1e-3)
        np.testing.assert_allclose(
            out["score"], float(np.asarray(ref["consist_score"])[0]),
            rtol=1e-3, atol=1e-3)
        poi = np.asarray(out["poi"], np.float32)
        ref_poi = np.asarray(ref["poi"])[0]
        assert poi.shape == ref_poi.shape
        np.testing.assert_allclose(poi, ref_poi, rtol=0, atol=2e-3)
        segm = cv2.imdecode(
            np.frombuffer(base64.b64decode(out["segm_mask_png"]), np.uint8),
            cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(segm,
                                      np.asarray(ref["segm_mask"])[0])

        # --- two concurrent requests coalesce into the batch-2 bucket ---
        ok1, png1 = cv2.imencode(".png", x[1])
        assert ok1
        results = [None, None]

        def worker(i, png):
            results[i] = _post_predict(addr, png.tobytes())

        threads = [threading.Thread(target=worker, args=(i, p))
                   for i, p in enumerate((png0, png1))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(2):
            status, body = results[i]
            assert status == 200, body[-500:]
            out = json.loads(body)
            np.testing.assert_allclose(
                np.asarray(out["theta"], np.float32).reshape(-1),
                np.asarray(ref["theta"])[i].reshape(-1), rtol=0, atol=1e-3)

        status, body = _get(addr, "/stats")
        assert status == 200
        stats = json.loads(body)
        assert stats["requests"] == 3
        assert stats["buckets"] == [1, 2]
        assert stats["batch_hist"].get("2", 0) >= 1, stats

        status, body = _get(addr, "/metrics")
        assert status == 200
        assert b"sfh_requests_total 3" in body

        # --- bad body -> 400, larger input resized server-side -> 200 ---
        status, body = _post_predict(addr, b"not an image")
        assert status == 400
        big = cv2.resize(x[0], (W * 2, H * 2),
                         interpolation=cv2.INTER_NEAREST)
        okb, pngb = cv2.imencode(".png", big)
        assert okb
        status, body = _post_predict(addr, pngb.tobytes())
        assert status == 200
        out = json.loads(body)
        assert np.isfinite(np.asarray(out["theta"], np.float32)).all()

        # --- graceful shutdown ------------------------------------------
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=120) == 0
    finally:
        watchdog.cancel()
        if proc.poll() is None:
            proc.kill()
            proc.wait()
