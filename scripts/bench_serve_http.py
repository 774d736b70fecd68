#!/usr/bin/env python
"""End-to-end ONLINE serving load test: HTTP + dynamic batcher + device.

bench.py measures the device program; scripts/bench_serving_latency.py
sweeps batch sizes of that program.  This harness measures the full
online-serving stack a production client sees — JPEG decode, resize,
dynamic batching (serve/batcher.py), the jitted predict, JSON response —
by standing up the real HTTP server (serve/server.py, port 0) and firing
closed-loop concurrent clients at it for a fixed duration.

Reports sustained requests/sec, latency quantiles and batcher occupancy
as one JSON line.

Usage:
  python scripts/bench_serve_http.py [--clients 64] [--seconds 20]
      [--max_batch 32] [--req_outputs theta,consistency]
"""
import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

W, H = 640, 360


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_delay_ms", type=float, default=8.0)
    ap.add_argument("--req_outputs", default="theta,consistency")
    ap.add_argument("--resnet", default="resnet34")
    ap.add_argument("--url", default=None,
                    help="fire at an ALREADY-RUNNING server instead of "
                         "standing one up (e.g. http://127.0.0.1:8800 for "
                         "cpp/pjrt_http_serve — same endpoints, same stats "
                         "schema); --max_batch/--resnet etc. are ignored")
    args = ap.parse_args()

    import cv2

    httpd = batcher = None
    if args.url:
        base = args.url.rstrip("/")
        url = base + "/predict"
    else:
        from sports_field_homography_tpu.serve.server import create_server

        argv = [
            "--port", "0",
            "--req_outputs", args.req_outputs,
            "--max_batch", str(args.max_batch),
            "--max_delay_ms", str(args.max_delay_ms),
            "--resnet_name", args.resnet,
            "--court_img", "assets/mask_ncaa_v4_nc4_m_onehot.png",
            "--court_poi", "assets/template_ncaa_v4_points.json",
        ]
        httpd, batcher = create_server(argv)
        port = httpd.server_address[1]
        server_thread = threading.Thread(target=httpd.serve_forever,
                                         daemon=True)
        server_thread.start()
        url = f"http://127.0.0.1:{port}/predict"

    # one realistic 1280x720 JPEG body, re-posted by every client (the
    # server resizes to the model's 640x360 per request, like production)
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (720, 1280, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    body = buf.tobytes()

    counters = {"done": 0, "errors": 0}
    lock = threading.Lock()
    stop = threading.Event()
    lat: list = []

    def client():
        n = err = 0
        mine = []
        while not stop.is_set():
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(
                        urllib.request.Request(url, data=body),
                        timeout=120) as r:
                    json.loads(r.read())
                mine.append(time.perf_counter() - t0)
                n += 1
            except Exception:
                err += 1
        with lock:
            counters["done"] += n
            counters["errors"] += err
            lat.extend(mine)

    # short warm ramp so the measured window is steady-state
    ramp = min(2.0, args.seconds / 4)
    threads = [threading.Thread(target=client, daemon=True)
               for _ in range(args.clients)]
    for t in threads:
        t.start()
    time.sleep(ramp)
    with lock:          # reset after ramp
        counters["done"] = 0
        counters["errors"] = 0
        lat.clear()
    t_start = time.perf_counter()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=130)
    elapsed = time.perf_counter() - t_start

    if batcher is not None:
        stats = batcher.stats()
        httpd.shutdown()
        httpd.server_close()
        batcher.close()
    else:  # external server: same stats schema over HTTP
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            stats = json.loads(r.read())

    lat.sort()
    q = lambda f: (round(lat[min(len(lat) - 1, int(f * len(lat)))] * 1e3, 1)
                   if lat else None)
    out = {
        "clients": args.clients,
        "seconds": round(elapsed, 2),
        "requests": counters["done"],
        "errors": counters["errors"],
        "rps": round(counters["done"] / elapsed, 1),
        "client_latency_ms": {"p50": q(0.50), "p90": q(0.90), "p99": q(0.99)},
        # .get: a minimal /stats (e.g. pjrt_http_serve --echo) has no
        # batcher counters — don't crash the summary over it
        "batcher": {"mean_occupancy": (round(stats["mean_occupancy"], 1)
                                       if stats.get("mean_occupancy")
                                       else None),
                    "batch_hist": stats.get("batch_hist", {})},
        "req_outputs": args.req_outputs,
        "max_batch": args.max_batch,
    }
    if args.url:
        out["url"] = args.url
        del out["req_outputs"], out["max_batch"]  # the server's, not ours
    print(json.dumps(out))


if __name__ == "__main__":
    main()
