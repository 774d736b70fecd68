"""Serving soak + drain (round-3 review ask #6).

The build claims production online serving, so prove the pipeline
qualities no single-request test covers:

  * sustained mixed load (concurrent clients, mixed frame sizes, metric
    scrapes) with zero errors, sane tail latency, and BOUNDED MEMORY —
    RSS after the soak must sit within a small band of the post-warmup
    RSS (leaks in the batcher/queue/handler path would grow monotonically
    with requests served);
  * graceful drain: a SIGTERM delivered while requests are in flight
    must let every already-accepted request finish with a valid 200
    response before the process exits cleanly (serve/server.py main's
    shutdown-then-drain ordering).

Durations are CI-sized by default; set SFH_SOAK_SECONDS for the long
BASELINE.md runs (e.g. 600).  TPU-side latency/throughput numbers come
from scripts/bench_serve_http.py — this module is about robustness.
"""
import http.client
import json
import os
import re
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from test_serve import _post_image, _start, _write_ckpt, COURT_IMG, COURT_POI

pytestmark = pytest.mark.full

W, H = 64, 36
SOAK_SECONDS = float(os.environ.get("SFH_SOAK_SECONDS", "45"))


def _rss_mb():
    with open("/proc/self/status") as f:
        m = re.search(r"VmRSS:\s+(\d+) kB", f.read())
    return int(m.group(1)) / 1024.0


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cp = _write_ckpt(str(tmp_path_factory.mktemp("soak_ckpt")))
    httpd, batcher, port = _start([
        "--load", cp, "--port", "0",
        "--req_outputs", "theta,poi,consistency",
        "--buckets", "1,2,4", "--max_delay_ms", "10",
        "--compute_dtype", "float32",
        "--court_img", COURT_IMG, "--court_poi", COURT_POI,
    ])
    yield {"port": port, "batcher": batcher, "cp": cp}
    httpd.shutdown()
    batcher.close()


def test_sustained_mixed_load(server):
    port = server["port"]
    rng = np.random.RandomState(0)
    stop = time.monotonic() + SOAK_SECONDS
    errors, latencies = [], []
    lock = threading.Lock()

    def client(seed):
        crng = np.random.RandomState(seed)
        while time.monotonic() < stop:
            # mixed sizes: target-size fast path + an off-size resize path
            if crng.rand() < 0.3:
                img = crng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
            else:
                img = crng.randint(0, 255, (H, W, 3), np.uint8)
            t0 = time.monotonic()
            try:
                status, body = _post_image(port, img)
                dt = time.monotonic() - t0
                with lock:
                    latencies.append(dt)
                    if status != 200 or not np.isfinite(
                            np.asarray(body["theta"])).all():
                        errors.append((status, body))
            except Exception as e:  # noqa: BLE001 - collect, assert below
                with lock:
                    errors.append(repr(e))

    scrapes = [0]

    def scraper():
        while time.monotonic() < stop:
            for path in ("/healthz", "/stats", "/metrics"):
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                try:
                    conn.request("GET", path)
                    resp = conn.getresponse()
                    resp.read()
                    with lock:
                        if resp.status != 200:
                            errors.append((path, resp.status))
                        else:
                            scrapes[0] += 1
                except Exception as e:  # noqa: BLE001 - collect, assert below
                    # an uncaught raise would silently end the thread and
                    # leave the soak "passing" without metric coverage
                    with lock:
                        errors.append((path, repr(e)))
                finally:
                    conn.close()
            time.sleep(1.0)

    # warmup then RSS baseline
    for _ in range(6):
        _post_image(port, rng.randint(0, 255, (H, W, 3), np.uint8))
    rss_start = _rss_mb()

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=scraper))
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    rss_end = _rss_mb()
    assert not errors, errors[:5]
    assert len(latencies) > 20, len(latencies)
    # the scraper must actually have exercised the observability surface
    assert scrapes[0] >= 3, scrapes[0]
    lat = np.sort(latencies)
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    # robustness bound on a loaded 1-CPU host, not a perf claim (TPU
    # latency numbers live in BASELINE.md via bench_serve_http)
    assert p99 < 30.0, (p50, p99)
    growth = rss_end - rss_start
    assert growth < 150.0, (rss_start, rss_end,
                            f"{len(latencies)} requests leaked {growth} MB")
    print(f"soak: {len(latencies)} reqs over {SOAK_SECONDS}s  "
          f"p50={p50 * 1e3:.0f}ms p99={p99 * 1e3:.0f}ms  "
          f"rss {rss_start:.0f}->{rss_end:.0f} MB")


def test_sigterm_drains_in_flight(tmp_path):
    """SIGTERM with requests parked in the batcher: all accepted requests
    complete with 200, then the process exits 0."""
    cp = _write_ckpt(str(tmp_path / "ckpt"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["SFH_JAX_PLATFORM"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--load", cp, "--port", "0",
         "--req_outputs", "theta,consistency",
         # long coalescing window so requests are still queued when the
         # signal lands
         "--buckets", "4", "--max_delay_ms", "2000",
         "--compute_dtype", "float32",
         "--court_img", COURT_IMG, "--court_poi", COURT_POI],
        cwd="/root/repo", env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    port = None
    deadline = time.monotonic() + 600
    lines = []
    while time.monotonic() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        m = re.search(r"serving on http://[\d.]+:(\d+)", line)
        if m:
            port = int(m.group(1))
            break
        assert proc.poll() is None, "".join(lines)[-2000:]
    assert port, "".join(lines)[-2000:]

    results, lock = [], threading.Lock()

    def client(seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        try:
            status, body = _post_image(port, img)
            ok = bool(status == 200
                      and np.isfinite(np.asarray(body["theta"])).all())
            with lock:
                results.append(ok or (status, body))
        except Exception as e:  # noqa: BLE001
            with lock:
                results.append(repr(e))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    time.sleep(0.5)          # requests now parked in the 2 s batch window
    proc.send_signal(signal.SIGTERM)
    for t in threads:
        t.join(timeout=120)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out[-2000:]
    assert results and all(r is True for r in results), results