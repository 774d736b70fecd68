"""Adversarial-client hardening of cpp/pjrt_http_serve (round-4 verdict #4).

Runs the binary in ``--echo`` mode — the full HTTP/connection layer
(accept loop, connection cap, socket timeouts, request parsing, decode +
resize preprocessing) with inference replaced by an immediate reply — so
no PJRT plugin or TPU is needed and each scenario runs in seconds.

Covered:
  * slowloris / idle connections: ``SO_RCVTIMEO`` (``--idle_timeout_s``)
    closes a stalled connection instead of parking a thread + fd forever;
  * connection flood: ``--max_connections`` caps live handlers — excess
    connections get an immediate 503 and the server keeps serving;
  * oversized (Content-Length > 32 MB) and truncated bodies close the
    connection without unbounded buffering and without killing the server;
  * a short concurrent soak (clients + metrics scraper) with an RSS bound.
"""
import http.client
import os
import socket
import subprocess
import threading
import time

import numpy as np
import pytest

from cpp_build import build, have_build_deps, rss_mb

pytestmark = pytest.mark.full

requires_build = pytest.mark.skipif(
    not have_build_deps(),
    reason="needs g++, OpenCV dev files, and the PJRT C API header")


class EchoServer:
    """pjrt_http_serve --echo on an ephemeral port."""

    def __init__(self, *extra_flags):
        binary = build("pjrt_http_serve")
        self.proc = subprocess.Popen(
            [binary, "--echo", "--port", "0", "--host", "127.0.0.1"]
            + list(extra_flags),
            stdout=subprocess.PIPE, text=True)
        self.port = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            line = self.proc.stdout.readline()
            if not line:
                break
            if "listening on port" in line:
                self.port = int(line.rsplit(" ", 1)[1])
                break
        if not self.port:
            # don't leak the spawned server when startup fails — __exit__
            # never runs if __init__ raises
            self.proc.kill()
            self.proc.wait()
            raise AssertionError("echo server never announced its port")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                self.proc.kill()
                self.proc.wait()
        else:
            self.proc.wait()

    def get(self, path, timeout=30):
        conn = http.client.HTTPConnection("127.0.0.1", self.port,
                                          timeout=timeout)
        try:
            conn.request("GET", path)
            r = conn.getresponse()
            return r.status, r.read()
        finally:
            conn.close()

    def post_predict(self, body, timeout=30):
        conn = http.client.HTTPConnection("127.0.0.1", self.port,
                                          timeout=timeout)
        try:
            conn.request("POST", "/predict", body=body,
                         headers={"Content-Type":
                                  "application/octet-stream"})
            r = conn.getresponse()
            return r.status, r.read()
        finally:
            conn.close()


def _png(rng, w=64, h=36):
    import cv2
    ok, buf = cv2.imencode(".png", rng.randint(0, 255, (h, w, 3), np.uint8))
    assert ok
    return buf.tobytes()


@requires_build
def test_idle_connection_times_out_and_server_survives():
    """A slowloris client (partial header, then silence) is disconnected
    after ~idle_timeout_s instead of holding a thread forever."""
    with EchoServer("--idle_timeout_s", "2") as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(b"POST /predict HTTP/1.1\r\nContent-Le")   # stall mid-header
        s.settimeout(15)
        t0 = time.monotonic()
        data = s.recv(4096)          # server closes -> EOF
        closed_after = time.monotonic() - t0
        assert data == b""
        assert closed_after < 12, closed_after
        s.close()
        # the server is still healthy and serving
        status, body = srv.get("/healthz")
        assert status == 200 and b'"ok": true' in body


@requires_build
def test_drip_feed_bounded_by_request_deadline():
    """A drip-feeding client (1 byte per second, each recv succeeding so
    SO_RCVTIMEO alone never fires) is still disconnected once the OVERALL
    per-request read deadline (idle_timeout_s) passes."""
    with EchoServer("--idle_timeout_s", "3") as srv:
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.settimeout(1.0)
        t0 = time.monotonic()
        closed_after = None
        for i in range(30):                  # up to 30 s of dripping
            try:
                s.sendall(b"G")              # one byte of "request" per tick
            except (BrokenPipeError, ConnectionResetError):
                closed_after = time.monotonic() - t0
                break
            try:
                if s.recv(64) == b"":        # server closed -> EOF
                    closed_after = time.monotonic() - t0
                    break
            except socket.timeout:
                pass                         # still open; keep dripping
            except ConnectionResetError:
                closed_after = time.monotonic() - t0
                break
        s.close()
        assert closed_after is not None, "drip-feed held the slot >30 s"
        assert closed_after < 15, closed_after
        status, _ = srv.get("/healthz")
        assert status == 200


@requires_build
def test_connection_flood_capped_with_503():
    """Beyond --max_connections live connections, new ones get an
    immediate 503 and close; slots free when clients disconnect."""
    with EchoServer("--idle_timeout_s", "30", "--max_connections",
                    "4") as srv:
        held = []
        try:
            for _ in range(4):
                s = socket.create_connection(("127.0.0.1", srv.port),
                                             timeout=30)
                # a partial request parks the handler without completing
                s.sendall(b"GET /healthz HTTP/1.1\r")
                held.append(s)
            time.sleep(0.5)          # let all four handlers start
            rejected = 0
            for _ in range(6):
                s = socket.create_connection(("127.0.0.1", srv.port),
                                             timeout=30)
                s.settimeout(10)
                s.sendall(b"GET /healthz HTTP/1.1\r\n\r\n")
                data = s.recv(4096)
                if b"503" in data.split(b"\r\n", 1)[0]:
                    rejected += 1
                s.close()
            assert rejected >= 5, rejected   # at most one raced a free slot
        finally:
            for s in held:
                s.close()
        # slots free up: normal service resumes
        deadline = time.monotonic() + 20
        while True:
            try:
                status, _ = srv.get("/healthz", timeout=5)
                if status == 200:
                    break
            except Exception:
                pass
            assert time.monotonic() < deadline, "slots never freed"
            time.sleep(0.5)


@requires_build
def test_oversized_and_truncated_bodies():
    with EchoServer("--idle_timeout_s", "3") as srv:
        # Content-Length over the 32 MB cap: closed without buffering it
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(b"POST /predict HTTP/1.1\r\n"
                  b"Content-Length: 67108864\r\n\r\n")
        s.settimeout(15)
        assert s.recv(4096) == b""           # rejected -> closed
        s.close()

        # truncated body: header promises 1000 bytes, client dies after 10
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(b"POST /predict HTTP/1.1\r\n"
                  b"Content-Length: 1000\r\n\r\n0123456789")
        s.close()

        # oversized header line: >64 KB of junk with no terminator — the
        # server drops the connection (EOF or RST, depending on how much
        # of the junk was still in flight when it closed)
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        s.sendall(b"GET /" + b"a" * 70000 + b" HTTP/1.1\r\n")
        s.settimeout(15)
        try:
            assert s.recv(4096) == b""
        except ConnectionResetError:
            pass
        s.close()

        status, body = srv.get("/healthz")
        assert status == 200 and b'"ok": true' in body


@requires_build
def test_echo_soak_concurrent_clients_and_scraper():
    """20 s of concurrent POST /predict (real decode+resize) + metrics
    scraping: zero errors, bounded RSS, graceful SIGTERM exit 0."""
    rng = np.random.RandomState(0)
    png = _png(rng)
    with EchoServer("--idle_timeout_s", "30") as srv:
        for _ in range(3):
            status, _ = srv.post_predict(png)
            assert status == 200
        rss_start = rss_mb(srv.proc.pid)

        stop = time.monotonic() + 20
        errors, count = [], [0]
        lock = threading.Lock()

        def client():
            r = np.random.RandomState(
                (os.getpid() ^ threading.get_ident()) % (2 ** 32))
            while time.monotonic() < stop:
                try:
                    status, body = srv.post_predict(_png(r))
                    with lock:
                        if status != 200:
                            errors.append((status, body[:200]))
                        else:
                            count[0] += 1
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(repr(e))

        def scraper():
            while time.monotonic() < stop:
                for path in ("/healthz", "/stats", "/metrics"):
                    try:
                        status, _ = srv.get(path, timeout=10)
                        with lock:
                            if status != 200:
                                errors.append((path, status))
                    except Exception as e:  # noqa: BLE001
                        with lock:
                            errors.append((path, repr(e)))
                time.sleep(0.5)

        threads = ([threading.Thread(target=client) for _ in range(3)]
                   + [threading.Thread(target=scraper)])
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        rss_end = rss_mb(srv.proc.pid)
        assert not errors, errors[:5]
        assert count[0] > 50, count[0]
        assert rss_end - rss_start < 100, (rss_start, rss_end)

        srv.proc.terminate()
        assert srv.proc.wait(timeout=30) == 0
