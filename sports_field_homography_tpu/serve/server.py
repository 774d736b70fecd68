"""Online HTTP serving: frames in, homography JSON out.

The reference's production path is an offline batch CLI
(``/root/reference/predict.py``); it has no online serving story.  This
module completes it for TPU deployment: the SAME jitted predict program
the batch CLI runs (``cli/engine.jit_predict_fn`` — static output
pruning, uint8 in-program normalization, folded BN, interval-table warp)
behind a dynamic batcher (``serve/batcher.py``) and a dependency-free
HTTP front end (stdlib ``ThreadingHTTPServer``).

Endpoints:
  * ``POST /predict`` — body = one encoded image (JPEG/PNG, any size;
    resized server-side with the video-ingest semantics of
    ``data/dataset.py VideoDataset.preprocess_frame``).  Response JSON:
    ``{"theta": 3x3, "score": float, "poi": [[x,y]...], ...}`` per
    ``--req_outputs``; mask outputs are base64 PNGs.
  * ``GET /healthz`` — liveness + backend.
  * ``GET /stats``   — batcher counters and latency quantiles (JSON).
  * ``GET /metrics`` — the same counters in the Prometheus text format.

Serves either a checkpoint (``--load`` + sidecar conf.yaml, exactly like
the predict CLI) or a self-contained StableHLO artifact
(``--serving_artifact``, from ``scripts/export_serving.py``) — the
artifact path runs with weights baked into the program, no model code.

Multi-chip: ``--num_devices N`` shards every batch bucket ``P('data')``
over a device mesh (the same jitted body as single-chip — see
``parallel.mesh.shard_predict_fn``), multiplying the endpoint's
throughput ceiling by N.  Buckets become ``N × powers-of-two`` so every
bucket splits evenly; responses are value-identical to single-chip
(tests/test_serve_multichip.py).

Usage:
  python serve.py --load ckpt/CP_epoch30.msgpack --port 8800
  python serve.py --serving_artifact ckpt/serving --port 8800
  curl -s --data-binary @frame.jpg localhost:8800/predict
"""
from __future__ import annotations

import base64
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from ..parallel.mesh import check_batch_divisible
from ..utils.config import get_serving_args, parse_config, replace_args
from ..utils.logger import get_logger
from .batcher import DynamicBatcher, default_buckets

__all__ = ["create_server", "main"]


def _resize_frame_u8(frame: np.ndarray, target_size) -> np.ndarray:
    """uint8 resize with the video-ingest interpolation choice
    (``VideoDataset.preprocess_frame``: INTER_AREA when downscaling else
    INTER_LINEAR); normalization stays in the jitted program (u8/255,
    bitwise-equal to the f32 path — docs/PARITY.md uint8 shipping)."""
    import cv2

    target_w, target_h = target_size
    h, w = frame.shape[:2]
    if w != target_w or h != target_h:
        inter = cv2.INTER_AREA if w > target_w else cv2.INTER_LINEAR
        frame = cv2.resize(frame, (target_w, target_h), interpolation=inter)
    return frame


def _png_b64(mask: np.ndarray) -> str:
    import cv2

    ok, buf = cv2.imencode(".png", mask)
    assert ok
    return base64.b64encode(buf.tobytes()).decode("ascii")


def _response_json(result: Dict[str, np.ndarray]) -> dict:
    """Per-request predict slice -> JSON-ready dict (same value
    conventions as the batch CLI's ``{game}_court.json``)."""
    out = {}
    if "theta" in result:
        out["theta"] = np.asarray(result["theta"],
                                  np.float64).reshape(3, 3).tolist()
    if "consist_score" in result:
        out["score"] = float(result["consist_score"])
    if "poi" in result:
        out["poi"] = np.asarray(result["poi"], np.float64).tolist()
    for key in ("segm_mask", "warp_mask"):
        if key in result:
            out[key + "_png"] = _png_b64(np.asarray(result[key], np.uint8))
    return out


def _build_from_checkpoint(args):
    """The predict CLI's model construction, minus the dataset: sidecar
    conf overlay, req_outputs -> static keep set, batch-1 court constants
    (they broadcast against every batch bucket —
    ``models/reconstructor._match_batch``)."""
    from ..cli.engine import build_model, discover_conf, jit_predict_fn

    args.conf_path = discover_conf(args.load, args.conf_path)
    if args.conf_path is not None:
        conf = parse_config(args.conf_path)
        # unlike predict, geometry (warp/court sizes, assets) comes from
        # the conf: serving has no --out_size flooring to override it
        args = replace_args(args, conf, ignore_keys=[
            "conf_path", "batchsize", "load", "compute_dtype",
            "num_devices", "req_outputs"])

    req_outputs = {n: True for n in args.req_outputs.split(",")}
    project_poi = "poi" in req_outputs
    consistency = "consistency" in req_outputs
    args.use_warper = "warp_mask" in req_outputs or consistency
    assert (consistency and args.use_unet) or not consistency
    assert (project_poi and args.use_warper) or not project_poi

    bundle = build_model(args, load=args.load, warp_with_nearest=True,
                         batch_size=1,
                         fold_bn=bool(getattr(args, "fold_bn", 1)))
    keep = set()
    if "segm_mask" in req_outputs:
        keep.add("segm_mask")
    if "warp_mask" in req_outputs:
        keep.add("warp_mask")
    if "theta" in req_outputs:
        keep.add("theta")
    if consistency:
        keep.add("consist_score")
    if project_poi:
        keep.add("poi")

    n_dev = args.num_devices or 1
    if n_dev > 1:
        # multi-chip serving: each batch bucket is sharded P('data') over
        # the mesh — the SAME jitted body as single-chip (shard_predict_fn
        # delegates to jit_predict_fn with a mesh), so responses are
        # value-identical by construction.  Buckets must be multiples of
        # num_devices (create_server enforces/derives that).
        import jax

        from ..parallel.mesh import make_mesh, shard_predict_fn
        mesh = make_mesh(n_dev)
        fn, batch_sharding, repl = shard_predict_fn(
            bundle, mesh, consistency=consistency,
            project_poi=project_poi, keep=tuple(keep))
        variables = jax.device_put(bundle.variables, repl)

        def run_batch(frames: np.ndarray):
            # place the batch sharded up front (a plain numpy arg would
            # land whole on device 0 and reshard inside the program)
            return fn(variables, jax.device_put(frames, batch_sharding))
    else:
        fn = jit_predict_fn(bundle, consistency=consistency,
                            project_poi=project_poi, keep=tuple(keep))
        variables = bundle.variables

        def run_batch(frames: np.ndarray):
            return fn(variables, frames)

    w, h = bundle.config.target_size
    return run_batch, (h, w, 3), np.uint8, None


def _build_from_artifact(path: str):
    """Serve a StableHLO artifact (weights baked in, no model code).
    Fixed-batch artifacts pin the batcher to one bucket; ``poly_batch``
    artifacts specialize per bucket like the live model.  A directory of
    ``b{N}`` sub-artifacts (``scripts/export_serving.py --buckets``, the
    same layout cpp/pjrt_http_serve consumes) serves every exported
    batch size as a bucket."""
    import glob as _glob
    import re as _re

    from ..compat.serving import load_serving

    subs = sorted(d for d in _glob.glob(os.path.join(path, "b*"))
                  if _re.fullmatch(r"b\d+", os.path.basename(d))
                  and os.path.exists(os.path.join(d, "meta.json")))
    if subs:
        fns, shapes = {}, set()
        dtype = None
        for d in subs:
            fn, meta = load_serving(d)
            spec = meta["input"]
            b, h, w, _ = spec["shape"]
            fns[int(b)] = fn
            shapes.add((int(h), int(w)))
            dtype = {"uint8": np.uint8, "float32": np.float32}[spec["dtype"]]
        if len(shapes) != 1:
            raise ValueError(
                f"bucket artifacts under {path} disagree on the frame "
                f"size: {sorted(shapes)}")
        (h, w), = shapes

        def run_batch(frames: np.ndarray):
            fn = fns.get(frames.shape[0])
            if fn is None:
                raise ValueError(
                    f"no bucket artifact for batch {frames.shape[0]} "
                    f"(have {sorted(fns)})")
            return fn(frames.astype(dtype))

        return run_batch, (h, w, 3), dtype, sorted(fns)

    fn, meta = load_serving(path)
    spec = meta["input"]
    b, h, w, _ = spec["shape"]
    dtype = {"uint8": np.uint8, "float32": np.float32}[spec["dtype"]]
    forced = None if spec.get("poly_batch") else [int(b)]

    def run_batch(frames: np.ndarray):
        return fn(frames.astype(dtype))

    return run_batch, (int(h), int(w), 3), dtype, forced


def _prometheus_metrics(stats: dict) -> str:
    """Batcher counters in the Prometheus text exposition format (what
    production scrapers consume; ``/stats`` keeps the human JSON view)."""
    lines = [
        "# TYPE sfh_requests_total counter",
        f"sfh_requests_total {stats['requests']}",
        "# TYPE sfh_batches_total counter",
        f"sfh_batches_total {stats['batches']}",
        "# TYPE sfh_errors_total counter",
        f"sfh_errors_total {stats['errors']}",
    ]
    if stats.get("mean_occupancy") is not None:
        lines += ["# TYPE sfh_batch_occupancy_mean gauge",
                  f"sfh_batch_occupancy_mean {stats['mean_occupancy']:.4f}"]
    lines.append("# TYPE sfh_batches_by_bucket_total counter")
    for bucket, n in stats["batch_hist"].items():
        lines.append(f'sfh_batches_by_bucket_total{{bucket="{bucket}"}} {n}')
    lat = stats.get("latency_ms") or {}
    lines.append("# TYPE sfh_request_latency_ms gauge")
    for q, v in lat.items():
        if v is not None:
            lines.append(f'sfh_request_latency_ms{{quantile="{q}"}} {v}')
    return "\n".join(lines) + "\n"


class _Handler(BaseHTTPRequestHandler):
    # class-level service state, set by create_server
    batcher: DynamicBatcher = None
    target_hw: tuple = None
    channel_order: str = "bgr"
    logger = None

    # stdlib default logs every request to stderr; route through our logger
    def log_message(self, fmt, *fmt_args):
        if self.logger is not None:
            self.logger.debug("%s - %s" % (self.address_string(),
                                           fmt % fmt_args))

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            import jax
            self._send(200, {"ok": True, "backend": jax.default_backend()})
        elif self.path == "/stats":
            self._send(200, self.batcher.stats())
        elif self.path == "/metrics":
            body = _prometheus_metrics(self.batcher.stats()).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._send(404, {"error": "unknown path; use POST /predict, "
                                      "GET /healthz, GET /stats, "
                                      "GET /metrics"})

    def do_POST(self):
        if self.path != "/predict":
            self._send(404, {"error": "unknown path"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            import cv2

            frame = cv2.imdecode(np.frombuffer(raw, np.uint8),
                                 cv2.IMREAD_COLOR)       # BGR, 3 channels
            if frame is None:
                self._send(400, {"error": "body is not a decodable image"})
                return
            if self.channel_order == "rgb":
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            h, w, _ = self.target_hw
            frame = _resize_frame_u8(frame, (w, h))
        except Exception as e:
            self._send(400, {"error": f"bad request: {e}"})
            return
        try:
            result = self.batcher.submit(frame, timeout=120.0)
            self._send(200, _response_json(result))
        except TimeoutError:
            self._send(504, {"error": "predict timed out"})
        except Exception as e:
            self._send(500, {"error": f"predict failed: {e}"})


def create_server(argv=None):
    """Build the service and a bound (not yet serving) HTTP server.

    Returns ``(httpd, batcher)``; call ``httpd.serve_forever()`` (main
    does) or drive it from a thread (tests do).  ``httpd.server_address``
    carries the bound port when ``--port 0``.
    """
    args = get_serving_args(argv)
    if os.environ.get("SFH_JAX_PLATFORM"):
        # test hook: JAX_PLATFORMS env is ignored on the tunneled runtime
        # (CLAUDE.md); must land before first backend use
        import jax
        jax.config.update("jax_platforms", os.environ["SFH_JAX_PLATFORM"])

    logger = get_logger(format="%(message)s", write_date=False)

    if args.serving_artifact:
        run_batch, frame_shape, dtype, forced = _build_from_artifact(
            args.serving_artifact)
    else:
        run_batch, frame_shape, dtype, forced = _build_from_checkpoint(args)

    n_dev = (args.num_devices or 1) if not args.serving_artifact else 1
    if args.serving_artifact and (args.num_devices or 1) > 1:
        logger.info("--num_devices is ignored with --serving_artifact "
                    "(the artifact is a fixed single-device program; serve "
                    "a checkpoint for mesh-sharded buckets)")
    if forced is not None:
        buckets = forced
        if len(forced) == 1:
            logger.info(f"fixed-batch artifact: serving bucket {forced[0]} "
                        "only (export with --buckets or --poly_batch for "
                        "size-adaptive buckets)")
        else:
            logger.info(f"bucket artifacts: serving buckets {forced}")
    elif args.buckets:
        buckets = sorted(int(b) for b in args.buckets.split(","))
        for b in buckets:
            check_batch_divisible(b, n_dev, flag="--buckets")
    elif n_dev > 1:
        # sharded buckets must split evenly over the mesh: num_devices x
        # powers of two (the smallest bucket is one frame per chip)
        buckets = [n_dev * b for b in
                   default_buckets(max(1, args.max_batch // n_dev))]
    else:
        buckets = default_buckets(args.max_batch)

    batcher = DynamicBatcher(run_batch, frame_shape, dtype=dtype,
                             max_batch=buckets[-1],
                             max_delay_ms=args.max_delay_ms,
                             buckets=buckets)
    if not args.no_warmup:
        logger.info(f"warming up batch buckets {list(buckets)}...")
        batcher.warmup()

    class Handler(_Handler):
        pass

    Handler.batcher = batcher
    Handler.target_hw = frame_shape
    Handler.channel_order = args.channel_order
    Handler.logger = logger

    httpd = ThreadingHTTPServer((args.http_host, args.port), Handler)
    httpd.daemon_threads = True
    logger.info(f"serving on http://{httpd.server_address[0]}:"
                f"{httpd.server_address[1]}  "
                f"(POST /predict, GET /healthz, GET /stats)")
    return httpd, batcher


def main(argv=None):
    httpd, batcher = create_server(argv)

    # graceful drain on SIGTERM (the orchestrator's stop signal, same as
    # the train CLI's checkpoint-and-exit): stop accepting connections,
    # let the batcher serve everything already enqueued, then exit.
    # shutdown() blocks until serve_forever returns, so it must be
    # triggered off-thread.
    import signal

    def _term(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:
        pass  # not the main thread (embedded use); SIGTERM stays default

    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        # close() enqueues the shutdown sentinel BEHIND pending requests:
        # the device worker drains them and wakes their handler threads
        # before joining, so in-flight clients get their responses
        batcher.close()


if __name__ == "__main__":
    main()
