"""Online serving: dynamic batcher + HTTP endpoint (serve/).

Covers: end-to-end request/response against a live server (value-parity
vs the jitted predict it wraps), dynamic batching coalescing under
concurrency, error paths, and serving a StableHLO artifact.
"""
import base64
import http.client
import json
import os
import threading

import numpy as np
import pytest
import yaml

import jax

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


class _Args:
    batchsize = 2
    target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
    court_size = (W, H); mask_classes = 4
    use_unet = True; unet_bilinear = False; unet_uv = False
    use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
    use_warper = True; compute_dtype = "float32"
    court_img = COURT_IMG; court_poi = COURT_POI


def _write_ckpt(cp_dir):
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    os.makedirs(cp_dir, exist_ok=True)
    conf = {
        "target_size": [W, H], "unet_size": [W, H], "warp_size": [W, H],
        "court_size": [W, H], "mask_classes": 4, "resnet_name": "resnet18",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "compute_dtype": "float32",
        "court_img": COURT_IMG, "court_poi": COURT_POI,
    }
    with open(os.path.join(cp_dir, "conf.yaml"), "w") as f:
        yaml.safe_dump(conf, f)
    bundle = build_model(_Args)
    # perturb params: the fresh-init STN head is identity-initialized
    # (reference parity), making theta input-independent — noise makes
    # outputs vary per input so slice mixups are detectable
    rng = jax.random.PRNGKey(42)
    variables = dict(bundle.variables)
    variables["params"] = jax.tree_util.tree_map_with_path(
        lambda p, v: v + 0.05 * jax.random.normal(
            jax.random.fold_in(rng, abs(hash(str(p))) % 2**31), v.shape),
        variables["params"])
    path = os.path.join(cp_dir, "CP_epoch1.msgpack")
    save_checkpoint(path, variables)
    return path


def _start(argv):
    from sports_field_homography_tpu.serve.server import create_server

    httpd, batcher = create_server(argv)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, batcher, httpd.server_address[1]


def _post_image(port, img_bgr_u8, path="/predict"):
    import cv2

    ok, buf = cv2.imencode(".png", img_bgr_u8)
    assert ok
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=buf.tobytes())
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cp = _write_ckpt(str(tmp_path_factory.mktemp("ckpt")))
    httpd, batcher, port = _start([
        "--load", cp, "--port", "0",
        "--req_outputs", "theta,poi,consistency,warp_mask",
        "--buckets", "1,2,4", "--max_delay_ms", "30",
        "--compute_dtype", "float32",
        "--court_img", COURT_IMG, "--court_poi", COURT_POI,
    ])
    yield {"port": port, "batcher": batcher, "cp": cp}
    httpd.shutdown()
    batcher.close()


def test_predict_endpoint_and_parity(server):
    """Response fields are well-formed AND bit-match the jitted predict
    the server wraps (same preprocessing, fold_bn, uint8 shipping)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (H, W, 3), np.uint8)     # already target size
    status, body = _post_image(server["port"], img)
    assert status == 200, body
    theta = np.asarray(body["theta"])
    assert theta.shape == (3, 3) and np.isfinite(theta).all()
    assert isinstance(body["score"], float)
    poi = np.asarray(body["poi"])
    assert poi.ndim == 2 and poi.shape[1] == 2
    # mask rides as base64 PNG
    import cv2
    png = base64.b64decode(body["warp_mask_png"])
    mask = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (H, W)

    # parity vs the same program called directly (batch-1 court constants,
    # folded BN, uint8 input -> in-program /255, like the server builds)
    from sports_field_homography_tpu.cli.engine import (build_model,
                                                        jit_predict_fn)
    bundle = build_model(_Args, load=server["cp"], warp_with_nearest=True,
                         batch_size=1, fold_bn=True)
    fn = jit_predict_fn(bundle, consistency=True, project_poi=True,
                        keep=("theta", "consist_score", "poi", "warp_mask"))
    direct = jax.device_get(fn(bundle.variables, img[None]))
    np.testing.assert_allclose(theta,
                               np.asarray(direct["theta"][0],
                                          np.float64).reshape(3, 3),
                               rtol=0, atol=1e-6)
    assert abs(body["score"] - float(direct["consist_score"][0])) < 1e-6
    np.testing.assert_array_equal(
        mask, np.asarray(direct["warp_mask"][0], np.uint8))


def test_healthz_and_stats(server):
    status, body = _get(server["port"], "/healthz")
    assert status == 200 and body["ok"] is True
    status, stats = _get(server["port"], "/stats")
    assert status == 200
    assert stats["requests"] >= 1 and stats["batches"] >= 1
    assert stats["buckets"] == [1, 2, 4]


def test_prometheus_metrics(server):
    conn = http.client.HTTPConnection("127.0.0.1", server["port"], timeout=30)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    text = resp.read().decode()
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/plain")
    conn.close()
    lines = {l.split(" ")[0]: l for l in text.splitlines()
             if l and not l.startswith("#")}
    assert float(lines["sfh_requests_total"].split()[1]) >= 1
    assert float(lines["sfh_batches_total"].split()[1]) >= 1
    assert 'sfh_batches_by_bucket_total{bucket="1"}' in text \
        or 'sfh_batches_by_bucket_total{bucket="2"}' in text \
        or 'sfh_batches_by_bucket_total{bucket="4"}' in text
    assert 'sfh_request_latency_ms{quantile="p50"}' in text


def test_dynamic_batching_coalesces(server):
    """8 concurrent posts with a 30 ms window must coalesce: fewer
    batches than requests, some batch bigger than 1."""
    b = server["batcher"]
    before_req, before_bat = b.n_requests, b.n_batches
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(8)]
    results = [None] * 8

    def post(i):
        results[i] = _post_image(server["port"], imgs[i])

    threads = [threading.Thread(target=post, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    d_req = b.n_requests - before_req
    d_bat = b.n_batches - before_bat
    assert d_req == 8
    assert d_bat < 8, f"no coalescing: {d_bat} batches for 8 requests"
    # different inputs -> different thetas (no slice mixups)
    thetas = {json.dumps(r[1]["theta"]) for r in results}
    assert len(thetas) == 8


def test_resizes_any_input_size(server):
    """A 2x-size frame resizes server-side (video-ingest semantics)."""
    rng = np.random.RandomState(7)
    big = rng.randint(0, 255, (H * 2, W * 2, 3), np.uint8)
    status, body = _post_image(server["port"], big)
    assert status == 200, body
    assert np.isfinite(np.asarray(body["theta"])).all()


def test_bad_request_and_unknown_path(server):
    conn = http.client.HTTPConnection("127.0.0.1", server["port"], timeout=30)
    conn.request("POST", "/predict", body=b"this is not an image")
    resp = conn.getresponse()
    assert resp.status == 400
    assert "error" in json.loads(resp.read())
    conn.close()
    status, body = _get(server["port"], "/nope")
    assert status == 404


def test_batcher_error_propagation():
    from sports_field_homography_tpu.serve.batcher import DynamicBatcher

    def boom(frames):
        raise RuntimeError("device on fire")

    b = DynamicBatcher(boom, (4, 4, 3), max_batch=2, max_delay_ms=1,
                       buckets=(2,))
    with pytest.raises(RuntimeError, match="device on fire"):
        b.submit(np.zeros((4, 4, 3), np.uint8), timeout=30)
    with pytest.raises(ValueError, match="frame shape"):
        b.submit(np.zeros((5, 4, 3), np.uint8))
    assert b.stats()["errors"] == 1
    b.close()


def test_batcher_close_fails_stragglers():
    """A request that lands in the queue only after the worker's shutdown
    drain must be failed by close(), not left blocked forever."""
    from sports_field_homography_tpu.serve.batcher import DynamicBatcher, _Pending

    b = DynamicBatcher(lambda frames: {"y": frames.sum(axis=(1, 2, 3))},
                       (4, 4, 3), max_batch=2, max_delay_ms=1, buckets=(2,))
    b._closed = True
    b._q.put(None)
    b._worker.join(timeout=30)
    assert not b._worker.is_alive()
    # simulate the race: an item enqueued after the worker already exited
    straggler = _Pending(np.zeros((4, 4, 3), np.uint8))
    b._q.put(straggler)
    b.close()
    assert straggler.event.is_set()
    assert isinstance(straggler.error, RuntimeError)


@pytest.mark.full
def test_serve_artifact_fixed_batch(tmp_path):
    """A fixed-batch StableHLO artifact serves (weights baked in, no
    checkpoint): the batcher pins to the artifact's batch bucket."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.compat.serving import (export_predict,
                                                            save_serving)

    bundle = build_model(_Args, warp_with_nearest=True)
    exported, meta = export_predict(
        bundle, consistency=True, project_poi=False,
        keep=("theta", "consist_score"), batch_size=2, input_dtype="uint8")
    art = str(tmp_path / "serving")
    save_serving(art, exported, meta)

    httpd, batcher, port = _start([
        "--serving_artifact", art, "--port", "0", "--max_delay_ms", "5"])
    try:
        assert batcher.buckets == (2,)
        rng = np.random.RandomState(11)
        status, body = _post_image(port,
                                   rng.randint(0, 255, (H, W, 3), np.uint8))
        assert status == 200, body
        assert np.isfinite(np.asarray(body["theta"])).all()
        assert "score" in body and "poi" not in body
    finally:
        httpd.shutdown()
        batcher.close()


@pytest.mark.full
def test_serve_artifact_bucket_dir(tmp_path):
    """A directory of b{N} sub-artifacts (export_serving --buckets, the
    cpp/pjrt_http_serve layout) serves every exported batch as a bucket,
    each request answered by the matching fixed-batch program."""
    import dataclasses

    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.compat.serving import (export_predict,
                                                            save_serving)

    bundle = build_model(_Args, warp_with_nearest=True)
    bundle = dataclasses.replace(
        bundle, court_img=np.asarray(bundle.court_img)[:1],
        court_poi=np.asarray(bundle.court_poi)[:1])
    art = str(tmp_path / "buckets")
    for b in (1, 2):
        exported, meta = export_predict(
            bundle, consistency=True, project_poi=False,
            keep=("theta", "consist_score"), batch_size=b,
            input_dtype="uint8")
        save_serving(os.path.join(art, f"b{b}"), exported, meta)

    httpd, batcher, port = _start([
        "--serving_artifact", art, "--port", "0", "--max_delay_ms", "5"])
    try:
        assert batcher.buckets == (1, 2)
        rng = np.random.RandomState(13)
        status, body = _post_image(port,
                                   rng.randint(0, 255, (H, W, 3), np.uint8))
        assert status == 200, body
        assert np.isfinite(np.asarray(body["theta"])).all()
        stats = batcher.stats()
        assert stats["batch_hist"].get(1, 0) >= 1  # bucket-1 program used
    finally:
        httpd.shutdown()
        batcher.close()
