#!/usr/bin/env python
"""BASELINE config #3: end-to-end video inference benchmark.

mp4 decode -> batched predict -> per-game court JSON — the reference's
``scripts/run_inference.sh`` video path (`/root/reference/predict.py:224`
VideoDataset + `run_inference.sh` REQ_OUTPUTS) driven through this
repo's predict CLI at the flagship operating point (UNet+resnet34,
640x360, theta+consistency, bf16, batch 32).

Builds a synthetic 1280x720 mp4 and a flagship init checkpoint, then
runs the predict CLI twice per ``--video_workers`` setting (first run
compiles; the second, steady-state fps is reported from the CLI's own
"Processed N frames" line).  One JSON line per configuration.

On the tunneled dev chip the e2e number is host-link-bound
(~50 MB/s H2D; see BASELINE.md) — the device program itself is the
bench.py 299-fps flagship.  The harness separates the two by also
reporting pure host decode throughput for the same video.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ASSET_IMG = os.path.join(REPO, "assets/mask_ncaa_v4_nc4_m_onehot.png")
ASSET_POI = os.path.join(REPO, "assets/template_ncaa_v4_points.json")


def make_video(path, n_frames, size=(1280, 720), fps=30):
    """Cheap-to-encode synthetic broadcast stand-in: static gradient
    court + a moving bright patch (decode cost is codec-realistic, RNG
    noise would inflate the bitrate unrealistically)."""
    import cv2

    w, h = size
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack([(xx * 255 // w), (yy * 255 // h),
                     np.full((h, w), 60)], -1).astype(np.uint8)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    assert wr.isOpened(), "cv2 VideoWriter failed to open " + path
    for i in range(n_frames):
        frame = base.copy()
        x0 = (i * 17) % (w - 160)
        y0 = (i * 11) % (h - 160)
        frame[y0:y0 + 160, x0:x0 + 160] = (255, 255, 255)
        wr.write(frame)
    wr.release()


def make_checkpoint(cp_dir, batch):
    """Flagship init checkpoint + conf.yaml sidecar (production geometry).

    Runs on CPU: the predict CLI subprocesses own the TPU tunnel — a
    second live client in this parent would contend for it (CLAUDE.md).
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    import yaml

    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    conf = {
        "target_size": [640, 360], "unet_size": [640, 360],
        "warp_size": [640, 360], "court_size": [640, 360],
        "mask_classes": 4, "resnet_name": "resnet34",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "court_img": ASSET_IMG, "court_poi": ASSET_POI,
    }
    os.makedirs(cp_dir, exist_ok=True)
    with open(os.path.join(cp_dir, "conf.yaml"), "w") as f:
        yaml.safe_dump(conf, f)

    class A:
        batchsize = batch
        target_size = (640, 360); unet_size = (640, 360)
        warp_size = (640, 360); court_size = (640, 360)
        mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet34"
        resnet_input = "img+mask"
        use_warper = True; compute_dtype = "bfloat16"
        court_img = ASSET_IMG; court_poi = ASSET_POI

    bundle = build_model(A)
    cp = os.path.join(cp_dir, "CP_epoch1.msgpack")
    save_checkpoint(cp, bundle.variables)
    return cp


def decode_only_fps(path, target_size=(640, 360)):
    """Pure host-side decode+resize throughput over the whole video."""
    import cv2

    from sports_field_homography_tpu.data.dataset import VideoDataset

    ds = VideoDataset(path=path, target_size=target_size, raw_uint8=True)
    t0 = time.perf_counter()
    n = len(ds)
    for i in range(n):
        ds[i]
    dt = time.perf_counter() - t0
    ds.close()
    return n / dt


FPS_RE = re.compile(r"Processed (\d+) frames in ([0-9.]+)s \(([0-9.]+) fps\)")


def run_predict(video, cp, dst, batch, workers):
    cmd = [sys.executable, os.path.join(REPO, "predict.py"),
           "--video_path", video, "--load", cp, "--dst_dir", dst,
           "--req_outputs", "theta,consistency",
           "--batchsize", str(batch),
           "--video_workers", str(workers),
           # court assets must be FLAGS: they sit on the predict
           # conf-overlay ignore list (reference predict.py:147 semantics)
           "--court_img", ASSET_IMG, "--court_poi", ASSET_POI]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=1800)
    out = p.stdout + p.stderr
    if p.returncode != 0:
        sys.stderr.write(out[-4000:])
        raise SystemExit("predict CLI failed (workers=%d)" % workers)
    m = None
    for m in FPS_RE.finditer(out):
        pass
    if m is None:
        sys.stderr.write(out[-4000:])
        raise SystemExit("no fps line in predict output")
    return int(m.group(1)), float(m.group(3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_frames", type=int, default=512)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--video_workers", type=str, default="1,4")
    ap.add_argument("--workdir", type=str, default="/tmp/sfh_video_bench")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    game_dir = os.path.join(args.workdir, "benchgame")
    os.makedirs(game_dir, exist_ok=True)
    # Include the frame count in the filename so reruns with a different
    # --n_frames in the same --workdir regenerate instead of benchmarking
    # a stale video and failing the frame-count assertion below.
    video = os.path.join(game_dir, "clip_%d.mp4" % args.n_frames)
    if not os.path.exists(video):
        make_video(video, args.n_frames)
    cp = make_checkpoint(os.path.join(args.workdir, "ckpt"), args.batch)

    dec_fps = decode_only_fps(video)
    print(json.dumps({"metric": "video_decode_only", "value": round(dec_fps, 1),
                      "unit": "frames/sec"}))

    for workers in [int(w) for w in args.video_workers.split(",")]:
        dst = os.path.join(args.workdir, "out_n%d_w%d" % (args.n_frames,
                                                          workers))
        run_predict(video, cp, dst, args.batch, workers)   # compile pass
        n, fps = run_predict(video, cp, dst, args.batch, workers)
        court = json.load(open(os.path.join(
            dst, "benchgame_court.json")))
        frames = [k for k in court if k != "model"]
        assert len(frames) == args.n_frames, \
            "expected %d frames in court JSON, got %d" % (args.n_frames,
                                                          len(frames))
        print(json.dumps({
            "metric": "video_e2e_predict", "value": round(fps, 1),
            "unit": "frames/sec", "n_frames": n,
            "video_workers": workers, "batch": args.batch}))


if __name__ == "__main__":
    main()
