"""C++ predict pipeline (cpp/pjrt_predict.cc) on the real TPU.

The binary decodes frames with OpenCV, batches them, executes a serving
artifact via the PJRT C API (pipelined: decode threads -> device -> writer
thread) and writes the reference-format ``{game}_court.json`` — the native
analog of reference ``predict.py``'s 3-process pipeline.  These tests
export a tiny fixed-batch TPU artifact, run the binary in a subprocess
(independent of this process's forced-CPU jax), and check:

  * image-dir mode: per-frame theta/score match a CPU-artifact reference
    fed the same PNG pixels (lossless round-trip), names/tail-batch
    padding correct (5 frames through batch 2);
  * video mode: names are the reference's ``%06d`` frame convention and
    identical frames produce identical outputs (decoder-parity-free check).

Skipped when the plugin, g++, OpenCV dev files, or the PJRT header is
unavailable.
"""
import json
import os
import subprocess
import uuid

import numpy as np
import pytest

import jax

from sports_field_homography_tpu.cli.engine import build_model
from sports_field_homography_tpu.compat.serving import (
    export_predict, load_serving, save_serving)

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from cpp_build import PLUGIN, have_build_deps, have_plugin  # noqa: E402

pytestmark = [pytest.mark.full, pytest.mark.skipif(
    not have_build_deps(),
    reason="needs g++, OpenCV dev files, and the PJRT C API header")]

requires_plugin = pytest.mark.skipif(
    not have_plugin(), reason="needs the axon PJRT plugin")


class _Args:
    batchsize = 2
    target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
    court_size = (W, H); mask_classes = 4
    use_unet = True; unet_bilinear = False; unet_uv = False
    use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
    use_warper = True; compute_dtype = "float32"
    court_img = COURT_IMG; court_poi = COURT_POI


def _ensure_binary():
    from cpp_build import build
    return build("pjrt_predict")


def _export_artifacts(tmp_path):
    # poi rides along: its [B,N,2] output is the one XLA:TPU lays out
    # transposed on device, the regression FetchBuffer's explicit host
    # layout guards against (cpp/pjrt_common.h)
    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta", "poi")
    exported_tpu, meta_tpu = export_predict(
        bundle, consistency=True, project_poi=True, keep=keep,
        batch_size=2, platforms=("tpu",))
    save_serving(str(tmp_path / "tpu"), exported_tpu, meta_tpu)
    exported_cpu, meta_cpu = export_predict(
        bundle, consistency=True, project_poi=True, keep=keep,
        batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path / "cpu"), exported_cpu, meta_cpu)
    return bundle


def _tpu_env():
    env = dict(os.environ)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    return env


def _tpu_opts():
    return ["--opt", "topology=v5e:1x1x1", "--opt", "remote_compile=1",
            "--opt", "n_slices=1",
            "--opt", f"session_id=cxxp-{uuid.uuid4()}",
            "--opt", "rank=4294967295"]


def test_cpp_selftest():
    """Host-side pipeline pieces (JSON formatting, preprocess, queue
    shutdown semantics) — no plugin, runs anywhere the binary builds."""
    binary = _ensure_binary()
    r = subprocess.run([binary, "--selftest"], capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, r.stderr


@requires_plugin
def test_cpp_predict_img_dir(tmp_path):
    import cv2

    binary = _ensure_binary()
    _export_artifacts(tmp_path)

    # 5 frames at the artifact's exact size (no resize: lossless PNG
    # round-trip makes the CPU reference bit-comparable), batch 2 ->
    # 3 batches with a padded tail
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 255, (5, H, W, 3), np.uint8)
    game_dir = tmp_path / "tiny_game"
    game_dir.mkdir()
    for i, f in enumerate(frames):
        assert cv2.imwrite(str(game_dir / f"frame_{i:03d}.png"),
                           f[..., ::-1])  # imwrite takes BGR
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), "--img_dir", str(game_dir),
         "--dst_dir", str(out_dir), "--threads", "2", "--model", "unittest"]
        + _tpu_opts(),
        env=_tpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    with open(out_dir / "tiny_game_court.json") as f:
        court = json.load(f)
    assert court.pop("model") == "unittest"
    assert sorted(court) == [f"frame_{i:03d}" for i in range(5)]

    # CPU reference on the same pixels
    fn, _ = load_serving(str(tmp_path / "cpu"))
    ref_theta, ref_score, ref_poi = [], [], []
    padded = np.concatenate([frames, frames[:1]], axis=0)  # 5 -> 3 batches
    for b in range(3):
        out = jax.device_get(fn(padded[2 * b:2 * b + 2]))
        ref_theta.append(np.asarray(out["theta"]))
        ref_score.append(np.asarray(out["consist_score"]))
        ref_poi.append(np.asarray(out["poi"]))
    ref_theta = np.concatenate(ref_theta)[:5]
    ref_score = np.concatenate(ref_score)[:5]
    ref_poi = np.concatenate(ref_poi)[:5]

    for i in range(5):
        entry = court[f"frame_{i:03d}"]
        theta = np.asarray(entry["theta"], np.float32)
        assert theta.shape == (1, 3, 3)
        np.testing.assert_allclose(theta, ref_theta[i], rtol=0, atol=1e-3)
        assert abs(entry["score"] - float(ref_score[i])) < 1e-3
        poi = np.asarray(entry["poi"], np.float32)
        assert poi.shape == ref_poi[i].shape
        np.testing.assert_allclose(poi, ref_poi[i], rtol=0, atol=2e-3)

    # --resume: rebuild an interrupted run's part JSONL from three of the
    # five records plus a torn tail line; the rerun must skip those three,
    # re-predict the rest, and merge all five (keep-last, ledger records
    # byte-preserved)
    jsonl = out_dir / "tiny_game_court_processing.json"
    with open(jsonl, "w") as f:
        for i in (0, 1, 3):
            rec = {k: court[f"frame_{i:03d}"][k] for k in ("score", "theta")}
            f.write(json.dumps({f"frame_{i:03d}": rec}) + "\n")
        f.write('{"frame_004": {"score": 0.')  # torn by the "crash"
    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), "--img_dir", str(game_dir),
         "--dst_dir", str(out_dir), "--model", "unittest", "--resume"]
        + _tpu_opts(),
        env=_tpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "--resume: 3 frames already" in r.stderr
    with open(out_dir / "tiny_game_court.json") as f:
        resumed = json.load(f)
    assert resumed.pop("model") == "unittest"
    assert sorted(resumed) == sorted(court)
    for name, entry in court.items():
        np.testing.assert_allclose(
            np.asarray(resumed[name]["theta"], np.float32),
            np.asarray(entry["theta"], np.float32), rtol=0, atol=1e-3)
        assert abs(resumed[name]["score"] - entry["score"]) < 1e-3


@requires_plugin
def test_cpp_predict_masks(tmp_path):
    """Full-output config: segm_mask/warp_mask PNGs written with the Python
    CLI's semantics (gray labels, nearest resize to --out_size), values
    equal to a CPU-artifact reference on the same pixels."""
    import cv2

    binary = _ensure_binary()
    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta", "segm_mask", "warp_mask")
    for platform in ("tpu", "cpu"):
        exported, meta = export_predict(
            bundle, consistency=True, project_poi=False, keep=keep,
            batch_size=2, platforms=(platform,))
        save_serving(str(tmp_path / platform), exported, meta)

    rng = np.random.RandomState(7)
    frames = rng.randint(0, 255, (3, H, W, 3), np.uint8)
    game_dir = tmp_path / "mask_game"
    game_dir.mkdir()
    for i, f in enumerate(frames):
        assert cv2.imwrite(str(game_dir / f"frame_{i:03d}.png"), f[..., ::-1])
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), "--img_dir", str(game_dir),
         "--dst_dir", str(out_dir), "--mask_type", "gray",
         "--out_size", f"{2 * W}x{2 * H}", "--debug"] + _tpu_opts(),
        env=_tpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    # CPU reference masks on the same pixels + the same nearest upscale
    fn, _ = load_serving(str(tmp_path / "cpu"))
    padded = np.concatenate([frames, frames[:1]], axis=0)
    ref = {k: [] for k in ("segm_mask", "warp_mask")}
    for b in range(2):
        out = jax.device_get(fn(padded[2 * b:2 * b + 2]))
        for k in ref:
            ref[k].append(np.asarray(out[k], np.uint8))
    for k in ref:
        ref[k] = np.concatenate(ref[k])[:3]

    for sub in ("segm_mask", "warp_mask"):
        for i in range(3):
            path = out_dir / "court" / sub / f"frame_{i:03d}.png"
            assert path.exists(), f"missing {path}"
            got = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
            want = cv2.resize(ref[sub][i], (2 * W, 2 * H),
                              interpolation=cv2.INTER_NEAREST)
            assert got.shape == want.shape
            # TPU-vs-CPU float differences can flip argmax/boundary pixels
            # (same tolerance class as the torch parity suite's <0.1%
            # label-mismatch bound)
            mismatch = np.mean(got != want)
            assert mismatch < 0.01, f"{sub} {i}: {mismatch:.4f} mismatched"

    # debug renders: one jpeg per frame at the ORIGINAL frame size, with
    # blended (mask-overlay) pixels somewhere — cli/predict._write_debug
    # semantics (overlay of the palette-colored warp mask + score text)
    for i in range(3):
        path = out_dir / "court" / "debug" / f"frame_{i:03d}.jpeg"
        assert path.exists(), f"missing {path}"
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        assert img.shape == (H, W, 3)
        assert np.any(img != cv2.imread(str(game_dir / f"frame_{i:03d}.png")))

    # theta/score JSON still written alongside the masks
    with open(out_dir / "mask_game_court.json") as f:
        court = json.load(f)
    court.pop("model")
    assert sorted(court) == [f"frame_{i:03d}" for i in range(3)]

    # --mask_save_format pickle: the same masks as a Python-compatible
    # pickled PNG-buffer stream (the Python CLI's default sink), readable
    # by viz_preds' MaskReader and equal to the PNG run's pixels
    from sports_field_homography_tpu.cli.viz_preds import MaskReader

    pkl_dir = tmp_path / "out_pkl"
    pkl_dir.mkdir()
    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), "--img_dir", str(game_dir),
         "--dst_dir", str(pkl_dir), "--mask_type", "gray",
         "--out_size", f"{2 * W}x{2 * H}", "--mask_save_format", "pickle"]
        + _tpu_opts(),
        env=_tpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    for sub in ("segm_mask", "warp_mask"):
        stream = pkl_dir / "court" / sub / "data.pkl"
        assert stream.exists(), f"missing {stream}"
        assert not (pkl_dir / "court" / sub / "frame_000.png").exists()
        reader = MaskReader(path=str(stream))
        entries = {name: MaskReader.decode(buf) for name, buf in reader}
        assert sorted(entries) == [f"frame_{i:03d}" for i in range(3)]
        for i in range(3):
            png = cv2.imread(str(out_dir / "court" / sub /
                                 f"frame_{i:03d}.png"),
                             cv2.IMREAD_GRAYSCALE)
            np.testing.assert_array_equal(entries[f"frame_{i:03d}"], png)


@requires_plugin
def test_cpp_predict_video(tmp_path):
    import cv2

    binary = _ensure_binary()
    _export_artifacts(tmp_path)

    # identical solid-color frames: any decoder reproduces them, and the
    # pipeline must map them all to one (theta, score)
    game_dir = tmp_path / "some_game"
    game_dir.mkdir()
    video_path = game_dir / "clip.mp4"
    vw = cv2.VideoWriter(str(video_path),
                         cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (W, H))
    assert vw.isOpened()
    frame = np.full((H, W, 3), (40, 90, 160), np.uint8)
    for _ in range(5):
        vw.write(frame)
    vw.release()

    out_dir = tmp_path / "out_video"
    out_dir.mkdir()
    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), "--video", str(video_path),
         "--dst_dir", str(out_dir), "--limit", "5"] + _tpu_opts(),
        env=_tpu_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]

    with open(out_dir / "some_game_court.json") as f:
        court = json.load(f)
    assert court.pop("model") == "tpu"  # defaults to the artifact dir name
    assert sorted(court) == [f"{i:06d}" for i in range(5)]
    thetas = np.stack([np.asarray(court[f"{i:06d}"]["theta"], np.float32)
                       for i in range(5)])
    assert np.isfinite(thetas).all()
    # same input frame -> same output, across batches and tail padding
    np.testing.assert_array_equal(thetas, np.broadcast_to(thetas[:1],
                                                          thetas.shape))
    scores = [court[f"{i:06d}"]["score"] for i in range(5)]
    assert len(set(scores)) == 1 and np.isfinite(scores[0])
