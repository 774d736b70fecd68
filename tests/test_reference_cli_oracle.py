"""Drop-in oracle: the reference's OWN predict CLI vs ours, same weights.

The round-3 review's #2 ask: nothing had ever exercised the drop-in /
bit-faithful-output-format claim through the reference's actual CLI.
This test exports our (fresh-init, theta-head-perturbed) checkpoint to
``.pth``, runs ``/root/reference/predict.py`` on CPU (stubbed kornia +
threaded pipeline, tests/ref_predict_runner.py) over a frame directory,
runs OUR ``cli/predict.py`` on the same frames from the ``.msgpack``
twin, and diffs the artifacts themselves:

  * ``{game}_court.json``: same frame keys + ``model`` key; per-frame
    theta within 1e-3, score within 1e-3, poi within 1e-3;
  * ``court/segm_mask`` and ``court/warp_mask`` PNGs: same file sets,
    pixel-equal up to a small argmax/boundary-flip fraction.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.full

import jax

from sports_field_homography_tpu.cli.engine import build_model
from sports_field_homography_tpu.cli.predict import process as our_predict
from sports_field_homography_tpu.compat.torch_export import (
    save_torch_checkpoint)
from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

W, H = 64, 36
N_FRAMES = 4
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"
REQ = "segm_mask,warp_mask,theta,poi,consistency"


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle")
    img_dir = root / "frames"
    img_dir.mkdir()
    rng = np.random.RandomState(6)
    for i in range(N_FRAMES):
        arr = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")

    cp_dir = root / "ckpt" / "model_v1"
    cp_dir.mkdir(parents=True)
    conf = {
        "target_size": [W, H], "unet_size": [W, H],
        "mask_classes": 4, "resnet_name": "resnet18",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "unet_bilinear": False,
    }
    import yaml
    with open(cp_dir / "conf.yaml", "w") as f:
        yaml.safe_dump(conf, f)

    class A:
        batchsize = 2
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A, load=None)
    variables = jax.device_get(bundle.variables)
    # perturb the identity-initialized theta head so theta/poi/warp are
    # NOT the trivial identity (a stronger value diff than fresh init)
    rng = np.random.RandomState(7)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    reg = dict(params["resnet_reg"]["reg"])
    reg["bias"] = (np.asarray(reg["bias"])
                   + rng.randn(*np.shape(reg["bias"])).astype(np.float32)
                   * 0.02)
    params = dict(params)
    params["resnet_reg"] = dict(params["resnet_reg"], reg=reg)
    variables = dict(variables, params=params)

    save_checkpoint(str(cp_dir / "CP_epoch1.msgpack"), variables)
    save_torch_checkpoint(str(cp_dir / "CP_epoch1.pth"), variables)
    return dict(root=root, img_dir=img_dir, cp_dir=cp_dir)


def _common_flags(workspace, dst, source=None):
    return (source or ["--img_dir", str(workspace["img_dir"])]) + [
        "--dst_dir", str(dst),
        "--req_outputs", REQ,
        "--out_size", str(W), str(H),
        "--batchsize", "2",
        # the reference DEFAULTS to the pickle stream, whose writer handle
        # is dropped (predict.py:331 discards the return), truncating the
        # file every frame — PNG is the comparable artifact surface
        "--mask_save_format", "png",
        "--court_img", COURT_IMG,
        "--court_poi", COURT_POI,
    ]


@pytest.fixture(scope="module")
def artifacts(workspace, tmp_path_factory):
    # 1) the reference's own predict.py on the exported .pth
    ref_dst = tmp_path_factory.mktemp("ref_out")
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ref_predict_runner.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # plain torch subprocess
    proc = subprocess.run(
        [sys.executable, runner,
         "--load", str(workspace["cp_dir"] / "CP_epoch1.pth")]
        + _common_flags(workspace, ref_dst),
        capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

    # 2) our CLI on the .msgpack twin
    our_dst = tmp_path_factory.mktemp("our_out")
    our_predict(["--load", str(workspace["cp_dir"] / "CP_epoch1.msgpack"),
                 "--compute_dtype", "float32"]
                + _common_flags(workspace, our_dst))
    return dict(ref=ref_dst, ours=our_dst)


def _load_court_json(dst):
    path = os.path.join(dst, "frames_court.json")
    assert os.path.exists(path), os.listdir(dst)
    return json.load(open(path))


def test_court_json_matches_reference(artifacts):
    ref = _load_court_json(artifacts["ref"])
    ours = _load_court_json(artifacts["ours"])
    assert set(ref) == set(ours)
    assert ref["model"] == ours["model"] == "model_v1"
    for k in ref:
        if k == "model":
            continue
        t_ref = np.asarray(ref[k]["theta"], np.float64)
        t_our = np.asarray(ours[k]["theta"], np.float64)
        assert t_ref.shape == t_our.shape == (1, 3, 3)
        assert np.abs(t_ref - t_our).max() < 1e-3, k
        assert abs(ref[k]["score"] - ours[k]["score"]) < 1e-3, k
        p_ref = np.asarray(ref[k]["poi"], np.float64)
        p_our = np.asarray(ours[k]["poi"], np.float64)
        assert p_ref.shape == p_our.shape
        assert np.abs(p_ref - p_our).max() < 1e-3, k


# --- video source ----------------------------------------------------------
# The reference's SECOND input source (predict.py:224 -> VideoDataset,
# utils/dataset.py:296-358): sequential cv2 decode, frame names
# ``{video}/{frame:06d}`` (JSON keys keep only the frame part, masks go to
# flat court/*/{frame}.png — predict.py:318-327), game name =
# basename(dirname(video_path)) (predict.py:164).  Same artifact diff as
# the img-dir oracle, driven end-to-end on an mp4 both CLIs decode with
# cv2 (identical decoded frames, so tolerances match the img-dir case).

N_VIDEO_FRAMES = 5


@pytest.fixture(scope="module")
def video_workspace(workspace, tmp_path_factory):
    import cv2

    vdir = tmp_path_factory.mktemp("videos") / "vgame"
    vdir.mkdir()
    video = str(vdir / "clip.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
    assert wr.isOpened(), "mp4v VideoWriter unavailable"
    rng = np.random.RandomState(13)
    for _ in range(N_VIDEO_FRAMES):
        wr.write(rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
    wr.release()
    return dict(workspace, video=video)


@pytest.fixture(scope="module")
def video_artifacts(video_workspace, tmp_path_factory):
    source = ["--video_path", video_workspace["video"]]

    ref_dst = tmp_path_factory.mktemp("ref_video_out")
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "ref_predict_runner.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, runner,
         "--load", str(video_workspace["cp_dir"] / "CP_epoch1.pth")]
        + _common_flags(video_workspace, ref_dst, source=source),
        capture_output=True, text=True, env=env, timeout=900)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

    our_dst = tmp_path_factory.mktemp("our_video_out")
    our_predict(
        ["--load", str(video_workspace["cp_dir"] / "CP_epoch1.msgpack"),
         "--compute_dtype", "float32"]
        + _common_flags(video_workspace, our_dst, source=source))
    return dict(ref=ref_dst, ours=our_dst)


def test_video_court_json_matches_reference(video_artifacts):
    ref = json.load(open(os.path.join(video_artifacts["ref"],
                                      "vgame_court.json")))
    ours = json.load(open(os.path.join(video_artifacts["ours"],
                                       "vgame_court.json")))
    assert set(ref) == set(ours)
    assert ref["model"] == ours["model"] == "model_v1"
    frames = sorted(k for k in ref if k != "model")
    assert frames == [f"{i:06d}" for i in range(N_VIDEO_FRAMES)]
    for k in frames:
        t_ref = np.asarray(ref[k]["theta"], np.float64)
        t_our = np.asarray(ours[k]["theta"], np.float64)
        assert t_ref.shape == t_our.shape == (1, 3, 3)
        assert np.abs(t_ref - t_our).max() < 1e-3, k
        assert abs(ref[k]["score"] - ours[k]["score"]) < 1e-3, k
        p_ref = np.asarray(ref[k]["poi"], np.float64)
        p_our = np.asarray(ours[k]["poi"], np.float64)
        assert p_ref.shape == p_our.shape
        assert np.abs(p_ref - p_our).max() < 1e-3, k


@pytest.mark.parametrize("sub,max_flips", [("court/segm_mask", 0.005),
                                           ("court/warp_mask", 0.01)])
def test_video_mask_pngs_match_reference(video_artifacts, sub, max_flips):
    ref_dir = os.path.join(video_artifacts["ref"], sub)
    our_dir = os.path.join(video_artifacts["ours"], sub)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(our_dir))
    assert len(ref_files) == N_VIDEO_FRAMES
    for f in ref_files:
        a = np.asarray(Image.open(os.path.join(ref_dir, f)))
        b = np.asarray(Image.open(os.path.join(our_dir, f)))
        assert a.shape == b.shape, f
        flips = float(np.mean(a != b))
        assert flips < max_flips, (sub, f, flips)


@pytest.mark.parametrize("sub,max_flips", [("court/segm_mask", 0.005),
                                           ("court/warp_mask", 0.01)])
def test_mask_pngs_match_reference(artifacts, sub, max_flips):
    ref_dir = os.path.join(artifacts["ref"], sub)
    our_dir = os.path.join(artifacts["ours"], sub)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(our_dir))
    assert len(ref_files) == N_FRAMES
    for f in ref_files:
        a = np.asarray(Image.open(os.path.join(ref_dir, f)))
        b = np.asarray(Image.open(os.path.join(our_dir, f)))
        assert a.shape == b.shape, f
        flips = float(np.mean(a != b))
        # CPU f32 argmax near-ties / nearest-warp boundary pixels only
        assert flips < max_flips, (sub, f, flips)
