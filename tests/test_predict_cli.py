"""End-to-end predict CLI test on a synthetic image directory (CPU).

Covers BASELINE config #1 (theta+consistency JSON) plus the full-output
config (segm/warp masks, poi, debug renders) in both save formats.
"""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from sports_field_homography_tpu.cli.predict import process
from sports_field_homography_tpu.cli.engine import build_model
from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

W, H = 64, 36
N_FRAMES = 5


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("predict")
    img_dir = root / "frames"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(N_FRAMES):
        arr = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")

    cp_dir = root / "ckpt" / "model_v1"
    cp_dir.mkdir(parents=True)
    conf = {
        "target_size": [W, H], "unet_size": [W, H], "warp_size": [W, H],
        "court_size": [W, H], "mask_classes": 4, "resnet_name": "resnet18",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "court_img": "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
        "court_poi": "/root/repo/assets/template_ncaa_v4_points.json",
    }
    import yaml
    with open(cp_dir / "conf.yaml", "w") as f:
        yaml.safe_dump(conf, f)

    class A:  # minimal args object for build_model
        batchsize = 2
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = conf["court_img"]; court_poi = conf["court_poi"]

    bundle = build_model(A, load=None)
    save_checkpoint(str(cp_dir / "CP_epoch1.msgpack"), bundle.variables)
    return dict(root=root, img_dir=img_dir, cp=cp_dir / "CP_epoch1.msgpack")


def run(workspace, dst, req_outputs, extra=None):
    argv = [
        "--img_dir", str(workspace["img_dir"]),
        "--load", str(workspace["cp"]),
        "--dst_dir", str(dst),
        "--req_outputs", req_outputs,
        "--out_size", str(W), str(H),
        "--batchsize", "2",
        "--compute_dtype", "float32",
        # court assets are ignore_keys in the conf overlay (reference
        # predict.py:147) so they must come from the CLI
        "--court_img", "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
        "--court_poi", "/root/repo/assets/template_ncaa_v4_points.json",
    ] + (extra or [])
    process(argv)


def test_theta_consistency_json(workspace, tmp_path):
    """BASELINE config #1: theta + consistency -> {game}_court.json."""
    run(workspace, tmp_path, "theta,consistency")
    out = json.load(open(tmp_path / "frames_court.json"))
    assert out["model"] == "model_v1"
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == N_FRAMES
    for v in frames.values():
        theta = np.asarray(v["theta"])
        assert theta.shape == (1, 3, 3)
        # untrained model: identity-initialized head
        assert np.abs(theta[0] - np.eye(3)).max() < 0.2
        assert isinstance(v["score"], float) and v["score"] >= 0


def test_full_outputs_png(workspace, tmp_path):
    run(workspace, tmp_path, "segm_mask,warp_mask,theta,poi,consistency,debug",
        extra=["--mask_save_format", "png"])
    for sub in ("court/segm_mask", "court/warp_mask", "court/debug"):
        files = os.listdir(tmp_path / sub)
        assert len(files) == N_FRAMES, (sub, files)
    segm = np.array(Image.open(tmp_path / "court/segm_mask" / "000000.png"))
    assert segm.shape == (H, W)
    assert segm.max() <= 3
    out = json.load(open(tmp_path / "frames_court.json"))
    v = out["000000"]
    assert np.asarray(v["poi"]).shape == (52, 2)


def test_pickle_mask_stream(workspace, tmp_path):
    run(workspace, tmp_path, "segm_mask,theta",
        extra=["--mask_save_format", "pickle"])
    entries = []
    with open(tmp_path / "court/segm_mask/data.pkl", "rb") as f:
        while True:
            try:
                entries.append(pickle.load(f))
            except EOFError:
                break
    assert len(entries) == N_FRAMES
    import cv2
    name, buf = entries[0]
    mask = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
    assert mask.shape == (H, W)


def test_rgb_and_bin_mask_types(workspace, tmp_path):
    run(workspace, tmp_path / "rgb", "segm_mask",
        extra=["--mask_save_format", "png", "--mask_type", "rgb"])
    rgb = np.array(Image.open(tmp_path / "rgb/court/segm_mask/000000.png"))
    assert rgb.shape == (H, W, 3)
    run(workspace, tmp_path / "bin", "segm_mask",
        extra=["--mask_save_format", "png", "--mask_type", "bin"])
    b = np.array(Image.open(tmp_path / "bin/court/segm_mask/000000.png"))
    assert set(np.unique(b)).issubset({0, 255})


def test_uneven_device_batch_fails_fast(workspace, tmp_path):
    """batchsize 6 over 8 devices: clear CLI error, not an XLA sharding
    crash (parallel.mesh.check_batch_divisible)."""
    argv = [
        "--img_dir", str(workspace["img_dir"]),
        "--load", str(workspace["cp"]),
        "--dst_dir", str(tmp_path),
        "--req_outputs", "theta",
        "--batchsize", "6",
        "--num_devices", "8",
        "--court_img", "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
        "--court_poi", "/root/repo/assets/template_ncaa_v4_points.json",
    ]
    with pytest.raises(SystemExit, match="not divisible by num_devices"):
        process(argv)
