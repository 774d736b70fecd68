"""Trained-checkpoint parity: weights trained by the reference's OWN loop.

Round-3 review ask #5: every parity number so far came from fresh-init
weights; BN running stats had never moved and the theta head was only
hand-perturbed.  Here the torch reference trains ITSELF for a couple of
epochs on the synthetic set (scripts/train_reference_torch.py drives
``/root/reference/train.py:43`` ``train_net`` over the reference's own
BasicDataset/DataLoader), then BOTH predict CLIs run off the SAME
``.pth`` + ``conf.yaml`` directory and the ``{game}_court.json``
artifacts are diffed — theta/PoI/score from genuinely trained weights.

The longer "few hundred steps" variant of the same chain is recorded in
BASELINE.md.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.full

W, H = 128, 72
N = 20
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REQ = "theta,poi,consistency"


def _torch_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # plain torch subprocess
    return env


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("trained_parity")
    synth = root / "synth"
    ckpt = root / "ckpt"
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_dataset.py",
         "--dst", str(synth), "--n", str(N), "--size", str(W), str(H)],
        cwd=REPO, check=True, env=_torch_env(), timeout=600,
        capture_output=True)
    proc = subprocess.run(
        [sys.executable, "scripts/train_reference_torch.py",
         "--data", str(synth), "--cp_dir", str(ckpt),
         "--epochs", "2", "--batch", "4", "--size", str(W), str(H)],
        cwd=REPO, env=_torch_env(), timeout=1200, capture_output=True,
        text=True)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return dict(root=root, synth=synth,
                pth=ckpt / "CP_epoch2.pth",
                img_dir=synth / "frames" / "train_game")


def test_checkpoint_is_actually_trained(trained):
    """BN running stats moved and the theta head is non-identity — the
    surfaces fresh-init parity never exercised."""
    import torch

    sd = torch.load(str(trained["pth"]), map_location="cpu")
    rm = sd["bn1.running_mean"] if "bn1.running_mean" in sd else None
    moved = [k for k, v in sd.items()
             if k.endswith("running_mean") and float(v.abs().max()) > 1e-4]
    assert len(moved) > 10, (len(moved), rm)
    reg_w = sd["resnet_reg.reg.weight"]
    assert float(reg_w.abs().max()) > 0  # head updated away from zero init


@pytest.fixture(scope="module")
def artifacts(trained, tmp_path_factory):
    common = [
        "--img_dir", str(trained["img_dir"]),
        "--req_outputs", REQ,
        "--out_size", str(W), str(H),
        "--batchsize", "4",
        # court assets must come as FLAGS: the predict conf overlay
        # ignores them (reference predict.py:147 ignore_keys)
        "--court_img", os.path.join(REPO, "assets",
                                    "mask_ncaa_v4_nc4_m_onehot.png"),
        "--court_poi", os.path.join(REPO, "assets",
                                    "template_ncaa_v4_points.json"),
    ]
    # 1) the reference's own predict.py on its own trained .pth
    ref_dst = tmp_path_factory.mktemp("ref_out")
    runner = os.path.join(REPO, "tests", "ref_predict_runner.py")
    proc = subprocess.run(
        [sys.executable, runner, "--load", str(trained["pth"]),
         "--dst_dir", str(ref_dst)] + common,
        capture_output=True, text=True, env=_torch_env(), timeout=900)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

    # 2) our CLI importing the SAME .pth (conf.yaml sidecar discovery)
    from sports_field_homography_tpu.cli.predict import process as our_predict

    our_dst = tmp_path_factory.mktemp("our_out")
    our_predict(["--load", str(trained["pth"]),
                 "--dst_dir", str(our_dst),
                 "--compute_dtype", "float32"] + common)
    return dict(ref=ref_dst, ours=our_dst)


def _court(dst):
    path = os.path.join(dst, "train_game_court.json")
    assert os.path.exists(path), os.listdir(dst)
    return json.load(open(path))


# parity is asserted on the unit Frobenius sphere: a briefly-trained
# checkpoint's raw theta scale is arbitrary (observed ~1.5e6 after 2
# epochs, with BOTH frameworks agreeing to ~5e-7 relative) — see the
# shared helper's docstring
from theta_utils import unit_theta as _unit_theta  # noqa: E402


PROD_W, PROD_H = 640, 360          # the reference's shipped model size
PROD_OUT = (1280, 720)             # default --out_size (utils/config.py:158)


@pytest.fixture(scope="module")
def prod_artifacts(trained, tmp_path_factory):
    """Both CLIs at the reference's REAL operating point (round-4 verdict
    #6): the trained weights loaded into the 640x360 model (fully
    convolutional + adaptive pool, so the 128x72-trained checkpoint loads
    at any size — exactly the train-at-X / predict-at-640x360 deployment
    the reference's own example configs describe), out_size 1280x720
    (court/warp floored up to it, reference predict.py:150-155), FULL
    req_outputs, 2 frames."""
    import shutil
    import yaml

    root = tmp_path_factory.mktemp("prod_parity")
    # 2 production-sized frames (independent of the 128x72 training set)
    synth = root / "synth640"
    # --n counts train+val; n=3 leaves 2 frames in train_game (the dir
    # both CLIs read)
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_dataset.py",
         "--dst", str(synth), "--n", "3", "--size", str(PROD_W),
         str(PROD_H)],
        cwd=REPO, check=True, env=_torch_env(), timeout=600,
        capture_output=True)
    img_dir = synth / "frames" / "train_game"

    # the trained .pth with a production-size sidecar (target/unet_size
    # are NOT in predict's conf ignore list, so the sidecar is what sets
    # the model resolution — reference predict.py:147)
    cp_dir = root / "ckpt_prod"
    cp_dir.mkdir()
    shutil.copy(str(trained["pth"]), str(cp_dir / "CP_epoch2.pth"))
    with open(os.path.join(os.path.dirname(str(trained["pth"])),
                           "conf.yaml")) as f:
        conf = yaml.safe_load(f)
    conf["target_size"] = [PROD_W, PROD_H]
    conf["unet_size"] = [PROD_W, PROD_H]
    conf["warp_size"] = [PROD_W, PROD_H]
    with open(cp_dir / "conf.yaml", "w") as f:
        yaml.safe_dump(conf, f)

    common = [
        "--img_dir", str(img_dir),
        "--req_outputs", "theta,poi,consistency,segm_mask,warp_mask",
        "--out_size", str(PROD_OUT[0]), str(PROD_OUT[1]),
        "--batchsize", "2",
        "--mask_save_format", "png",
        "--court_img", os.path.join(REPO, "assets",
                                    "mask_ncaa_v4_nc4_m_onehot.png"),
        "--court_poi", os.path.join(REPO, "assets",
                                    "template_ncaa_v4_points.json"),
    ]
    ref_dst = tmp_path_factory.mktemp("ref_prod_out")
    runner = os.path.join(REPO, "tests", "ref_predict_runner.py")
    proc = subprocess.run(
        [sys.executable, runner, "--load", str(cp_dir / "CP_epoch2.pth"),
         "--dst_dir", str(ref_dst)] + common,
        capture_output=True, text=True, env=_torch_env(), timeout=1800)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

    from sports_field_homography_tpu.cli.predict import process as our_predict

    our_dst = tmp_path_factory.mktemp("our_prod_out")
    our_predict(["--load", str(cp_dir / "CP_epoch2.pth"),
                 "--dst_dir", str(our_dst),
                 "--compute_dtype", "float32"] + common)
    return dict(ref=ref_dst, ours=our_dst)


def test_production_shape_court_json_parity(prod_artifacts):
    """North-star tolerances at the SHIPPED geometry (640x360 model,
    1280x720 outputs), trained weights — not only at toy shapes."""
    ref = _court(prod_artifacts["ref"])
    ours = _court(prod_artifacts["ours"])
    frames = {k for k in ref if k != "model"}
    assert frames == {k for k in ours if k != "model"} and len(frames) == 2
    for k in sorted(frames):
        t_r = _unit_theta(ref[k]["theta"])
        t_o = _unit_theta(ours[k]["theta"])
        assert float(np.max(np.abs(t_r - t_o))) <= 1e-3, k
        assert abs(float(ref[k]["score"]) - float(ours[k]["score"])) <= 1e-3
        p_r = np.asarray(ref[k]["poi"], np.float64)
        p_o = np.asarray(ours[k]["poi"], np.float64)
        assert p_r.shape == p_o.shape
        assert float(np.max(np.abs(p_r - p_o))) <= 1e-3, k


@pytest.mark.parametrize("sub,max_flips", [("court/segm_mask", 0.005),
                                           ("court/warp_mask", 0.01)])
def test_production_shape_masks_parity(prod_artifacts, sub, max_flips):
    """1280x720 mask artifacts pixel-equal up to argmax/boundary flips."""
    from PIL import Image

    ref_dir = os.path.join(prod_artifacts["ref"], sub)
    our_dir = os.path.join(prod_artifacts["ours"], sub)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(our_dir)) and len(ref_files) == 2
    for f in ref_files:
        a = np.asarray(Image.open(os.path.join(ref_dir, f)))
        b = np.asarray(Image.open(os.path.join(our_dir, f)))
        assert a.shape == b.shape == (PROD_OUT[1], PROD_OUT[0]), f
        flips = float(np.mean(a != b))
        assert flips < max_flips, (sub, f, flips)


def test_trained_court_json_parity(artifacts):
    ref = _court(artifacts["ref"])
    ours = _court(artifacts["ours"])
    ref_frames = {k for k in ref if k != "model"}
    assert ref_frames == {k for k in ours if k != "model"}
    assert ref_frames, ref
    max_theta = max_score = max_poi = 0.0
    for k in sorted(ref_frames):
        t_r = _unit_theta(ref[k]["theta"])
        t_o = _unit_theta(ours[k]["theta"])
        max_theta = max(max_theta, float(np.max(np.abs(t_r - t_o))))
        max_score = max(max_score,
                        abs(float(ref[k]["score"]) - float(ours[k]["score"])))
        p_r = np.asarray(ref[k]["poi"], np.float64)
        p_o = np.asarray(ours[k]["poi"], np.float64)
        max_poi = max(max_poi, float(np.max(np.abs(p_r - p_o))))
    # the BASELINE.json north star tolerance, now from TRAINED weights
    # (theta on the unit sphere; poi/score are naturally normalized)
    assert max_theta <= 1e-3, max_theta
    assert max_score <= 1e-3, max_score
    assert max_poi <= 1e-3, max_poi
