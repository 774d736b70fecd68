"""End-to-end soccer-pitch variant: color-mask prep -> train -> predict.

The pitch assets ship as RGBA class-color masks (the reference converts
them with its ``generate_onehot`` prep step before training —
``dataset_utils/preparation.py:140-213``); the NCAA-only alternative in
earlier rounds left the second sport untested end to end.  Here the
synthetic generator converts ``assets/pitch_mask_nc4_hd.png`` to a
label-coded template, renders a pitch dataset from known homographies
(33-point PoI set, ``template_pitch_points.json``), and the train CLI +
predict CLI run on it end to end.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
W, H = 64, 36
PITCH_IMG = os.path.join(REPO, "assets", "pitch_mask_nc4_hd.png")
PITCH_POI = os.path.join(REPO, "assets", "template_pitch_points.json")


@pytest.fixture(scope="module")
def pitch_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("pitchset")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_synthetic_dataset.py"),
         "--dst", str(root), "--n", "10", "--size", str(W), str(H),
         "--court_img", PITCH_IMG, "--court_poi", PITCH_POI],
        check=True, cwd=REPO)
    return root


def test_pitch_template_converted(pitch_dataset):
    """The RGBA color mask became a label-coded grayscale template with
    every mapped class present, and the rendered masks/annos follow."""
    from PIL import Image

    tmpl = np.array(Image.open(pitch_dataset / "court_template_onehot.png"))
    assert tmpl.ndim == 2
    assert set(np.unique(tmpl)) == {0, 1, 2, 3}
    mask = np.array(Image.open(
        pitch_dataset / "masks" / "train_game" / "000000.png"))
    assert mask.shape == (H, W) and mask.max() <= 3
    anno = json.load(open(
        pitch_dataset / "anno" / "train_game" / "000000.json"))
    assert np.asarray(anno["poi"]).shape == (33, 3)   # pitch PoI set


@pytest.mark.full
def test_pitch_train_and_predict_end_to_end(pitch_dataset, tmp_path):
    """Train one epoch on the pitch dataset, then predict with the same
    template + 33-point PoI set through the CLI."""
    from sports_field_homography_tpu.cli.predict import process
    from sports_field_homography_tpu.cli.train import main

    tmpl_path = str(pitch_dataset / "court_template_onehot.png")
    cp_dir = tmp_path / "cp"
    conf = {
        "img_dir": str(pitch_dataset / "frames"),
        "mask_dir": str(pitch_dataset / "masks"),
        "anno_dir": str(pitch_dataset / "anno"),
        "anno_keys": ["poi", "reproj_mse"], "val_names": ["val_game"],
        "court_img": tmpl_path, "court_poi": PITCH_POI,
        "court_size": [W, H], "target_size": [W, H], "unet_size": [W, H],
        "warp_size": [W, H], "mask_classes": 4,
        "use_unet": True, "unet_bilinear": False,
        "use_resnet": True, "resnet_name": "resnet18",
        "resnet_input": "img+mask",
        "opt": "RMSprop", "lr": 1e-4, "weight_decay": 1e-8,
        "epochs": 1, "batchsize": 3,
        "seg_loss": "CE", "rec_loss": "MSE", "reproj_loss": "RRMSE",
        "cp_dir": str(cp_dir) + "/", "log_dir": str(tmp_path / "logs"),
        "compute_dtype": "float32",
    }
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    state = main(["-c", str(conf_path)])
    assert state is not None
    assert int(state["step"]) == 3          # 9 imgs / batch 3
    ckpt = cp_dir / "CP_epoch1.msgpack"
    assert os.path.exists(ckpt)

    dst = tmp_path / "preds"
    process(["--img_dir", str(pitch_dataset / "frames" / "val_game"),
             "--load", str(ckpt), "--dst_dir", str(dst),
             "--req_outputs", "theta,poi,consistency", "--batchsize", "2",
             "--court_img", tmpl_path, "--court_poi", PITCH_POI,
             "--compute_dtype", "float32"])
    out = json.load(open(dst / "val_game_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == 1                 # 10 samples, 1 val
    rec = next(iter(frames.values()))
    assert np.isfinite(np.asarray(rec["theta"])).all()
    assert np.asarray(rec["poi"]).shape[-2:] == (33, 2)
