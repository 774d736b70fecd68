"""End-to-end UV pipeline: prep -> train(unet_uv + uv_loss) -> eval.

Everything is produced by this repo: the synthetic generator writes the
uint16 (mask, u, v) tiffs (notebook step 9 equivalent,
``football_dataset.ipynb`` cell 15 / reference ``utils/court.py:102-129``),
the loader reads them back through ``preprocess_uv_mask``, and the train
CLI runs with ``unet_uv=True`` + ``uv_loss`` end to end.
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
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


@pytest.fixture(scope="module")
def uv_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("uvset")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/make_synthetic_dataset.py"),
         "--dst", str(root), "--n", "10", "--size", str(W), str(H), "--uv"],
        check=True, cwd=REPO)
    return root


def test_uv_tiffs_roundtrip(uv_dataset):
    """The written tiffs decode through the training loader's reader."""
    import cv2

    from sports_field_homography_tpu.data.dataset import preprocess_uv_mask

    game_dir = uv_dataset / "masks_uv" / "train_game"
    tifs = sorted(os.listdir(game_dir))
    assert len(tifs) == 9  # 10 samples, 1 val
    uv_mask = cv2.imread(str(game_dir / tifs[0]), -1)
    assert uv_mask.dtype == np.uint16 and uv_mask.shape == (H, W, 3)
    mask, uv = preprocess_uv_mask(uv_mask, (W, H))
    assert mask.shape == (H, W) and 0 <= mask.min() and mask.max() <= 3
    assert uv.shape == (H, W, 2) and uv.dtype == np.float32
    assert 0.0 <= uv.min() and uv.max() <= 1.0
    # u/v are normalized template coordinates where the court is visible
    assert (uv[..., 0] > 0).any() and (uv[..., 1] > 0).any()
    # the label channel matches the plain segmentation mask
    from PIL import Image
    seg = np.array(Image.open(uv_dataset / "masks" / "train_game"
                              / (tifs[0][:-4] + ".png")))
    np.testing.assert_array_equal(uv_mask[..., 0], seg)


def test_build_dataset_uv_step(uv_dataset, tmp_path):
    """prep.build_dataset --uv on repo-produced annos writes readable tiffs."""
    import cv2

    from sports_field_homography_tpu.prep.build_dataset import build_uv_masks

    # build_uv_masks consumes anno/<game>/*.json theta + masks/<game>/*.png;
    # synthetic annos have no theta, so write one (identity -> mask == uv
    # label channel trivially aligned)
    root = tmp_path / "prep"
    (root / "anno" / "g").mkdir(parents=True)
    (root / "masks" / "g").mkdir(parents=True)
    rng = np.random.RandomState(0)
    mask = rng.randint(0, 4, size=(H, W), dtype=np.uint8)
    cv2.imwrite(str(root / "masks" / "g" / "f0.png"), mask)
    with open(root / "anno" / "g" / "f0.json", "w") as f:
        json.dump({"theta": np.eye(3).tolist()}, f)
    counts = build_uv_masks(str(root), mask_size=(W, H), uv_offset=(2, 2))
    assert counts == {"g": 1}
    uv_mask = cv2.imread(str(root / "masks_uv" / "g" / "f0.tif"), -1)
    assert uv_mask.dtype == np.uint16 and uv_mask.shape == (H, W, 3)
    np.testing.assert_array_equal(uv_mask[..., 0], mask)
    # identity theta: interior u ramps left->right, v top->bottom
    u = uv_mask[..., 1].astype(np.float64) / np.iinfo(np.uint16).max
    assert u[H // 2, 3] < u[H // 2, W - 4]
    assert (u[:, :2] == 0).all()  # offset-trimmed border


@pytest.mark.full
def test_train_uv_end_to_end(uv_dataset, tmp_path):
    """Train CLI with unet_uv + uv_loss on the repo-produced tiffs."""
    from sports_field_homography_tpu.cli.train import main

    cp_dir = tmp_path / "cp"
    conf = {
        "img_dir": str(uv_dataset / "frames"),
        "mask_dir": str(uv_dataset / "masks_uv"),
        "anno_dir": str(uv_dataset / "anno"),
        "anno_keys": ["poi", "reproj_mse"], "val_names": ["val_game"],
        "court_img": COURT_IMG, "court_poi": COURT_POI,
        "court_size": [W, H], "target_size": [W, H], "unet_size": [W, H],
        "warp_size": [W, H], "mask_classes": 4,
        "use_unet": True, "unet_uv": True, "unet_bilinear": False,
        "use_resnet": True, "resnet_name": "resnet18",
        "resnet_input": "img+mask+uv",
        "opt": "RMSprop", "lr": 1e-4, "weight_decay": 1e-8,
        "epochs": 1, "batchsize": 3,
        "seg_loss": "CE", "rec_loss": "MSE", "reproj_loss": "RRMSE",
        "uv_loss": "MSE", "consist_loss": "CE", "consist_start_iter": 0,
        "cp_dir": str(cp_dir) + "/", "log_dir": str(tmp_path / "logs"),
        "compute_dtype": "float32",
    }
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)
    state = main(["-c", str(conf_path)])
    assert state is not None
    assert int(state["step"]) == 3          # 9 imgs / batch 3
    assert os.path.exists(cp_dir / "CP_epoch1.msgpack")
