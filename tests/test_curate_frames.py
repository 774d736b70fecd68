"""Curation CLI (scripts/curate_frames.py): the reference's
center_court_dataset.ipynb workflow as a command — render debug frames
from a {game}_court.json, split per game, move selected originals."""
import importlib.util
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "curate_frames", os.path.join(REPO, "scripts", "curate_frames.py"))
curate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(curate)

GAME = "2021_02_27_UCLA_at_Colorado"


def _make_workspace(tmp_path, n=3):
    import cv2

    frames_dir = tmp_path / "orig_frames" / GAME
    frames_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    mapping = {}
    for i in range(n):
        name = f"{GAME}-{i:05d}"
        img = rng.randint(0, 255, (72, 128, 3), dtype=np.uint8)
        cv2.imwrite(str(frames_dir / f"{name}.jpeg"), img)
        # identity-ish homography + distinct scores
        theta = np.eye(3)
        mapping[name] = {"theta": [theta.tolist()], "score": 0.01 * (i + 1)}
    mapping["model"] = "model_test"
    mpath = tmp_path / f"{GAME}_court.json"
    with open(mpath, "w") as f:
        json.dump(mapping, f)
    return mpath


def test_render_split_select_roundtrip(tmp_path):
    mpath = _make_workspace(tmp_path, n=3)
    debug = tmp_path / "debug"

    # 1. render: all 3 frames drawn; min_score filters the lowest
    curate.main(["render", "--mapping", str(mpath),
                 "--frames_dir", str(tmp_path / "orig_frames"),
                 "--dst_dir", str(debug)])
    rendered = sorted(os.listdir(debug))
    assert rendered == [f"{GAME}-{i:05d}.jpeg" for i in range(3)]

    # 2. manual triage: delete one debug frame
    os.remove(debug / f"{GAME}-00001.jpeg")

    # 3. split the survivors into per-game folders
    selected = tmp_path / "selected"
    curate.main(["split", "--src", str(debug), "--dst", str(selected)])
    assert sorted(os.listdir(selected / GAME)) == ["00000.jpeg", "00002.jpeg"]
    assert not [f for f in os.listdir(debug) if f.endswith(".jpeg")]

    # 4. select: move matching originals into the curated dataset
    curated = tmp_path / "frames"
    curate.main(["select", "--selected", str(selected),
                 "--frames_dir", str(tmp_path / "orig_frames"),
                 "--dst", str(curated)])
    assert sorted(os.listdir(curated / GAME)) == ["00000.jpeg", "00002.jpeg"]
    # moved (not copied): originals gone, the unselected one remains
    remaining = sorted(os.listdir(tmp_path / "orig_frames" / GAME))
    assert remaining == [f"{GAME}-00001.jpeg"]


def test_render_min_score_filter(tmp_path):
    mpath = _make_workspace(tmp_path, n=3)
    debug = tmp_path / "debug"
    curate.main(["render", "--mapping", str(mpath),
                 "--frames_dir", str(tmp_path / "orig_frames"),
                 "--dst_dir", str(debug), "--min_score", "0.015"])
    # scores are 0.01/0.02/0.03 -> the first frame is filtered
    assert sorted(os.listdir(debug)) == [f"{GAME}-{i:05d}.jpeg"
                                         for i in (1, 2)]


def test_select_copy_keeps_originals(tmp_path):
    mpath = _make_workspace(tmp_path, n=2)
    debug = tmp_path / "debug"
    curate.main(["render", "--mapping", str(mpath),
                 "--frames_dir", str(tmp_path / "orig_frames"),
                 "--dst_dir", str(debug)])
    selected = tmp_path / "selected"
    curate.main(["split", "--src", str(debug), "--dst", str(selected)])
    curated = tmp_path / "frames"
    curate.main(["select", "--selected", str(selected),
                 "--frames_dir", str(tmp_path / "orig_frames"),
                 "--dst", str(curated), "--copy"])
    assert sorted(os.listdir(curated / GAME)) == ["00000.jpeg", "00001.jpeg"]
    assert len(os.listdir(tmp_path / "orig_frames" / GAME)) == 2
