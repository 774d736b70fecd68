"""Predict CLI ``--resume``: an interrupted run's part JSONL is the
resume ledger — recorded frames are skipped (proven by sentinel records
that survive untouched), torn tail records are repaired and re-predicted,
and a resumed run with nothing left still produces the final merge.

The reference has no resume story (a crashed ``predict.py`` job restarts
from frame 0); this is a production-robustness addition for long jobs.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from sports_field_homography_tpu.cli.predict import (_read_resume_names,
                                                     process)
from sports_field_homography_tpu.cli.engine import build_model
from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

W, H = 64, 36
N_FRAMES = 6
SENTINEL = [[999.0, 0.0, 0.0], [0.0, 999.0, 0.0], [0.0, 0.0, 999.0]]


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
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

    class A:
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


def run(workspace, dst, extra=None):
    argv = [
        "--img_dir", str(workspace["img_dir"]),
        "--load", str(workspace["cp"]),
        "--dst_dir", str(dst),
        "--req_outputs", "theta,consistency",
        "--out_size", str(W), str(H),
        "--batchsize", "2",
        "--compute_dtype", "float32",
        "--court_img", "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
        "--court_poi", "/root/repo/assets/template_ncaa_v4_points.json",
    ] + (extra or [])
    process(argv)


def _seed_part(dst, names, torn_tail=None):
    """Write a fake interrupted-run part JSONL with sentinel records."""
    os.makedirs(dst, exist_ok=True)
    part = os.path.join(str(dst), "frames_court_processing.json")
    with open(part, "w") as f:
        for n in names:
            f.write(json.dumps({n: {"theta": [SENTINEL], "score": -1.0}}))
            f.write("\n")
        if torn_tail is not None:
            f.write(torn_tail)       # crash artifact: no trailing newline
    return part


def test_resume_skips_recorded_frames(workspace, tmp_path):
    done = [f"{i:06d}" for i in range(3)]
    _seed_part(tmp_path, done)
    run(workspace, tmp_path, extra=["--resume"])

    out = json.load(open(tmp_path / "frames_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == N_FRAMES
    for n in done:      # untouched sentinel == the frame was NOT recomputed
        assert frames[n]["theta"] == [SENTINEL]
        assert frames[n]["score"] == -1.0
    for i in range(3, N_FRAMES):    # the rest were actually predicted
        theta = np.asarray(frames[f"{i:06d}"]["theta"])
        assert theta.shape == (1, 3, 3)
        assert np.abs(theta[0] - np.eye(3)).max() < 0.2
    assert not os.path.exists(tmp_path / "frames_court_processing.json")


def test_resume_repairs_torn_tail(workspace, tmp_path):
    """A record torn mid-write is dropped and its frame re-predicted."""
    done = [f"{i:06d}" for i in range(2)]
    _seed_part(tmp_path, done, torn_tail='{"000002": {"theta": [[')
    run(workspace, tmp_path, extra=["--resume"])

    out = json.load(open(tmp_path / "frames_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == N_FRAMES
    assert frames["000000"]["theta"] == [SENTINEL]
    assert frames["000001"]["theta"] == [SENTINEL]
    # the torn frame was recomputed: real theta, not the torn garbage
    theta = np.asarray(frames["000002"]["theta"])
    assert np.abs(theta[0] - np.eye(3)).max() < 0.2


def test_resume_with_nothing_left_still_merges(workspace, tmp_path):
    all_names = [f"{i:06d}" for i in range(N_FRAMES)]
    _seed_part(tmp_path, all_names)
    run(workspace, tmp_path, extra=["--resume"])

    out = json.load(open(tmp_path / "frames_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == N_FRAMES
    assert all(frames[n]["theta"] == [SENTINEL] for n in all_names)
    assert not os.path.exists(tmp_path / "frames_court_processing.json")


def test_read_resume_names_repair_unit(tmp_path):
    part = tmp_path / "part.json"
    # one clean record, one complete record missing its newline (crash
    # between json.dump and the "\n" write)
    with open(part, "w") as f:
        f.write('{"a": {"score": 1.0}}\n')
        f.write('{"b": {"score": 2.0}}')
    names = _read_resume_names(str(part))
    assert names == {"a", "b"}
    # the repair appended the missing newline: appends stay line-aligned
    assert open(part).read().endswith('{"b": {"score": 2.0}}\n')

    with open(part, "a") as f:
        f.write('{"c": {"score"')      # torn mid-record
    names = _read_resume_names(str(part))
    assert names == {"a", "b"}
    assert open(part).read().count("\n") == 2


def test_resume_video_prefix_skip(workspace, tmp_path):
    """Video resume: the contiguous done prefix of frames is skipped
    (sequential decode re-seeks to the first missing frame)."""
    import cv2

    video_dir = tmp_path / "mygame"
    video_dir.mkdir()
    video = str(video_dir / "clip.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
    rng = np.random.RandomState(1)
    for _ in range(7):
        wr.write(rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
    wr.release()

    dst = tmp_path / "out"
    dst.mkdir()
    part = os.path.join(str(dst), "mygame_court_processing.json")
    with open(part, "w") as f:
        for i in range(3):
            f.write(json.dumps(
                {f"{i:06d}": {"theta": [SENTINEL], "score": -1.0}}) + "\n")

    argv = [
        "--video_path", video,
        "--load", str(workspace["cp"]),
        "--dst_dir", str(dst),
        "--req_outputs", "theta,consistency",
        "--out_size", str(W), str(H),
        "--batchsize", "2",
        "--compute_dtype", "float32",
        "--court_img", "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
        "--court_poi", "/root/repo/assets/template_ncaa_v4_points.json",
        "--resume",
    ]
    process(argv)

    out = json.load(open(dst / "mygame_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == 7
    for i in range(3):
        assert frames[f"{i:06d}"]["theta"] == [SENTINEL]
    for i in range(3, 7):
        theta = np.asarray(frames[f"{i:06d}"]["theta"])
        assert np.abs(theta[0] - np.eye(3)).max() < 0.2


def test_fresh_run_ignores_resume_flag_without_part(workspace, tmp_path):
    """--resume with no part file behaves exactly like a fresh run."""
    run(workspace, tmp_path, extra=["--resume"])
    out = json.load(open(tmp_path / "frames_court.json"))
    frames = {k: v for k, v in out.items() if k != "model"}
    assert len(frames) == N_FRAMES


def test_truncate_torn_pickle_unit(tmp_path):
    import pickle
    from sports_field_homography_tpu.cli.predict import _truncate_torn_pickle

    path = str(tmp_path / "data.pkl")
    with open(path, "wb") as f:
        pickle.dump(["a", b"png-bytes-a"], f)
        pickle.dump(["b", b"png-bytes-b"], f)
        f.write(b"\x80\x04\x95torn")          # crash mid-dump
    _truncate_torn_pickle(path)
    names = []
    with open(path, "rb") as f:
        try:
            while True:
                rec = pickle.load(f)
                names.append(rec[0])
        except EOFError:
            pass
    assert names == ["a", "b"]
    # idempotent on a clean stream
    size = os.path.getsize(path)
    _truncate_torn_pickle(path)
    assert os.path.getsize(path) == size


def test_resume_repairs_torn_pickle_stream(workspace, tmp_path):
    """Pickle mask streams survive a crash: the torn tail record is
    dropped before appending, so the resumed stream reads end-to-end and
    covers every frame (duplicates allowed — at-least-once, last wins)."""
    import pickle

    done = [f"{i:06d}" for i in range(2)]
    _seed_part(tmp_path, done)
    pkl_dir = tmp_path / "court" / "segm_mask"
    pkl_dir.mkdir(parents=True)
    with open(pkl_dir / "data.pkl", "wb") as f:
        for n in done:
            pickle.dump([n, b"fake-png-from-interrupted-run"], f)
        f.write(b"\x80\x04\x95partial-frame-2")   # torn mid-write
    run(workspace, tmp_path,
        extra=["--resume", "--req_outputs", "theta,segm_mask",
               "--mask_save_format", "pickle"])

    masks = {}
    with open(pkl_dir / "data.pkl", "rb") as f:
        try:
            while True:
                name, buf = pickle.load(f)     # raises if stream corrupt
                masks[name] = buf
        except EOFError:
            pass
    assert set(masks) == {f"{i:06d}" for i in range(N_FRAMES)}
    # the ledger-recorded frames kept their original (interrupted) masks
    assert masks["000000"] == b"fake-png-from-interrupted-run"
