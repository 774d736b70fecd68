"""Multi-host (DCN) inference: 2-process CPU smoke of the predict CLI.

Each process initializes jax.distributed (gloo on CPU), takes its
contiguous slice of the frame list, writes its own outputs, and host 0
merges the per-host JSONL parts into {game}_court.json after a global
barrier.  The merged result must equal a single-host run bit-for-bit.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.full

W, H = 64, 36
N_FRAMES = 6
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


def _child_env(tmp):
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["SFH_JAX_PLATFORM"] = "cpu"
    # isolate the persistent compile cache: the repo's .jax_cache may hold
    # CPU AOT entries compiled on a different host type (observed SIGILL-
    # class loader warnings -> crashed subprocess -> barrier mismatch)
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("mh_predict")
    img_dir = root / "frames"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(N_FRAMES):
        arr = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:06d}.png")

    cp_dir = root / "ckpt" / "model_mh"
    cp_dir.mkdir(parents=True)
    conf = {
        "target_size": [W, H], "unet_size": [W, H], "warp_size": [W, H],
        "court_size": [W, H], "mask_classes": 4, "resnet_name": "resnet18",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "court_img": COURT_IMG, "court_poi": COURT_POI,
    }
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
    save_checkpoint(str(cp_dir / "CP_epoch1.msgpack"), bundle.variables)
    return dict(root=root, img_dir=img_dir, cp=cp_dir / "CP_epoch1.msgpack")


def _argv(workspace, dst, extra):
    return [
        "--img_dir", str(workspace["img_dir"]),
        "--load", str(workspace["cp"]),
        "--dst_dir", str(dst),
        "--req_outputs", "theta,consistency",
        "--batchsize", "2",
        "--compute_dtype", "float32",
        "--court_img", COURT_IMG,
        "--court_poi", COURT_POI,
    ] + extra


def test_two_host_predict_matches_single(workspace, tmp_path):
    # single-host reference run (in-process, CPU via conftest); pickle
    # mask format exercises the per-host part files + host-0 concat merge
    from sports_field_homography_tpu.cli.predict import process

    extra_out = ["--req_outputs", "theta,consistency,segm_mask",
                 "--mask_save_format", "pickle"]
    single_dst = tmp_path / "single"
    process(_argv(workspace, single_dst, extra_out))
    single = json.load(open(single_dst / "frames_court.json"))

    # two-process run
    mh_dst = tmp_path / "multi"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "predict.py"] + _argv(workspace, mh_dst, [
                "--coordinator", f"127.0.0.1:{port}",
                "--num_hosts", "2", "--host_id", str(i)] + extra_out),
            cwd="/root/repo", env=_child_env(tmp_path / "cache"),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), \
        "\n=== host outputs ===\n".join(o[-3000:] for o in outs)

    merged = json.load(open(mh_dst / "frames_court.json"))
    assert set(merged) == set(single)
    frames = [k for k in single if k != "model"]
    assert len(frames) == N_FRAMES
    for k in frames:
        np.testing.assert_array_equal(np.asarray(merged[k]["theta"]),
                                      np.asarray(single[k]["theta"]))
        assert merged[k]["score"] == single[k]["score"]

    # merged pickle mask stream == single-host stream, record for record
    def read_stream(p):
        import pickle
        recs = {}
        with open(p, "rb") as f:
            while True:
                try:
                    name, buf = pickle.load(f)
                except EOFError:
                    return recs
                recs[name] = np.asarray(buf).tobytes()

    mh_pkl = mh_dst / "court/segm_mask/data.pkl"
    assert not list(mh_dst.glob("court/segm_mask/data.pkl.h*")), \
        "per-host parts must be merged and removed"
    s, m = read_stream(single_dst / "court/segm_mask/data.pkl"), \
        read_stream(mh_pkl)
    assert sorted(m) == sorted(s) and len(m) == N_FRAMES
    assert all(m[k] == s[k] for k in s)


def test_two_host_two_device_predict_matches_single(workspace, tmp_path):
    """Multi-host x multi-chip: each of 2 processes shards its batch over
    a 2-device LOCAL mesh (--num_devices with jax.distributed up) — the
    combination the per-host local mesh in cli/predict.py enables."""
    from sports_field_homography_tpu.cli.predict import process

    single_dst = tmp_path / "single"
    process(_argv(workspace, single_dst, []))
    single = json.load(open(single_dst / "frames_court.json"))

    mh_dst = tmp_path / "multi22"
    port = _free_port()
    procs = []
    for i in range(2):
        env = _child_env(tmp_path / f"cache{i}")
        env["XLA_FLAGS"] = (env["XLA_FLAGS"] + " "
                            "--xla_force_host_platform_device_count=2").strip()
        procs.append(subprocess.Popen(
            [sys.executable, "predict.py"] + _argv(workspace, mh_dst, [
                "--coordinator", f"127.0.0.1:{port}",
                "--num_hosts", "2", "--host_id", str(i),
                "--num_devices", "2"]),
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), \
        "\n=== host outputs ===\n".join(o[-3000:] for o in outs)

    merged = json.load(open(mh_dst / "frames_court.json"))
    frames = [k for k in single if k != "model"]
    assert set(merged) == set(single) and len(frames) == N_FRAMES
    for k in frames:
        np.testing.assert_array_equal(np.asarray(merged[k]["theta"]),
                                      np.asarray(single[k]["theta"]))
        assert merged[k]["score"] == single[k]["score"]
