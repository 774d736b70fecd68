"""Real-signal interrupt test: SIGTERM a live train subprocess mid-run.

The jitted train step donates the input state's buffers
(train/loop.py donate_argnums), so while a step is in flight every state
object the signal handler can reach is already deleted — a handler that
saves immediately crashes with "Array has been deleted" instead of saving
(observed on a real 60-epoch TPU run).  The fix defers: the handler sets a
flag, the loop saves at the next between-steps safe point where the state
is live (cli/train.py request_interrupt).  This test delivers an actual
SIGTERM to a training subprocess — unlike test_train.py's resume tests,
which fabricate the interrupt artifacts in-process — and asserts a clean
exit with loadable resume artifacts.

Reference behavior mirrored: train.py:437-442 (SIGTERM save-and-exit).
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.full

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"

CHILD = """
import jax, sys
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
from sports_field_homography_tpu.cli.train import main
main(["-c", sys.argv[1]])
"""


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sigterm_set")
    rng = np.random.RandomState(0)
    game = "gameA"
    for d in ("frames", "masks", "anno"):
        (root / d / game).mkdir(parents=True)
    for i in range(8):
        img = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "frames" / game / f"{i:04d}.png")
        mask = rng.randint(0, 4, size=(H, W), dtype=np.uint8)
        Image.fromarray(mask).save(root / "masks" / game / f"{i:04d}.png")
        poi = np.concatenate([rng.rand(52, 2),
                              (rng.rand(52, 1) > 0.3).astype(float)], axis=1)
        with open(root / "anno" / game / f"{i:04d}.json", "w") as f:
            json.dump({"poi": poi.tolist(), "reproj_mse": 0.001}, f)
    return root


def test_sigterm_mid_run_saves_and_exits_zero(dataset_root, tmp_path):
    cp_dir = tmp_path / "cp"
    conf = {
        "img_dir": str(dataset_root / "frames"),
        "mask_dir": str(dataset_root / "masks"),
        "anno_dir": str(dataset_root / "anno"),
        "anno_keys": ["poi", "reproj_mse"], "val_names": [],
        "court_img": COURT_IMG, "court_poi": COURT_POI,
        "court_size": [W, H], "target_size": [W, H], "unet_size": [W, H],
        "warp_size": [W, H], "mask_classes": 4,
        "use_unet": True, "unet_bilinear": False, "use_resnet": True,
        "resnet_name": "resnet18", "resnet_input": "img+mask",
        "opt": "RMSprop", "lr": 1e-4, "weight_decay": 1e-8,
        # enough epochs that the run is guaranteed live when we signal
        "epochs": 2000, "batchsize": 4, "val_step_n": 10 ** 9,
        "seg_loss": "CE", "rec_loss": "MSE", "reproj_loss": "RRMSE",
        "seg_lambda": 1.0, "rec_lambda": 1.0, "reproj_lambda": 8.0,
        "cp_dir": str(cp_dir) + "/", "log_dir": str(tmp_path / "logs"),
        "compute_dtype": "float32",
    }
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    out_path = tmp_path / "child.log"
    with open(out_path, "w") as out:
        p = subprocess.Popen(
            [sys.executable, "-c", CHILD, str(conf_path)],
            cwd="/root/repo", stdout=out, stderr=subprocess.STDOUT)
    try:
        # wait until training is demonstrably under way (first epoch ckpt)
        deadline = time.time() + 600
        while time.time() < deadline:
            if (cp_dir / "CP_epoch2.msgpack").exists():
                break
            if p.poll() is not None:
                pytest.fail("train exited early:\n"
                            + open(out_path).read()[-4000:])
            time.sleep(0.5)
        else:
            pytest.fail("no epoch checkpoint within deadline:\n"
                        + open(out_path).read()[-4000:])

        p.send_signal(signal.SIGTERM)
        rc = p.wait(timeout=300)
    finally:
        if p.poll() is None:
            p.kill()
    log = open(out_path).read()
    assert rc == 0, log[-4000:]
    assert "Interrupt requested" in log, log[-4000:]
    assert "Saved interrupt" in log, log[-4000:]

    # the resume artifacts are complete and loadable
    assert (cp_dir / "last.msgpack").exists()
    assert (cp_dir / "last_state.msgpack").exists()
    sched = json.load(open(cp_dir / "last_state.sched.json"))
    assert sched["opt_steps_done"] >= 1

    from flax import serialization
    state = serialization.msgpack_restore(
        open(cp_dir / "last_state.msgpack", "rb").read())
    assert int(state["step"]) >= 2
    import jax
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state["params"])]
    assert leaves and all(np.isfinite(v).all() for v in leaves)
