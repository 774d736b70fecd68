"""Coverage for remaining paths: orbax checkpoints, the UV training
pipeline (uint16 TIFF masks), hub constructors, mapping examples."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


def test_orbax_checkpoint_roundtrip(tmp_path):
    from sports_field_homography_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint)

    variables = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                            "b": np.ones((4,), np.float32)},
                 "batch_stats": {"m": np.zeros((4,), np.float32)}}
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint(path, variables)
    restored = load_checkpoint(path, target=jax.tree.map(np.zeros_like, variables))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  variables["params"]["w"])
    np.testing.assert_array_equal(np.asarray(restored["batch_stats"]["m"]),
                                  variables["batch_stats"]["m"])


def test_failed_save_never_truncates_existing_checkpoint(tmp_path):
    """A save that dies mid-serialization (e.g. a state buffer donated to
    an in-flight step) must leave the previous good file intact — the old
    open-then-serialize order truncated it to 0 bytes (observed when a
    SIGTERM save crashed a real 60-epoch run)."""
    import pytest
    from flax import serialization
    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    path = str(tmp_path / "last.msgpack")
    good = {"params": {"w": np.ones((3,), np.float32)}}
    save_checkpoint(path, good)
    size = os.path.getsize(path)
    assert size > 0

    dead = jnp.ones((3,), jnp.float32)
    dead.delete()                       # same error as a donated buffer
    with pytest.raises(RuntimeError):
        save_checkpoint(path, {"params": {"w": dead}})
    assert os.path.getsize(path) == size
    restored = serialization.msgpack_restore(open(path, "rb").read())
    np.testing.assert_array_equal(restored["params"]["w"],
                                  good["params"]["w"])


@pytest.mark.full
def test_uv_training_pipeline(tmp_path):
    """unet_uv end to end: uint16 TIFF masks -> dataset -> train step with
    UV loss (resnet_input img+mask+uv)."""
    import cv2
    from PIL import Image
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer

    rng = np.random.RandomState(0)
    for d in ("frames", "masks", "anno"):
        (tmp_path / d / "g").mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(
            tmp_path / "frames" / "g" / f"{i:04d}.png")
        uvm = np.zeros((H, W, 3), np.uint16)
        uvm[..., 0] = rng.randint(0, 4, (H, W))                  # labels
        uvm[..., 1] = rng.randint(0, 65535, (H, W))              # u
        uvm[..., 2] = rng.randint(0, 65535, (H, W))              # v
        cv2.imwrite(str(tmp_path / "masks" / "g" / f"{i:04d}.tif"), uvm)

    ds = BasicDataset([f"g/{i:04d}.png" for i in range(4)],
                      str(tmp_path / "frames"), str(tmp_path / "masks"),
                      None, None, 4, use_uv=True, target_size=(W, H))
    s = ds[0]
    assert s["uv"].shape == (H, W, 2) and s["uv"].dtype == np.float32
    assert s["uv"].max() <= 1.0
    assert s["mask"].shape == (H, W)

    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = True
        use_resnet = True; resnet_name = "resnet18"
        resnet_input = "img+mask+uv"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    batch = next(iter(Loader(ds, 4, num_workers=1)))
    batch = {k: v for k, v in batch.items()
             if isinstance(v, np.ndarray) and k != "valid"}
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss=None,
                          consist_loss=None, uv_loss="SmoothL1", batch_size=4)
    opt = make_optimizer("Adam", 1e-4, 0.0)
    step = jax.jit(make_train_step(bundle.model, opt, loss_cfg))
    state = init_train_state(bundle.variables, opt)
    state, logs = step(state, batch, jnp.asarray(bundle.court_img),
                       jnp.asarray(bundle.court_poi))
    assert np.isfinite(float(logs["UV_loss"]))
    assert float(logs["UV_loss"]) > 0


def test_hubconf_constructors():
    from sports_field_homography_tpu.utils.hubconf import reconstructor, unet

    m = unet(mask_classes=4)
    x = jnp.zeros((1, H, W, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, H, W, 4)

    r = reconstructor(target_size=(W, H), unet_size=(W, H), warp_size=(W, H),
                      resnet_name="resnet18")
    assert r.config.resnet_name == "resnet18"


def test_mapping_example_runs(tmp_path, monkeypatch):
    from sports_field_homography_tpu.utils import mapping_example as me

    monkeypatch.chdir("/root/repo")
    pts = me.map_frame_points_to_court(out_path=str(tmp_path / "a.png"))
    assert pts.shape == (1, 2)
    poi = me.map_court_poi_to_frame(out_path=str(tmp_path / "b.png"))
    assert poi.shape == (52, 2)
    assert os.path.exists(tmp_path / "a.png")
    assert os.path.exists(tmp_path / "b.png")


def test_async_saver_roundtrip(tmp_path):
    import numpy as np
    from sports_field_homography_tpu.utils.checkpoint import (
        AsyncSaver, load_checkpoint)

    tree = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
            "batch_stats": {"m": np.ones((4,), np.float32)}}
    saver = AsyncSaver()
    path = str(tmp_path / "CP_epoch1.orbax")
    saver.save(path, tree)
    saver.wait()
    saver.close()
    out = load_checkpoint(path, target=tree)
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(out["batch_stats"]["m"],
                                  tree["batch_stats"]["m"])
