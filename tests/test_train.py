"""Training-loop tests on a synthetic dataset (CPU, tiny shapes).

Covers: full train CLI (all 5 losses, checkpoint writing, sidecar conf),
loss decrease on an overfit split, the checkpoint-sweep test CLI, plateau
LR schedule, and a data-parallel shard_map step over the 8 virtual devices.
"""
import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.full

import jax
import jax.numpy as jnp

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainset")
    rng = np.random.RandomState(0)
    for game, n in [("gameA", 8), ("valgame", 4)]:
        for d in ("frames", "masks", "anno"):
            (root / d / game).mkdir(parents=True)
        for i in range(n):
            img = rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / "frames" / game / f"{i:04d}.png")
            mask = rng.randint(0, 4, size=(H, W), dtype=np.uint8)
            Image.fromarray(mask).save(root / "masks" / game / f"{i:04d}.png")
            poi = np.concatenate([rng.rand(52, 2),
                                  (rng.rand(52, 1) > 0.3).astype(float)], axis=1)
            anno = {"poi": poi.tolist(), "reproj_mse": 0.001}
            with open(root / "anno" / game / f"{i:04d}.json", "w") as f:
                json.dump(anno, f)
    return root


def make_conf(root, cp_dir, log_dir, **overrides):
    conf = {
        "img_dir": str(root / "frames"), "mask_dir": str(root / "masks"),
        "anno_dir": str(root / "anno"), "anno_keys": ["poi", "reproj_mse"],
        "val_names": ["valgame"],
        "court_img": COURT_IMG, "court_poi": COURT_POI,
        "court_size": [W, H], "target_size": [W, H], "unet_size": [W, H],
        "warp_size": [W, H], "mask_classes": 4,
        "use_unet": True, "unet_bilinear": False, "use_resnet": True,
        "resnet_name": "resnet18", "resnet_input": "img+mask",
        "opt": "RMSprop", "lr": 1e-4, "weight_decay": 1e-8,
        "epochs": 1, "batchsize": 4,
        "seg_loss": "CE", "rec_loss": "MSE", "reproj_loss": "RRMSE",
        "consist_loss": "CE", "consist_start_iter": 0,
        "seg_lambda": 1.0, "rec_lambda": 1.0, "reproj_lambda": 8.0,
        "consist_lambda": 1.0,
        "cp_dir": str(cp_dir) + "/", "log_dir": str(log_dir),
        "compute_dtype": "float32",
    }
    conf.update(overrides)
    return conf


def test_train_cli_end_to_end(dataset_root, tmp_path):
    from sports_field_homography_tpu.cli.train import main

    cp_dir = tmp_path / "cp"
    conf = make_conf(dataset_root, cp_dir, tmp_path / "logs")
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    state = main(["-c", str(conf_path)])
    assert state is not None
    assert int(state["step"]) == 2          # 8 imgs / batch 4
    assert os.path.exists(cp_dir / "CP_epoch1.msgpack")
    assert os.path.exists(cp_dir / "conf.yaml")

    # checkpoint-sweep CLI on the produced checkpoint
    from sports_field_homography_tpu.cli.test import main as test_main
    test_main(["--cp_dir", str(cp_dir), "--test_epochs", "1",
               "--img_dir", conf["img_dir"], "--mask_dir", conf["mask_dir"],
               "--anno_dir", conf["anno_dir"], "--batchsize", "4",
               "--court_img", COURT_IMG, "--court_poi", COURT_POI,
               "--compute_dtype", "float32"])
    scores = open(cp_dir / "test_scores.txt").read()
    assert "Reprojection px:" in scores
    assert "Elapsed msec:" in scores


def test_loss_decreases_when_overfitting(dataset_root):
    """A few steps on one repeated batch must reduce the total loss."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader

    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    ids = [f"gameA/{i:04d}.png" for i in range(4)]
    ds = BasicDataset(ids, str(dataset_root / "frames"),
                      str(dataset_root / "masks"), str(dataset_root / "anno"),
                      ["poi", "reproj_mse"], 4, target_size=(W, H))
    batch = next(iter(Loader(ds, 4, num_workers=1)))
    batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)
             and k != "valid"}

    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss=None, batch_size=4)
    optimizer = make_optimizer("Adam", 3e-4, 0.0)
    step = jax.jit(make_train_step(bundle.model, optimizer, loss_cfg))
    state = init_train_state(bundle.variables, optimizer)
    first = None
    for i in range(8):
        state, logs = step(state, batch, bundle.court_img, bundle.court_poi)
        if first is None:
            first = float(logs["Tot_loss"])
    last = float(logs["Tot_loss"])
    assert last < first, (first, last)
    assert np.isfinite(last)


def test_uint8_inputs_bit_identical_without_aug(dataset_root):
    """uint8-shipped frames (device-side u8/255) must reproduce the f32
    train step (loss bitwise; params to float ulp — XLA fuses the convert
    differently) when no augmentation is configured, and
    prepare_dataloader must default to uint8 exactly then."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.cli.train import prepare_dataloader
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader

    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    ids = [f"gameA/{i:04d}.png" for i in range(4)]
    kw = dict(num_classes=4, target_size=(W, H))
    ds_f32 = BasicDataset(ids, str(dataset_root / "frames"),
                          str(dataset_root / "masks"),
                          str(dataset_root / "anno"), ["poi", "reproj_mse"],
                          **kw)
    ds_u8 = BasicDataset(ids, str(dataset_root / "frames"),
                         str(dataset_root / "masks"),
                         str(dataset_root / "anno"), ["poi", "reproj_mse"],
                         raw_uint8=True, **kw)
    b_f32 = next(iter(Loader(ds_f32, 4, num_workers=1)))
    b_u8 = next(iter(Loader(ds_u8, 4, num_workers=1)))
    assert b_u8["image"].dtype == np.uint8
    assert b_f32["image"].dtype == np.float32
    b_f32 = {k: v for k, v in b_f32.items()
             if isinstance(v, np.ndarray) and k != "valid"}
    b_u8 = {k: v for k, v in b_u8.items()
            if isinstance(v, np.ndarray) and k != "valid"}

    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss=None, batch_size=4)
    optimizer = make_optimizer("Adam", 3e-4, 0.0)
    step = make_train_step(bundle.model, optimizer, loss_cfg, with_grads=True)
    _, logs1, g1 = jax.jit(step)(init_train_state(bundle.variables, optimizer),
                                 b_f32, bundle.court_img, bundle.court_poi)
    _, logs2, g2 = jax.jit(step)(init_train_state(bundle.variables, optimizer),
                                 b_u8, bundle.court_img, bundle.court_poi)
    # the normalized VALUES are exactly equal (u8/255 == host /255), so
    # every loss matches bitwise; gradients agree only to cross-program
    # tolerance (the uint8 program fuses the convert/divide into the
    # backward convs, reordering the wgrad reductions — same tolerance
    # class as the DP-vs-single comparison below).  Post-Adam params are
    # NOT comparable at all: step-1 Adam is sign(g)-shaped, so any grad
    # noise near g=0 moves a weight by 2*lr.
    for k in logs1:
        assert float(logs1[k]) == float(logs2[k]), (k, logs1[k], logs2[k])
    # per-leaf relative L2: robust to individual near-cancellation elements
    # (per-element tolerances fail on ~1e-5-of-the-leaf entries whose sums
    # nearly cancel); noise-floor guard for true-zero grad leaves
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        na = np.linalg.norm(a)
        if na < 1e-6:
            continue    # true-zero grad leaf: both sides are pure f32 noise
        rel = np.linalg.norm(a - b) / na
        # bias/BN-beta grads sum ~1e4 near-cancelling summands, so the
        # reordered program leaves ~0.2% on those leaves; a real
        # normalization bug would already have failed the bitwise loss
        # asserts above
        assert rel < 1e-2, (a.shape, rel)

    # default wiring: no aug -> uint8 train+val; aug -> float train, u8 val
    tl, _, vl, _ = prepare_dataloader(
        str(dataset_root / "frames"), str(dataset_root / "masks"),
        str(dataset_root / "anno"), ["poi", "reproj_mse"], ["valgame"],
        4, False, 4, (W, H), aug=None, only_ncaam=False)
    assert next(iter(tl))["image"].dtype == np.uint8
    assert next(iter(vl))["image"].dtype == np.uint8
    aug = {"apperance": {"blur": 3}}
    tl, _, vl, _ = prepare_dataloader(
        str(dataset_root / "frames"), str(dataset_root / "masks"),
        str(dataset_root / "anno"), ["poi", "reproj_mse"], ["valgame"],
        4, False, 4, (W, H), aug=aug, only_ncaam=False)
    assert next(iter(tl))["image"].dtype == np.float32
    assert next(iter(vl))["image"].dtype == np.uint8
    # forced: augmented frames quantized back to 8 bits
    tl, _, _, _ = prepare_dataloader(
        str(dataset_root / "frames"), str(dataset_root / "masks"),
        str(dataset_root / "anno"), ["poi", "reproj_mse"], ["valgame"],
        4, False, 4, (W, H), aug=aug, only_ncaam=False, uint8_inputs=1)
    assert next(iter(tl))["image"].dtype == np.uint8


def test_plateau_scheduler_matches_torch_semantics():
    from sports_field_homography_tpu.train.optim import ReduceLROnPlateau

    s = ReduceLROnPlateau(lr=1.0, patience=3, factor=0.1)
    # improving metrics: lr unchanged
    for m in (10.0, 9.0, 8.0):
        assert s.step(m) == 1.0
    # 4 bad epochs (patience 3) -> reduce on the 4th
    for m in (8.0, 8.0, 8.0):
        assert s.step(m) == 1.0
    assert s.step(8.0) == pytest.approx(0.1)


def test_data_parallel_shard_map_step(dataset_root):
    """DP over the 8 virtual CPU devices: replicated state stays identical
    and matches the single-device step on the same global batch."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.parallel.mesh import make_mesh, shard_train_step
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer

    class A:
        batchsize = 8
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    rng = np.random.RandomState(1)
    batch = {
        "image": rng.rand(8, H, W, 3).astype(np.float32),
        "mask": rng.randint(0, 4, size=(8, H, W)).astype(np.int64),
        "weight": np.ones((8, 1), np.float32),
    }
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss=None,
                          consist_loss=None, batch_size=8)
    optimizer = make_optimizer("SGD", 1e-3, 0.0)

    mesh = make_mesh(8, spatial=1)
    dp_model = bundle.model.clone(bn_axis_name="data")   # sync BatchNorm
    dp_step = shard_train_step(
        make_train_step(dp_model, optimizer, loss_cfg, axis_name="data"), mesh)
    state = init_train_state(bundle.variables, optimizer)
    dp_state, dp_logs = dp_step(state, batch, bundle.court_img, bundle.court_poi)

    single = jax.jit(make_train_step(bundle.model, optimizer, loss_cfg))
    s_state, s_logs = single(init_train_state(bundle.variables, optimizer),
                             batch, bundle.court_img, bundle.court_poi)

    # per-shard BN batch stats differ from global-batch stats by design;
    # params must agree because grads are psum-averaged
    np.testing.assert_allclose(float(dp_logs["Tot_loss"]),
                               float(s_logs["Tot_loss"]), rtol=2e-3)
    a = jax.tree.leaves(dp_state["params"])
    b = jax.tree.leaves(s_state["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-5)


def test_grad_accum_matches_mean_of_micro_grads():
    """grad_accum=K must apply ONE optimizer update with the K-mean of the
    per-micro-batch gradients (each computed from the same pre-step params;
    BN running stats thread sequentially), and log the K-mean scalars."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_loss_fn, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer
    import optax

    class A:
        batchsize = 2
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    rng = np.random.RandomState(7)
    micro = [{
        "image": rng.rand(2, H, W, 3).astype(np.float32),
        "mask": rng.randint(0, 4, size=(2, H, W)).astype(np.int64),
        "weight": np.ones((2, 1), np.float32),
    } for _ in range(2)]
    stacked = {k: np.stack([m[k] for m in micro]) for k in micro[0]}

    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss=None,
                          consist_loss=None, batch_size=2)
    optimizer = make_optimizer("SGD", 1e-3, 0.0)
    state0 = init_train_state(bundle.variables, optimizer)

    # expected: two independent backward passes from the same params,
    # batch_stats threaded, mean grads, one update
    loss_fn = make_loss_fn(bundle.model, loss_cfg)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    bs = state0["batch_stats"]
    grads, logs = [], []
    for m in micro:
        (_, (bs, lg)), g = grad_fn(state0["params"], bs, m, state0["step"],
                                   bundle.court_img, bundle.court_poi, None)
        grads.append(g)
        logs.append(lg)
    mean_grads = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = optimizer.update(mean_grads, state0["opt_state"],
                                  state0["params"])
    expected_params = optax.apply_updates(state0["params"], updates)

    step = jax.jit(make_train_step(bundle.model, optimizer, loss_cfg,
                                   grad_accum=2))
    new_state, step_logs = step(init_train_state(bundle.variables, optimizer),
                                stacked, bundle.court_img, bundle.court_poi)

    for x, y in zip(jax.tree.leaves(expected_params),
                    jax.tree.leaves(new_state["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-7)
    # threaded BN running stats equal K sequential plain-step updates
    for x, y in zip(jax.tree.leaves(bs),
                    jax.tree.leaves(new_state["batch_stats"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-7)
    expected_tot = (float(logs[0]["Tot_loss"]) + float(logs[1]["Tot_loss"])) / 2
    np.testing.assert_allclose(float(step_logs["Tot_loss"]), expected_tot,
                               rtol=1e-5)
    assert int(new_state["step"]) == 1      # ONE optimizer step


def test_grad_accum_data_parallel_composes(dataset_root):
    """grad_accum under the DP mesh (batch leaves (K, B, ...), sharded on
    axis 1) must match the single-device grad_accum step."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.parallel.mesh import (
        make_mesh, shard_train_step)
    from sports_field_homography_tpu.train.loop import (
        LossConfig, init_train_state, make_train_step)
    from sports_field_homography_tpu.train.optim import make_optimizer

    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    rng = np.random.RandomState(11)
    stacked = {
        "image": rng.rand(2, 4, H, W, 3).astype(np.float32),
        "mask": rng.randint(0, 4, size=(2, 4, H, W)).astype(np.int64),
        "weight": np.ones((2, 4, 1), np.float32),
    }
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss=None,
                          consist_loss=None, batch_size=4)
    optimizer = make_optimizer("SGD", 1e-3, 0.0)

    mesh = make_mesh(2, spatial=1)
    dp_model = bundle.model.clone(bn_axis_name="data")
    dp_step = shard_train_step(
        make_train_step(dp_model, optimizer, loss_cfg, axis_name="data",
                        grad_accum=2),
        mesh, batch_axis=1)
    dp_state, dp_logs = dp_step(init_train_state(bundle.variables, optimizer),
                                stacked, bundle.court_img, bundle.court_poi)

    single = jax.jit(make_train_step(bundle.model, optimizer, loss_cfg,
                                     grad_accum=2))
    s_state, s_logs = single(init_train_state(bundle.variables, optimizer),
                             stacked, bundle.court_img, bundle.court_poi)

    np.testing.assert_allclose(float(dp_logs["Tot_loss"]),
                               float(s_logs["Tot_loss"]), rtol=2e-3)
    for x, y in zip(jax.tree.leaves(dp_state["params"]),
                    jax.tree.leaves(s_state["params"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=2e-5)


def test_grad_accum_cli_end_to_end(dataset_root, tmp_path):
    """--grad_accum 2 with batchsize 2: 8 train imgs -> 2 optimizer steps
    (4 loader batches grouped in pairs), checkpoint written."""
    from sports_field_homography_tpu.cli.train import main

    cp_dir = tmp_path / "cp_accum"
    conf = make_conf(dataset_root, cp_dir, tmp_path / "logs_accum",
                     batchsize=2, grad_accum=2, consist_loss=None)
    conf_path = tmp_path / "conf_accum.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    state = main(["-c", str(conf_path)])
    assert state is not None
    assert int(state["step"]) == 2
    assert os.path.exists(cp_dir / "CP_epoch1.msgpack")


def test_resume_restores_optimizer_state(dataset_root, tmp_path):
    """Interrupted training resumes with optimizer state + step intact."""
    import yaml
    from sports_field_homography_tpu.cli.train import main
    from sports_field_homography_tpu.utils.checkpoint import (
        save_train_state)
    from sports_field_homography_tpu.train.loop import init_train_state
    from sports_field_homography_tpu.train.optim import make_optimizer
    from sports_field_homography_tpu.cli.engine import build_model

    cp_dir = tmp_path / "cp"
    cp_dir.mkdir(parents=True)
    conf = make_conf(dataset_root, cp_dir, tmp_path / "logs")
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    # fabricate an interrupted state at step 7 with nonzero momentum
    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    bundle = build_model(A)
    opt = make_optimizer("RMSprop", 1e-4, 1e-8)
    state = init_train_state(bundle.variables, opt)
    state["step"] = jnp.asarray(7, jnp.int32)
    save_train_state(str(cp_dir / "last_state.msgpack"), state)

    out_state = main(["-c", str(conf_path), "--resume"])
    # 8 train imgs / batch 4 = 2 more steps on top of the resumed 7
    assert int(out_state["step"]) == 9


def test_train_cli_async_ckpt_and_orbax_sweep(dataset_root, tmp_path):
    """--async_ckpt writes CP_epoch{n}.orbax; the sweep CLI consumes it."""
    from sports_field_homography_tpu.cli.train import main

    cp_dir = tmp_path / "cp"
    conf = make_conf(dataset_root, cp_dir, tmp_path / "logs")
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    state = main(["-c", str(conf_path), "--async_ckpt"])
    assert state is not None
    assert os.path.isdir(cp_dir / "CP_epoch1.orbax")
    assert not os.path.exists(cp_dir / "CP_epoch1.msgpack")

    from sports_field_homography_tpu.cli.test import main as test_main
    test_main(["--cp_dir", str(cp_dir), "--test_epochs", "1",
               "--img_dir", conf["img_dir"], "--mask_dir", conf["mask_dir"],
               "--anno_dir", conf["anno_dir"], "--batchsize", "4",
               "--court_img", COURT_IMG, "--court_poi", COURT_POI,
               "--compute_dtype", "float32"])
    assert "Reprojection px:" in open(cp_dir / "test_scores.txt").read()


def test_exact_mid_epoch_resume_bit_identical(dataset_root, tmp_path):
    """Kill a seeded run mid-epoch, resume from the interrupt artifacts ->
    final params bit-identical to the uninterrupted run (the resume_sched
    contract in train_net: replay the epoch's (seed, epoch) order, skip
    the consumed steps, finish the ORIGINAL epochs plan)."""
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader
    from sports_field_homography_tpu.train.loop import LossConfig, train_net
    from sports_field_homography_tpu.utils.checkpoint import save_train_state

    class A:
        batchsize = 4
        target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
        court_size = (W, H); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    ids = [f"gameA/{i:04d}.png" for i in range(8)]
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss=None, batch_size=4)

    def fresh_loader():
        ds = BasicDataset(ids, str(dataset_root / "frames"),
                          str(dataset_root / "masks"),
                          str(dataset_root / "anno"),
                          ["poi", "reproj_mse"], 4, target_size=(W, H))
        return Loader(ds, 4, shuffle=True, num_workers=2, drop_last=False,
                      pad_last=True, seed=0)

    class ArraysOnly:
        """cli.train._TrackingLoader twin: arrays only + sched passthrough."""
        def __init__(self, loader, die_after=None):
            self.loader, self.die_after, self.count = loader, die_after, 0
        def set_epoch(self, e): self.loader.set_epoch(e)
        def skip_next_batches(self, k): self.loader.skip_next_batches(k)
        def __iter__(self):
            for b in self.loader:
                if self.die_after is not None and self.count >= self.die_after:
                    raise KeyboardInterrupt
                self.count += 1
                yield {k: v for k, v in b.items()
                       if isinstance(v, np.ndarray)}

    def run(train_loader, variables, **kw):
        return train_net(
            model=bundle.model, variables=variables,
            court_img=bundle.court_img, court_poi=bundle.court_poi,
            train_loader=train_loader, n_train=8, val_loader=None,
            batch_size=4, val_step_n=100, loss_cfg=loss_cfg, opt="Adam",
            epochs=2, lr=1e-3, w_decay=0.0, target_size=(W, H),
            cp_dir=None, log_dir=None, **kw)

    # uninterrupted reference run: 2 epochs x 2 steps
    bundle = build_model(A)
    full = run(ArraysOnly(fresh_loader()), bundle.variables)
    assert int(full["step"]) == 4

    # interrupted run: dies after 3 optimizer steps (mid-epoch 2)
    bundle = build_model(A)
    holder = {"state": None}
    with pytest.raises(KeyboardInterrupt):
        run(ArraysOnly(fresh_loader(), die_after=3), bundle.variables,
            state_holder=holder)
    assert holder["sched"] == {"epoch": 1, "opt_steps_done": 1}
    state_path = tmp_path / "last_state.msgpack"
    save_train_state(str(state_path), holder["state"])

    # resume: replays epoch 2 skipping the consumed step -> 1 more step
    bundle = build_model(A)
    resumed = run(ArraysOnly(fresh_loader()), bundle.variables,
                  resume_state_path=str(state_path),
                  resume_sched=holder["sched"])
    assert int(resumed["step"]) == 4

    flat_full = jax.tree_util.tree_leaves(full["params"])
    flat_res = jax.tree_util.tree_leaves(resumed["params"])
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
