"""StableHLO serving artifacts (compat.serving + scripts/export_serving.py).

The artifact must (a) serialize/deserialize through bytes on disk,
(b) run WITHOUT the model code path (weights baked in), and (c) produce
bit-identical outputs to the live jitted predict it was exported from.
"""
import importlib.util
import json

import pytest
import os

import numpy as np
import yaml

import jax

from sports_field_homography_tpu.cli.engine import build_model, jit_predict_fn
from sports_field_homography_tpu.compat.serving import (
    export_predict, load_serving, save_serving)
from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"


class _Args:
    batchsize = 2
    target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
    court_size = (W, H); mask_classes = 4
    use_unet = True; unet_bilinear = False; unet_uv = False
    use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
    use_warper = True; compute_dtype = "float32"
    court_img = COURT_IMG; court_poi = COURT_POI


def test_export_roundtrip_bit_equal(tmp_path):
    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta", "warp_mask")
    exported, meta = export_predict(
        bundle, consistency=True, project_poi=True, keep=keep,
        batch_size=2, input_dtype="uint8")
    save_serving(str(tmp_path / "serving"), exported, meta)

    fn, meta2 = load_serving(str(tmp_path / "serving"))
    assert meta2["input"]["shape"] == [2, H, W, 3]
    assert sorted(meta2["outputs"]) == sorted(keep)

    x = np.random.RandomState(7).randint(0, 255, (2, H, W, 3), np.uint8)
    served = jax.device_get(fn(x))

    live_fn = jit_predict_fn(bundle, consistency=True, project_poi=True,
                             keep=keep)
    live = jax.device_get(live_fn(bundle.variables, x))

    assert sorted(served) == sorted(live)
    for k in live:
        np.testing.assert_array_equal(np.asarray(served[k]),
                                      np.asarray(live[k]), err_msg=k)
    # non-degenerate program: theta finite, warp labels in class range
    assert np.isfinite(served["theta"]).all()
    assert served["warp_mask"].dtype == np.uint8


def test_export_bf16_weights_bit_equal(tmp_path):
    """bf16-compute exports store bf16 weights (half the artifact).

    On TPU this is BIT-identical to serving the f32 params (measured
    max-abs-diff 0.0 on the flagship config — the MXU rounds params to
    bf16 at use either way).  On the CPU backend XLA may elide the
    f32->bf16 cast into the conv and keep extra precision, so this
    CPU-run test asserts a ~1e-5 envelope rather than bit equality."""

    class B(_Args):
        compute_dtype = "bfloat16"

    bundle = build_model(B, warp_with_nearest=True)
    keep = ("consist_score", "theta")
    exported, meta = export_predict(
        bundle, consistency=True, project_poi=False, keep=keep,
        batch_size=2, input_dtype="uint8")
    assert meta["weights_dtype"] == "bfloat16"
    save_serving(str(tmp_path / "bf16"), exported, meta)

    fn, _ = load_serving(str(tmp_path / "bf16"))
    x = np.random.RandomState(9).randint(0, 255, (2, H, W, 3), np.uint8)
    served = jax.device_get(fn(x))
    live_fn = jit_predict_fn(bundle, consistency=True, project_poi=False,
                             keep=keep)
    live = jax.device_get(live_fn(bundle.variables, x))
    for k in live:
        np.testing.assert_allclose(np.asarray(served[k], np.float32),
                                   np.asarray(live[k], np.float32),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


@pytest.mark.full
def test_export_poly_batch(tmp_path):
    """A --poly_batch artifact (symbolic batch dim) serves ANY batch size,
    bit-equal to the live model per batch; batch-1 court constants
    broadcast identically to the batch-replicated path."""
    import dataclasses

    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta", "poi", "warp_mask")
    exported, meta = export_predict(
        bundle, consistency=True, project_poi=True, keep=keep,
        batch_size=2, input_dtype="uint8", poly_batch=True)
    save_serving(str(tmp_path / "poly"), exported, meta)

    fn, meta2 = load_serving(str(tmp_path / "poly"))
    assert meta2["input"]["shape"] == ["b", H, W, 3]
    assert meta2["input"]["poly_batch"] is True

    # live reference with batch-1 constants (what the artifact bakes in)
    b1 = dataclasses.replace(bundle,
                             court_img=np.asarray(bundle.court_img)[:1],
                             court_poi=np.asarray(bundle.court_poi)[:1])
    live1 = jit_predict_fn(b1, consistency=True, project_poi=True, keep=keep)
    # and the ordinary batch-replicated live path as the semantics anchor
    live2 = jit_predict_fn(bundle, consistency=True, project_poi=True,
                           keep=keep)
    for b in (2, 5):
        x = np.random.RandomState(b).randint(0, 255, (b, H, W, 3), np.uint8)
        out = jax.device_get(fn(x))
        assert out["theta"].shape == (b, 1, 3, 3)
        live = jax.device_get(live1(b1.variables, x))
        for k in live:
            np.testing.assert_array_equal(np.asarray(out[k]),
                                          np.asarray(live[k]), err_msg=k)
        if b == 2:      # broadcast == replicate, bitwise
            anchor = jax.device_get(live2(bundle.variables, x))
            for k in anchor:
                np.testing.assert_array_equal(
                    np.asarray(out[k]), np.asarray(anchor[k]),
                    err_msg=f"replicated-{k}")


@pytest.mark.full
def test_export_cli(tmp_path):
    cp_dir = tmp_path / "ckpt"
    cp_dir.mkdir()
    bundle = build_model(_Args)
    save_checkpoint(str(cp_dir / "CP_epoch1.msgpack"), bundle.variables)
    conf = {
        "target_size": [W, H], "unet_size": [W, H], "warp_size": [W, H],
        "court_size": [W, H], "mask_classes": 4, "resnet_name": "resnet18",
        "resnet_input": "img+mask", "use_unet": True, "use_resnet": True,
        "compute_dtype": "float32",
    }
    with open(cp_dir / "conf.yaml", "w") as f:
        yaml.safe_dump(conf, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_serving", os.path.join(repo, "scripts", "export_serving.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--load", str(cp_dir / "CP_epoch1.msgpack"),
              "--req_outputs", "theta,consistency",
              "--batchsize", "2", "--out_size", str(W), str(H),
              "--court_img", COURT_IMG, "--court_poi", COURT_POI,
              "--compute_dtype", "float32"])

    art = cp_dir / "CP_epoch1_serving"
    assert (art / "program.shlo").exists()
    meta = json.load(open(art / "meta.json"))
    assert sorted(meta["outputs"]) == ["consist_score", "theta"]

    # fixed-batch single-platform artifacts carry the C++ runtime sidecars
    for f in ("module.mlir.bc", "compile_options.pb", "io_spec.txt"):
        assert (art / f).exists(), f
    spec = (art / "io_spec.txt").read_text().splitlines()
    assert spec[0] == f"input uint8 2,{H},{W},3"

    fn, _ = load_serving(str(art))
    x = np.random.RandomState(3).randint(0, 255, (2, H, W, 3), np.uint8)
    out = jax.device_get(fn(x))
    assert out["theta"].shape == (2, 1, 3, 3)
    assert np.isfinite(np.asarray(out["consist_score"], np.float32)).all()

    # --poly_batch through the CLI: symbolic batch recorded, sidecars
    # (fixed-shape-only) skipped
    mod.main(["--load", str(cp_dir / "CP_epoch1.msgpack"),
              "--req_outputs", "theta,consistency",
              "--batchsize", "2", "--out_size", str(W), str(H),
              "--court_img", COURT_IMG, "--court_poi", COURT_POI,
              "--compute_dtype", "float32",
              "--poly_batch", "--dst", str(tmp_path / "poly_cli")])
    meta = json.load(open(tmp_path / "poly_cli" / "meta.json"))
    assert meta["input"]["poly_batch"] is True
    assert not os.path.exists(tmp_path / "poly_cli" / "module.mlir.bc")
    fn, _ = load_serving(str(tmp_path / "poly_cli"))
    out = jax.device_get(fn(np.random.RandomState(5).randint(
        0, 255, (3, H, W, 3), np.uint8)))
    assert out["theta"].shape == (3, 1, 3, 3)

    # --buckets: one fixed-batch artifact per size under <dst>/b{N}
    # (the pjrt_http_serve bucket set); checkpoint loads once, batch-1
    # court constants broadcast, so every bucket is bit-equal to the
    # plain fixed-batch export
    mod.main(["--load", str(cp_dir / "CP_epoch1.msgpack"),
              "--req_outputs", "theta,consistency",
              "--batchsize", "2", "--out_size", str(W), str(H),
              "--court_img", COURT_IMG, "--court_poi", COURT_POI,
              "--compute_dtype", "float32",
              "--buckets", "2,1", "--dst", str(tmp_path / "buckets")])
    for b in (1, 2):
        sub = tmp_path / "buckets" / f"b{b}"
        meta = json.load(open(sub / "meta.json"))
        assert meta["input"]["shape"] == [b, H, W, 3]
        for f in ("module.mlir.bc", "compile_options.pb", "io_spec.txt"):
            assert (sub / f).exists(), f
    fn2, _ = load_serving(str(tmp_path / "buckets" / "b2"))
    x = np.random.RandomState(3).randint(0, 255, (2, H, W, 3), np.uint8)
    out2 = jax.device_get(fn2(x))
    ref = jax.device_get(load_serving(str(art))[0](x))
    np.testing.assert_array_equal(np.asarray(out2["theta"]),
                                  np.asarray(ref["theta"]))
    fn1, _ = load_serving(str(tmp_path / "buckets" / "b1"))
    out1 = jax.device_get(fn1(x[:1]))
    np.testing.assert_array_equal(np.asarray(out1["theta"]),
                                  np.asarray(ref["theta"])[:1])
