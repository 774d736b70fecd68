"""C++ PJRT serving runtime (cpp/pjrt_serve.cc) on the real TPU.

The binary dlopens the PJRT plugin, compiles the artifact's raw StableHLO
(module.mlir.bc) and serves it with zero Python.  This test exports a tiny
fixed-batch artifact lowered for TPU, runs the binary against the axon
plugin in a subprocess (independent of this process's forced-CPU jax),
and asserts the outputs match a CPU-artifact reference.

Skipped when the plugin, g++, or the PJRT header is unavailable.
"""
import os
import subprocess
import uuid

import numpy as np
import pytest

import jax

from sports_field_homography_tpu.cli.engine import build_model
from sports_field_homography_tpu.compat.serving import (
    export_predict, load_serving, save_serving)

W, H = 64, 36
COURT_IMG = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
COURT_POI = "/root/repo/assets/template_ncaa_v4_points.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from cpp_build import PLUGIN, have_build_deps, have_plugin  # noqa: E402

pytestmark = [pytest.mark.full, pytest.mark.skipif(
    not (have_plugin() and have_build_deps(opencv=False)),
    reason="needs the axon PJRT plugin, g++, and the PJRT C API header")]


class _Args:
    batchsize = 2
    target_size = (W, H); unet_size = (W, H); warp_size = (W, H)
    court_size = (W, H); mask_classes = 4
    use_unet = True; unet_bilinear = False; unet_uv = False
    use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
    use_warper = True; compute_dtype = "float32"
    court_img = COURT_IMG; court_poi = COURT_POI


def test_cpp_runtime_serves_tpu_artifact(tmp_path):
    from cpp_build import build
    binary = build("pjrt_serve")

    bundle = build_model(_Args, warp_with_nearest=True)
    keep = ("consist_score", "theta")
    # one artifact lowered for the TPU (served by C++), one for CPU (the
    # in-process reference) — same weights, same program
    exported_tpu, meta_tpu = export_predict(
        bundle, consistency=True, project_poi=False, keep=keep,
        batch_size=2, platforms=("tpu",))
    save_serving(str(tmp_path / "tpu"), exported_tpu, meta_tpu)
    exported_cpu, meta_cpu = export_predict(
        bundle, consistency=True, project_poi=False, keep=keep,
        batch_size=2, platforms=("cpu",))
    save_serving(str(tmp_path / "cpu"), exported_cpu, meta_cpu)
    for f in ("module.mlir.bc", "compile_options.pb", "io_spec.txt"):
        assert (tmp_path / "tpu" / f).exists(), f

    x = np.random.RandomState(11).randint(0, 255, (2, H, W, 3), np.uint8)
    x.tofile(tmp_path / "input.bin")
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    env = dict(os.environ)
    env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    env.setdefault("AXON_LOOPBACK_RELAY", "1")
    env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    r = subprocess.run(
        [binary, str(tmp_path / "tpu"), str(tmp_path / "input.bin"),
         str(out_dir),
         "--opt", "topology=v5e:1x1x1", "--opt", "remote_compile=1",
         "--opt", "n_slices=1", "--opt", f"session_id=cxx-{uuid.uuid4()}",
         "--opt", "rank=4294967295"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]

    theta_cxx = np.fromfile(out_dir / "theta.bin",
                            np.float32).reshape(2, 1, 3, 3)
    score_cxx = np.fromfile(out_dir / "consist_score.bin", np.float32)

    fn, _ = load_serving(str(tmp_path / "cpu"))
    ref = jax.device_get(fn(x))
    # TPU-vs-CPU float reductions: north-star tolerance 1e-3 with margin
    np.testing.assert_allclose(theta_cxx, np.asarray(ref["theta"]),
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(score_cxx,
                               np.asarray(ref["consist_score"]),
                               rtol=1e-3, atol=1e-3)
    assert np.isfinite(theta_cxx).all()
