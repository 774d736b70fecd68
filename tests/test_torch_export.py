"""Checkpoint export to the reference's .pth format (compat.torch_export).

Three guarantees:
  1. round-trip: convert_state_dict(export_state_dict(v)) == v exactly;
  2. the exported dict loads into the ACTUAL reference torch model with
     ``strict=True`` (same keys, same shapes);
  3. forward parity: the reference model running the exported weights
     matches our model running the originals.
"""
import numpy as np
import pytest
import torch

import jax

from sports_field_homography_tpu.compat.torch_export import (
    export_state_dict, save_torch_checkpoint)
from sports_field_homography_tpu.compat.torch_import import convert_state_dict
from sports_field_homography_tpu.models import Reconstructor, ReconstructorConfig

from torch_ref import import_reference

ref_reconstructor, _, _ = import_reference()

RNG = np.random.RandomState(3)


def _make_court(size=(64, 36), classes=4):
    w, h = size
    tmpl = RNG.randint(0, classes, size=(h, w)).astype(np.float32) / classes
    ci_t = torch.from_numpy(tmpl)[None, None].repeat(2, 1, 1, 1)
    poi = RNG.rand(28, 2).astype(np.float32)
    cp_t = torch.from_numpy(poi)[None].repeat(2, 1, 1)
    import jax.numpy as jnp
    return ci_t, cp_t, jnp.asarray(tmpl[None, :, :, None]), jnp.asarray(poi[None])


def _init_variables(cfg, in_size=(64, 36)):
    model = Reconstructor(cfg)
    _, _, ci_j, cp_j = _make_court((64, 36), cfg.mask_classes)
    x = jax.numpy.zeros((1, in_size[1], in_size[0], 3), jax.numpy.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(11), x, ci_j, cp_j, train=False))()
    return model, jax.device_get(variables), ci_j, cp_j


CFG = dict(target_size=(64, 36), unet_size=(64, 36), warp_size=(64, 36),
           mask_classes=4, use_unet=True, unet_bilinear=False,
           use_resnet=True, resnet_name="resnet18",
           resnet_input="img+mask")


@pytest.mark.full
def test_roundtrip_exact():
    cfg = ReconstructorConfig(**CFG)
    _, variables, _, _ = _init_variables(cfg)
    sd = export_state_dict(variables)
    back = convert_state_dict(sd, unet_bilinear=False)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b
    b_by_path = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v),
                                      b_by_path[jax.tree_util.keystr(p)],
                                      err_msg=jax.tree_util.keystr(p))


@pytest.mark.parametrize("resnet_name", [
    "resnet18",
    pytest.param("resnet50", marks=pytest.mark.full),
])
def test_strict_load_and_forward_parity(resnet_name, tmp_path):
    cfg = ReconstructorConfig(**{**CFG, "resnet_name": resnet_name})
    model, variables, ci_j, cp_j = _init_variables(cfg)

    pth = tmp_path / "export.pth"
    save_torch_checkpoint(str(pth), variables)
    sd = torch.load(str(pth), map_location="cpu", weights_only=True)

    ci_t, cp_t, _, _ = _make_court((64, 36), cfg.mask_classes)
    ref = ref_reconstructor.Reconstructor(
        ci_t, cp_t, target_size=(64, 36), mask_classes=4,
        unet_size=(64, 36), warp_size=(64, 36), resnet_name=resnet_name,
        resnet_input="img+mask")
    # strict load: exported keys must exactly cover the reference model
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    x_np = RNG.rand(2, 36, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    logits_t = out_t["logits"].numpy().transpose(0, 2, 3, 1)
    theta_t = out_t["theta"].numpy()

    out_j = jax.jit(
        lambda v, x: model.apply(
            v, x, jax.numpy.concatenate([ci_j, ci_j]),
            jax.numpy.concatenate([cp_j, cp_j]), train=False)
    )(variables, jax.numpy.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out_j["logits"], np.float32),
                               logits_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["theta"], np.float32),
                               theta_t, atol=2e-4)


def test_export_cli_from_msgpack(tmp_path):
    import importlib.util
    import os

    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    cfg = ReconstructorConfig(**CFG)
    _, variables, _, _ = _init_variables(cfg)
    cp = tmp_path / "CP_epoch1.msgpack"
    save_checkpoint(str(cp), variables)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "export_torch_checkpoint",
        os.path.join(repo, "scripts", "export_torch_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--load", str(cp)])
    out = tmp_path / "CP_epoch1.pth"
    assert out.exists()
    sd = torch.load(str(out), map_location="cpu", weights_only=True)
    expect = export_state_dict(variables)
    assert sorted(sd) == sorted(expect)
    np.testing.assert_allclose(
        sd["inc.double_conv.0.weight"].numpy(),
        np.asarray(expect["inc.double_conv.0.weight"], np.float32))
