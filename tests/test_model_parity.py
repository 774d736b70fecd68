"""End-to-end numerical parity vs the PyTorch reference Reconstructor.

The reference's own ``models.reconstructor.Reconstructor`` is imported from
/root/reference (kornia stubbed with exact-semantics torch code, see
torch_ref.py), initialized with torch's RNG, its state_dict converted with
``compat.torch_import`` and run against our flax Reconstructor on the same
inputs.  The BASELINE target is theta max-abs-diff <= 1e-3; we assert far
tighter here on CPU f32.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.models import Reconstructor, ReconstructorConfig
from sports_field_homography_tpu.compat.torch_import import convert_state_dict

from torch_ref import import_reference

ref_reconstructor, ref_resnet, _ = import_reference()

RNG = np.random.RandomState(42)


def make_court(batch, size=(64, 36), classes=4):
    w, h = size
    tmpl = RNG.randint(0, classes, size=(h, w)).astype(np.float32) / classes
    poi = RNG.uniform(-0.9, 0.9, size=(20, 2)).astype(np.float32)
    court_img_t = torch.from_numpy(tmpl)[None, None].repeat(batch, 1, 1, 1)
    court_poi_t = torch.from_numpy(poi)[None].repeat(batch, 1, 1)
    court_img_j = jnp.asarray(tmpl)[None, :, :, None].repeat(batch, 0)
    court_poi_j = jnp.asarray(poi)[None].repeat(batch, 0)
    return court_img_t, court_poi_t, court_img_j, court_poi_j


def randomize_bn_stats(net):
    """Give BN layers non-trivial running stats so eval mode is exercised."""
    g = torch.Generator().manual_seed(7)
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) * 0.5 + 0.75)


def build_pair(torch_kwargs, cfg, batch=2, in_size=(64, 36), court_size=(64, 36)):
    torch.manual_seed(0)
    ci_t, cp_t, ci_j, cp_j = make_court(batch, court_size, cfg.mask_classes)
    ref = ref_reconstructor.Reconstructor(ci_t, cp_t, **torch_kwargs)
    randomize_bn_stats(ref)
    ref.eval()
    variables = convert_state_dict(ref.state_dict(), unet_bilinear=cfg.unet_bilinear)
    model = Reconstructor(cfg)
    x_np = RNG.rand(batch, in_size[1], in_size[0], 3).astype(np.float32)
    x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    x_j = jnp.asarray(x_np)
    return ref, model, variables, x_t, x_j, (ci_t, cp_t, ci_j, cp_j)


CONFIGS = [
    # (name, torch kwargs, our config)
    ("deconv_img+mask",
     dict(target_size=(64, 36), mask_classes=4, unet_size=(64, 36),
          warp_size=(64, 36), resnet_name="resnet18", resnet_input="img+mask"),
     ReconstructorConfig(target_size=(64, 36), unet_size=(64, 36),
                         warp_size=(64, 36), resnet_name="resnet18")),
    ("bilinear_mask",
     dict(target_size=(64, 36), mask_classes=4, unet_bilinear=True,
          unet_size=(64, 36), warp_size=(64, 36), resnet_name="resnet18",
          resnet_input="mask"),
     ReconstructorConfig(target_size=(64, 36), unet_bilinear=True,
                         unet_size=(64, 36), warp_size=(64, 36),
                         resnet_name="resnet18", resnet_input="mask")),
    ("uv_resnet34",
     dict(target_size=(64, 36), mask_classes=4, unet_size=(64, 36),
          unet_uv=True, warp_size=(64, 36), resnet_name="resnet34",
          resnet_input="img+mask+uv"),
     ReconstructorConfig(target_size=(64, 36), unet_size=(64, 36),
                         unet_uv=True, warp_size=(64, 36),
                         resnet_name="resnet34", resnet_input="img+mask+uv")),
    ("bottleneck_resize",
     dict(target_size=(64, 36), mask_classes=4, unet_size=(48, 28),
          warp_size=(80, 44), resnet_name="resnet50", resnet_input="img+mask"),
     ReconstructorConfig(target_size=(64, 36), unet_size=(48, 28),
                         warp_size=(80, 44), resnet_name="resnet50")),
]


@pytest.mark.parametrize("name,torch_kwargs,cfg", CONFIGS,
                         ids=[c[0] for c in CONFIGS])
def test_forward_parity(name, torch_kwargs, cfg):
    ref, model, variables, x_t, x_j, courts = build_pair(torch_kwargs, cfg)
    ci_t, cp_t, ci_j, cp_j = courts
    with torch.no_grad():
        ref_out = ref(x_t)
    out = jax.jit(lambda v, x: model.apply(v, x, ci_j, cp_j, train=False))(
        variables, x_j)

    # logits
    ref_logits = ref_out["logits"].permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits,
                               rtol=1e-3, atol=2e-4)
    # theta: the BASELINE north star (<=1e-3); assert much tighter
    theta_diff = np.abs(np.asarray(out["theta"]) - ref_out["theta"].numpy()).max()
    assert theta_diff <= 2e-4, f"theta max-abs-diff {theta_diff}"
    # poi
    np.testing.assert_allclose(np.asarray(out["poi"]), ref_out["poi"].numpy(),
                               rtol=1e-3, atol=5e-4)
    # warp mask (training path: bilinear)
    np.testing.assert_allclose(np.asarray(out["warp_mask"]),
                               ref_out["warp_mask"].numpy(),
                               rtol=1e-3, atol=5e-4)
    if "uv" in ref_out:
        np.testing.assert_allclose(np.asarray(out["uv"]),
                                   ref_out["uv"].permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=2e-4)


def test_predict_parity_with_consistency():
    torch_kwargs = dict(target_size=(64, 36), mask_classes=4,
                        unet_size=(64, 36), warp_size=(80, 44),
                        resnet_name="resnet18", resnet_input="img+mask",
                        warp_with_nearest=True)
    cfg = ReconstructorConfig(target_size=(64, 36), unet_size=(64, 36),
                              warp_size=(80, 44), resnet_name="resnet18",
                              warp_with_nearest=True)
    ref, model, variables, x_t, x_j, courts = build_pair(torch_kwargs, cfg)
    ci_t, cp_t, ci_j, cp_j = courts
    with torch.no_grad():
        ref_out = ref.predict(x_t, consistency=True, project_poi=True)
    out = jax.jit(lambda v, x: model.apply(
        v, x, ci_j, cp_j, consistency=True, project_poi=True,
        method=model.predict))(variables, x_j)

    theta_diff = np.abs(np.asarray(out["theta"]) - ref_out["theta"].numpy()).max()
    assert theta_diff <= 2e-4
    np.testing.assert_allclose(np.asarray(out["consist_score"]),
                               ref_out["consist_score"].numpy(),
                               rtol=1e-3, atol=1e-3)
    # nearest warp labels are ints; allow a tiny fraction of boundary pixels
    # to disagree (floating-point rounding at exact cell edges)
    wm_ours = np.asarray(out["warp_mask"])
    wm_ref = ref_out["warp_mask"].numpy()
    mismatch = (wm_ours != wm_ref).mean()
    assert mismatch < 1e-3, f"warp label mismatch fraction {mismatch}"
    np.testing.assert_allclose(np.asarray(out["poi"]), ref_out["poi"].numpy(),
                               rtol=1e-3, atol=5e-4)


def test_train_mode_batchnorm_parity():
    """Train-mode forward: batch stats used + running stats updated like torch."""
    from sports_field_homography_tpu.models.unet import DoubleConv
    import unet.unet_parts as up

    torch.manual_seed(3)
    ref = up.DoubleConv(3, 8)
    ref.train()
    x_np = RNG.rand(4, 10, 12, 3).astype(np.float32)
    x_t = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref_y = ref(x_t).permute(0, 2, 3, 1).numpy()

    sd = {f"inc.double_conv.{k}": v for k, v in ref.double_conv.state_dict().items()}
    variables = convert_state_dict(sd)
    params = {"params": variables["params"]["unet"]["inc"],
              "batch_stats": {k: {"mean": np.zeros_like(v["mean"]),
                                  "var": np.ones_like(v["var"])}
                              for k, v in variables["batch_stats"]["unet"]["inc"].items()}}
    model = DoubleConv(8)
    y, mutated = model.apply(params, jnp.asarray(x_np), True,
                             mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-4, atol=1e-5)
    # running stats after one train step (torch updated them in-place)
    for bn_name, torch_bn in [("bn1", ref.double_conv[1]), ("bn2", ref.double_conv[4])]:
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"][bn_name]["mean"]),
            torch_bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"][bn_name]["var"]),
            torch_bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("resnet_name", ["resnext50_32x4d", "wide_resnet50_2"])
def test_exotic_resnet_variants(resnet_name):
    """Grouped and wide bottlenecks match the reference implementations.

    Note: the reference's ``resnet_stn`` registry entry point crashes for
    these names (their factories don't take ``in_channels``,
    reference models/resnet.py:308-359 vs :373-374) — a reference quirk we
    don't reproduce.  Call the factories directly (in_channels defaults 4).
    """
    torch.manual_seed(1)
    ref = getattr(ref_resnet, resnet_name)(None)
    randomize_bn_stats(ref)
    ref.eval()
    sd = {f"resnet_reg.{k}": v for k, v in ref.state_dict().items()}
    variables = convert_state_dict(sd)
    variables = {"params": variables["params"]["resnet_reg"],
                 "batch_stats": variables["batch_stats"]["resnet_reg"]}

    from sports_field_homography_tpu.models.resnet import resnet_stn
    model = resnet_stn(resnet_name)
    x_np = RNG.rand(2, 36, 64, 4).astype(np.float32)
    with torch.no_grad():
        ref_theta = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    theta = model.apply(variables, jnp.asarray(x_np), False)
    assert np.abs(np.asarray(theta) - ref_theta).max() <= 2e-4


def test_torchvision_warmstart_conversion():
    """torchvision-style ResNet weights warm-start the STN like the
    reference's strict=False load: layers+bn load, conv1/fc dropped.

    torchvision isn't installed; synthesize its exact naming from the
    reference ResNetSTN state_dict (conv0->conv1, reg->fc)."""
    from sports_field_homography_tpu.compat.torch_import import (
        convert_torchvision_resnet)

    torch.manual_seed(2)
    ref = ref_resnet.resnet_stn("resnet18", None, 4)
    sd = ref.state_dict()
    tv_sd = {}
    for k, v in sd.items():
        if k.startswith("conv0."):
            tv_sd["conv1." + k[len("conv0."):]] = v
        elif k.startswith("reg."):
            tv_sd["fc." + k[len("reg."):]] = v
        else:
            tv_sd[k] = v

    pre = convert_torchvision_resnet(tv_sd)
    params = pre["params"]["resnet_reg"]
    stats = pre["batch_stats"]["resnet_reg"]
    assert "conv0" not in params and "reg" not in params   # dropped
    assert "layer1_0" in params and "bn1" in params
    np.testing.assert_array_equal(
        params["layer1_0"]["conv1"]["kernel"],
        sd["layer1.0.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(stats["bn1"]["mean"],
                                  sd["bn1.running_mean"].numpy())
