"""BatchNorm folding must be a numerical no-op at inference."""
import numpy as np

import jax

import pytest
import jax.numpy as jnp

from sports_field_homography_tpu.models import Reconstructor, ReconstructorConfig
from sports_field_homography_tpu.ops.fold_bn import fold_batchnorm


@pytest.mark.full
def test_folded_predict_matches_unfolded():
    cfg = ReconstructorConfig(target_size=(64, 36), unet_size=(64, 36),
                              warp_size=(64, 36), resnet_name="resnet18",
                              warp_with_nearest=True)
    model = Reconstructor(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 36, 64, 3))
    court_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 36, 64, 1))
    court_poi = jax.random.uniform(jax.random.PRNGKey(2), (2, 20, 2),
                                   minval=-0.9, maxval=0.9)
    variables = model.init(rng, x, court_img, court_poi, train=False)

    # give BN non-trivial stats so folding actually does something
    def perturb(path, v):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        k = jax.random.fold_in(rng, abs(hash("/".join(map(str, path)))) % 2**31)
        if name == "mean":
            return 0.1 * jax.random.normal(k, v.shape)
        if name == "var":
            return 0.75 + 0.5 * jax.random.uniform(k, v.shape)
        return v
    variables = {
        "params": jax.tree_util.tree_map_with_path(
            lambda p, v: v + 0.05 * jax.random.normal(
                jax.random.fold_in(rng, abs(hash(str(p))) % 2**31), v.shape),
            variables["params"]),
        "batch_stats": jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"]),
    }

    def predict(v):
        return model.apply(v, x, court_img, court_poi, consistency=True,
                           project_poi=True, method=model.predict)

    base = predict(variables)
    folded_vars = fold_batchnorm(variables)
    folded = predict(folded_vars)

    # f32 reassociation (kernel*s) shifts a handful of ulps; logits of the
    # perturbed random net have magnitude ~1e2, hence the atol.
    for k in ("logits", "theta", "consist_score", "poi"):
        np.testing.assert_allclose(np.asarray(folded[k]), np.asarray(base[k]),
                                   rtol=5e-3, atol=5e-3), k
    # folded BN layers are neutralized
    bn = folded_vars["params"]["unet"]["inc"]["bn1"]
    assert np.allclose(bn["scale"], 1.0)
    stats = folded_vars["batch_stats"]["unet"]["inc"]["bn1"]
    assert np.allclose(stats["mean"], 0.0)


def test_bn_folded_model_path_bit_identical():
    """model.clone(bn_folded=True) on folded variables == the normal BN
    path on the same folded variables, bit for bit (the skip computes the
    same f32 x+bias expression the neutralized stats produce)."""
    cfg = ReconstructorConfig(target_size=(64, 36), unet_size=(64, 36),
                              warp_size=(64, 36), resnet_name="resnet18",
                              warp_with_nearest=True)
    model = Reconstructor(cfg)
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (2, 36, 64, 3))
    court_img = jax.random.uniform(jax.random.PRNGKey(1), (2, 36, 64, 1))
    court_poi = jax.random.uniform(jax.random.PRNGKey(2), (2, 20, 2),
                                   minval=-0.9, maxval=0.9)
    variables = model.init(rng, x, court_img, court_poi, train=False)
    folded_vars = fold_batchnorm(variables)

    def predict(m, v):
        return jax.jit(lambda v, x, ci, cp: m.apply(
            v, x, ci, cp, consistency=True, project_poi=True,
            method=m.predict))(v, x, court_img, court_poi)

    via_stats = predict(model, folded_vars)
    via_skip = predict(model.clone(bn_folded=True), folded_vars)
    for k in ("logits", "theta", "consist_score", "poi"):
        np.testing.assert_array_equal(np.asarray(via_stats[k]),
                                      np.asarray(via_skip[k]), err_msg=k)


def test_build_model_fold_bn_flag(tmp_path):
    """build_model(fold_bn=True) loads a checkpoint folded + clones the
    model with the BN skip; predict outputs match the unfolded build."""
    from sports_field_homography_tpu.cli.engine import build_model, jit_predict_fn
    from sports_field_homography_tpu.utils.checkpoint import save_checkpoint

    class A:
        batchsize = 2
        target_size = (64, 36); unet_size = (64, 36); warp_size = (64, 36)
        court_size = (64, 36); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
        court_poi = "/root/repo/assets/template_ncaa_v4_points.json"

    base = build_model(A, warp_with_nearest=True)
    cp = str(tmp_path / "CP_epoch1.msgpack")
    save_checkpoint(cp, base.variables)

    plain = build_model(A, load=cp, warp_with_nearest=True, fold_bn=False)
    folded = build_model(A, load=cp, warp_with_nearest=True, fold_bn=True)
    assert folded.model.bn_folded and not plain.model.bn_folded

    x = np.random.RandomState(7).randint(0, 256, (2, 36, 64, 3), dtype=np.uint8)
    keep = ("theta", "consist_score")
    out_p = jit_predict_fn(plain, consistency=True, project_poi=False,
                           keep=keep)(plain.variables, jnp.asarray(x))
    out_f = jit_predict_fn(folded, consistency=True, project_poi=False,
                           keep=keep)(folded.variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_f["theta"]),
                               np.asarray(out_p["theta"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["consist_score"]),
                               np.asarray(out_p["consist_score"]),
                               rtol=1e-3, atol=1e-4)
