"""BatchNorm folding must be a numerical no-op at inference."""
import numpy as np

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.models import Reconstructor, ReconstructorConfig
from sports_field_homography_tpu.ops.fold_bn import fold_batchnorm


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
