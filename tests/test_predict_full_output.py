"""Full-output predict program (BASELINE config #2 shape): the shared-warp
consistency path must be bit-equal to the fused subsampled-grid warp, and
the CLI engine must auto-select it when warp_mask is kept.
"""
import numpy as np

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.data.assets import (
    open_court_poi,
    open_court_template,
)
from sports_field_homography_tpu.models import Reconstructor, ReconstructorConfig
from sports_field_homography_tpu.ops.interval_warp import build_interval_table

TMPL = "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png"
POI = "/root/repo/assets/template_ncaa_v4_points.json"


def _setup(batch=2, target=(64, 36), warp=(128, 72)):
    cfg = ReconstructorConfig(
        target_size=target, unet_size=target, warp_size=warp,
        resnet_name="resnet18", resnet_input="img+mask",
        warp_with_nearest=True)
    model = Reconstructor(cfg, dtype=jnp.float32)
    ci = open_court_template(TMPL, num_classes=4, size=warp,
                             batch_size=batch)
    cp = open_court_poi(POI, batch)
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(batch, target[1], target[0], 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1],
                           jnp.asarray(ci[:1]), jnp.asarray(cp[:1]),
                           train=False)
    wt = build_interval_table(ci)
    return model, variables, x, jnp.asarray(ci), jnp.asarray(cp), wt


def test_score_from_warp_mask_bit_equal():
    model, variables, x, ci, cp, wt = _setup()
    a = model.apply(variables, x, ci, cp, consistency=True,
                    warp_table=wt, method=model.predict)
    b = model.apply(variables, x, ci, cp, consistency=True,
                    warp_table=wt, score_from_warp_mask=True,
                    method=model.predict)
    np.testing.assert_array_equal(np.asarray(a["consist_score"]),
                                  np.asarray(b["consist_score"]))
    np.testing.assert_array_equal(np.asarray(a["warp_mask"]),
                                  np.asarray(b["warp_mask"]))


def test_engine_shares_warp_when_mask_kept(tmp_path):
    """jit_predict_fn(keep with warp_mask) equals the unshared outputs."""
    from sports_field_homography_tpu.cli.engine import ModelBundle, jit_predict_fn

    model, variables, x, ci, cp, wt = _setup()
    bundle = ModelBundle(model, jax.device_put(variables),
                         np.asarray(ci), np.asarray(cp), model.config)
    fn_full = jit_predict_fn(bundle, consistency=True, project_poi=True,
                             keep=("theta", "warp_mask", "consist_score",
                                   "poi", "segm_mask"))
    fn_slim = jit_predict_fn(bundle, consistency=True, project_poi=True,
                             keep=("theta", "consist_score"))
    full = fn_full(bundle.variables, x)
    slim = fn_slim(bundle.variables, x)
    np.testing.assert_allclose(np.asarray(full["consist_score"]),
                               np.asarray(slim["consist_score"]),
                               rtol=1e-6, atol=1e-6)
    assert full["warp_mask"].dtype == jnp.uint8
    assert full["warp_mask"].shape == (2, 72, 128)
