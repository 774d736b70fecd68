"""Full-UNet packed level-1 domain (conv_kernel='pallas') vs the XLA path:
forward, batch-stat updates, gradients, eval — interpret mode on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.models.unet import UNet
from sports_field_homography_tpu.ops import double_conv as dc

N, H, W = 2, 16, 32


@pytest.fixture(autouse=True)
def _lower_gates():
    old_t, old_e = dc._TRAIN_MIN_PIXELS, dc._EVAL_MIN_PIXELS
    dc._TRAIN_MIN_PIXELS = 0
    dc._EVAL_MIN_PIXELS = 0
    yield
    dc._TRAIN_MIN_PIXELS, dc._EVAL_MIN_PIXELS = old_t, old_e


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, 3).astype(np.float32))
    unet_x = UNet(mask_classes=4, conv_kernel="xla")
    variables = unet_x.init(jax.random.PRNGKey(0), x, True)
    unet_p = UNet(mask_classes=4, conv_kernel="pallas")
    return x, variables, unet_x, unet_p


def test_train_forward_and_stats(setup):
    x, variables, unet_x, unet_p = setup
    (lx, tx, _), mx = unet_x.apply(variables, x, True,
                                   mutable=["batch_stats"])
    (lp, tp, _), mp = unet_p.apply(variables, x, True,
                                   mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(tx),
                               rtol=5e-4, atol=5e-4)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(mx["batch_stats"]))
    flat_p = dict(jax.tree_util.tree_leaves_with_path(mp["batch_stats"]))
    assert set(flat_p) == set(flat_x)
    for path, vx in flat_x.items():
        np.testing.assert_allclose(np.asarray(flat_p[path]),
                                   np.asarray(vx), rtol=5e-4, atol=5e-4,
                                   err_msg=str(path))


@pytest.mark.full
def test_train_grads(setup):
    x, variables, unet_x, unet_p = setup
    rng = np.random.RandomState(1)
    cot = jnp.asarray(rng.randn(N, H, W, 4).astype(np.float32))

    def loss(unet, params):
        (logits, _, _), _ = unet.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        return jnp.sum(logits * cot)

    gx = jax.grad(lambda p: loss(unet_x, p))(variables["params"])
    gp = jax.grad(lambda p: loss(unet_p, p))(variables["params"])
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    assert set(flat_p) == {p for p, _ in flat_x}
    # elementwise comparison is invalid at full depth: ~1e-4 forward
    # rounding differences flip ReLU masks, and the measured intrinsic
    # gradient chaos of the XLA path under a 1e-4 input perturbation is
    # LARGER than the pallas-vs-xla delta.  Compare relative L2 per leaf.
    for path, vx in flat_x:
        vp = np.asarray(flat_p[path], np.float64)
        vx = np.asarray(vx, np.float64)
        # conv biases feeding train-BN have ~zero true gradient (the
        # shift cancels in the mean subtraction), so floor the denominator
        # at a scale-aware epsilon instead of comparing pure noise
        denom = np.linalg.norm(vx) + 1e-3 * np.sqrt(vx.size)
        rel = np.linalg.norm(vp - vx) / denom
        assert rel < 0.05, (str(path), rel)


def test_eval_matches(setup):
    x, variables, unet_x, unet_p = setup
    # non-trivial running stats
    rng = np.random.RandomState(2)
    bs = jax.tree.map(
        lambda v: jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.1
                              + (1.0 if v.shape else 0.0)),
        variables["batch_stats"])
    vv = {"params": variables["params"], "batch_stats": bs}
    lx, tx, _ = unet_x.apply(vv, x, False)
    lp, tp, _ = unet_p.apply(vv, x, False)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(tx),
                               rtol=5e-4, atol=5e-4)


def test_uv_head_packed(setup):
    x, variables, _, _ = setup
    unet_uv_x = UNet(mask_classes=4, uv=True, conv_kernel="xla")
    v = unet_uv_x.init(jax.random.PRNGKey(1), x, True)
    unet_uv_p = UNet(mask_classes=4, uv=True, conv_kernel="pallas")
    (lx, _, uvx), _ = unet_uv_x.apply(v, x, True, mutable=["batch_stats"])
    (lp, _, uvp), _ = unet_uv_p.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(uvp), np.asarray(uvx),
                               rtol=5e-4, atol=5e-4)
