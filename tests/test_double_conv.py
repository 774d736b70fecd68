"""Fused Pallas DoubleConv vs the plain-XLA reference composition:
forward outputs, batch stats, and every gradient (interpret mode on CPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.ops.double_conv import (
    double_conv_train,
    supports_double_conv,
)

EPS = 1e-5


def ref_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y + b


def ref_bn_relu(y, gamma, beta):
    mean = jnp.mean(y, (0, 1, 2))
    var = jnp.mean(y * y, (0, 1, 2)) - mean * mean
    z = (y - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return jnp.maximum(z, 0.0), mean, var


def ref_double_conv(x, k1, b1, g1, be1, k2, b2, g2, be2):
    y1 = ref_conv(x, k1, b1)
    z1, m1, v1 = ref_bn_relu(y1, g1, be1)
    y2 = ref_conv(z1, k2, b2)
    z2, m2, v2 = ref_bn_relu(y2, g2, be2)
    return z2, m1, v1, m2, v2


def make_params(rng, cin, mid, cout):
    k1 = jnp.asarray(rng.randn(3, 3, cin, mid).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.randn(mid).astype(np.float32) * 0.1)
    g1 = jnp.asarray(1.0 + 0.2 * rng.randn(mid).astype(np.float32))
    be1 = jnp.asarray(rng.randn(mid).astype(np.float32) * 0.1)
    k2 = jnp.asarray(rng.randn(3, 3, mid, cout).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    g2 = jnp.asarray(1.0 + 0.2 * rng.randn(cout).astype(np.float32))
    be2 = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    return k1, b1, g1, be1, k2, b2, g2, be2


@pytest.mark.parametrize("cin", [64, 3])
def test_forward_and_stats(cin):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 16, cin).astype(np.float32))
    params = make_params(rng, cin, 64, 64)
    out, m1, v1, m2, v2 = double_conv_train(x, *params, EPS, True)
    ref = ref_double_conv(x, *params)
    for got, want, tag in zip((out, m1, v1, m2, v2), ref,
                              ("out", "m1", "v1", "m2", "v2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4, err_msg=tag)


@pytest.mark.parametrize("cin", [64, 3])
def test_gradients(cin):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16, cin).astype(np.float32))
    params = make_params(rng, cin, 64, 64)
    cot = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))

    def loss_fused(x, *p):
        out, m1, v1, m2, v2 = double_conv_train(x, *p, EPS, True)
        # touch the stats so their (detached) cotangents exist
        return jnp.sum(out * cot) + 0.0 * (jnp.sum(m1) + jnp.sum(v1)
                                           + jnp.sum(m2) + jnp.sum(v2))

    def loss_ref(x, *p):
        out = ref_double_conv(x, *p)[0]
        return jnp.sum(out * cot)

    grads_f = jax.grad(loss_fused, argnums=tuple(range(9)))(x, *params)
    grads_r = jax.grad(loss_ref, argnums=tuple(range(9)))(x, *params)
    names = ["dx", "dk1", "db1", "dg1", "dbe1", "dk2", "db2", "dg2", "dbe2"]
    for got, want, tag in zip(grads_f, grads_r, names):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4,
            err_msg=tag)


def test_mid_channels_differ():
    """Bilinear-UNet DoubleConvs use mid != out channels."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))
    params = make_params(rng, 64, 128, 64)
    out, *stats = double_conv_train(x, *params, EPS, True)
    ref = ref_double_conv(x, *params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-4)


def test_supports():
    assert supports_double_conv((26, 360, 640, 64), jnp.bfloat16)
    assert supports_double_conv((26, 360, 640, 3), jnp.bfloat16)
    assert not supports_double_conv((2, 7, 18, 64), jnp.float32)
    # the measured-best train gate fuses level 1 only (BASELINE round 3)
    assert not supports_double_conv((26, 180, 320, 64), jnp.bfloat16,
                                    128, 128)
    assert not supports_double_conv((26, 45, 80, 256), jnp.bfloat16,
                                    512, 512)
    from sports_field_homography_tpu.ops.double_conv import (
        supports_double_conv_eval)
    # eval fuses levels 1-2 (no residuals, but tunnel-compile cost gates
    # the small deep levels)
    assert supports_double_conv_eval((26, 180, 320, 64), jnp.bfloat16,
                                     128, 128)
    assert not supports_double_conv_eval((26, 90, 160, 128), jnp.bfloat16,
                                         256, 256)


class TestUNetIntegration:
    """conv_kernel='pallas' must match the XLA path through the real UNet
    module (params, batch-stat updates, loss gradients)."""

    def _setup(self, cin=3):
        from sports_field_homography_tpu.models.unet import DoubleConv
        from sports_field_homography_tpu.ops import double_conv as dc

        dc._TRAIN_MIN_PIXELS = 0     # tiny test shapes must still fuse
        dc._EVAL_MIN_PIXELS = 0

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 8, 16, cin).astype(np.float32))
        mod_x = DoubleConv(64, conv_kernel="xla")
        variables = mod_x.init(jax.random.PRNGKey(0), x, True)
        mod_p = DoubleConv(64, conv_kernel="pallas")
        return x, variables, mod_x, mod_p

    @pytest.mark.parametrize("cin", [64, 3])
    def test_apply_and_stats_match(self, cin):
        x, variables, mod_x, mod_p = self._setup(cin)
        yx, mx = mod_x.apply(variables, x, True, mutable=["batch_stats"])
        yp, mp = mod_p.apply(variables, x, True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                                   rtol=2e-4, atol=2e-4)
        for k in ("bn1", "bn2"):
            for stat in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(mp["batch_stats"][k][stat]),
                    np.asarray(mx["batch_stats"][k][stat]),
                    rtol=2e-4, atol=2e-4, err_msg=f"{k}/{stat}")

    def test_grads_match(self):
        x, variables, mod_x, mod_p = self._setup(64)
        cot = jnp.asarray(np.random.RandomState(6)
                          .randn(2, 8, 16, 64).astype(np.float32))

        def loss(mod, params):
            out, _ = mod.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               x, True, mutable=["batch_stats"])
            return jnp.sum(out * cot)

        gx = jax.grad(lambda p: loss(mod_x, p))(variables["params"])
        gp = jax.grad(lambda p: loss(mod_p, p))(variables["params"])
        flat_x = jax.tree_util.tree_leaves_with_path(gx)
        flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
        # same param tree in both modes (checkpoint compatibility)
        assert set(flat_p) == {p for p, _ in flat_x}
        for path, vx in flat_x:
            np.testing.assert_allclose(
                np.asarray(flat_p[path]), np.asarray(vx),
                rtol=5e-4, atol=5e-4, err_msg=str(path))

    def test_eval_fused_init_stats(self):
        x, variables, mod_x, mod_p = self._setup(64)
        ye = mod_p.apply(variables, x, False)
        yx = mod_x.apply(variables, x, False)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yx),
                                   rtol=2e-4, atol=2e-4)

    def test_eval_fused_matches_xla(self):
        """Eval fusion (running stats incl. nontrivial values) == XLA path."""
        x, variables, mod_x, mod_p = self._setup(64)
        rng = np.random.RandomState(9)
        bs = jax.tree.map(lambda v: v, variables["batch_stats"])
        bs = {k: {"mean": jnp.asarray(rng.randn(64).astype(np.float32) * .3),
                  "var": jnp.asarray(1 + rng.rand(64).astype(np.float32))}
              for k in bs}
        vv = {"params": variables["params"], "batch_stats": bs}
        ye = mod_p.apply(vv, x, False)
        yx = mod_x.apply(vv, x, False)
        np.testing.assert_allclose(np.asarray(ye), np.asarray(yx),
                                   rtol=2e-4, atol=2e-4)


class TestPackedIOModes:
    """stem_packed / dual_packed boundary forms vs the XLA composition."""

    def test_stem_packed_forward_and_grads(self):
        from sports_field_homography_tpu.ops.conv3x3_pallas import (
            unpack_pairs)

        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.randn(2, 8, 16, 3).astype(np.float32))
        params = make_params(rng, 3, 64, 64)
        cot_p = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))

        out, m1, v1, m2, v2 = double_conv_train(x, *params, EPS, True,
                                                "stem_packed")
        assert out.shape == (2, 8, 8, 128)
        ref = ref_double_conv(x, *params)
        np.testing.assert_allclose(np.asarray(unpack_pairs(out)),
                                   np.asarray(ref[0]), rtol=2e-4, atol=2e-4)
        for got, want, tag in zip((m1, v1, m2, v2), ref[1:],
                                  ("m1", "v1", "m2", "v2")):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=2e-4, err_msg=tag)

        def loss_f(x, *p):
            o = double_conv_train(x, *p, EPS, True, "stem_packed")[0]
            return jnp.sum(o * cot_p)

        def loss_r(x, *p):
            from sports_field_homography_tpu.ops.conv3x3_pallas import (
                pack_pairs)
            return jnp.sum(pack_pairs(ref_double_conv(x, *p)[0]) * cot_p)

        gf = jax.grad(loss_f, argnums=tuple(range(9)))(x, *params)
        gr = jax.grad(loss_r, argnums=tuple(range(9)))(x, *params)
        names = ["dx", "dk1", "db1", "dg1", "dbe1", "dk2", "db2", "dg2",
                 "dbe2"]
        for got, want, tag in zip(gf, gr, names):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=5e-4, atol=5e-4, err_msg=tag)

    def test_dual_packed_forward_and_grads(self):
        from sports_field_homography_tpu.ops.conv3x3_pallas import (
            pack_pairs, unpack_pairs)

        rng = np.random.RandomState(12)
        a = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))
        params = make_params(rng, 128, 64, 64)
        cot_p = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))

        out, m1, v1, m2, v2 = double_conv_train(
            (pack_pairs(a), pack_pairs(b)), *params, EPS, True,
            "dual_packed")
        ref = ref_double_conv(jnp.concatenate([a, b], -1), *params)
        np.testing.assert_allclose(np.asarray(unpack_pairs(out)),
                                   np.asarray(ref[0]), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(ref[1]),
                                   rtol=2e-4, atol=2e-4)

        def loss_f(a, b, *p):
            o = double_conv_train((pack_pairs(a), pack_pairs(b)), *p,
                                  EPS, True, "dual_packed")[0]
            return jnp.sum(o * cot_p)

        def loss_r(a, b, *p):
            o = ref_double_conv(jnp.concatenate([a, b], -1), *p)[0]
            return jnp.sum(pack_pairs(o) * cot_p)

        gf = jax.grad(loss_f, argnums=tuple(range(10)))(a, b, *params)
        gr = jax.grad(loss_r, argnums=tuple(range(10)))(a, b, *params)
        names = ["da", "db_in", "dk1", "db1", "dg1", "dbe1", "dk2", "db2",
                 "dg2", "dbe2"]
        for got, want, tag in zip(gf, gr, names):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=5e-4, atol=5e-4, err_msg=tag)

    def test_eval_io_modes(self):
        from sports_field_homography_tpu.ops.conv3x3_pallas import (
            pack_pairs, unpack_pairs)
        from sports_field_homography_tpu.ops.double_conv import (
            double_conv_eval)

        rng = np.random.RandomState(13)
        x3 = jnp.asarray(rng.randn(2, 8, 16, 3).astype(np.float32))
        a = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 8, 16, 64).astype(np.float32))

        def eval_ref(x, k1, b1, g1, be1, k2, b2, g2, be2, rm1, rv1,
                     rm2, rv2):
            y1 = ref_conv(x, k1, b1)
            z1 = jnp.maximum((y1 - rm1) * jax.lax.rsqrt(rv1 + EPS) * g1
                             + be1, 0.0)
            y2 = ref_conv(z1, k2, b2)
            return jnp.maximum((y2 - rm2) * jax.lax.rsqrt(rv2 + EPS) * g2
                               + be2, 0.0)

        for cin, io, xin in ((3, "stem_packed", x3),
                             (128, "dual_packed",
                              (pack_pairs(a), pack_pairs(b)))):
            params = make_params(rng, cin, 64, 64)
            rm1 = jnp.asarray(rng.randn(64).astype(np.float32) * .2)
            rv1 = jnp.asarray(1 + rng.rand(64).astype(np.float32))
            rm2 = jnp.asarray(rng.randn(64).astype(np.float32) * .2)
            rv2 = jnp.asarray(1 + rng.rand(64).astype(np.float32))
            k1, b1, g1, be1, k2, b2, g2, be2 = params
            got = double_conv_eval(xin, k1, b1, g1, be1, rm1, rv1,
                                   k2, b2, g2, be2, rm2, rv2, EPS, True, io)
            x_ref = x3 if cin == 3 else jnp.concatenate([a, b], -1)
            want = eval_ref(x_ref, *params, rm1, rv1, rm2, rv2)
            np.testing.assert_allclose(np.asarray(unpack_pairs(got)),
                                       np.asarray(want), rtol=2e-4,
                                       atol=2e-4, err_msg=io)
