"""Tail-batch semantics: padded-replica masking + exact ragged tail.

The reference's DataLoader yields a smaller TRUE-mean tail batch when
``n_train % batchsize != 0`` (``/root/reference/train.py:33-36``).  Our
static-shape loader pads the tail with replicas; ``make_loss_fn`` must
mask them out of every loss mean (scale ``B*shards/num_valid``) so the
padded batch produces the reference's gradients — including when the
padding is unevenly sharded over a data-parallel mesh.  Single-device
training instead defaults to the TRUE ragged tail (``--tail exact``).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sports_field_homography_tpu.train.loop import LossConfig, make_loss_fn

H, W, NPOI, NC = 8, 12, 52, 4


class _StubCfg:
    mask_classes = NC
    unet_uv = True


class _StubModel:
    """Per-sample-independent forward (no BatchNorm): lets the masking
    math be verified EXACTLY — padded+masked vs true-tail differ only
    through the loss reductions, not through batch statistics."""

    config = _StubCfg()

    def apply(self, variables, img, court_img, court_poi, train,
              warp_table, mutable):
        p = variables["params"]
        logits = jnp.tanh(img @ p["wc"])                      # (B,H,W,NC)
        warp_mask = jax.nn.sigmoid(jnp.sum(img * p["wm"], -1))  # (B,H,W)
        uv = img[..., :2] * p["wu"]                           # (B,H,W,2)
        feat = jnp.mean(img, axis=(1, 2))                     # (B,3)
        poi = (feat @ p["wp"]).reshape(-1, NPOI, 2)           # (B,NPOI,2)
        return ({"logits": logits, "warp_mask": warp_mask, "uv": uv,
                 "poi": poi}, {"batch_stats": {}})


def _params(rng):
    return {
        "wc": jnp.asarray(rng.randn(3, NC), jnp.float32) * 0.5,
        "wm": jnp.asarray(rng.randn(3), jnp.float32),
        "wu": jnp.asarray(rng.randn(2), jnp.float32),
        "wp": jnp.asarray(rng.randn(3, NPOI * 2), jnp.float32),
    }


def _batch(rng, n):
    return {
        "image": rng.rand(n, H, W, 3).astype(np.float32),
        "mask": rng.randint(0, NC, size=(n, H, W)).astype(np.int64),
        "uv": rng.rand(n, H, W, 2).astype(np.float32),
        "weight": rng.rand(n, 1).astype(np.float32) + 0.5,
        "poi": rng.rand(n, NPOI, 2).astype(np.float32),
        "nonzeros": (rng.rand(n, NPOI) > 0.3).astype(np.float32),
        "num_nonzero": np.full((n,), 30.0, np.float32),
    }


def _pad(batch, n_real, n_total):
    """Replica-pad to ``n_total`` + attach the loader's ``valid`` mask."""
    out = {}
    for k, v in batch.items():
        reps = np.concatenate(
            [v[:n_real]] + [v[n_real - 1:n_real]] * (n_total - n_real))
        out[k] = reps
    out["valid"] = np.arange(n_total) < n_real
    return out


LOSS_CFG = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                      consist_loss="CE", uv_loss="MSE", batch_size=4)
LOG_KEYS = ("Seg_loss", "Rec_loss", "UV_loss", "Reproj_loss", "Cons_loss",
            "Tot_loss")


def test_masked_padded_batch_matches_true_tail():
    """All five losses AND their parameter gradients on a replica-padded
    batch with the valid mask == the true smaller batch (reference tail
    semantics, train.py:186-237)."""
    rng = np.random.RandomState(0)
    params = _params(rng)
    true = _batch(rng, 3)                 # the real tail: 3 samples
    padded = _pad(true, 3, 5)             # static batch 5, 2 replicas

    loss_fn = make_loss_fn(_StubModel(), LOSS_CFG)

    def total(p, b):
        t, (_, logs) = loss_fn(p, {}, b, jnp.zeros((), jnp.int32),
                               None, None, None)
        return t, logs

    (t_true, logs_true), g_true = jax.value_and_grad(
        total, has_aux=True)(params, true)
    (t_pad, logs_pad), g_pad = jax.value_and_grad(
        total, has_aux=True)(params, padded)

    for k in LOG_KEYS:
        np.testing.assert_allclose(float(logs_pad[k]), float(logs_true[k]),
                                   rtol=1e-6, err_msg=k)
    for a, b in zip(jax.tree.leaves(g_true), jax.tree.leaves(g_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_all_valid_is_bit_identical_to_unmasked():
    """A full batch (valid all-True, scale exactly 1.0) must produce
    bit-identical losses to the same batch without any valid key — the
    masking must cost nothing on the non-tail 99% of steps."""
    rng = np.random.RandomState(1)
    params = _params(rng)
    batch = _batch(rng, 4)
    with_valid = dict(batch, valid=np.ones(4, bool))

    loss_fn = make_loss_fn(_StubModel(), LOSS_CFG)
    args = (params, {}, jnp.zeros((), jnp.int32))

    def run(b):
        t, (_, logs) = loss_fn(args[0], args[1], b, args[2], None, None, None)
        return t, logs

    t1, logs1 = jax.jit(run)(batch)
    t2, logs2 = jax.jit(run)(with_valid)
    for k in LOG_KEYS:
        assert float(logs1[k]) == float(logs2[k]), k


def test_masked_padding_uneven_across_dp_shards():
    """Padding falling entirely on the last mesh shards (one shard even
    ends up all-padding) must still reproduce the global true-sample mean
    and gradients through psum/pmean — the ``B*shards/psum(num_valid)``
    correction in make_loss_fn."""
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    rng = np.random.RandomState(2)
    params = _params(rng)
    true = _batch(rng, 5)                 # 5 real samples
    padded = _pad(true, 5, 8)             # batch 8 over 4 shards of 2:
    # shard contents: [2 real, 2 real, 1 real + 1 pad, 2 pad]

    loss_fn_dp = make_loss_fn(_StubModel(), LOSS_CFG, axis_name="data")
    loss_fn = make_loss_fn(_StubModel(), LOSS_CFG)

    def shard_body(p, b):
        def total(pp):
            t, (_, logs) = loss_fn_dp(pp, {}, b, jnp.zeros((), jnp.int32),
                                      None, None, None)
            return t, logs
        (t, logs), g = jax.value_and_grad(total, has_aux=True)(p)
        pm = lambda x: jax.lax.pmean(x, "data")
        return pm(t), jax.tree.map(pm, logs), jax.tree.map(pm, g)

    from jax.sharding import PartitionSpec as P
    batch_specs = {k: P("data") for k in padded}
    dp = jax.jit(jax.shard_map(shard_body, mesh=mesh,
                               in_specs=(P(), batch_specs),
                               out_specs=(P(), P(), P()),
                               check_vma=False))
    t_dp, logs_dp, g_dp = dp(params, padded)

    def total(p):
        t, (_, logs) = loss_fn(p, {}, true, jnp.zeros((), jnp.int32),
                               None, None, None)
        return t, logs

    (t_true, logs_true), g_true = jax.value_and_grad(
        total, has_aux=True)(params)

    for k in LOG_KEYS:
        np.testing.assert_allclose(float(logs_dp[k]), float(logs_true[k]),
                                   rtol=1e-5, err_msg=k)
    for a, b in zip(jax.tree.leaves(g_true), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


@pytest.mark.full
def test_exact_tail_cli_runs_ragged_last_batch(tmp_path):
    """Single-device CLI default (--tail exact): n_train=8, batchsize=3 ->
    3 optimizer steps with a true 2-sample tail batch (one extra compiled
    program, reference DataLoader semantics)."""
    import json
    import yaml
    from PIL import Image
    from test_train import make_conf
    from sports_field_homography_tpu.cli.train import main

    root = tmp_path / "set"
    rng = np.random.RandomState(3)
    for game, n in [("gameA", 8)]:
        for d in ("frames", "masks", "anno"):
            (root / d / game).mkdir(parents=True)
        for i in range(n):
            img = rng.randint(0, 255, size=(36, 64, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / "frames" / game / f"{i:04d}.png")
            mask = rng.randint(0, 4, size=(36, 64), dtype=np.uint8)
            Image.fromarray(mask).save(root / "masks" / game / f"{i:04d}.png")
            poi = np.concatenate([rng.rand(52, 2),
                                  (rng.rand(52, 1) > 0.3).astype(float)],
                                 axis=1)
            with open(root / "anno" / game / f"{i:04d}.json", "w") as f:
                json.dump({"poi": poi.tolist(), "reproj_mse": 0.001}, f)

    conf = make_conf(root, tmp_path / "cp", tmp_path / "logs",
                     batchsize=3, val_names=[], consist_loss=None)
    conf_path = tmp_path / "conf.yaml"
    with open(conf_path, "w") as f:
        yaml.safe_dump(conf, f)

    state = main(["-c", str(conf_path)])
    assert int(state["step"]) == 3        # ceil(8/3): 3+3+2, tail ragged


def test_augmented_loader_is_deterministic():
    """Derived (aug_seed, epoch, index) seeds: two loader passes over the
    same epoch are bit-identical regardless of worker-thread scheduling;
    different epochs draw different parameters."""
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader
    import os
    import tempfile
    from PIL import Image

    aug = {"apperance": {"jitter": {"brightness": 0.4}, "blur": 3},
           "geometric": {"scale": [0.85, 1.0], "hflip": 0.5}}
    with tempfile.TemporaryDirectory() as d:
        os.makedirs(os.path.join(d, "g"))
        rng = np.random.RandomState(4)
        for i in range(6):
            Image.fromarray(rng.randint(0, 255, (36, 64, 3), np.uint8)).save(
                os.path.join(d, "g", f"{i}.png"))
        ids = [f"g/{i}.png" for i in range(6)]

        def epoch_images(epoch, workers):
            ds = BasicDataset(ids, d, target_size=(64, 36), aug=aug,
                              aug_seed=7)
            loader = Loader(ds, 2, shuffle=True, num_workers=workers, seed=7)
            loader.set_epoch(epoch)
            return np.concatenate([b["image"] for b in loader])

        a = epoch_images(0, workers=4)
        b = epoch_images(0, workers=1)     # thread count must not matter
        np.testing.assert_array_equal(a, b)
        c = epoch_images(1, workers=4)
        assert not np.array_equal(a, c)


@pytest.mark.full
def test_exact_mid_epoch_resume_bit_identical_with_augmentation(tmp_path):
    """The round-3 exact-resume bit-identity claim extended to an
    AUGMENTED run: with derived aug seeds, interrupt + resume reproduces
    the uninterrupted run's params bit-for-bit (previously only true
    without augmentation — the per-sample seed came from the global RNG
    under thread scheduling)."""
    import json
    import pytest
    from PIL import Image
    from test_train import COURT_IMG, COURT_POI
    from sports_field_homography_tpu.cli.engine import build_model
    from sports_field_homography_tpu.data.dataset import BasicDataset
    from sports_field_homography_tpu.data.loader import Loader
    from sports_field_homography_tpu.train.loop import LossConfig, train_net
    from sports_field_homography_tpu.utils.checkpoint import save_train_state

    TW, TH = 64, 36

    class A:
        batchsize = 4
        target_size = (TW, TH); unet_size = (TW, TH); warp_size = (TW, TH)
        court_size = (TW, TH); mask_classes = 4
        use_unet = True; unet_bilinear = False; unet_uv = False
        use_resnet = True; resnet_name = "resnet18"; resnet_input = "img+mask"
        use_warper = True; compute_dtype = "float32"
        court_img = COURT_IMG; court_poi = COURT_POI

    root = tmp_path / "set"
    rng = np.random.RandomState(5)
    for d in ("frames", "masks", "anno"):
        (root / d / "gameA").mkdir(parents=True)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (TH, TW, 3), np.uint8)).save(
            root / "frames" / "gameA" / f"{i:04d}.png")
        Image.fromarray(rng.randint(0, 4, (TH, TW), np.uint8)).save(
            root / "masks" / "gameA" / f"{i:04d}.png")
        poi = np.concatenate([rng.rand(52, 2),
                              (rng.rand(52, 1) > 0.3).astype(float)], axis=1)
        with open(root / "anno" / "gameA" / f"{i:04d}.json", "w") as f:
            json.dump({"poi": poi.tolist(), "reproj_mse": 0.001}, f)

    ids = [f"gameA/{i:04d}.png" for i in range(8)]
    aug = {"apperance": {"jitter": {"brightness": 0.4}},
           "geometric": {"hflip": 0.5}}
    loss_cfg = LossConfig(seg_loss="CE", rec_loss="MSE", reproj_loss="RRMSE",
                          consist_loss=None, batch_size=4)

    def fresh_loader():
        ds = BasicDataset(ids, str(root / "frames"), str(root / "masks"),
                          str(root / "anno"), ["poi", "reproj_mse"], 4,
                          target_size=(TW, TH), aug=aug, aug_seed=0)
        return Loader(ds, 4, shuffle=True, num_workers=2, seed=0)

    class ArraysOnly:
        def __init__(self, loader, die_after=None):
            self.loader, self.die_after, self.count = loader, die_after, 0
        def set_epoch(self, e): self.loader.set_epoch(e)
        def skip_next_batches(self, k): self.loader.skip_next_batches(k)
        def __iter__(self):
            for b in self.loader:
                if self.die_after is not None and self.count >= self.die_after:
                    raise KeyboardInterrupt
                self.count += 1
                yield {k: v for k, v in b.items() if isinstance(v, np.ndarray)}

    def run(train_loader, variables, **kw):
        return train_net(
            model=bundle.model, variables=variables,
            court_img=bundle.court_img, court_poi=bundle.court_poi,
            train_loader=train_loader, n_train=8, val_loader=None,
            batch_size=4, val_step_n=100, loss_cfg=loss_cfg, opt="Adam",
            epochs=2, lr=1e-3, w_decay=0.0, target_size=(TW, TH),
            cp_dir=None, log_dir=None, **kw)

    bundle = build_model(A)
    full = run(ArraysOnly(fresh_loader()), bundle.variables)

    bundle = build_model(A)
    holder = {"state": None}
    with pytest.raises(KeyboardInterrupt):
        run(ArraysOnly(fresh_loader(), die_after=3), bundle.variables,
            state_holder=holder)
    assert holder["sched"] == {"epoch": 1, "opt_steps_done": 1}
    state_path = tmp_path / "last_state.msgpack"
    save_train_state(str(state_path), holder["state"])

    bundle = build_model(A)
    resumed = run(ArraysOnly(fresh_loader()), bundle.variables,
                  resume_state_path=str(state_path),
                  resume_sched=holder["sched"])

    for a, b in zip(jax.tree_util.tree_leaves(full["params"]),
                    jax.tree_util.tree_leaves(resumed["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
