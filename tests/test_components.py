"""Tests for augmentation, prep utilities, postprocess, viz_metrics,
legacy models and the video dataset."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


class TestAugmentation:
    def make_pipe(self, aug, use_uv=False, size=(64, 36)):
        from sports_field_homography_tpu.data.augmentation import AugmentationPipeline
        return AugmentationPipeline(aug, size, use_uv=use_uv)

    def test_hflip_consistency_img_mask_uv_poi(self):
        """One flip decision applies to every stream coherently."""
        rng = np.random.RandomState(0)
        img = rng.rand(36, 64, 3).astype(np.float32)
        mask = rng.randint(0, 4, (36, 64)).astype(np.int64)
        uv = rng.rand(36, 64, 2).astype(np.float32)
        uv[..., 0] = np.clip(uv[..., 0], 0.01, 1.0)   # court pixels everywhere
        poi = rng.rand(52, 2).astype(np.float32)
        nz = np.ones(52, np.float32)
        pipe = self.make_pipe({"geometric": {"hflip": 1.0}}, use_uv=True)
        img2, mask2, uv2, poi2, nz2 = pipe(img, mask, uv, poi, nz, seed=1)
        np.testing.assert_array_equal(img2, img[:, ::-1])
        np.testing.assert_array_equal(mask2, mask[:, ::-1])
        # u channel flipped then inverted on court pixels
        np.testing.assert_allclose(uv2[..., 0], 1.0 - uv[:, ::-1, 0], atol=1e-6)
        np.testing.assert_array_equal(uv2[..., 1], uv[:, ::-1, 1])
        # PoI mirrored through the NCAA symmetry mapping
        from sports_field_homography_tpu.data.augmentation import ncaa_poi_flip_mapping
        m = ncaa_poi_flip_mapping()
        for i in range(len(m)):
            assert poi2[i, 0] == pytest.approx(1.0 - poi[m[i], 0])
            assert poi2[i, 1] == pytest.approx(poi[m[i], 1])

    def test_hflip_probability_zero_is_identity(self):
        rng = np.random.RandomState(0)
        img = rng.rand(36, 64, 3).astype(np.float32)
        mask = rng.randint(0, 4, (36, 64)).astype(np.int64)
        pipe = self.make_pipe({"geometric": {"hflip": 0.0}})
        img2, mask2, _, _, _ = pipe(img, mask, None, None, None, seed=3)
        np.testing.assert_array_equal(img2, img)

    def test_random_resized_crop_shapes_and_label_preservation(self):
        rng = np.random.RandomState(0)
        img = rng.rand(72, 128, 3).astype(np.float32)
        mask = rng.randint(0, 4, (72, 128)).astype(np.int64)
        pipe = self.make_pipe({"geometric": {"scale": [0.5, 1.0], "hflip": 0.5}})
        img2, mask2, _, _, _ = pipe(img, mask, None, None, None, seed=7)
        assert img2.shape == (36, 64, 3)
        assert mask2.shape == (36, 64)
        assert set(np.unique(mask2)).issubset({0, 1, 2, 3})
        assert mask2.dtype == np.int64

    def test_poi_with_scale_raises(self):
        """Reference parity: points transforms don't support 'scale'."""
        pipe = self.make_pipe({"geometric": {"scale": [0.5, 1.0]}})
        poi = np.zeros((52, 2), np.float32)
        with pytest.raises(AssertionError):
            pipe(np.zeros((72, 128, 3), np.float32), None, None, poi,
                 np.ones(52, np.float32), seed=0)

    def test_appearance_changes_image_but_not_geometry(self):
        rng = np.random.RandomState(0)
        img = rng.rand(36, 64, 3).astype(np.float32)
        pipe = self.make_pipe({"apperance": {"jitter": {"brightness": 0.35,
                                                        "contrast": 0.35,
                                                        "saturation": 0.25,
                                                        "hue": 0.25},
                                             "blur": 5}})
        img2, _, _, _, _ = pipe(img, None, None, None, None, seed=11)
        assert img2.shape == img.shape
        assert not np.allclose(img2, img)
        assert img2.min() >= 0.0 and img2.max() <= 1.0

    def test_deterministic_given_seed(self):
        rng = np.random.RandomState(0)
        img = rng.rand(36, 64, 3).astype(np.float32)
        pipe = self.make_pipe({"apperance": {"jitter": {}},
                               "geometric": {"hflip": 0.5}})
        a, _, _, _, _ = pipe(img, None, None, None, None, seed=5)
        b, _, _, _, _ = pipe(img, None, None, None, None, seed=5)
        np.testing.assert_array_equal(a, b)


class TestPrep:
    def test_dlt_matches_cv2_findHomography(self):
        import cv2
        from sports_field_homography_tpu.prep.preparation import find_homography_dlt

        rng = np.random.RandomState(3)
        H = np.eye(3) + 0.1 * rng.randn(3, 3) * [[1, 1, 1], [1, 1, 1], [.1, .1, .2]]
        src = rng.uniform(-1, 1, (12, 2))
        ones = np.ones((12, 1))
        d = np.concatenate([src, ones], 1) @ H.T
        dst = d[:, :2] / d[:, 2:3]
        ours = find_homography_dlt(src, dst)
        ref, _ = cv2.findHomography(src.astype(np.float32), dst.astype(np.float32))
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_calculate_homography_too_few_points(self):
        from sports_field_homography_tpu.prep.preparation import calculate_homography
        field = np.random.rand(5, 2)
        manual = np.full((5, 2), -1.0)
        manual[0] = [0.5, 0.5]
        assert calculate_homography(field, manual) is None

    def test_reprojection_rmse_and_nonzero(self):
        from sports_field_homography_tpu.prep.preparation import (
            calculate_reprojection_rmse, find_nonzero_points)
        p1 = np.array([[0, 0], [1, 1], [-1, -1.]])
        p2 = np.array([[3, 4], [1, 1], [-1, -1.]])
        nz = find_nonzero_points(p2)
        assert list(nz) == [True, True, False]
        rmse = calculate_reprojection_rmse(p1, p2, nz)
        assert rmse == pytest.approx(5.0 / 2)

    def test_onehot_conversion(self, tmp_path):
        import cv2
        from sports_field_homography_tpu.prep.preparation import generate_onehot
        rgb = np.zeros((8, 8, 3), np.uint8)
        rgb[0:4] = (0, 255, 0)    # class 1
        rgb[4:6] = (0, 0, 255)    # class 3
        cv2.imwrite(str(tmp_path / "m.png"), rgb)
        generate_onehot(str(tmp_path), num_classes=4, num_workers=1)
        out = cv2.imread(str(tmp_path / "m.png"), 0)
        assert set(np.unique(out)) == {0, 1, 3}


class TestPostprocess:
    def test_preds_to_masks_argmax(self):
        from sports_field_homography_tpu.utils.postprocess import preds_to_masks
        logits = np.zeros((1, 4, 4, 3), np.float32)
        logits[..., 2] = 5.0
        m = preds_to_masks(logits, 3)
        assert m.dtype == np.uint8
        assert (m == 2).all()

    def test_onehot_to_image_palettes(self):
        from sports_field_homography_tpu.utils.postprocess import onehot_to_image
        mask = np.array([[0, 1], [2, 3]], np.uint8)
        rgb = onehot_to_image(mask, 4)
        assert rgb.shape == (1, 2, 2, 3)
        assert tuple(rgb[0, 0, 1]) == (0, 255, 0)
        with pytest.raises(NotImplementedError):
            onehot_to_image(mask, 5)


class TestVizMetrics:
    def test_parse_sweep_log_and_chart(self, tmp_path):
        from sports_field_homography_tpu.utils.viz_metrics import (
            parse_model_dir, vizualize_metrics)

        mdir = tmp_path / "model_a"
        mdir.mkdir()
        (mdir / "conf.yaml").write_text("version: v2\n")
        log = """<<< Logger is created: 2026-01-01 >>>
Starting testing:
        Model file:      /x/CP_epoch1.msgpack
        Images dir:      /data/frames/
        Test size:       100
Test scores:
        Reprojection px:     12.5
        Reprojection RMSE:   0.04
        Segmentation CE:     0.3
        Reconstruction MSE:  0.01
        Elapsed msec:        2000.0
<<< Logger is created: 2026-01-01 >>>
Starting testing:
        Model file:      /x/CP_epoch2.msgpack
        Images dir:      /data/frames/
        Test size:       100
Test scores:
        Reprojection px:     8.5
        Reprojection RMSE:   0.03
        Segmentation CE:     0.2
        Reconstruction MSE:  0.008
        Elapsed msec:        1000.0
"""
        (mdir / "test_scores.txt").write_text(log)
        best = parse_model_dir(str(mdir))
        assert best["epoch"] == "CP_epoch2.msgpack"
        assert best["reproj_px"] == 8.5
        assert best["imgs_per_sec"] == pytest.approx(100.0)

        scores = vizualize_metrics(str(tmp_path), dst_dir=str(tmp_path / "charts"))
        assert len(scores) == 1
        assert os.path.exists(tmp_path / "charts" / "reproj_px-vs-imgs_per_sec.png")
        assert os.path.exists(tmp_path / "charts" / "scores.txt")


class TestLegacyModels:
    @pytest.mark.full
    def test_legacy_unet_and_court_reconstruction_shapes(self):
        from sports_field_homography_tpu.models.legacy import (
            UNet, CourtReconstruction)

        x = jnp.zeros((1, 36, 64, 3))
        m = UNet(n_classes=4, bilinear=True)
        v = m.init(jax.random.PRNGKey(0), x)
        logits = m.apply(v, x)
        assert logits.shape == (1, 36, 64, 4)

        tmpl = jnp.zeros((1, 36, 64, 1))
        cr = CourtReconstruction(n_classes=4, target_size=(64, 36))
        # legacy reg head hardcodes 8*22*40 like the reference; use 640x360
        x_full = jnp.zeros((1, 360, 640, 3))
        tmpl_full = jnp.zeros((1, 360, 640, 1))
        cr = CourtReconstruction(n_classes=4, target_size=(640, 360))
        v = cr.init(jax.random.PRNGKey(0), x_full, tmpl_full)
        logits, proj = cr.apply(v, x_full, tmpl_full)
        assert logits.shape == (1, 360, 640, 4)
        assert proj.shape == (1, 360, 640)


class TestVideoDataset:
    def test_video_read_and_fallback(self, tmp_path):
        import cv2
        from sports_field_homography_tpu.data.dataset import VideoDataset

        path = str(tmp_path / "clip.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 36))
        rng = np.random.RandomState(0)
        for _ in range(6):
            w.write(rng.randint(0, 255, (36, 64, 3), dtype=np.uint8))
        w.release()

        ds = VideoDataset(path, target_size=(32, 18))
        assert len(ds) == 6
        s = ds[0]
        assert s["image"].shape == (18, 32, 3)
        assert s["name"] == "clip/000000"
        assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0


class TestBuildDataset:
    def test_pipeline_end_to_end(self, tmp_path):
        import json as _json
        from sports_field_homography_tpu.prep.build_dataset import build_dataset
        from sports_field_homography_tpu.geometry.court import load_court_poi

        # synthetic manual annotations: project the real field PoI through a
        # known homography, mark a few points missing
        field_poi = load_court_poi(
            "/root/repo/assets/template_ncaa_v4_points.json", normalize=False)
        H = np.array([[0.8, 0.05, 0.1], [0.02, 0.7, 0.15], [0.01, 0.02, 1.0]])
        ones = np.ones((field_poi.shape[0], 1))
        proj = np.concatenate([field_poi, ones], 1) @ H.T
        manual = proj[:, :2] / proj[:, 2:3]
        manual[5:9] = -1.0                         # missing annotations

        game_dir = tmp_path / "anno_src" / "game1"
        game_dir.mkdir(parents=True)
        anno = {"000001": {"poi": manual.tolist()},
                "000002": {"poi": np.full_like(manual, -1.0).tolist()}}  # <4 pts
        _json.dump(anno, open(game_dir / "manual_anno.json", "w"))

        counts = build_dataset(str(tmp_path / "anno_src"),
                               "/root/repo/assets/template_ncaa_v4_points.json",
                               str(tmp_path / "out"),
                               field_mask_path="/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
                               mask_size=(128, 72))
        assert counts["game1"] == 1               # frame 2 skipped (<4 points)
        saved = _json.load(open(tmp_path / "out/anno/game1/000001.json"))
        assert saved["reproj_mse"] < 1e-6          # exact homography recovered
        theta = np.asarray(saved["theta"])
        np.testing.assert_allclose(theta / theta[2, 2], H / H[2, 2], atol=1e-6)
        poi = np.asarray(saved["poi"])
        assert poi.shape == (52, 3)
        assert poi[5, 2] == 0.0 and poi[0, 2] == 1.0
        from PIL import Image
        mask = np.array(Image.open(tmp_path / "out/masks/game1/000001.png"))
        assert mask.shape == (72, 128)
        assert set(np.unique(mask)).issubset({0, 1, 2, 3})


def test_legacy_unet_stn_shapes():
    from sports_field_homography_tpu.models.legacy import UNetSTN

    x = jnp.zeros((1, 360, 640, 3))
    tmpl = jnp.zeros((1, 360, 640, 1))
    m = UNetSTN(n_classes=4, bilinear=True)
    v = m.init(jax.random.PRNGKey(0), x, tmpl)
    logits, proj = m.apply(v, x, tmpl)
    assert logits.shape == (1, 360, 640, 4)
    assert proj.shape == (1, 360, 640)


class TestNaryaConverters:
    """prep/narya.py vs the reference notebook's converter cells
    (dataset_utils/football_dataset.ipynb, Narya sections)."""

    def _frame(self, path, w=64, h=36):
        import cv2
        rng = np.random.RandomState(0)
        cv2.imwrite(str(path), rng.randint(0, 255, (h, w, 3), np.uint8))

    def test_keypoints_conversion(self, tmp_path):
        import json as _json
        from sports_field_homography_tpu.prep.narya import (
            NARYA_TO_OUR_POI, convert_narya_keypoints)

        (tmp_path / "img").mkdir()
        (tmp_path / "anno").mkdir()
        self._frame(tmp_path / "img" / "wc_1.jpg", 100, 50)
        xml = """<annotation><size><width>100</width><height>50</height></size>
          <object><name>2</name><keypoints><x1>25</x1><y1>10</y1></keypoints></object>
          <object><name>10</name><keypoints><x1>90</x1><y1>40</y1></keypoints></object>
        </annotation>"""
        (tmp_path / "anno" / "wc_1.xml").write_text(xml)
        # anno without a frame -> skipped, like the notebook
        (tmp_path / "anno" / "wc_2.xml").write_text(xml)

        n = convert_narya_keypoints(str(tmp_path / "img"), str(tmp_path / "anno"),
                                    str(tmp_path / "out/frames"), str(tmp_path / "out"),
                                    frame_size=(64, 36))
        assert n == 1
        labels = _json.load(open(tmp_path / "out/manual_anno.json"))
        poi = np.asarray(labels["000001"]["poi"])
        assert poi.shape == (33, 2)
        np.testing.assert_allclose(poi[NARYA_TO_OUR_POI[2]], [0.25, 0.2])
        np.testing.assert_allclose(poi[NARYA_TO_OUR_POI[10]], [0.9, 0.8])
        unset = [i for i in range(33)
                 if i not in (NARYA_TO_OUR_POI[2], NARYA_TO_OUR_POI[10])]
        assert (poi[unset] == -1.0).all()
        assert (tmp_path / "out/frames/000001.jpeg").exists()

    def test_homography_conversion(self, tmp_path):
        import json as _json
        from sports_field_homography_tpu.geometry.court import load_court_poi
        from sports_field_homography_tpu.prep.narya import convert_narya_homography

        (tmp_path / "img").mkdir()
        (tmp_path / "homo").mkdir()
        self._frame(tmp_path / "img" / "100.jpg", 1024, 1024)
        H = np.array([[0.9, 0.05, 0.1], [0.02, 0.8, 0.05], [0.01, 0.0, 1.0]])
        np.save(tmp_path / "homo" / "100_homo.npy", H[None])   # (1,3,3) form

        poi_path = "/root/repo/assets/template_pitch_points.json"
        n = convert_narya_homography(str(tmp_path / "img"), str(tmp_path / "homo"),
                                     str(tmp_path / "out/frames"),
                                     str(tmp_path / "out"), poi_path,
                                     frame_size=(64, 36))
        assert n == 1
        labels = _json.load(open(tmp_path / "out/manual_anno.json"))
        rec = labels["000001"]
        assert rec["rmse"] == 7.0                   # 5 base + 2 for 1024x1024
        # expected: inv(H) applied to centered field PoI, then +0.5
        field = load_court_poi(poi_path, normalize=False) - 0.5
        ones = np.ones((field.shape[0], 1))
        ph = np.concatenate([field, ones], 1) @ np.linalg.inv(H).T
        expect = ph[:, :2] / ph[:, 2:3] + 0.5
        np.testing.assert_allclose(np.asarray(rec["poi"]), expect, atol=1e-12)


class TestParallelVideoDecode:
    def _write_video(self, path, n=25, w=64, h=36):
        import cv2
        four = cv2.VideoWriter_fourcc(*"mp4v")
        wr = cv2.VideoWriter(str(path), four, 30, (w, h))
        rng = np.random.RandomState(0)
        for _ in range(n):
            wr.write(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        wr.release()

    def test_parallel_matches_sequential(self, tmp_path):
        from sports_field_homography_tpu.data.dataset import VideoDataset

        path = tmp_path / "clip.mp4"
        self._write_video(path)
        seq = VideoDataset(str(path), target_size=(32, 18))
        par = VideoDataset(str(path), target_size=(32, 18), decode_workers=4,
                           decode_ahead=8)
        assert len(par) == len(seq) == 25
        for i in range(len(seq)):
            a, b = seq[i], par[i]
            assert a["name"] == b["name"]
            np.testing.assert_array_equal(a["image"], b["image"])
        # tail-padding replays of the last index must not deadlock
        last = par[len(par) - 1]
        assert last["name"].endswith(str(len(par) - 1).zfill(6))

    def test_concurrent_duplicate_gets_no_deadlock(self, tmp_path):
        """Two threads asking for the same not-yet-consumed index: one pops
        ready[i], the other must be satisfied from the last-replay slot
        (regression: the replay check used to sit outside the wait loop)."""
        import threading

        from sports_field_homography_tpu.data.dataset import VideoDataset

        path = tmp_path / "clip.mp4"
        self._write_video(path, n=12)
        ds = VideoDataset(str(path), target_size=(32, 18), decode_workers=2,
                          decode_ahead=8)
        for i in range(10):
            ds[i]
        results, errs = [], []

        def grab():
            try:
                results.append(ds[10]["name"])
            except BaseException as e:  # pragma: no cover - diagnostic
                errs.append(e)

        threads = [threading.Thread(target=grab) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10.0)
        assert not errs
        assert results == ["clip/000010"] * 2
        ds.close()  # shutdown path: joins workers, releases captures

    def test_parallel_through_loader(self, tmp_path):
        from sports_field_homography_tpu.data.dataset import VideoDataset
        from sports_field_homography_tpu.data.loader import Loader

        path = tmp_path / "clip.mp4"
        self._write_video(path, n=23)
        data = VideoDataset(str(path), target_size=(32, 18), decode_workers=3,
                            decode_ahead=6)
        ref = VideoDataset(str(path), target_size=(32, 18))
        batches = list(Loader(data, 8, shuffle=False, num_workers=1))
        assert sum(b["num_valid"] for b in batches) == 23
        flat = np.concatenate([b["image"] for b in batches])[:23]
        expect = np.stack([ref[i]["image"] for i in range(23)])
        np.testing.assert_array_equal(flat, expect)

    def test_pool_respects_shard_range(self, tmp_path):
        """A multi-host shard consumes only [lo, n): without set_range the
        pool covers [0, n) with next_needed=0 and a shard start deep past
        the decode-ahead window deadlocks (regression)."""
        import threading

        from sports_field_homography_tpu.data.dataset import VideoDataset

        path = tmp_path / "clip.mp4"
        self._write_video(path, n=120)
        seq = VideoDataset(str(path), target_size=(32, 18))
        ref = {i: seq[i] for i in range(120)}   # sequential = in-order
        ds = VideoDataset(str(path), target_size=(32, 18), decode_workers=2,
                          decode_ahead=8)   # per_ahead=4 << lo
        ds.set_range(70, 120)
        got, errs = {}, []

        def consume():
            try:
                for i in range(70, 120):
                    got[i] = ds[i]
            except BaseException as e:  # pragma: no cover - diagnostic
                errs.append(e)

        t = threading.Thread(target=consume, daemon=True)
        t.start()
        t.join(timeout=30.0)
        assert not t.is_alive(), "shard-range decode deadlocked"
        assert not errs and len(got) == 50
        for i in (70, 95, 119):
            np.testing.assert_array_equal(got[i]["image"], ref[i]["image"])
        ds.close()

    def test_host_slice_clamps_surplus_hosts(self):
        from sports_field_homography_tpu.cli.predict import _host_slice

        # 4 frames over 8 hosts: hosts 4..7 must get EMPTY (not negative)
        slices = [_host_slice(4, p, 8) for p in range(8)]
        assert slices[:4] == [(0, 1), (1, 2), (2, 3), (3, 4)]
        assert all(lo == hi for lo, hi in slices[4:])
        assert all(hi >= lo for lo, hi in slices)
        # general partition property
        for n, k in [(6, 2), (7, 3), (1, 5), (0, 3), (25, 4)]:
            parts = [_host_slice(n, p, k) for p in range(k)]
            assert parts[0][0] == 0 and max(hi for _, hi in parts) == n
            covered = sorted(i for lo, hi in parts for i in range(lo, hi))
            assert covered == list(range(n))

    def test_pickle_part_merge_roundtrip(self, tmp_path):
        """Per-host pickle mask parts byte-concatenate into one valid
        data.pkl stream (the multi-host merge in cli/predict.py)."""
        import pickle

        from sports_field_homography_tpu.cli.predict import PickleMaskWriter

        rng = np.random.RandomState(0)
        masks = {f"f{i:03d}": rng.randint(0, 255, (8, 8), dtype=np.uint8)
                 for i in range(4)}
        names = sorted(masks)
        for h in range(2):
            wr = PickleMaskWriter(str(tmp_path), "court/segm_mask",
                                  suffix=f".h{h}")
            for n in names[h * 2:(h + 1) * 2]:
                wr.write(n, masks[n])
            wr.close()
        pkl = tmp_path / "court/segm_mask/data.pkl"
        with open(pkl, "wb") as out:
            for h in range(2):
                part = str(pkl) + f".h{h}"
                with open(part, "rb") as f:
                    out.write(f.read())
        import cv2
        seen = {}
        with open(pkl, "rb") as f:
            while True:
                try:
                    name, buf = pickle.load(f)
                except EOFError:
                    break
                seen[name] = cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)
        assert sorted(seen) == names
        for n in names:
            np.testing.assert_array_equal(seen[n], masks[n])
