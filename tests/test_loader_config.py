"""Host pipeline + config-system tests: padding, ordering, YAML overlay."""
import numpy as np
import pytest
import yaml


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"name": f"s{i}", "image": np.full((4, 6, 3), i, np.float32),
                "weight": np.float32(1.0)}


class TestLoader:
    def test_order_and_batching(self):
        from sports_field_homography_tpu.data.loader import Loader

        loader = Loader(_ToyDataset(10), batch_size=4, num_workers=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["name"] == ["s0", "s1", "s2", "s3"]
        np.testing.assert_array_equal(batches[0]["image"][:, 0, 0, 0],
                                      [0, 1, 2, 3])

    def test_tail_padding_and_valid_mask(self):
        from sports_field_homography_tpu.data.loader import Loader

        loader = Loader(_ToyDataset(10), batch_size=4, num_workers=1)
        last = list(loader)[-1]
        assert last["image"].shape[0] == 4        # static shape
        assert last["num_valid"] == 2
        assert list(last["valid"]) == [True, True, False, False]
        # pads replicate the last valid sample
        np.testing.assert_array_equal(last["image"][2], last["image"][1])

    def test_drop_last(self):
        from sports_field_homography_tpu.data.loader import Loader

        loader = Loader(_ToyDataset(10), batch_size=4, num_workers=1,
                        drop_last=True)
        assert len(list(loader)) == 2

    def test_shuffle_deterministic_by_seed(self):
        from sports_field_homography_tpu.data.loader import Loader

        a = [b["name"] for b in Loader(_ToyDataset(8), 4, shuffle=True, seed=1)]
        b = [b["name"] for b in Loader(_ToyDataset(8), 4, shuffle=True, seed=1)]
        c = [b["name"] for b in Loader(_ToyDataset(8), 4, shuffle=True, seed=2)]
        assert a == b
        assert a != c

    def test_worker_error_propagates(self):
        from sports_field_homography_tpu.data.loader import Loader

        class Bad(_ToyDataset):
            def __getitem__(self, i):
                if i == 3:
                    raise RuntimeError("decode failed")
                return super().__getitem__(i)

        with pytest.raises(RuntimeError, match="decode failed"):
            list(Loader(Bad(6), 2, num_workers=2))

    def test_abandoned_iteration_stops_producer(self):
        """Closing the iterator mid-epoch must terminate the producer
        thread (a blocking put on the full prefetch queue would otherwise
        leave it stuck forever)."""
        import threading
        import time

        from sports_field_homography_tpu.data.loader import Loader

        loader = Loader(_ToyDataset(64), batch_size=2, num_workers=1,
                        prefetch_batches=1)
        it = iter(loader)
        next(it)          # producer now decodes ahead and fills the queue
        it.close()        # generator finally: stop + join
        deadline = time.time() + 10
        while time.time() < deadline:
            if not any(t.name == "sfh-loader-producer"
                       for t in threading.enumerate()):
                break
            time.sleep(0.05)
        assert not any(t.name == "sfh-loader-producer"
                       for t in threading.enumerate())

    def test_device_prefetch_preserves_stream(self):
        from sports_field_homography_tpu.data.loader import Loader, device_prefetch

        loader = Loader(_ToyDataset(6), 2, num_workers=1)
        names = [b["name"] for b in device_prefetch(iter(loader), depth=2)]
        assert names == [["s0", "s1"], ["s2", "s3"], ["s4", "s5"]]


class TestConfig:
    def test_yaml_overlay_and_ignore_keys(self, tmp_path):
        from sports_field_homography_tpu.utils.config import (
            get_training_args, parse_config, replace_args)

        conf = {"lr": 0.5, "batchsize": 99, "resnet_name": "resnet50",
                "unknown_key": 1}
        path = tmp_path / "c.yaml"
        yaml.safe_dump(conf, open(path, "w"))
        args = get_training_args(argv=["-c", str(path)])
        parsed = parse_config(str(path))
        args = replace_args(args, parsed, ignore_keys=["batchsize"])
        assert args.lr == 0.5
        assert args.resnet_name == "resnet50"
        assert args.batchsize == 8          # ignored -> default
        assert not hasattr(args, "unknown_key")

    def test_segm_loss_footgun_warned(self, capsys):
        from sports_field_homography_tpu.utils.config import (
            get_training_args, replace_args)

        args = get_training_args(argv=[])
        replace_args(args, {"segm_loss": "focal"})
        out = capsys.readouterr().out
        assert "segm_loss" in out
        assert args.seg_loss == "CE"        # silently keeps default

    def test_parse_config_missing_file_returns_none(self):
        from sports_field_homography_tpu.utils.config import parse_config

        assert parse_config("/nonexistent/conf.yaml") is None

    def test_fused_bn_flag_reaches_model_config(self):
        from sports_field_homography_tpu.cli.engine import build_model
        from sports_field_homography_tpu.utils.config import (
            get_prediction_args, get_training_args)

        args = get_training_args(
            argv=["--fused_bn", "--court_img",
                  "./assets/pitch_mask_nc4_hd.png"])
        assert args.fused_bn is True
        bundle = build_model(args, batch_size=1, init_if_missing=False)
        assert bundle.config.fused_bn is True
        assert get_training_args(argv=[]).fused_bn is False
        assert get_prediction_args(argv=["--fused_bn"]).fused_bn is True


def test_logger_no_duplicate_handlers(capsys):
    from sports_field_homography_tpu.utils.logger import get_logger

    lg1 = get_logger(format="%(message)s", write_date=False)
    lg2 = get_logger(format="%(message)s", write_date=False)
    lg2.info("once")
    out = capsys.readouterr()
    assert (out.out + out.err).count("once") == 1
