"""Checkpoint-sweep evaluation CLI (reference ``test.py``).

Loops ``CP_epoch{n}`` checkpoints, evaluates seg CE / rec MSE /
reprojection px+RMSE on the full image set and logs scores + wall-clock to
``test_scores.txt`` (the input of ``utils/viz_metrics.py``).
"""
from __future__ import annotations

import os
import time

import jax

from ..data.dataset import BasicDataset, split_on_train_val
from ..data.loader import Loader
from ..train.evaluate import eval_reconstructor
from ..utils.config import get_test_args, parse_config, replace_args
from ..utils.logger import get_logger
from .engine import build_model

__all__ = ["test", "main"]


def test(args):
    conf_path = os.path.join(os.path.dirname(args.load), "conf.yaml")
    assert os.path.isfile(conf_path)
    print("Reading params from {}...".format(conf_path))
    conf = parse_config(conf_path)
    ignore_keys = ["img_dir", "mask_dir", "anno_dir", "batchsize", "load",
                   "court_img", "court_poi", "compute_dtype", "num_devices"]
    args = replace_args(args, conf, ignore_keys=ignore_keys)

    args.resnet_pretrained = None
    args.anno_keys = ["poi"]
    args.log_path = os.path.join(os.path.dirname(args.load), "test_scores.txt")
    logger = get_logger(args.log_path, format="%(message)s")

    bundle = build_model(args, load=args.load, warp_with_nearest=True,
                         fold_bn=bool(getattr(args, "fold_bn", 1)))

    test_ids, _ = split_on_train_val(args.img_dir, val_names=[])
    # uint8 transfer is lossless here (no augmentation; the eval step
    # normalizes u8/255 on device) and cuts H2D traffic 4x
    test_data = BasicDataset(test_ids, args.img_dir, args.mask_dir,
                             args.anno_dir, args.anno_keys, args.mask_classes,
                             target_size=args.target_size, raw_uint8=True)
    loader = Loader(test_data, args.batchsize, shuffle=False, num_workers=8,
                    drop_last=False)
    n_test = len(test_data)

    logger.info(f"""Starting testing:
            Model file:      {args.load}
            Images dir:      {args.img_dir}
            Masks dir:       {args.mask_dir}
            Annotation dir:  {args.anno_dir}
            Logs file:       {args.log_path}
            Batch size:      {args.batchsize}
            Test size:       {n_test}
            Device:          {jax.devices()[0].platform}
            Target size:     {args.target_size}
            UNET input size: {args.unet_size}
            Bilinear:        {args.unet_bilinear}
            Mask classes:    {args.mask_classes}
            ResNetSTN:       {args.resnet_name}
            Resnet Input:    {args.resnet_input}
            Metric img size: {args.metric_img_size}
        """)

    def array_batches():
        import numpy as np
        for b in loader:
            yield {k: v for k, v in b.items()
                   if isinstance(v, np.ndarray) or k == "num_valid"}

    # device-synchronized wall-clock (torch.cuda.Event analog)
    jax.block_until_ready(bundle.variables)
    start = time.perf_counter()
    result = eval_reconstructor(bundle.model, bundle.variables,
                                array_batches(), bundle.court_img,
                                bundle.court_poi, args.metric_img_size,
                                use_per_sample_weights=False)
    elapsed_ms = (time.perf_counter() - start) * 1000.0

    logger.info(f"""Test scores:
            Reprojection px:     {result['val_reproj_px']}
            Reprojection RMSE:   {result['val_reproj_score']}
            Segmentation CE:     {result['val_seg_score']}
            Reconstruction MSE:  {result['val_rec_score']}
            Elapsed msec:        {elapsed_ms}
        """)
    print("All done!")
    return result


def main(argv=None):
    args = get_test_args(argv)
    epochs = args.test_epochs.split(",")
    for e in epochs:
        # .orbax: directory checkpoints written by --async_ckpt training
        for ext in (".msgpack", ".pth", ".orbax"):
            cp_name = "CP_epoch{}{}".format(e, ext)
            path = os.path.join(args.cp_dir, cp_name)
            if os.path.exists(path):
                args.load = path
                break
        else:
            print("Model file not found for epoch {}".format(e))
            continue
        test(args)


if __name__ == "__main__":
    main()
