#!/usr/bin/env python
"""Augmentation visual smoke tool: render augmented samples + PoI to disk.

Twin of the reference's eyeball check (``utils/augmentation.py:287-362``
``__main__`` block): loads a dataset with an augmentation config, draws the
augmented frames with their (flip-remapped) PoI and the colorized mask
overlay, and writes PNGs for manual inspection — the only way to
sanity-check a new aug config visually.

Usage:
  python scripts/preview_augmentation.py \
      --img_dir DIR [--mask_dir DIR] [--anno_dir DIR] \
      --dst_dir OUT [--size 640 360] [--iters 10] [--batchsize 2] \
      [--aug-preset geometric|appearance|all] [--overlay-mask]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


AUG_PRESETS = {
    # mirror the reference's example configs (:308-313)
    "appearance": {"apperance": {
        "jitter": {"brightness": 0.35, "contrast": 0.35,
                   "saturation": 0.25, "hue": 0.25},
        "blur": 5}},
    "geometric": {"geometric": {"hflip": 0.5}},
    "all": {"apperance": {
        "jitter": {"brightness": 0.35, "contrast": 0.35,
                   "saturation": 0.25, "hue": 0.25},
        "blur": 5},
        "geometric": {"hflip": 0.5}},
}


def main(argv=None):
    import cv2

    from sports_field_homography_tpu.data.dataset import (
        BasicDataset, split_on_train_val)
    from sports_field_homography_tpu.data.loader import Loader
    from sports_field_homography_tpu.utils.postprocess import (
        onehot_to_image, overlay)

    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--mask_dir", default=None)
    ap.add_argument("--anno_dir", default=None)
    ap.add_argument("--dst_dir", required=True)
    ap.add_argument("--size", nargs=2, type=int, default=(640, 320))
    ap.add_argument("--mask_classes", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batchsize", type=int, default=2)
    ap.add_argument("--aug-preset", default="geometric",
                    choices=sorted(AUG_PRESETS))
    ap.add_argument("--aug-json", default=None,
                    help="JSON file with a full aug config (overrides preset)")
    ap.add_argument("--overlay-mask", action="store_true",
                    help="blend the colorized mask over the frame")
    args = ap.parse_args(argv)

    aug = (json.load(open(args.aug_json)) if args.aug_json
           else AUG_PRESETS[args.aug_preset])
    os.makedirs(args.dst_dir, exist_ok=True)

    ids, _ = split_on_train_val(args.img_dir, val_names=[])
    anno_keys = ["poi"] if args.anno_dir else None
    data = BasicDataset(ids, args.img_dir, args.mask_dir, args.anno_dir,
                        anno_keys, args.mask_classes,
                        target_size=tuple(args.size), aug=aug)
    loader = Loader(data, args.batchsize, shuffle=False, num_workers=4,
                    drop_last=False, pad_last=False)

    n_out = 0
    for it in range(args.iters):
        for bi, batch in enumerate(loader):
            imgs = (np.asarray(batch["image"]) * 255.0).astype(np.uint8)
            masks = batch.get("mask")
            poi = batch.get("poi")
            for i in range(batch["num_valid"]):
                out = cv2.cvtColor(imgs[i], cv2.COLOR_RGB2BGR)
                if masks is not None and args.overlay_mask:
                    colored = onehot_to_image(
                        np.asarray(masks[i]).astype(np.uint8),
                        args.mask_classes)[0]
                    out = overlay(out, colored[..., ::-1])
                if poi is not None:
                    h, w = out.shape[:2]
                    for pi, (px, py) in enumerate(np.asarray(poi[i])):
                        if px == 0 and py == 0:
                            continue
                        x, y = int(round(px * w)), int(round(py * h))
                        out = cv2.circle(out, (x, y), 3, (0, 255, 255), 2)
                        cv2.putText(out, str(pi), (x, y),
                                    cv2.FONT_HERSHEY_COMPLEX_SMALL, 0.75,
                                    (64, 255, 0), 1)
                    out = cv2.resize(out, (0, 0), fx=2, fy=2)
                path = os.path.join(args.dst_dir,
                                    "{}_{}_{}.png".format(it, bi, i))
                cv2.imwrite(path, out)
                n_out += 1
    print("Done! wrote {} previews to {}".format(n_out, args.dst_dir))


if __name__ == "__main__":
    main()
