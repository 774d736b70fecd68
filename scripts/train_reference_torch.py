#!/usr/bin/env python
"""Train the PyTorch REFERENCE itself (CPU) to get real trained weights.

The round-3 review's #5 ask: every parity number so far came from
fresh-init weights; nothing proved cross-framework parity on a TRAINED
checkpoint (moved BN running stats, a non-identity theta head).  This
script produces one by driving the reference's OWN training loop
(``/root/reference/train.py:43`` ``train_net``) over its OWN
``BasicDataset``/``DataLoader`` on the synthetic dataset — only kornia
and torchvision are stubbed (tests/torch_ref.py's validated stubs;
augmentation stays off) and DataLoader workers run in-process.

Chain (also wrapped by tests/test_trained_checkpoint_parity.py):

  python scripts/make_synthetic_dataset.py --dst /tmp/tp/synth --n 96 \\
      --size 128 72
  python scripts/train_reference_torch.py --data /tmp/tp/synth \\
      --cp_dir /tmp/tp/ckpt --epochs 8 --batch 4 --size 128 72
  python scripts/parity_report.py --load /tmp/tp/ckpt/CP_epoch8.pth \\
      --img_dir /tmp/tp/synth/frames/val_game --cpu

A ``conf.yaml`` sidecar is written next to the checkpoints so both
predict CLIs (the reference's and ours) can run straight off the
directory for an artifact-level oracle diff.
"""
from __future__ import annotations

import argparse
import os
import sys
import types

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tests"))

from torch_ref import REFERENCE_PATH, install_kornia_stub  # noqa: E402

install_kornia_stub()

# torchvision is not installed; the reference's utils/augmentation imports
# it at module level but the no-aug train path never calls into it.
_tv = types.ModuleType("torchvision")
_tv_t = types.ModuleType("torchvision.transforms")
_tv_f = types.ModuleType("torchvision.transforms.functional")
_tv.transforms = _tv_t
_tv_t.functional = _tv_f
for _n, _m in [("torchvision", _tv), ("torchvision.transforms", _tv_t),
               ("torchvision.transforms.functional", _tv_f)]:
    sys.modules[_n] = _m

sys.path.insert(0, REFERENCE_PATH)

import torch  # noqa: E402
from torch.utils.data import DataLoader  # noqa: E402

import train as ref_train  # noqa: E402  (/root/reference/train.py)
from models.reconstructor import Reconstructor  # noqa: E402
from utils.dataset import (BasicDataset, open_court_poi,  # noqa: E402
                           open_court_template, split_on_train_val)

TMPL = os.path.join(_REPO, "assets", "mask_ncaa_v4_nc4_m_onehot.png")
POI = os.path.join(_REPO, "assets", "template_ncaa_v4_points.json")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True,
                    help="make_synthetic_dataset output dir")
    ap.add_argument("--cp_dir", required=True)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", nargs=2, type=int, default=(128, 72))
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--opt", default="RMSprop")
    ap.add_argument("--resnet", default="resnet34")
    ap.add_argument("--court_img", default=TMPL)
    ap.add_argument("--court_poi", default=POI)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    torch.manual_seed(args.seed)
    size = tuple(args.size)
    img_dir = os.path.join(args.data, "frames")
    mask_dir = os.path.join(args.data, "masks")
    anno_dir = os.path.join(args.data, "anno")
    train_ids, _ = split_on_train_val(img_dir, ["val_game"])
    assert train_ids, img_dir
    dataset = BasicDataset(train_ids, img_dir, mask_dir, anno_dir,
                           ["poi", "reproj_mse"], 4, False, size)
    loader = DataLoader(dataset, batch_size=args.batch, shuffle=True,
                        num_workers=0, pin_memory=False)

    court_img = open_court_template(args.court_img, 4, size=size,
                                    batch_size=args.batch)
    court_poi = open_court_poi(args.court_poi, args.batch)
    net = Reconstructor(court_img, court_poi, target_size=size,
                        mask_classes=4, unet_size=size, warp_size=size,
                        resnet_name=args.resnet, resnet_input="img+mask")
    device = torch.device("cpu")
    net.to(device)

    cp_dir = os.path.join(os.path.abspath(args.cp_dir), "")
    os.makedirs(cp_dir, exist_ok=True)
    # conf.yaml sidecar: both predict CLIs rebuild the model from this
    import yaml
    conf = {
        "target_size": list(size), "unet_size": list(size),
        "warp_size": list(size), "mask_classes": 4,
        "resnet_name": args.resnet, "resnet_input": "img+mask",
        "use_unet": True, "use_resnet": True, "unet_bilinear": False,
        "court_img": args.court_img, "court_poi": args.court_poi,
    }
    with open(os.path.join(cp_dir, "conf.yaml"), "w") as f:
        yaml.safe_dump(conf, f)

    # val_step_n past the horizon: plateau-LR/eval need a val split the
    # tiny synthetic run doesn't exercise; the reference skips cleanly.
    ref_train.train_net(
        net, device, loader, len(dataset), None, args.batch, 10 ** 9,
        "CE", 1.0, "MSE", 1.0, "RRMSE", 1.0, "CE", 0.1, 0,
        opt=args.opt, epochs=args.epochs, lr=args.lr,
        target_size=size, cp_dir=cp_dir,
        log_dir=os.path.join(cp_dir, "tb"))
    print("trained checkpoints in", cp_dir)


if __name__ == "__main__":
    main()
