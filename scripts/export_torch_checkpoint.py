#!/usr/bin/env python
"""Export a checkpoint trained here to a reference-loadable ``.pth``.

The inverse of serving reference weights on TPU: models trained with
``train.py`` (``.msgpack`` / ``.orbax`` checkpoints) are converted to the
flat torch ``state_dict`` format the reference saves from its
``train.py:314-323`` and loads in ``predict.py``/``test.py`` — so a user
can train on TPU with this framework and serve with the reference's
PyTorch stack unchanged.

Usage:
  python scripts/export_torch_checkpoint.py --load ckpt/CP_epoch30.msgpack \
      [--dst ckpt/CP_epoch30.pth]
"""
import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--load", required=True,
                    help=".msgpack or .orbax checkpoint from train.py")
    ap.add_argument("--dst", default=None,
                    help="output .pth path (default: alongside --load)")
    args = ap.parse_args(argv)

    from sports_field_homography_tpu.compat.torch_export import (
        save_torch_checkpoint)

    if args.load.endswith(".msgpack"):
        # raw (target-free) restore: the export walk needs only the tree
        from flax.serialization import msgpack_restore

        with open(args.load, "rb") as f:
            variables = msgpack_restore(f.read())
    else:
        from sports_field_homography_tpu.utils.checkpoint import (
            load_checkpoint)

        variables = load_checkpoint(args.load)
    dst = args.dst
    if dst is None:
        base = args.load
        for suffix in (".msgpack", ".orbax"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
        dst = base + ".pth"
    save_torch_checkpoint(dst, variables)
    print(f"exported {args.load} -> {dst}")


if __name__ == "__main__":
    main()
