#!/usr/bin/env python
"""Export a checkpoint to a self-contained StableHLO serving artifact.

Builds the exact predict program the CLI serves (same req_outputs
pruning, uint8 in-program normalization, folded BN, interval-table warp)
and serializes it with ``jax.export`` — weights baked in — so production
loads one artifact directory and calls ``f(frames_u8) -> outputs``
without this package's model code or the checkpoint.

Usage:
  python scripts/export_serving.py --load ckpt/CP_epoch30.msgpack \
      --req_outputs theta,consistency --batchsize 32 \
      [--platforms tpu,cpu] [--dst ckpt/serving]

``--buckets 1,8,32`` exports one fixed-batch artifact per size under
``<dst>/b{N}`` (the checkpoint loads once) — the bucket set
``cpp/pjrt_http_serve`` consumes for latency/throughput-adaptive
dynamic batching.  ``--poly_batch`` is the one-artifact alternative for
runtimes that specialize symbolic shapes themselves.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv=None):
    # the predict CLI's own arg surface (plus --platforms / --dst via env
    # of argparse below) keeps conf.yaml sidecar discovery identical
    import argparse

    from sports_field_homography_tpu.utils.config import (
        get_prediction_args, parse_config, replace_args)

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--platforms", default=None,
                    help="comma list of lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    ap.add_argument("--dst", default=None,
                    help="artifact directory (default: <load>_serving)")
    ap.add_argument("--poly_batch", action="store_true", default=False,
                    help="export with a symbolic batch dimension: one "
                         "artifact serves any batch size (--batchsize "
                         "becomes the recommended size recorded in meta)")
    ap.add_argument("--buckets", default=None,
                    help="comma list of batch sizes, e.g. 1,8,32: export "
                         "one fixed-batch artifact per size under "
                         "<dst>/b{N} — the bucket set cpp/pjrt_http_serve "
                         "and serve.py --serving_artifact consume for "
                         "latency/throughput-adaptive batching")
    own, rest = ap.parse_known_args(argv)
    if own.buckets and own.poly_batch:
        ap.error("--buckets and --poly_batch are mutually exclusive")

    args = get_prediction_args(rest)
    if os.environ.get("SFH_JAX_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["SFH_JAX_PLATFORM"])

    from sports_field_homography_tpu.cli.engine import build_model, discover_conf
    from sports_field_homography_tpu.compat.serving import (
        export_predict, save_serving)

    args.conf_path = discover_conf(args.load, args.conf_path)
    if args.conf_path is not None:
        print("Reading params from {}...".format(args.conf_path))
        conf = parse_config(args.conf_path)
        args = replace_args(args, conf, ignore_keys=[
            "conf_path", "batchsize", "court_img", "court_poi", "img_dir",
            "court_size", "warp_size", "load", "compute_dtype",
            "num_devices"])

    args.out_size = tuple(args.out_size)
    if args.court_size[0] < args.out_size[0]:
        args.court_size = args.out_size
    if args.warp_size[0] < args.out_size[0]:
        args.warp_size = args.out_size

    req_outputs = {n: True for n in args.req_outputs.split(",")}
    project_poi = "poi" in req_outputs
    consistency = "consistency" in req_outputs
    if "debug" in req_outputs and "warp_mask" not in req_outputs:
        req_outputs["warp_mask"] = True
    args.use_warper = "warp_mask" in req_outputs or consistency

    keep = set()
    if "segm_mask" in req_outputs:
        keep.add("segm_mask")
    if "warp_mask" in req_outputs:
        keep.add("warp_mask")
    if "theta" in req_outputs:
        keep.add("theta")
    if consistency:
        keep.add("consist_score")
    if project_poi:
        keep.add("poi")

    bundle = build_model(args, load=args.load, warp_with_nearest=True,
                         fold_bn=bool(getattr(args, "fold_bn", 1)))
    platforms = own.platforms.split(",") if own.platforms else None

    dst = own.dst
    if dst is None:
        base = args.load or "model"
        for suffix in (".msgpack", ".orbax", ".pth"):
            if base.endswith(suffix):
                base = base[: -len(suffix)]
        dst = base + "_serving"

    if own.buckets:
        import dataclasses

        import numpy as np

        batches = sorted({int(b) for b in own.buckets.split(",")})
        if batches[0] < 1:
            ap.error("--buckets entries must be >= 1")
        # batch-1 court constants broadcast against any live batch
        # (models/reconstructor._match_batch), so ONE bundle serves every
        # bucket — the checkpoint loads once, only the export loop repeats
        bundle = dataclasses.replace(
            bundle, court_img=np.asarray(bundle.court_img)[:1],
            court_poi=np.asarray(bundle.court_poi)[:1])
        for b in batches:
            exported, meta = export_predict(
                bundle, consistency=consistency, project_poi=project_poi,
                keep=tuple(sorted(keep)), batch_size=b,
                platforms=platforms)
            sub = os.path.join(dst, "b{}".format(b))
            save_serving(sub, exported, meta)
            size = os.path.getsize(os.path.join(sub, "program.shlo"))
            print("exported serving artifact -> {} (batch {}, {} outputs, "
                  "{:.1f} MB, platforms={})".format(
                      sub, b, len(meta["outputs"]), size / 1e6,
                      meta["platforms"]))
        return

    exported, meta = export_predict(
        bundle, consistency=consistency, project_poi=project_poi,
        keep=tuple(sorted(keep)), batch_size=args.batchsize,
        platforms=platforms, poly_batch=own.poly_batch)
    save_serving(dst, exported, meta)
    size = os.path.getsize(os.path.join(dst, "program.shlo"))
    print("exported serving artifact -> {} ({} outputs, {:.1f} MB, "
          "platforms={})".format(dst, len(meta["outputs"]),
                                 size / 1e6, meta["platforms"]))


if __name__ == "__main__":
    main()
