"""Argparse + YAML-overlay configuration system.

Flag-compatible with the reference (``utils/config.py``): same argument
names, defaults and YAML override mechanics (``parse_config`` +
``replace_args`` with ``ignore_keys``), so existing reference conf.yaml
files drive this framework unchanged.

Known reference quirk, preserved by behavior: YAML keys that don't match an
arg name are silently ignored — e.g. the reference example config's
``segm_loss:`` key never takes effect because the arg is ``seg_loss``
(reference ``conf/train_reconstructor.yaml.example:39`` vs
``utils/config.py:122``).  We additionally *warn* when that specific
footgun is detected.
"""
from __future__ import annotations

import argparse
import os

import yaml

__all__ = [
    "parse_config",
    "make_base_parser",
    "get_training_args",
    "get_prediction_args",
    "get_test_args",
    "replace_args",
    "resolve_asset",
]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def resolve_asset(path: str) -> str:
    """Resolve ``./assets/...`` defaults against the repo root when they
    don't exist relative to the cwd, so the CLIs work from any directory
    (the reference assumes repo-cwd invocation)."""
    if path and not os.path.exists(path):
        candidate = os.path.join(_REPO_ROOT, path.lstrip("./"))
        if os.path.exists(candidate):
            return candidate
    return path


def parse_config(path_to_yaml: str):
    """Parse a YAML config file (reference ``utils/config.py:5-17``)."""
    config = None
    try:
        with open(path_to_yaml, "r") as file:
            config = yaml.safe_load(file)
    except Exception:  # noqa: BLE001 - match reference behavior (print+None)
        print("Error reading the config file:", path_to_yaml)
    return config


def make_base_parser() -> argparse.ArgumentParser:
    """Shared model/geometry args (reference ``utils/config.py:19-73``)."""
    parser = argparse.ArgumentParser(description="Reconstructor (TPU)")
    parser.add_argument("--load", dest="load", type=str, default=None,
                        help="Load model from a checkpoint (.pth/.msgpack/orbax dir)")
    parser.add_argument("--conf_path", "-c", dest="conf_path", type=str, default=None,
                        help="Load config from a .yaml file")
    parser.add_argument("--viz", action="store_true", default=False,
                        help="Visualize the images as they are processed")
    parser.add_argument("--batchsize", "-bs", dest="batchsize", type=int, default=8,
                        help="Batch size")

    # Data:
    parser.add_argument("--img_dir", dest="img_dir", type=str, default=None,
                        help="Path to dir containing training images")
    parser.add_argument("--court_img", dest="court_img", type=str,
                        default="./assets/pitch_mask_nc4_hd_onehot.png",
                        help="Path to court template image warped by the homography")
    parser.add_argument("--court_poi", dest="court_poi", type=str,
                        default="./assets/template_pitch_points.json",
                        help="Path to court points of interest (reprojection error)")

    # Resolutions (W, H):
    parser.add_argument("--target_size", dest="target_size", default=(640, 360),
                        help="Size of the input/output data")
    parser.add_argument("--unet_size", dest="unet_size", default=(640, 360),
                        help="Size of the UNET input/output")
    parser.add_argument("--warp_size", dest="warp_size", default=(640, 360),
                        help="Output size of warper")
    parser.add_argument("--court_size", dest="court_size", default=(640, 360),
                        help="Size of the court image template")

    # Segmentation (UNET):
    parser.add_argument("--use_unet", action="store_true", default=True,
                        help="Whether to use UNET or not")
    parser.add_argument("--unet_bilinear", action="store_true", default=False,
                        help="Use bilinear upsampling (True) or deconvolution (False)")
    parser.add_argument("--mask_classes", dest="mask_classes", type=int, default=4,
                        help="Number of segmentation mask classes")
    parser.add_argument("--unet_uv", action="store_true", default=False,
                        help="Whether UNET also regresses a UV-mask")

    # Regression (ResNetSTN):
    parser.add_argument("--use_resnet", action="store_true", default=True,
                        help="Whether to use ResNetSTN or not")
    parser.add_argument("--resnet_name", type=str, default="resnet34",
                        help="ResNetSTN variant (resnet18, resnet34, resnet50, ...)")
    parser.add_argument("--resnet_input", type=str, default="img+mask",
                        help="STN input: 'img / mask / img+mask / img+mask+uv'")
    parser.add_argument("--use_warper", action="store_true", default=True,
                        help="Whether to warp the court mask with the homography")

    # TPU-specific:
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        help="Model compute dtype: bfloat16 (fast) or float32 (parity)")
    parser.add_argument("--warp_kernel", type=str, default="auto",
                        choices=("auto", "xla", "pallas"),
                        help="Nearest interval-warp kernel; bit-identical "
                             "outputs (auto=xla per the measurements in "
                             "BASELINE.md; pallas is the guaranteed-fusion "
                             "fallback)")
    parser.add_argument("--conv_kernel", type=str, default="auto",
                        choices=("auto", "xla", "pallas"),
                        help="UNet DoubleConv kernel: pallas = fused "
                             "train-mode Pallas DoubleConv "
                             "(ops/double_conv; batch on the grid, BN "
                             "fused into the convs), auto per the "
                             "measured policy in BASELINE.md")
    parser.add_argument("--fused_bn", action="store_true", default=False,
                        help="Use the Pallas fused train-mode BN+ReLU "
                             "(ops/bn_pallas) inside DoubleConv; measured "
                             "slower than XLA at the flagship shapes "
                             "(BASELINE.md), kept reachable for other "
                             "shapes/compilers")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Data-parallel devices (default: all visible)")
    # multi-host (DCN) runtime; see parallel/distributed.py.  With only
    # --num_hosts set, JAX's cluster auto-detection fills the rest
    # (Cloud TPU pod metadata); explicit coordinator/host_id for manual
    # or CPU-test topologies.
    parser.add_argument("--num_hosts", type=int, default=None,
                        help="Total hosts in a multi-host run (enables "
                             "jax.distributed)")
    parser.add_argument("--host_id", type=int, default=None,
                        help="This host's process id in a multi-host run")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Coordinator address host:port for "
                             "jax.distributed")
    return parser


def get_training_args(ret_parser: bool = False, argv=None):
    """Training args (reference ``utils/config.py:76-141``)."""
    parser = make_base_parser()

    parser.add_argument("--resnet_pretrained", type=str, default=None,
                        help="Warm-start ResNetSTN: a local .pth (reference "
                             "or torchvision state_dict), a torchvision "
                             "variant name (e.g. 'resnet34' -> downloaded "
                             "via torch.hub), or a direct URL")

    # Training data:
    parser.add_argument("--mask_dir", dest="mask_dir", type=str, default=None)
    parser.add_argument("--anno_dir", dest="anno_dir", type=str, default=None)
    parser.add_argument("--anno_keys", dest="anno_keys", type=str, default=None)
    parser.add_argument("--val_names", dest="val_names", type=str, default=None)
    parser.add_argument("--aug", dest="aug", type=str, default=None)
    parser.add_argument("--only_ncaam", action="store_true", default=False)

    # Training args:
    parser.add_argument("--opt", dest="opt", type=str, default="RMSprop")
    parser.add_argument("--epochs", dest="epochs", type=int, default=8)
    parser.add_argument("--lr", dest="lr", type=float, default=0.0001)
    parser.add_argument("--weight_decay", dest="weight_decay", type=float, default=1e-8)
    parser.add_argument("--val_step_n", dest="val_step_n", type=int, default=None)
    parser.add_argument("--cp_dir", dest="cp_dir", type=str, default=None)
    parser.add_argument("--log_dir", dest="log_dir", type=str, default=None)
    parser.add_argument("--grad_accum", dest="grad_accum", type=int,
                        default=1,
                        help="Accumulate gradients over N loader batches "
                             "per optimizer step (lax.scan over "
                             "micro-batches: effective batch N*batchsize "
                             "at one batch's activation memory)")
    parser.add_argument("--async_ckpt", action="store_true", default=False,
                        help="Write epoch checkpoints asynchronously via "
                             "orbax (CP_epoch{n}.orbax dirs); serialization "
                             "overlaps the next epoch")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="Resume full training state (params + optimizer "
                             "+ step) from cp_dir/last_state.msgpack")
    parser.add_argument("--data_seed", dest="data_seed", type=int, default=0,
                        help="Seed for the train shuffle order; each epoch's "
                             "order derives from (seed, epoch), enabling "
                             "reproducible runs and exact mid-epoch resume. "
                             "-1 restores the legacy nondeterministic "
                             "shuffle (single-host only).")
    parser.add_argument("--uint8_inputs", type=int, default=None,
                        help="Ship train/val frames to the device as uint8 "
                             "(4x less host->device traffic; normalization "
                             "happens on device). Default: on when no "
                             "augmentation is configured (bit-identical), "
                             "off with augmentation (rounds the augmented "
                             "float image back to 8 bits). 0/1 to force.")
    parser.add_argument("--tail", type=str, default=None,
                        choices=("exact", "pad"),
                        help="Last-train-batch handling when n_train %% "
                             "batchsize != 0. 'exact': yield the true "
                             "smaller tail batch (reference DataLoader "
                             "semantics, incl. BatchNorm statistics; costs "
                             "one extra XLA compile for the tail shape). "
                             "'pad': pad to the static batch with replicas "
                             "— losses AND train-mode BatchNorm moments "
                             "mask them out (reference-exact; the tail "
                             "batch dispatches to a separate masked "
                             "program, one extra compile). Default: exact "
                             "on a single device, pad with "
                             "--num_devices/multi-host/grad_accum (those "
                             "need uniform shapes).")

    # Losses:
    parser.add_argument("--rec_loss", type=str, default="MSE")
    parser.add_argument("--uv_loss", type=str, default="MSE")
    parser.add_argument("--seg_loss", type=str, default="CE")
    parser.add_argument("--reproj_loss", type=str, default=None)
    parser.add_argument("--consist_loss", type=str, default=None)
    parser.add_argument("--consist_start_iter", type=int, default=0)
    parser.add_argument("--seg_lambda", type=float, default=2.0)
    parser.add_argument("--rec_lambda", type=float, default=2.0)
    parser.add_argument("--uv_lambda", type=float, default=2.0)
    parser.add_argument("--reproj_lambda", type=float, default=8.0)
    parser.add_argument("--consist_lambda", type=float, default=1.0)
    parser.add_argument("--weight_semantics", type=str, default="ref",
                        choices=("ref", "sample"),
                        help="Per-sample annotation-quality weighting. "
                             "'ref' reproduces the reference exactly: its "
                             "(B,)*(B,1) broadcast outer-products, so the "
                             "seg/rec losses see mean(loss)*mean(weights) "
                             "— weights decoupled from samples (UV stays "
                             "per-sample). 'sample' weights every loss "
                             "truly per-sample (mean(w_i*l_i)).")

    return parser if ret_parser else parser.parse_args(argv)


def get_prediction_args(argv=None):
    """Prediction args (reference ``utils/config.py:144-165``)."""
    parser = make_base_parser()
    parser.add_argument("--video_path", type=str, default=None,
                        help="Path to video to process (used when img_dir is empty)")
    parser.add_argument("--video_workers", type=int, default=1,
                        help="Parallel video decode threads (chunked "
                             "captures; 1 = sequential like the reference)")
    parser.add_argument("--dst_dir", type=str, default=None,
                        help="Directory where the results will be saved")
    parser.add_argument("--req_outputs", type=str,
                        default="segm_mask,warp_mask,theta,poi,consistency,debug",
                        help="Output names to be computed and saved")
    parser.add_argument("--out_size", default=(1280, 720), nargs="+", type=int,
                        help="Output images size")
    parser.add_argument("--mask_type", type=str, default="gray",
                        help="Output mask type [bin / gray / rgb]")
    parser.add_argument("--mask_save_format", type=str, default="pickle",
                        help="Mask save format [png / pickle]")
    parser.add_argument("--fold_bn", type=int, default=1,
                        help="Fold BatchNorm into conv weights at load "
                             "(inference-only, exactly equivalent; 0 disables)")
    parser.add_argument("--resume", action="store_true", default=False,
                        help="Resume an interrupted run: frames already "
                             "recorded in the part JSONL are skipped and new "
                             "results append (requires a JSON output — "
                             "theta/poi/consistency — in req_outputs)")
    return parser.parse_args(argv)


def get_serving_args(argv=None):
    """Online-serving args (no reference twin: the reference has no
    serving layer — see ``serve/server.py``).  Model/geometry args come
    from the shared base parser so a checkpoint's sidecar conf.yaml
    overlays identically to predict/test."""
    parser = make_base_parser()
    parser.description = "Serve"
    parser.add_argument("--http_host", type=str, default="127.0.0.1",
                        help="Bind address (0.0.0.0 to expose)")
    parser.add_argument("--port", type=int, default=8800,
                        help="HTTP port (0 = ephemeral, printed at start)")
    parser.add_argument("--req_outputs", type=str,
                        default="theta,poi,consistency",
                        help="Outputs computed per request (same names as "
                             "predict; segm_mask/warp_mask return "
                             "base64 PNGs)")
    parser.add_argument("--max_batch", type=int, default=32,
                        help="Dynamic batcher cap (the throughput bucket)")
    parser.add_argument("--max_delay_ms", type=float, default=8.0,
                        help="Max coalescing wait after the first queued "
                             "request before dispatch")
    parser.add_argument("--buckets", type=str, default=None,
                        help="Comma list of compiled batch sizes "
                             "(default: powers of 2 up to max_batch)")
    parser.add_argument("--channel_order", type=str, default="bgr",
                        choices=("bgr", "rgb"),
                        help="Channel order frames are fed to the model in "
                             "(bgr = the video-ingest twin, "
                             "data/dataset.py VideoDataset)")
    parser.add_argument("--serving_artifact", type=str, default=None,
                        help="Serve a StableHLO artifact directory "
                             "(scripts/export_serving.py) instead of a "
                             "checkpoint")
    parser.add_argument("--no_warmup", action="store_true",
                        help="Skip compiling all batch buckets at startup")
    parser.add_argument("--fold_bn", type=int, default=1,
                        help="Fold BatchNorm into conv weights at load "
                             "(inference-only, exactly equivalent; 0 disables)")
    return parser.parse_args(argv)


def get_test_args(argv=None):
    """Checkpoint-sweep test args (reference ``utils/config.py:168-176``)."""
    parser = get_training_args(ret_parser=True)
    parser.description = "Test"
    parser.add_argument("--test_epochs", dest="test_epochs", type=str, default=None,
                        help="List of epochs to test, e.g. 1,2,5")
    parser.add_argument("--metric_img_size", "-mis", dest="metric_img_size",
                        default=(640, 360), help="Metric image size")
    parser.add_argument("--fold_bn", type=int, default=1,
                        help="Fold BatchNorm into conv weights at load "
                             "(inference-only, exactly equivalent; 0 disables)")
    return parser.parse_args(argv)


def replace_args(args, conf, ignore_keys=None):
    """Overlay YAML values onto parsed args (reference ``utils/config.py:178-192``)."""
    assert args is not None
    assert conf is not None
    ignore_keys = ignore_keys or []
    if "segm_loss" in conf and "seg_loss" not in conf:
        print("WARNING: config key 'segm_loss' is ignored (the arg is "
              "'seg_loss'); keeping default/CLI value — this matches the "
              "reference's silent behavior.")
    for k in vars(args).keys():
        if k not in ignore_keys and k in conf:
            setattr(args, k, conf[k])
    return args
