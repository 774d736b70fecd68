"""Batch-inference CLI: image dir / video -> theta + masks + score JSON.

Capability twin of reference ``predict.py`` with the same flags, output
layout and ``{game}_court.json`` format, re-architected for TPU:

  * the reference's 3-process pipeline (GPU predict -> GPU->CPU transfer ->
    writer, ``predict.py:45-122``) becomes: threaded host decode loader ->
    device-prefetched jitted predict (XLA overlaps D2H of batch k with
    compute of k+1) -> a writer thread draining a bounded queue.  Same
    overlap structure, no process spawning, no tensor IPC.
  * req_outputs are static: unneeded outputs are dropped from the jitted
    function's return dict, so XLA dead-code-eliminates their compute
    (e.g. no warp at all when only theta is requested).
  * batches have one static shape; the tail batch is padded and masked.
"""
from __future__ import annotations

import json
import os
import pickle
import queue
import threading
import time
from typing import Dict, Optional

import numpy as np

import jax

from ..data.dataset import BasicDataset, VideoDataset
from ..data.loader import Loader, device_prefetch
from ..utils.config import get_prediction_args, parse_config, replace_args
from ..utils.logger import get_logger
from ..utils.postprocess import preds_to_masks, onehot_to_image, overlay, draw_text
from .engine import build_model, jit_predict_fn, discover_conf

__all__ = ["process", "main"]


class NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return json.JSONEncoder.default(self, obj)


def save_mask_as_png(mask, dst_dir, name, postfix="mask"):
    import cv2

    dst_subdir = os.path.join(dst_dir, postfix)
    os.makedirs(dst_subdir, exist_ok=True)
    cv2.imwrite(os.path.join(dst_subdir, name + ".png"), mask)


def _truncate_torn_pickle(path: str) -> None:
    """Drop a torn trailing record from a pickle stream (crash mid-write).

    An interrupted run can die with the last ``pickle.dump`` partially
    flushed; appending onto those partial bytes would make the whole
    stream unreadable from that point.  Complete records are kept; the
    torn frame is re-predicted by the resume logic (at-least-once —
    duplicate [name, buf] records are harmless, readers keep the last)."""
    good = 0
    with open(path, "rb") as f:
        try:
            while True:
                pickle.load(f)
                good = f.tell()
        except Exception:
            pass
    if good < os.path.getsize(path):
        with open(path, "rb+") as f:
            f.truncate(good)


class PickleMaskWriter:
    """Pickled PNG-buffer stream writer (reference ``predict.py:26-37``)."""

    def __init__(self, dst_dir: str, postfix: str = "mask", suffix: str = "",
                 append: bool = False):
        # suffix: per-host part discriminator for multi-host runs (the
        # parts are byte-concatenated into data.pkl by host 0 — a
        # pickle.dump stream concatenates losslessly).  append: resumed
        # runs extend the stream instead of truncating it (repairing a
        # torn tail record first).
        dst_subdir = os.path.join(dst_dir, postfix)
        os.makedirs(dst_subdir, exist_ok=True)
        path = os.path.join(dst_subdir, "data.pkl" + suffix)
        if append and os.path.exists(path):
            _truncate_torn_pickle(path)
        self.file = open(path, "ab" if append else "wb+")

    def write(self, name: str, mask: np.ndarray):
        import cv2

        _, buf = cv2.imencode(".png", mask)
        pickle.dump([name, buf], self.file)

    def flush(self):
        self.file.flush()

    def close(self):
        self.file.close()


def _resize_masks(masks: np.ndarray, out_size) -> np.ndarray:
    """Nearest-resize a batch of masks to (W, H)=out_size.

    The reference always lands in this resize (its size check is
    short-circuited — ``predict.py:305,311`` — so masks are always
    resized); we keep the always-resize behavior.
    """
    import cv2

    out = [cv2.resize(m, tuple(out_size), interpolation=cv2.INTER_NEAREST)
           for m in masks]
    return np.stack(out, axis=0)


class _IndexView:
    """Arbitrary-index view of a dataset (``--resume``: the frames an
    interrupted run hasn't recorded yet)."""

    def __init__(self, base, indices):
        self.base, self.indices = base, list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.base[self.indices[i]]


def _read_resume_names(path: str) -> set:
    """Frame names already recorded in a part JSONL by an interrupted run.

    A crash can tear the final record (partial line, or a complete JSON
    object missing its newline); everything from the first unparsable
    line on is dropped and the file is rewritten as the clean prefix, so
    resumed appends never concatenate onto a torn record.  The frames
    whose records were torn (or still buffered at crash time) are simply
    re-predicted — resume is at-least-once, keyed on the JSONL.
    """
    if not os.path.exists(path):
        return set()
    names, good = set(), []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                break
            names.update(rec.keys())
            good.append(line if line.endswith("\n") else line + "\n")
    with open(path, "w") as f:
        f.writelines(good)
    return names


class _DatasetShard:
    """Contiguous [lo, hi) view of a dataset: each host of a multi-host
    predict run processes only its own slice (pure data decomposition —
    inference needs no cross-host collectives at all)."""

    def __init__(self, base, lo: int, hi: int):
        self.base, self.lo, self.n = base, lo, max(0, hi - lo)
        if isinstance(base, VideoDataset):
            # both decode paths (sequential pre-seek / chunked pool)
            # restrict themselves to the shard's frame range
            base.set_range(lo, hi)

    def __len__(self):
        return self.n

    def __getitem__(self, i: int):
        return self.base[self.lo + i]


def _host_slice(n: int, pid: int, nproc: int):
    """Contiguous per-host [lo, hi) input slice.  Clamps BOTH ends: with
    more hosts than frames a surplus host gets an empty shard (and must
    still reach the end-of-run barrier rather than die on len()<0)."""
    per = (n + nproc - 1) // nproc
    lo = min(pid * per, n)
    return lo, min(lo + per, n)


def _merge_jsonl_parts(parts, dst_path: str, model_name: str):
    """Merge per-host (or the single-host) JSONL part files into the
    final ``{game}_court.json`` (reference ``predict.py:399-407``);
    removes the parts."""
    output = {}
    for part in parts:
        if not os.path.exists(part):
            continue
        with open(part) as f:
            for line in f:
                output.update(json.loads(line))
        os.remove(part)
    if output:
        output["model"] = model_name
        with open(dst_path, "w") as f:
            json.dump(output, f, cls=NumpyEncoder, indent=2)


def process(argv=None, num_data_workers: int = 4):
    args = get_prediction_args(argv)
    if os.environ.get("SFH_JAX_PLATFORM"):
        # test hook: the JAX_PLATFORMS env var is ignored on the tunneled
        # runtime (CLAUDE.md); this must land before first backend use
        jax.config.update("jax_platforms", os.environ["SFH_JAX_PLATFORM"])

    # multi-host runtime must come up before any backend use
    multihost = False
    if (getattr(args, "num_hosts", None) or
            getattr(args, "coordinator", None)):
        from ..parallel.distributed import initialize_distributed
        multihost = initialize_distributed(args.coordinator, args.num_hosts,
                                           args.host_id)
        if multihost:
            print(f"jax.distributed up: predict process "
                  f"{jax.process_index()} of {jax.process_count()}")

    # conf.yaml sidecar discovery + overlay (reference predict.py:137-148)
    args.conf_path = discover_conf(args.load, args.conf_path)
    if args.conf_path is not None:
        print("Reading params from {}...".format(args.conf_path))
        conf = parse_config(args.conf_path)
        ignore_keys = ["conf_path", "batchsize", "court_img", "court_poi",
                       "img_dir", "court_size", "warp_size", "load",
                       "compute_dtype", "num_devices", "resume"]
        args = replace_args(args, conf, ignore_keys=ignore_keys)

    # resolution floors (reference predict.py:150-155)
    args.out_size = tuple(args.out_size)
    if args.court_size[0] < args.out_size[0]:
        args.court_size = args.out_size
    if args.warp_size[0] < args.out_size[0]:
        args.warp_size = args.out_size

    req_outputs = {n: True for n in args.req_outputs.split(",")}
    os.makedirs(args.dst_dir, exist_ok=True)

    if args.video_path is not None and len(args.video_path) > 0:
        game_name = os.path.basename(os.path.dirname(args.video_path))
    else:
        game_name = os.path.basename(args.img_dir)

    project_poi = "poi" in req_outputs
    consistency = "consistency" in req_outputs
    keep_orig_img = "debug" in req_outputs
    if "debug" in req_outputs and "warp_mask" not in req_outputs:
        req_outputs["warp_mask"] = True
    args.use_warper = "warp_mask" in req_outputs or consistency
    assert (consistency and args.use_unet) or not consistency
    assert (project_poi and args.use_warper) or not project_poi

    logger = get_logger(format="%(message)s", write_date=False)

    if jax.default_backend() == "tpu" and args.batchsize % 8:
        # same sublane-padding tax as training (cli/train.py): measured at
        # inference too — batch 18 runs batch-24 tiles (81.9 ms vs batch
        # 16's 61.5 ms, i.e. 220 vs 260 fps; see BASELINE.md serving sweep)
        nxt = args.batchsize + 8 - args.batchsize % 8
        down = args.batchsize - args.batchsize % 8
        alts = f"Batch {down} or {nxt}" if down >= 8 else f"Batch {nxt}"
        logger.info(
            f"NOTE: batch size {args.batchsize} is not a multiple of 8; on "
            f"TPU it computes like batch {nxt} (sublane padding). "
            f"{alts} predicts strictly faster per frame.")

    bundle = build_model(args, load=args.load, warp_with_nearest=True,
                         fold_bn=bool(getattr(args, "fold_bn", 1)))
    keep = set()
    if "segm_mask" in req_outputs:
        keep.add("segm_mask")       # device-side argmax (uint8)
    if "warp_mask" in req_outputs:
        keep.add("warp_mask")
    if "theta" in req_outputs:
        keep.add("theta")
    if consistency:
        keep.add("consist_score")
    if project_poi:
        keep.add("poi")
    batch_sharding = None
    if args.num_devices is not None and args.num_devices > 1:
        # multi-chip data-parallel inference: batch sharded over the mesh,
        # same jitted predict body as single-chip (shard_predict_fn
        # delegates to jit_predict_fn with a mesh)
        from ..parallel.mesh import (check_batch_divisible, make_mesh,
                                     shard_predict_fn)
        check_batch_divisible(args.batchsize, args.num_devices)
        # under jax.distributed, inference needs no cross-host collectives:
        # each host meshes over its own chips and predicts its input slice
        mesh = make_mesh(args.num_devices, local=multihost)
        predict, batch_sharding, repl = shard_predict_fn(
            bundle, mesh, consistency=consistency, project_poi=project_poi,
            keep=tuple(keep))
        bundle.variables = jax.device_put(bundle.variables, repl)
        print(f"data-parallel inference over {mesh}")
    else:
        predict = jit_predict_fn(bundle, consistency=consistency,
                                 project_poi=project_poi, keep=tuple(keep))

    # dataset (reference predict.py:210-227)
    assert args.img_dir is not None or args.video_path is not None, \
        "img_dir and video_path cannot be both None"
    if args.img_dir is not None:
        ids = [n for n in os.listdir(args.img_dir)
               if os.path.isfile(os.path.join(args.img_dir, n))]
        ids.sort()
        data = BasicDataset(ids, args.img_dir, None, None, None,
                            args.mask_classes, use_uv=False,
                            target_size=args.target_size,
                            keep_orig_img=keep_orig_img, raw_uint8=True)
        loader_workers = num_data_workers
    else:
        data = VideoDataset(path=args.video_path, target_size=args.target_size,
                            keep_orig_img=keep_orig_img, raw_uint8=True,
                            decode_workers=getattr(args, "video_workers", 1))
        loader_workers = 1
    if multihost and jax.process_count() > 1:
        # contiguous per-host slice of the input (reference has no
        # multi-machine inference; this is the DCN scale-out analog)
        pid, nproc = jax.process_index(), jax.process_count()
        lo, hi = _host_slice(len(data), pid, nproc)
        data = _DatasetShard(data, lo, hi)
        print(f"host {pid}: frames [{lo}, {hi}), {hi - lo} local")

    # per-host part suffix: every multi-host writer (JSONL + pickle mask
    # streams) writes its own part; host 0 merges after the barrier
    part_suffix = (".h{}".format(jax.process_index())
                   if multihost and jax.process_count() > 1 else "")
    json_path = os.path.join(
        args.dst_dir,
        "{}_court_processing.json".format(game_name)) + part_suffix

    # --resume: skip frames an interrupted run already recorded in the
    # part JSONL (this host's own part), append new records to it.  Masks
    # for the skipped frames are already on disk (PNGs are per-frame;
    # pickle streams are appended).  Resume is keyed on the JSONL, so it
    # needs a JSON output (theta/poi/consistency) in req_outputs.
    resume = bool(getattr(args, "resume", False))
    done_names = _read_resume_names(json_path) if resume else set()
    if done_names:
        in_shard = isinstance(data, _DatasetShard)
        base = data.base if in_shard else data
        lo = data.lo if in_shard else 0
        hi = lo + (data.n if in_shard else len(data))
        if args.img_dir is not None:
            # JSONL keys are the ids without extension (writer name rule)
            todo = [i for i in range(lo, hi)
                    if base.ids[i][: base.ids[i].rfind(".")] not in done_names]
            n_skip = (hi - lo) - len(todo)
            data = _IndexView(base, todo)
        else:
            # video names are zero-padded absolute frame indices written
            # in order: advance past the contiguous done prefix
            lo0 = lo
            while lo < hi and str(lo).zfill(6) in done_names:
                lo += 1
            n_skip = lo - lo0
            data = _DatasetShard(base, lo, hi)
        logger.info(f"--resume: {n_skip} frames already in "
                    f"{os.path.basename(json_path)}, "
                    f"{len(data)} left to predict")
    loader = Loader(data, args.batchsize, shuffle=False,
                    num_workers=loader_workers)
    n_data = len(data)

    logger.info(f"""Start making predictions:
            Model file:        {args.load}
            Device:            {jax.devices()[0].platform}
            Images dir:        {args.img_dir}
            Video path:        {args.video_path}
            Num images:        {n_data}
            Batch size:        {args.batchsize}
            Dest dir:          {args.dst_dir}
            Required outputs:  {req_outputs}
            Mask type:         {args.mask_type}
            Mask save format:  {args.mask_save_format}
            Consistency:       {consistency}
            Use warper:        {args.use_warper}
            ResNet input size: {args.target_size}
            UNET input size:   {args.unet_size}
            Court img size:    {args.court_size}
            Warping size:      {args.warp_size}
            Output size:       {args.out_size}
        """)

    # --- writer thread: encodes/saves while the device computes ------------
    out_q: "queue.Queue" = queue.Queue(maxsize=8)
    writer_state: Dict[str, Optional[object]] = {"json": None, "segm_pkl": None,
                                                 "warp_pkl": None, "error": None}

    def get_pickle_writer(key, postfix):
        if writer_state[key] is None:
            writer_state[key] = PickleMaskWriter(args.dst_dir, postfix,
                                                 suffix=part_suffix,
                                                 append=resume)
        return writer_state[key]

    def writer_loop():
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                _write_outputs(item)
        except BaseException as e:  # propagate to main thread
            writer_state["error"] = e

    def _write_outputs(host: Dict[str, np.ndarray]):
        names = host["name"]
        segm_mask = host.get("segm_mask")
        warp_mask = host.get("warp_mask")
        theta = host.get("theta")
        consist_score = host.get("consist_score")
        poi = host.get("poi")

        # mask colorspace conversion (reference predict.py:287-301)
        if args.mask_type == "rgb":
            if segm_mask is not None:
                segm_mask = onehot_to_image(segm_mask, args.mask_classes)
            if warp_mask is not None:
                warp_mask = onehot_to_image(warp_mask, args.mask_classes)
        elif args.mask_type == "bin":
            if segm_mask is not None:
                segm_mask = ((segm_mask > 0) * 255).astype(np.uint8)
            if warp_mask is not None:
                warp_mask = ((warp_mask > 0) * 255).astype(np.uint8)
        elif args.mask_type == "gray":
            pass
        else:
            raise NotImplementedError(args.mask_type)

        # always-resize to out_size (see _resize_masks docstring)
        if segm_mask is not None:
            segm_mask = _resize_masks(segm_mask, args.out_size)
        if warp_mask is not None:
            warp_mask = _resize_masks(warp_mask, args.out_size)

        json_records = []
        for i, n in enumerate(names):
            t = n.split("/")
            name = t[1] if len(t) == 2 else t[0]

            if segm_mask is not None:
                if args.mask_save_format == "png":
                    save_mask_as_png(segm_mask[i], args.dst_dir, name,
                                     postfix="court/segm_mask")
                elif args.mask_save_format == "pickle":
                    get_pickle_writer("segm_pkl", "court/segm_mask").write(
                        name, segm_mask[i])
                else:
                    raise NotImplementedError(args.mask_save_format)

            if warp_mask is not None:
                if args.mask_save_format == "png":
                    save_mask_as_png(warp_mask[i], args.dst_dir, name,
                                     postfix="court/warp_mask")
                elif args.mask_save_format == "pickle":
                    get_pickle_writer("warp_pkl", "court/warp_mask").write(
                        name, warp_mask[i])
                else:
                    raise NotImplementedError(args.mask_save_format)

            if theta is not None or consist_score is not None or poi is not None:
                outputs = {}
                if consist_score is not None:
                    outputs["score"] = float("{:5f}".format(consist_score[i]))
                if theta is not None:
                    outputs["theta"] = theta[i]
                if poi is not None:
                    outputs["poi"] = poi[i]
                json_records.append({name: outputs})

            if "debug" in req_outputs:
                _write_debug(host, i, name, segm_mask, warp_mask,
                             consist_score, poi)

        # crash-resume invariant: a frame's JSONL record (the resume
        # ledger) must never persist before its masks — flush the pickle
        # streams, THEN write + flush this batch's JSONL lines
        if json_records:
            for key in ("segm_pkl", "warp_pkl"):
                if writer_state[key] is not None:
                    writer_state[key].flush()
            if writer_state["json"] is None:
                writer_state["json"] = open(json_path,
                                            "a" if resume else "w+")
            for rec in json_records:
                json.dump(rec, writer_state["json"], cls=NumpyEncoder)
                writer_state["json"].write("\n")
            writer_state["json"].flush()

    def _write_debug(host, i, name, segm_mask, warp_mask, consist_score, poi):
        import cv2

        orig_img = np.asarray(host["orig_img"][i])
        mask = None
        if warp_mask is not None:
            mask = warp_mask[i]
        elif segm_mask is not None:
            mask = segm_mask[i]
        if mask is not None:
            if mask.shape[0:2] != orig_img.shape[0:2]:
                mask = cv2.resize(mask, (orig_img.shape[1], orig_img.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
            if args.mask_type != "rgb":
                mask = onehot_to_image(mask, args.mask_classes)[0]
            debug_img = overlay(orig_img, mask)
        else:
            debug_img = orig_img
        if poi is not None:
            img_h, img_w = orig_img.shape[0:2]
            for pi, pts in enumerate(poi[i]):
                # poi coords are normalized [0,1]; bound-check in that space.
                # (The reference compares them against pixel dims with an x/y
                # swap, predict.py:381 — a vestigial check that only filters
                # negatives; cv2 then clips silently.  See docs/PARITY.md.)
                if not (0.0 <= pts[0] < 1.0 and 0.0 <= pts[1] < 1.0):
                    continue
                x, y = int(round(pts[0] * img_w)), int(round(pts[1] * img_h))
                debug_img = cv2.circle(debug_img, (x, y), 3,
                                       color=(255, 255, 255), thickness=2)
                draw_text(debug_img, text=str(pi), pos=(x + 3, y + 3),
                          color=(128, 128, 255), scale=1)
        if consist_score is not None:
            draw_text(debug_img, text="{:4f}".format(consist_score[i]),
                      pos=(15, 15), color=(0, 255, 0), scale=0.75)
        dst_subdir = os.path.join(args.dst_dir, "court/debug")
        os.makedirs(dst_subdir, exist_ok=True)
        cv2.imwrite(os.path.join(dst_subdir, name + ".jpeg"), debug_img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])

    writer_thread = threading.Thread(target=writer_loop, daemon=True)
    writer_thread.start()

    # --- device loop -------------------------------------------------------
    try:
        from tqdm import tqdm
        pbar = tqdm(total=n_data, desc="Processing", unit="img")
    except ImportError:
        pbar = None
    t_start = time.time()
    n_done = 0
    for batch in device_prefetch(iter(loader), depth=2,
                                 sharding=batch_sharding):
        preds = predict(bundle.variables, batch["image"])
        nv = batch["num_valid"]
        host: Dict[str, np.ndarray] = {"name": batch["name"][:nv]}
        if "segm_mask" in req_outputs and "segm_mask" in preds:
            host["segm_mask"] = np.asarray(preds["segm_mask"][:nv])
        elif "segm_mask" in req_outputs and "logits" in preds:
            host["segm_mask"] = preds_to_masks(
                np.asarray(preds["logits"][:nv]), args.mask_classes)
        if "warp_mask" in req_outputs and "warp_mask" in preds:
            host["warp_mask"] = np.asarray(preds["warp_mask"][:nv]).astype(np.uint8)
        if "theta" in req_outputs and "theta" in preds:
            host["theta"] = np.asarray(preds["theta"][:nv])
        if "consist_score" in preds:
            host["consist_score"] = np.asarray(preds["consist_score"][:nv])
        if "poi" in req_outputs and "poi" in preds:
            host["poi"] = np.asarray(preds["poi"][:nv])
        if keep_orig_img:
            host["orig_img"] = batch["orig_img"][:nv]
        if writer_state["error"] is not None:
            raise writer_state["error"]
        out_q.put(host)
        n_done += nv
        if pbar is not None:
            pbar.update(nv)

    if pbar is not None:
        pbar.close()
    out_q.put(None)
    writer_thread.join()
    if writer_state["error"] is not None:
        raise writer_state["error"]
    elapsed = time.time() - t_start
    logger.info("Processed {} frames in {:.2f}s ({:.1f} fps)".format(
        n_done, elapsed, n_done / max(elapsed, 1e-9)))

    # close writers + merge JSONL -> {game}_court.json (reference :399-407)
    for key in ("segm_pkl", "warp_pkl"):
        if writer_state[key] is not None:
            writer_state[key].close()
    if writer_state["json"] is not None:
        writer_state["json"].close()
    model_name = (os.path.basename(os.path.dirname(args.load))
                  if args.load else "uninitialized")
    court_json = os.path.join(args.dst_dir, "{}_court.json".format(game_name))
    if multihost and jax.process_count() > 1:
        # every host's parts are on disk; barrier, then host 0 merges
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("sfh_predict_writers_done")
        if jax.process_index() == 0:
            base = os.path.join(args.dst_dir,
                                "{}_court_processing.json".format(game_name))
            nproc = jax.process_count()
            _merge_jsonl_parts([base + ".h{}".format(p) for p in range(nproc)],
                               court_json, model_name)
            for postfix in ("court/segm_mask", "court/warp_mask"):
                pkl = os.path.join(args.dst_dir, postfix, "data.pkl")
                parts = [pkl + ".h{}".format(p) for p in range(nproc)
                         if os.path.exists(pkl + ".h{}".format(p))]
                if parts:        # a pickle stream concatenates losslessly
                    with open(pkl, "wb") as out:
                        for part in parts:
                            with open(part, "rb") as f:
                                out.write(f.read())
                            os.remove(part)
    elif writer_state["json"] is not None or (resume and
                                              os.path.exists(json_path)):
        # the resume clause covers a resumed run with nothing left to do:
        # the part from the interrupted run still needs its final merge
        _merge_jsonl_parts([json_path], court_json, model_name)

    print("Processing completed!")


def main():
    process()


if __name__ == "__main__":
    main()
