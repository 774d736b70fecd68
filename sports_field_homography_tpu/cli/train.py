"""Training CLI (capability twin of reference ``train.py:328-481``).

Same flags/YAML config surface; adds ``--num_devices`` for multi-chip data
parallelism over a jax Mesh.  SIGTERM / Ctrl-C save an interrupt
``last.msgpack`` checkpoint like the reference's ``last.pth``.
"""
from __future__ import annotations

import os
import signal
import sys
from shutil import copyfile

import jax

from ..data.dataset import BasicDataset, split_on_train_val
from ..data.loader import Loader
from ..train.loop import LossConfig, train_net
from ..utils.checkpoint import save_checkpoint, save_train_state
from ..utils.config import get_training_args, parse_config, replace_args
from ..utils.logger import get_logger
from .engine import build_model

__all__ = ["main", "prepare_dataloader"]


def prepare_dataloader(img_dir, mask_dir, anno_dir, anno_keys, val_names,
                       mask_classes, use_uv, batch_size, target_size, aug,
                       only_ncaam, shard=None, uint8_inputs=None,
                       data_seed=0, tail="pad"):
    """Train/val loaders (reference ``train.py:25-40``).

    ``shard``: (host_index, host_count) for multi-host training — each
    host decodes only its slice of every (global) train batch; validation
    stays unsharded (every host evaluates the full set identically, so
    the plateau scheduler steps in lockstep).

    ``uint8_inputs``: ship frames as uint8 and normalize on device (4x
    less H2D traffic).  Default (None): on exactly when it is lossless —
    no augmentation (u8/255 on device is bit-identical to the host /255
    float path); with augmentation it quantizes the augmented float image
    back to 8 bits, so it is opt-in (pass 1 to force).

    ``tail``: 'exact' yields the true smaller tail train batch (reference
    DataLoader semantics, ``train.py:33-36`` — correct losses AND correct
    train-mode BN statistics; one extra XLA program for the tail shape);
    'pad' keeps the static padded batch — the losses AND the train-mode
    BN batch moments mask the replicas (train/loop.make_loss_fn with
    masked_bn; the tail dispatches to a separate compiled program), so
    both modes are reference-exact."""
    train_ids, val_ids = split_on_train_val(img_dir, val_names,
                                            only_ncaam=only_ncaam)
    train_u8 = bool(uint8_inputs) if uint8_inputs is not None else aug is None
    val_u8 = bool(uint8_inputs) if uint8_inputs is not None else True
    train = BasicDataset(train_ids, img_dir, mask_dir, anno_dir, anno_keys,
                         mask_classes, use_uv, target_size, aug=aug,
                         raw_uint8=train_u8, aug_seed=data_seed)
    val = BasicDataset(val_ids, img_dir, mask_dir, anno_dir, anno_keys,
                       mask_classes, use_uv, target_size, raw_uint8=val_u8)
    # seeded by default: per-epoch orders derive from (seed, epoch) —
    # reproducible runs + exact mid-epoch resume; sharded hosts also need
    # it to agree on the index order.  data_seed=None opts out (legacy
    # nondeterministic shuffle).
    assert not (shard and data_seed is None), \
        "sharded training requires a data seed"
    train_loader = Loader(train, batch_size, shuffle=True, num_workers=8,
                          drop_last=False, pad_last=(tail != "exact"),
                          seed=data_seed, shard=shard)
    # keep the ragged tail: eval means over the `valid` mask, so padded
    # tail batches score exactly like the reference's variable-size tail
    val_loader = Loader(val, batch_size, shuffle=False, num_workers=8,
                        drop_last=False, pad_last=True)
    return train_loader, len(train), val_loader, len(val)


def main(argv=None):
    args = get_training_args(argv=argv)
    if args.conf_path is not None:
        conf = parse_config(args.conf_path)
        args = replace_args(args, conf)

    # multi-host runtime must come up before any backend use
    multihost = False
    if (getattr(args, "num_hosts", None) or
            getattr(args, "coordinator", None)):
        from ..parallel.distributed import initialize_distributed
        multihost = initialize_distributed(args.coordinator, args.num_hosts,
                                           args.host_id)
        if multihost:
            print(f"jax.distributed up: process {jax.process_index()} of "
                  f"{jax.process_count()}, {len(jax.devices())} global devices")

    if not os.path.exists(args.cp_dir):
        os.makedirs(args.cp_dir)
    log_path = os.path.join(os.path.dirname(args.cp_dir.rstrip("/")), "train.txt")
    logger = get_logger(log_path, format="%(message)s")

    if jax.default_backend() == "tpu" and args.batchsize % 8:
        # XLA pads the batch to the next sublane multiple inside every
        # level-1 op (measured: batch 26 and batch 32 cost the same
        # 425 ms/step; batch 24 runs 316 ms) — see BASELINE.md
        next_down = args.batchsize - args.batchsize % 8
        logger.info(
            f"NOTE: batch size {args.batchsize} is not a multiple of 8; on "
            f"TPU it computes like batch {args.batchsize + 8 - args.batchsize % 8} "
            f"(sublane padding). Batch {next_down or 8} or "
            f"{args.batchsize + 8 - args.batchsize % 8} trains strictly faster "
            f"per image.")

    bundle = build_model(args, load=args.load, warp_with_nearest=False)
    model, variables = bundle.model, bundle.variables

    # warm-start the STN from converted torchvision weights if requested
    if args.resnet_pretrained and args.load is None:
        from ..compat.torch_import import (TORCHVISION_URLS,
                                           load_torch_checkpoint,
                                           load_torchvision_resnet)
        if (args.resnet_pretrained in TORCHVISION_URLS
                or args.resnet_pretrained.startswith(("http://", "https://"))):
            # variant name or URL -> torchvision weights via torch.hub
            pre = load_torchvision_resnet(args.resnet_pretrained)
        else:
            pre = load_torch_checkpoint(args.resnet_pretrained)
            if not pre["params"]:
                # raw torchvision ResNet weights from a local file
                pre = load_torchvision_resnet(args.resnet_pretrained)
        if pre["params"]:
            logger.info(f"ResNet warm-start from {args.resnet_pretrained}")
            for col in ("params", "batch_stats"):
                if "resnet_reg" in pre.get(col, {}):
                    dst = dict(variables[col])
                    merged = dict(dst["resnet_reg"])
                    for k, v in pre[col]["resnet_reg"].items():
                        if k in merged:
                            merged[k] = v
                    dst["resnet_reg"] = merged
                    variables[col] = dst

    logger.info(f"""# Reconstructor network overview:
            Target size:      {args.target_size}
            Court img path:   {args.court_img}
            Court PoI path:   {args.court_poi}
            Court img size:   {args.court_size}
            Use UNet:         {args.use_unet}
            UNet bilinear:    {args.unet_bilinear}
            UNet size:        {args.unet_size}
            Mask classes:     {args.mask_classes}
            UNet UV:          {args.unet_uv}
            Use ResNet:       {args.use_resnet}
            ResNet name:      {args.resnet_name}
            ResNet input:     {args.resnet_input}
            Use warper:       {args.use_warper}
            Warp size:        {args.warp_size}
        """)

    anno_keys = args.anno_keys
    if isinstance(anno_keys, str):
        anno_keys = [k.strip() for k in anno_keys.split(",")]
    val_names = args.val_names
    if isinstance(val_names, str):
        val_names = [v.strip() for v in val_names.split(",")]

    grad_accum = int(getattr(args, "grad_accum", 1) or 1)

    # tail default: true ragged tail batch on a single device (reference
    # semantics exactly); padded+loss-masked whenever uniform shapes are
    # structurally required (sharding / grad accumulation)
    needs_pad = (multihost or grad_accum > 1
                 or (args.num_devices is not None and args.num_devices > 1))
    tail = getattr(args, "tail", None) or ("pad" if needs_pad else "exact")
    if tail == "exact" and needs_pad:
        logger.info("NOTE: --tail exact is incompatible with sharded/"
                    "accumulated training (uniform shapes required); "
                    "using 'pad' (losses and BN moments mask the "
                    "replicas).")
        tail = "pad"

    train_loader, n_train, val_loader, n_val = prepare_dataloader(
        img_dir=args.img_dir, mask_dir=args.mask_dir, anno_dir=args.anno_dir,
        anno_keys=anno_keys, val_names=val_names or [],
        mask_classes=args.mask_classes, use_uv=args.unet_uv,
        batch_size=args.batchsize, target_size=args.target_size,
        aug=args.aug, only_ncaam=args.only_ncaam,
        shard=((jax.process_index(), jax.process_count())
               if multihost else None),
        uint8_inputs=getattr(args, "uint8_inputs", None),
        data_seed=(None if getattr(args, "data_seed", 0) in (None, -1)
                   else int(getattr(args, "data_seed", 0))),
        tail=tail)
    logger.info(f"Dataset: train={n_train} val={n_val} aug={args.aug}")

    if args.conf_path is not None:
        copyfile(args.conf_path, os.path.join(args.cp_dir, "conf.yaml"))

    # disable losses for missing submodules (reference train.py:428-434)
    if args.use_unet is False:
        args.seg_loss = None
        args.consist_loss = None
    if args.use_resnet is False:
        args.rec_loss = None
        args.reproj_loss = None
        args.consist_loss = None

    if args.use_resnet and args.rec_loss and not args.reproj_loss:
        # theta supervised only by the warp MSE has a degenerate optimum
        # (homography off-template -> zero gradient, constant loss); the
        # reference's production conf always sets reproj_loss: RRMSE
        # (conf/train_reconstructor.yaml.example:37).  Same default as the
        # reference (utils/config.py:124) — this is a heads-up, not a change.
        logger.info("NOTE: reproj_loss is disabled; the homography head is "
                    "supervised only by rec_loss, which cannot recover from "
                    "off-template warps. Set reproj_loss (e.g. RRMSE) for "
                    "stable theta training.")

    loss_cfg = LossConfig(
        seg_loss=args.seg_loss, rec_loss=args.rec_loss,
        reproj_loss=args.reproj_loss, consist_loss=args.consist_loss,
        uv_loss=args.uv_loss, seg_lambda=args.seg_lambda,
        rec_lambda=args.rec_lambda, reproj_lambda=args.reproj_lambda,
        consist_lambda=args.consist_lambda, uv_lambda=args.uv_lambda,
        consist_start_iter=args.consist_start_iter,
        batch_size=args.batchsize,
        weight_semantics=getattr(args, "weight_semantics", "ref") or "ref")

    state_holder = {"state": None}

    def save_model(a1=None, a2=None):
        if state_holder["state"] is not None:
            s = state_holder["state"]
            path = os.path.join(args.cp_dir, "last.msgpack")
            try:
                save_checkpoint(path, {"params": s["params"],
                                       "batch_stats": s["batch_stats"]})
                # full train state (opt_state + step) for true resume
                save_train_state(
                    os.path.join(args.cp_dir, "last_state.msgpack"), s)
                if state_holder.get("sched") is not None:
                    # data-schedule position: --resume replays the interrupted
                    # epoch's exact order and skips the consumed steps
                    import json
                    with open(os.path.join(args.cp_dir,
                                           "last_state.sched.json"), "w") as f:
                        json.dump(state_holder["sched"], f)
                logger.info("Saved interrupt to {}".format(path))
            except RuntimeError as e:
                # the train step donates the input state's buffers
                # (train/loop.py), so a state captured while a step is in
                # flight is unrecoverable from this frame.  The deferred
                # signal path below avoids this window; this fallback only
                # fires for a raw KeyboardInterrupt raised mid-dispatch.
                logger.warning(
                    "Interrupt save skipped: params were donated to an "
                    "in-flight step ({}). Resume from the newest epoch "
                    "checkpoint in {} instead.".format(e, args.cp_dir))
        sys.exit(0)

    def request_interrupt(signum=None, frame=None):
        """SIGTERM/SIGINT: defer the save to the train loop's next safe
        point.  The jitted step donates the input state's device buffers
        (train/loop.py donate_argnums), so while a step is in flight —
        i.e. most of the wall time — every state the handler can reach is
        already deleted and serializing it would crash the run with
        'Array has been deleted' instead of saving.  Setting a flag and
        returning lets the in-flight step finish; the loop then saves the
        fresh (live) state and exits 0.  A second signal force-exits."""
        if state_holder.get("interrupt"):
            logger.warning("Second interrupt: exiting without a save.")
            os._exit(1)
        if state_holder["state"] is None:      # nothing trained yet
            sys.exit(0)
        state_holder["interrupt"] = True
        state_holder["save_and_exit"] = save_model
        logger.info("Interrupt requested: finishing the in-flight step, "
                    "then saving the interrupt checkpoint...")

    prev_term = signal.signal(signal.SIGTERM, request_interrupt)
    prev_int = signal.signal(signal.SIGINT, request_interrupt)

    if grad_accum > 1:
        logger.info(f"Gradient accumulation: {grad_accum} micro-batches "
                    f"per optimizer step (effective batch "
                    f"{grad_accum * args.batchsize})")

    mesh = None
    if multihost:
        from ..parallel.distributed import global_mesh
        from ..parallel.mesh import check_batch_divisible
        mesh = global_mesh()
        check_batch_divisible(args.batchsize, mesh.devices.size)
        logger.info(f"Multi-host data-parallel mesh: {mesh}")
    elif args.num_devices is not None and args.num_devices > 1:
        from ..parallel.mesh import check_batch_divisible, make_mesh
        check_batch_divisible(args.batchsize, args.num_devices)
        mesh = make_mesh(args.num_devices)
        logger.info(f"Data-parallel mesh: {mesh}")

    class _TrackingLoader:
        """Filters batches to arrays + exposes state for SIGTERM saves."""

        def __init__(self, loader):
            self.loader = loader

        def set_epoch(self, epoch):
            if hasattr(self.loader, "set_epoch"):
                self.loader.set_epoch(epoch)

        def skip_next_batches(self, k):
            if hasattr(self.loader, "skip_next_batches"):
                self.loader.skip_next_batches(k)

        def __iter__(self):
            import numpy as np
            for batch in self.loader:
                # keep 'valid': the eval step means over it so padded tail
                # batches score exactly (train loss ignores it)
                yield {k: v for k, v in batch.items()
                       if isinstance(v, np.ndarray)}

    # exact mid-epoch resume: if the interrupt handler saved a data-
    # schedule position next to the state, replay the interrupted epoch
    # from that point (requires the seeded loader — the default)
    resume_sched = None
    if args.resume and getattr(args, "data_seed", 0) not in (None, -1):
        sched_path = os.path.join(args.cp_dir, "last_state.sched.json")
        if os.path.exists(sched_path):
            import json
            with open(sched_path) as f:
                resume_sched = json.load(f)
    elif args.resume:
        # --data_seed -1: legacy nondeterministic schedule — the resumed
        # run restores the train state but CANNOT replay the interrupted
        # epoch's order, so interrupted+resumed is not bit-identical to an
        # uninterrupted run (docs/PARITY.md); warn instead of surprising
        logger.warning(
            "resuming a --data_seed -1 run: the data schedule is "
            "nondeterministic, so this resume continues with a FRESH "
            "shuffle order (not bit-exact vs an uninterrupted run). Use a "
            "seeded --data_seed for exact mid-epoch resume.")

    try:
        state = train_net(
            model=model, variables=variables, court_img=bundle.court_img,
            court_poi=bundle.court_poi,
            train_loader=_TrackingLoader(train_loader), n_train=n_train,
            val_loader=_TrackingLoader(val_loader) if n_val else None,
            batch_size=args.batchsize, val_step_n=args.val_step_n,
            loss_cfg=loss_cfg, opt=args.opt, epochs=args.epochs, lr=args.lr,
            w_decay=args.weight_decay, target_size=args.target_size,
            cp_dir=args.cp_dir, log_dir=args.log_dir, logger=logger,
            vizualize=args.viz, mesh=mesh, state_holder=state_holder,
            resume_state_path=(os.path.join(args.cp_dir, "last_state.msgpack")
                               if args.resume else None),
            async_ckpt=getattr(args, "async_ckpt", False),
            grad_accum=grad_accum, resume_sched=resume_sched)
        return state
    except KeyboardInterrupt:
        # only reachable if KeyboardInterrupt is raised by other means than
        # SIGINT (the handler above defers those); save_model tolerates a
        # donated mid-step state
        save_model()
        try:
            sys.exit(0)
        except SystemExit:
            os._exit(0)
    finally:
        # in-process callers (tests) must not keep the handlers installed
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)


if __name__ == "__main__":
    main()
