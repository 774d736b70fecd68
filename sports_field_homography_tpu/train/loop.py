"""Training loop: jitted multi-loss step + host orchestration.

Capability twin of reference ``train_net`` (``train.py:43-325``) with the
TPU shape: one jitted ``train_step`` computes the forward, all enabled
losses, gradients, value-clipped optimizer update and BN running-stat
updates in a single XLA program.  Loss selection is static (compiled in);
the consistency-loss warmup gate (``consist_start_iter``) is a cheap
runtime multiplier so it doesn't retrigger compilation.

Data parallelism: when ``mesh`` is provided the step is wrapped with
``shard_map`` over a 1-D ``data`` axis — batch sharded across chips,
gradients/metrics all-reduced over ICI with ``psum`` (the TPU-native
replacement for the reference's absent torch.distributed).
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.losses import (
    cross_entropy_map,
    focal_loss_map,
    mse_map,
    per_sample_weighted,
    reprojection_loss,
    smooth_l1_map,
)
from ..utils.checkpoint import save_checkpoint
from .evaluate import eval_reconstructor, make_eval_step, norm_img
from .optim import ReduceLROnPlateau, current_learning_rate, make_optimizer, set_learning_rate

__all__ = ["TrainState", "LossConfig", "make_loss_fn", "make_train_step",
           "train_net"]


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss selection + lambdas (reference ``train.py:100-144``)."""

    seg_loss: Optional[str] = "CE"          # CE | focal | None
    rec_loss: Optional[str] = "MSE"         # MSE | SmoothL1 | None
    reproj_loss: Optional[str] = None       # RRMSE | None
    consist_loss: Optional[str] = None      # CE | focal | None
    uv_loss: Optional[str] = None           # MSE | SmoothL1 | None
    seg_lambda: float = 2.0
    rec_lambda: float = 2.0
    reproj_lambda: float = 8.0
    consist_lambda: float = 1.0
    uv_lambda: float = 2.0
    consist_start_iter: int = 0
    batch_size: int = 8
    # "ref": reference-exact per-sample weighting.  The reference's
    # ``per_sample_weighted_criterion`` (models/losses.py:33-40) multiplies
    # a (B,) per-sample loss by the (B,1) weight column, which broadcasts
    # to the (B,B) OUTER product — so for the seg and rec losses the scalar
    # is mean(per-sample loss) * mean(weights): the annotation-quality
    # weights DECOUPLE from their samples and only scale the loss by the
    # batch-mean weight.  The UV loss map is 4-D in torch (NCHW), its
    # (B,W)*(B,1) broadcast aligns, so UV weighting IS truly per-sample.
    # "sample": the evidently-intended semantics — every loss weighted
    # per-sample (mean(w_i * l_i)).
    weight_semantics: str = "ref"


class TrainState(dict):
    """Lightweight pytree train state (dict-backed for easy serialization)."""


def init_train_state(variables, optimizer) -> Dict[str, Any]:
    return {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt_state": optimizer.init(variables["params"]),
        "step": jnp.zeros((), jnp.int32),
    }


def _elementwise(loss_name):
    return {"MSE": mse_map, "SmoothL1": smooth_l1_map}[loss_name]


def make_loss_fn(model, loss_cfg: LossConfig, axis_name: Optional[str] = None,
                 masked_bn: bool = False):
    """The multi-loss objective shared by the train step and the
    gradient-histogram probe (reference loss builders ``train.py:100-144``).

    Signature: ``loss_fn(params, batch_stats, batch, step_no, court_img,
    court_poi, warp_table) -> (total, (new_batch_stats, logs))``.

    Tail-batch correction: when the batch carries a ``valid`` mask (the
    loader pads the last batch to the static shape with replicas), every
    loss mean counts ONLY real samples, matching the reference DataLoader's
    smaller true-mean tail batch (``train.py:33-36``): padded samples are
    zero-weighted and the mean is rescaled by ``B*shards/num_valid_global``
    so the psum/pmean over data-parallel shards reproduces the global
    true-sample mean even when the padding is unevenly sharded.  With no
    padding the scale is exactly 1.0, so full batches are bit-identical to
    the unmasked computation.

    ``masked_bn=True`` additionally valid-weights the train-mode BatchNorm
    batch moments (``models/layers.batch_norm_apply``), making the padded
    tail step fully reference-exact INCLUDING batch statistics.  It is a
    separate compiled variant (not a runtime branch) because the weighted
    moments change XLA's reduction codegen, which perturbs full batches by
    ~1 ulp — ``train_net`` dispatches full batches to the unmasked program
    (bit-identical to no-mask behavior by construction) and batches that
    actually contain padding to this one.  The opt-in Pallas fused kernels
    (``conv_kernel=pallas`` / ``fused_bn``) compute unmasked moments, so
    under ``masked_bn`` they fall back to the XLA conv/BN path
    (models/unet.py, models/layers.py).
    """
    num_classes = model.config.mask_classes

    def loss_fn(params, batch_stats, batch, step_no, court_img, court_poi,
                warp_table):
        variables = {"params": params, "batch_stats": batch_stats}
        # uint8 frames ship 4x less over the host->device link; u8/255 on
        # device is bit-identical to the host-side /255 float path
        img = norm_img(batch["image"])
        bn_valid = (batch["valid"] if masked_bn and "valid" in batch
                    else None)
        preds, mutated = model.apply(variables, img, court_img,
                                     court_poi, train=True,
                                     warp_table=warp_table,
                                     bn_valid=bn_valid,
                                     mutable=["batch_stats"])
        logs = {}
        total = jnp.zeros((), jnp.float32)

        valid = batch.get("valid")
        if valid is None:
            vmask = jnp.ones((img.shape[0],), jnp.float32)
        else:
            vmask = valid.astype(jnp.float32)
        local_n = jnp.sum(vmask)
        if axis_name is not None:
            shards = jax.lax.psum(1, axis_name)
            total_n = jax.lax.psum(local_n, axis_name)
        else:
            shards = 1
            total_n = local_n
        scale = img.shape[0] * shards / total_n
        w_raw = batch["weight"].reshape(-1).astype(jnp.float32)
        coupled_w = w_raw * vmask * scale
        if loss_cfg.weight_semantics == "ref":
            # decoupled reference weighting for seg/rec (see LossConfig):
            # value = global-masked-mean(per-sample loss) * wbar.  wbar has
            # no parameter dependence, so the per-shard S-scaled masked
            # mean keeps both the pmean'd VALUE and the pmean'd GRADIENTS
            # exactly equal to the reference's global computation.
            sw = jnp.sum(w_raw * vmask)
            if axis_name is not None:
                sw = jax.lax.psum(sw, axis_name)
            wbar = sw / total_n
            seg_rec_w = vmask * scale
        else:
            wbar = jnp.ones((), jnp.float32)
            seg_rec_w = coupled_w

        if loss_cfg.seg_loss is not None:
            m = (cross_entropy_map if loss_cfg.seg_loss == "CE"
                 else focal_loss_map)(preds["logits"],
                                      batch["mask"].astype(jnp.int32))
            seg = (per_sample_weighted(m, seg_rec_w) * wbar
                   * loss_cfg.seg_lambda)
            total += seg
            logs["Seg_loss"] = seg

        if loss_cfg.rec_loss is not None:
            gt_f = batch["mask"].astype(jnp.float32) / float(num_classes)
            m = _elementwise(loss_cfg.rec_loss)(preds["warp_mask"], gt_f)
            rec = (per_sample_weighted(m, seg_rec_w) * wbar
                   * loss_cfg.rec_lambda)
            total += rec
            logs["Rec_loss"] = rec

        if loss_cfg.uv_loss is not None and model.config.unet_uv:
            # the UV loss is truly per-sample in the reference too (its 4-D
            # NCHW map broadcasts aligned) — coupled in both modes
            m = _elementwise(loss_cfg.uv_loss)(preds["uv"], batch["uv"])
            uvl = per_sample_weighted(m, coupled_w) * loss_cfg.uv_lambda
            total += uvl
            logs["UV_loss"] = uvl

        if loss_cfg.reproj_loss is not None:
            rl_per = reprojection_loss(
                preds["poi"], batch["poi"].astype(jnp.float32),
                batch["nonzeros"].astype(jnp.float32),
                batch["num_nonzero"].astype(jnp.float32),
                reduction="none")
            rl = jnp.mean(rl_per * vmask) * scale * loss_cfg.reproj_lambda
            total += rl
            logs["Reproj_loss"] = rl

        if loss_cfg.consist_loss is not None:
            labels = (preds["warp_mask"] * num_classes).astype(jnp.int32)
            m = (cross_entropy_map if loss_cfg.consist_loss == "CE"
                 else focal_loss_map)(preds["logits"], labels)
            # warmup gate (reference train.py:219-220), runtime multiplier
            gate = (step_no * loss_cfg.batch_size
                    >= loss_cfg.consist_start_iter).astype(jnp.float32)
            m = m * vmask[:, None, None]
            cl = jnp.mean(m) * scale * loss_cfg.consist_lambda * gate
            total += cl
            logs["Cons_loss"] = cl

        logs["Tot_loss"] = total
        return total, (mutated["batch_stats"], logs)

    return loss_fn


def make_train_step(model, optimizer, loss_cfg: LossConfig,
                    axis_name: Optional[str] = None,
                    with_grads: bool = False, grad_accum: int = 1,
                    masked_bn: bool = False):
    """Build the jitted (or shard_map-able) train step.

    Returns ``step(state, batch, court_img, court_poi) -> (state, logs)``
    where logs mirrors the reference's TB scalars.  The court constants are
    arguments, not closures: jit closure constants get re-uploaded per
    dispatch on tunneled TPU runtimes (29 MB template = 78 ms/step).

    ``with_grads``: also return the (pre-update, post-clip-free) gradients
    — ``step(...) -> (state, logs, grads)`` — for the TB gradient
    histograms the reference reads off ``.grad`` after ``backward()``
    (``train.py:246-250``).  This is a second compiled variant used only on
    validation steps, so histogram steps cost ONE backward like every
    other step instead of a separate jitted grad probe's extra backward.

    ``grad_accum=K``: gradient accumulation — the batch leaves carry a
    leading micro-batch axis ``(K, B, ...)``; a ``lax.scan`` runs K
    backward passes (activation memory of ONE micro-batch at a time),
    averages the K gradients and applies ONE optimizer update.  The
    optimization step then sees an effective batch of K*B while HBM holds
    B-sized activations — the TPU-idiomatic route to reference-scale
    batches on small chips (the reference has no equivalent; torch users
    hand-roll loss/K backward loops).  BN train-mode normalization uses
    per-micro-batch statistics (exactly K plain steps' behavior); running
    stats thread through the scan sequentially.  Logs are the K-mean.

    ``masked_bn``: build the masked-BN-moment variant of the loss (see
    ``make_loss_fn``) — used by ``train_net`` only for batches that
    actually contain tail padding.
    """
    loss_fn = make_loss_fn(model, loss_cfg, axis_name=axis_name,
                           masked_bn=masked_bn)

    def step(state, batch, court_img, court_poi, warp_table=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (_, (new_bs, logs)), grads = grad_fn(
                state["params"], state["batch_stats"], batch, state["step"],
                court_img, court_poi, warp_table)
        else:
            def micro(carry, micro_batch):
                acc, bs = carry
                (_, (bs, lg)), g = grad_fn(
                    state["params"], bs, micro_batch, state["step"],
                    court_img, court_poi, warp_table)
                return (jax.tree.map(jnp.add, acc, g), bs), lg

            zeros = jax.tree.map(jnp.zeros_like, state["params"])
            (grads, new_bs), log_seq = jax.lax.scan(
                micro, (zeros, state["batch_stats"]), batch)
            grads = jax.tree.map(lambda g: g / grad_accum, grads)
            logs = jax.tree.map(lambda a: a.mean(0), log_seq)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            logs = jax.lax.pmean(logs, axis_name)
            new_bs = jax.lax.pmean(new_bs, axis_name)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "batch_stats": new_bs,
                     "opt_state": opt_state, "step": state["step"] + 1}
        if with_grads:
            return new_state, logs, grads
        return new_state, logs

    return step


def _accumulation_groups(loader, k: int):
    """Stack every ``k`` consecutive loader batches into one ``(k, B, ...)``
    super-batch for the grad-accumulation scan.  A tail group smaller than
    ``k`` is dropped (a partial group would change the effective batch of
    its optimizer step; the epoch boundary shift is logged by the caller).
    """
    group = []
    for batch in loader:
        group.append(batch)
        if len(group) == k:
            yield {key: np.stack([g[key] for g in group])
                   for key in group[0]}
            group = []


def train_net(model, variables, court_img, court_poi, train_loader, n_train,
              val_loader, batch_size, val_step_n, loss_cfg: LossConfig,
              opt="RMSprop", epochs=5, lr=1e-4, w_decay=1e-8,
              target_size=(1280, 720), cp_dir=None, log_dir=None, logger=None,
              vizualize=False, mesh=None, state_holder=None,
              resume_state_path=None, async_ckpt=False, grad_accum=1,
              resume_sched=None):
    """Host-side training orchestration (reference ``train_net``).

    ``async_ckpt``: write epoch checkpoints through an orbax
    ``AsyncSaver`` (CP_epoch{n}.orbax directories) so serialization
    overlaps the next epoch's compute; the saver is joined before return.

    ``grad_accum=K``: accumulate gradients over K loader batches per
    optimizer step (see ``make_train_step``); ``val_step_n`` counts
    optimizer steps either way.

    ``resume_sched``: ``{"epoch": e, "opt_steps_done": k}`` — the data-
    schedule position of an interrupted run (cli/train.py saves it next
    to ``last_state.msgpack`` on SIGTERM/Ctrl-C).  Training continues
    EXACTLY where it stopped: epoch ``e`` is replayed with its derived
    ``(seed, epoch)`` order (``Loader.set_epoch``), the ``k`` consumed
    optimizer steps' batches are skipped undecoded, and the run finishes
    the ORIGINAL ``epochs`` plan — interrupted+resumed is bit-identical
    to an uninterrupted run (tested).  Requires a seeded loader; without
    ``resume_sched`` the legacy behavior stands (resume trains ``epochs``
    more epochs from a fresh schedule).
    """
    import logging
    if logger is None:
        logger = logging

    val_step_n = val_step_n if val_step_n is not None else int(n_train / batch_size) + 1

    logger.info(f"""# Starting training:
            Optimizer:       {opt}
            Epochs:          {epochs}
            Val step:        {val_step_n}
            Batch size:      {batch_size}
            Learning rate:   {lr}
            Weight decay:    {w_decay}
            Losses:          seg={loss_cfg.seg_loss} rec={loss_cfg.rec_loss} \
reproj={loss_cfg.reproj_loss} consist={loss_cfg.consist_loss} uv={loss_cfg.uv_loss}
            Lambdas:         seg={loss_cfg.seg_lambda} rec={loss_cfg.rec_lambda} \
reproj={loss_cfg.reproj_lambda} consist={loss_cfg.consist_lambda} uv={loss_cfg.uv_lambda}
            Cons start iter: {loss_cfg.consist_start_iter}
            Checkpoints dir: {cp_dir}
            Log dir:         {log_dir}
            Devices:         {jax.devices()}
    """)

    writer = None
    if log_dir is not None:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            logger.info("tensorboardX unavailable; TB logging disabled")

    optimizer = make_optimizer(opt, lr, w_decay, grad_clip_value=0.1)
    state = init_train_state(variables, optimizer)
    if resume_state_path is not None and os.path.exists(resume_state_path):
        from ..utils.checkpoint import load_train_state
        state = load_train_state(resume_state_path, state)
        logger.info(f"Resumed full train state from {resume_state_path} "
                    f"(step {int(state['step'])})")
    scheduler = ReduceLROnPlateau(lr, patience=3)

    warp_table = None
    if model.config.use_warper and not model.config.warp_with_nearest:
        try:
            from ..ops.interval_warp import build_interval_table
            warp_table = build_interval_table(np.asarray(court_img))
        except (ValueError, AssertionError) as e:
            logger.info(f"interval warp unavailable for training ({e})")
    court_img = jax.device_put(court_img)
    court_poi = jax.device_put(court_poi)
    if mesh is not None:
        # cross-replica BN: per-shard batch stats pmean-reduced over 'data'
        dp_model = model.clone(bn_axis_name="data")

    # Step variants, built lazily and cached by (with_grads, masked_bn):
    #   * with_grads — used only on validation steps for TB grad histograms
    #     (one backward per step either way; the reference reads the
    #     already-computed .grad, train.py:246-250);
    #   * masked_bn — reference-exact BN moments, dispatched ONLY to
    #     batches that actually contain tail padding so the full-batch hot
    #     path keeps its bit-identical unmasked program (make_loss_fn).
    def _build_step(with_grads: bool, masked_bn: bool):
        """One compiled step variant.  ``masked_bn`` variants (tail batches
        with actual padding; reference-exact BN moments, make_loss_fn) only
        compile when such a batch is first seen."""
        if mesh is not None:
            from ..parallel.mesh import shard_train_step
            # with grad_accum the batch leaves are (K, B, ...): shard axis 1
            return shard_train_step(
                make_train_step(dp_model, optimizer, loss_cfg,
                                axis_name="data", with_grads=with_grads,
                                grad_accum=grad_accum, masked_bn=masked_bn),
                mesh, n_outputs=3 if with_grads else 2,
                batch_axis=0 if grad_accum == 1 else 1)
        # donate the input state: params/opt-state buffers are reused
        # in place instead of copied every step (~400 MB of f32 state);
        # the loop always rebinds `state` to the step's output, and the
        # SIGTERM holder stores that new (live) state
        return jax.jit(make_train_step(model, optimizer, loss_cfg,
                                       with_grads=with_grads,
                                       grad_accum=grad_accum,
                                       masked_bn=masked_bn),
                       donate_argnums=(0,))

    step_cache = {}

    def get_step(with_grads: bool, masked_bn: bool):
        key = (with_grads, masked_bn)
        if key not in step_cache:
            step_cache[key] = _build_step(with_grads, masked_bn)
        return step_cache[key]

    eval_step = make_eval_step(model, court_img, court_poi, target_size, True)

    try:
        from tqdm import tqdm
    except ImportError:
        tqdm = None

    global_step = int(state["step"])
    saver = None                      # lazy AsyncSaver when async_ckpt

    def _interrupt_check():
        # deferred SIGTERM/SIGINT save (cli/train.py request_interrupt):
        # only between steps is the state guaranteed live — the jitted
        # step donates its input buffers, so a mid-step save would find
        # deleted arrays.  save_and_exit saves last_state + exits 0.
        if state_holder is not None and state_holder.get("interrupt"):
            cb = state_holder.get("save_and_exit")
            if cb is not None:
                if saver is not None:
                    saver.wait()     # flush pending async epoch ckpts
                cb()

    # exact mid-epoch resume: position the epoch loop + data schedule at
    # the interrupted run's exact point (see docstring)
    batches_per_epoch = max(1, -(-n_train // batch_size))   # pad_last ceil
    opt_steps_per_epoch = (batches_per_epoch // grad_accum if grad_accum > 1
                           else batches_per_epoch)
    start_epoch, resume_skip = 0, 0
    if resume_sched:
        start_epoch = int(resume_sched.get("epoch", 0))
        resume_skip = int(resume_sched.get("opt_steps_done", 0))
        if resume_skip >= opt_steps_per_epoch:   # died at an epoch boundary
            start_epoch, resume_skip = start_epoch + 1, 0
        if not hasattr(train_loader, "set_epoch"):
            logger.info("resume_sched given but the loader has no "
                        "set_epoch; falling back to a fresh schedule")
            start_epoch, resume_skip = 0, 0
        elif start_epoch >= epochs:
            logger.info(f"Resumed run already finished its {epochs} "
                        "epochs; nothing to do (raise --epochs to train "
                        "further)")
        else:
            logger.info(f"Exact resume: epoch {start_epoch + 1}, skipping "
                        f"{resume_skip} consumed optimizer steps")

    for epoch in range(start_epoch, epochs):
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        skip_now = resume_skip if epoch == start_epoch else 0
        if skip_now and hasattr(train_loader, "skip_next_batches"):
            train_loader.skip_next_batches(skip_now * grad_accum)
        steps_in_epoch = skip_now
        epoch_loss = 0.0
        t0 = time.time()
        pbar = (tqdm(total=n_train, desc=f"Epoch {epoch + 1}/{epochs}",
                     unit="img",
                     initial=min(skip_now * grad_accum * batch_size, n_train))
                if tqdm is not None else None)
        epoch_batches = (train_loader if grad_accum == 1 else
                         _accumulation_groups(train_loader, grad_accum))
        for batch in epoch_batches:
            # padding presence decides the BN-moment program (see
            # get_step); checked on the HOST-LOCAL batch.  pad_global (the
            # loader's pre-shard flag) keeps multi-host processes agreeing
            # even when the padding lands on only some hosts' shards.
            pad_flag = batch.pop("pad_global", None)
            if pad_flag is not None:
                has_pad = bool(np.any(pad_flag))
            else:
                v = batch.get("valid")
                has_pad = v is not None and not bool(np.all(np.asarray(v)))
            if mesh is not None and jax.process_count() > 1:
                # multi-host: per-host loader shards -> global jax.Arrays
                # over the global mesh (parallel/distributed.py)
                from ..parallel.distributed import host_local_batch_to_global
                batch = host_local_batch_to_global(
                    batch, mesh, leading_accum=grad_accum > 1)
            # on validation steps run the with_grads step variant so the TB
            # grad histograms come from the SAME single backward that also
            # updates the params
            hist_grads = None
            want_grads = (writer is not None and val_loader is not None
                          and (global_step + 1) % val_step_n == 0)
            step = get_step(want_grads, has_pad)
            if want_grads:
                state, logs, hist_grads = step(
                    state, batch, court_img, court_poi, warp_table)
            else:
                state, logs = step(state, batch, court_img, court_poi,
                                   warp_table)
            global_step += 1
            steps_in_epoch += 1
            if state_holder is not None:   # expose for SIGTERM interrupt save
                state_holder["state"] = state
                # data-schedule position: written as last_state.sched.json
                # by the interrupt handler for exact mid-epoch resume
                state_holder["sched"] = {"epoch": epoch,
                                         "opt_steps_done": steps_in_epoch}
            _interrupt_check()
            if pbar is not None:
                img = batch["image"]
                n_imgs = (len(img) if grad_accum == 1
                          else img.shape[0] * img.shape[1])
                pbar.update(n_imgs)
                pbar.set_postfix(loss=float(logs["Tot_loss"]))

            if writer is not None:
                for k, v in logs.items():
                    tag = {"Seg_loss": "Loss/train seg", "Rec_loss": "Loss/train rec",
                           "UV_loss": "Loss/train uv", "Reproj_loss": "Loss/train reproj",
                           "Cons_loss": "Loss/train consistency",
                           "Tot_loss": "Loss/train"}[k]
                    writer.add_scalar(tag, float(v), global_step)
            epoch_loss += float(logs["Tot_loss"])

            if global_step % val_step_n == 0 and val_loader is not None:
                print("\nStarting validation...")
                if writer is not None:
                    for path, value in jax.tree_util.tree_flatten_with_path(
                            state["params"])[0]:
                        t = "/".join(str(getattr(p, "key", p)) for p in path)
                        writer.add_histogram("weights/" + t, np.asarray(value),
                                             global_step)
                    if hist_grads is not None:
                        for path, value in jax.tree_util.tree_flatten_with_path(
                                hist_grads)[0]:
                            t = "/".join(str(getattr(p, "key", p)) for p in path)
                            writer.add_histogram("grads/" + t,
                                                 np.asarray(value), global_step)
                result = eval_reconstructor(
                    model, {"params": state["params"],
                            "batch_stats": state["batch_stats"]},
                    val_loader, court_img, court_poi, target_size,
                    use_per_sample_weights=True, eval_step=eval_step)
                val_tot = (result["val_seg_score"] + result["val_rec_score"]
                           + result["val_reproj_score"]
                           + result["val_consist_score"] + result["val_uv_score"])
                new_lr = scheduler.step(result["val_reproj_px"])
                # compare at f32: the injected hyperparam lives on device in
                # f32, so a python-float != comparison fires spuriously
                if np.float32(new_lr) != np.float32(
                        current_learning_rate(state["opt_state"])):
                    state["opt_state"] = set_learning_rate(state["opt_state"], new_lr)
                    logger.info("Learning rate has been changed: {}".format(new_lr))
                if writer is not None:
                    writer.add_scalar("learning_rate", new_lr, global_step)
                    writer.add_scalar("Loss/test", val_tot, global_step)
                    writer.add_scalar("Loss/test_seg", result["val_seg_score"], global_step)
                    writer.add_scalar("Loss/test_rec", result["val_rec_score"], global_step)
                    writer.add_scalar("Loss/test_uv", result["val_uv_score"], global_step)
                    writer.add_scalar("Loss/test_reproj", result["val_reproj_px"], global_step)
                    writer.add_scalar("Loss/test_consist", result["val_consist_score"], global_step)
                logger.info(
                    "[Validation, epoch: {} of {}, step: {}] Tot: {}, seg: {}, "
                    "rec: {}, uv: {}, reproj: {}({:.3f})px, cons: {}".format(
                        epoch + 1, epochs, global_step, val_tot,
                        result["val_seg_score"], result["val_rec_score"],
                        result["val_uv_score"], result["val_reproj_score"],
                        result["val_reproj_px"], result["val_consist_score"]))
                if vizualize and writer is not None:
                    _tb_images(writer, result, model.config.mask_classes,
                               global_step)
                _interrupt_check()   # signal may have landed during eval

        if pbar is not None:
            pbar.close()
        logger.info("Epoch {} done in {:.1f}s, loss {:.4f}".format(
            epoch + 1, time.time() - t0, epoch_loss))

        if cp_dir is not None:
            os.makedirs(cp_dir, exist_ok=True)
            ck = {"params": state["params"],
                  "batch_stats": state["batch_stats"]}
            if async_ckpt:
                if saver is None:
                    from ..utils.checkpoint import AsyncSaver
                    saver = AsyncSaver()
                saver.save(os.path.join(cp_dir, f"CP_epoch{epoch + 1}.orbax"),
                           ck)
                logger.info(f"Checkpoint {epoch + 1} saving (async)...")
            else:
                path = os.path.join(cp_dir, f"CP_epoch{epoch + 1}.msgpack")
                save_checkpoint(path, ck)
                logger.info(f"Checkpoint {epoch + 1} saved !")
        _interrupt_check()           # signal during the epoch-end save

    if saver is not None:
        saver.wait()
        saver.close()
        logger.info("Async checkpoints flushed.")
    if writer is not None:
        writer.close()
    return state


def _tb_images(writer, result, num_classes, global_step):
    """Validation image panel (reference ``train.py:282-312``), NHWC->NCHW."""
    from ..utils.postprocess import preds_to_masks, onehot_to_image

    output = [np.transpose(result["imgs"], (0, 3, 1, 2))]
    if "logits" in result:
        pred_masks = preds_to_masks(result["logits"], num_classes)
        pred_masks = onehot_to_image(pred_masks, num_classes)[..., ::-1]
        output.append(np.transpose(pred_masks, (0, 3, 1, 2)).astype(np.float32) / 255.0)
    if "warp_masks" in result:
        warp = (result["warp_masks"] * num_classes).astype(np.uint8)
        warp = onehot_to_image(warp, num_classes)[..., ::-1]
        output.append(np.transpose(warp, (0, 3, 1, 2)).astype(np.float32) / 255.0)
    if "uv_masks" in result:
        uvm = np.transpose(result["uv_masks"], (0, 3, 1, 2)).astype(np.float32)
        z = np.zeros((uvm.shape[0], 1, uvm.shape[-2], uvm.shape[-1]), np.float32)
        output.append(np.concatenate((uvm, z), axis=1))
    writer.add_images("output", np.concatenate(output, axis=2), global_step)
