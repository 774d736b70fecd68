"""Validation metrics for the Reconstructor (reference ``eval.py:142-233``).

One jitted metric function computes every score for a batch; the host loop
accumulates.  Returned keys match the reference: val_seg_score,
val_rec_score, val_uv_score, val_reproj_score, val_reproj_px,
val_consist_score, plus last-batch tensors for visualization.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ..models.losses import (
    cross_entropy_map,
    mse_map,
    reprojection_loss,
)

__all__ = ["make_eval_step", "eval_reconstructor", "norm_img"]


def norm_img(img):
    """Device-side u8/255 normalization (no-op for float inputs)."""
    img = jnp.asarray(img)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    return img


def make_eval_step(model, court_img, court_poi, target_size,
                   use_per_sample_weights: bool = True,
                   weight_semantics: str = "ref"):
    """Build the jitted per-batch metric function.

    ``target_size`` is (W, H): reprojection px scales normalized [0,1]
    PoI coordinates by the frame size (reference ``eval.py:208-215``).

    ``weight_semantics``: "ref" reproduces the reference's
    ``per_sample_weighted_criterion`` outer-product broadcast exactly —
    seg/rec scores are mean(per-sample loss) * mean(weights) (weights
    decoupled from their samples), UV stays truly per-sample (see
    train/loop.LossConfig for the full analysis); "sample" weights every
    score per-sample.
    """
    tw, th = target_size
    mask_classes = model.config.mask_classes
    unet_uv = model.config.unet_uv

    court_img = jax.device_put(court_img)
    court_poi = jax.device_put(court_poi)
    warp_table = None
    if model.config.use_warper:
        try:
            from ..ops.interval_warp import build_interval_table
            warp_table = build_interval_table(np.asarray(court_img))
        except (ValueError, AssertionError):
            pass

    @jax.jit
    def _step(variables, batch, ci, cp, wt) -> Dict[str, jnp.ndarray]:
        preds = model.apply(variables, norm_img(batch["image"]), ci, cp,
                            train=False, warp_table=wt)
        out: Dict[str, jnp.ndarray] = {}
        logits = preds.get("logits")
        warp_masks = preds.get("warp_mask")
        uv = preds.get("uv")

        gt_masks_i = batch["mask"].astype(jnp.int32)
        gt_masks_f = gt_masks_i.astype(jnp.float32) / float(mask_classes)

        # tail batches are PADDED to the static batch size (data/loader);
        # metrics mean over the true samples only, so scores are exact for
        # any dataset size (reference semantics: variable tail batch,
        # ``eval.py:181-215``)
        if "valid" in batch:
            valid = batch["valid"].astype(jnp.float32)
        else:
            valid = jnp.ones((batch["image"].shape[0],), jnp.float32)
        nv = jnp.maximum(jnp.sum(valid), 1.0)

        def masked_mean(loss_map):
            per = jnp.mean(loss_map.astype(jnp.float32),
                           axis=tuple(range(1, loss_map.ndim)))
            return jnp.sum(per * valid) / nv

        if use_per_sample_weights:
            w = batch["weight"].reshape(-1).astype(jnp.float32)

            def weighted(loss_map):
                per = jnp.mean(loss_map.astype(jnp.float32),
                               axis=tuple(range(1, loss_map.ndim)))
                return jnp.sum(per * w * valid) / nv

            def decoupled(loss_map):
                # reference outer-product broadcast: mean(per) * mean(w)
                per = jnp.mean(loss_map.astype(jnp.float32),
                               axis=tuple(range(1, loss_map.ndim)))
                return (jnp.sum(per * valid) / nv) * (jnp.sum(w * valid) / nv)

            seg_rec = decoupled if weight_semantics == "ref" else weighted
            if logits is not None:
                out["seg"] = seg_rec(cross_entropy_map(logits, gt_masks_i))
            if warp_masks is not None:
                out["rec"] = seg_rec(mse_map(warp_masks, gt_masks_f))
            if uv is not None and unet_uv:
                out["uv"] = weighted(mse_map(uv, batch["uv"]))
        else:
            if logits is not None:
                out["seg"] = masked_mean(cross_entropy_map(logits, gt_masks_i))
            if warp_masks is not None:
                out["rec"] = masked_mean(mse_map(warp_masks, gt_masks_f))
            if uv is not None and unet_uv:
                out["uv"] = masked_mean(mse_map(uv, batch["uv"]))

        if logits is not None and warp_masks is not None:
            warp_i = (warp_masks * mask_classes).astype(jnp.int32)
            out["consist"] = masked_mean(cross_entropy_map(logits, warp_i))

        if "poi" in preds and "poi" in batch:
            poi = preds["poi"]
            gt_poi = batch["poi"].astype(jnp.float32)
            nz = batch["nonzeros"].astype(jnp.float32)
            nn = batch["num_nonzero"].astype(jnp.float32)
            per = reprojection_loss(poi, gt_poi, nz, nn, "none")
            out["reproj_sum"] = jnp.sum(per * valid)
            scale = jnp.asarray([tw, th], jnp.float32)
            per_px = reprojection_loss(poi * scale, gt_poi * scale,
                                       nz, nn, "none")
            out["reproj_px_sum"] = jnp.sum(per_px * valid)

        out["_logits"] = logits if logits is not None else jnp.zeros(())
        out["_warp"] = warp_masks if warp_masks is not None else jnp.zeros(())
        out["_uv"] = uv if uv is not None else jnp.zeros(())
        return out

    def step(variables, batch):
        return _step(variables, batch, court_img, court_poi, warp_table)

    return step


def eval_reconstructor(model, variables, loader, court_img, court_poi,
                       target_size, use_per_sample_weights: bool = True,
                       eval_step=None,
                       weight_semantics: str = "ref") -> Dict[str, object]:
    """Run validation over a loader (reference ``eval_reconstructor``)."""
    if eval_step is None:
        eval_step = make_eval_step(model, court_img, court_poi, target_size,
                                   use_per_sample_weights, weight_semantics)
    sums = {"seg": 0.0, "rec": 0.0, "uv": 0.0, "consist": 0.0,
            "reproj_sum": 0.0, "reproj_px_sum": 0.0}
    n_batches = 0
    counter = 0
    last = None
    last_imgs = None
    for batch in loader:
        nv = batch.get("num_valid", len(batch["image"]))
        out = eval_step(variables, batch)
        # the eval step means over the `valid` samples only, so a padded
        # tail batch contributes exactly the reference's variable-size
        # tail-batch mean — scores are exact for any dataset size
        for k in sums:
            if k in out:
                sums[k] += float(out[k])
        counter += int(nv)
        n_batches += 1
        last, last_imgs = out, batch["image"]

    n = max(n_batches, 1)
    c = max(counter, 1)
    result = {
        "val_seg_score": sums["seg"] / n,
        "val_rec_score": sums["rec"] / n,
        "val_uv_score": sums["uv"] / n,
        "val_reproj_score": sums["reproj_sum"] / c,
        "val_reproj_px": sums["reproj_px_sum"] / c,
        "val_consist_score": sums["consist"] / n,
    }
    if last is not None:
        imgs = np.asarray(last_imgs)
        if imgs.dtype == np.uint8:
            imgs = imgs.astype(np.float32) / 255.0
        result["imgs"] = imgs
        if np.ndim(last["_logits"]):
            result["logits"] = np.asarray(last["_logits"])
        if np.ndim(last["_warp"]):
            result["warp_masks"] = np.asarray(last["_warp"])
        if np.ndim(last["_uv"]):
            result["uv_masks"] = np.asarray(last["_uv"])
    return result


def eval_net(model, variables, loader, n_classes: int,
             court_img=None, court_poi=None):
    """Legacy dice/CE evaluation for a segmentation-only UNet
    (reference ``eval.py:7-39``)."""
    from ..models.losses import cross_entropy_map, dice_coeff

    tot = 0.0
    n_val = 0
    for batch in loader:
        logits = model.apply(variables, norm_img(batch["image"]), train=False)
        mask = jnp.asarray(batch["mask"])
        if n_classes > 1:
            tot += float(jnp.mean(cross_entropy_map(logits, mask.astype(jnp.int32))))
        else:
            pred = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.float32)
            tot += float(dice_coeff(pred, mask.astype(jnp.float32)))
        n_val += 1
    return {"val_score": tot / max(n_val, 1)}


def eval_stn(model, variables, loader, template, n_classes: int):
    """Legacy UNet+STN evaluation (reference ``eval.py:42-75``)."""
    from ..models.losses import cross_entropy_map, mse_map

    ce_score = mse_score = 0.0
    n_val = 0
    for batch in loader:
        logits, proj = model.apply(variables, norm_img(batch["image"]),
                                   template, train=False)
        mask_i = jnp.asarray(batch["mask"]).astype(jnp.int32)
        ce_score += float(jnp.mean(cross_entropy_map(logits, mask_i)))
        gt_f = mask_i.astype(jnp.float32) / float(n_classes)
        mse_score += float(jnp.mean(mse_map(proj, gt_f)))
        n_val += 1
    n = max(n_val, 1)
    return {"val_tot_score": (ce_score + mse_score) / n,
            "val_ce_score": ce_score / n,
            "val_mse_score": mse_score / n}
