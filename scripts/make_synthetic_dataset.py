#!/usr/bin/env python
"""Generate a synthetic court-homography dataset for training smoke runs.

Frames are renders of the NCAA template warped by realistic broadcast-
camera homographies (plus noise/background), masks are the warped label
maps, PoI are the projected court points — so ground truth is exact and a
working training loop must drive reprojection error down.

Usage:
  python scripts/make_synthetic_dataset.py --dst /tmp/synth --n 512 \
      [--size 320 180] [--val_frac 0.1]

Defaults to the NCAA template; ``--court_img/--court_poi/--classes``
switch sports (e.g. the soccer pitch: ``--court_img
assets/pitch_mask_nc4_hd.png --court_poi
assets/template_pitch_points.json``).  A color court mask (the pitch
assets are RGBA class-color images; the reference converts them with its
``generate_onehot`` prep step) is converted to a label-coded grayscale
template and written to ``<dst>/court_template_onehot.png`` — point the
training conf's ``court_img`` there.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from sports_field_homography_tpu.geometry.court import load_court_poi  # noqa: E402
from sports_field_homography_tpu.geometry.warp import warp_homography  # noqa: E402
from sports_field_homography_tpu.utils.postprocess import onehot_to_image  # noqa: E402

TEMPLATE = os.path.join(_REPO, "assets", "mask_ncaa_v4_nc4_m_onehot.png")
POI = os.path.join(_REPO, "assets", "template_ncaa_v4_points.json")
BASE_THETA = np.array([[1.4, 0.1, 0.05], [0.02, 2.2, 0.6], [0.01, 0.9, 1.0]])


def sample_theta(rng):
    n = rng.randn(3, 3) * np.array([[.15, .05, .1], [.05, .3, .15],
                                    [.005, .1, .05]])
    return (BASE_THETA + n).astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", required=True)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--size", nargs=2, type=int, default=(320, 180))
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--uv", action="store_true",
                    help="also write masks_uv/ uint16 (mask,u,v) tiffs — "
                         "the unet_uv training inputs (notebook step 9)")
    ap.add_argument("--court_img", default=TEMPLATE)
    ap.add_argument("--court_poi", default=POI)
    ap.add_argument("--classes", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    # host-side data prep: run on CPU (TPU compiles via the tunnel are slow)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    w, h = args.size
    nc = args.classes
    raw = np.array(Image.open(args.court_img).convert("RGB"))
    if len(np.unique(raw.reshape(-1, 3), axis=0)) > nc or np.ptp(raw) > nc:
        # color class mask (e.g. assets/pitch_mask_nc4_hd.png) -> label-coded
        # grayscale, reference generate_onehot semantics (prep/preparation)
        from sports_field_homography_tpu.prep.preparation import (
            MASK_CLASS_MAPPINGS)
        labels_full = np.zeros(raw.shape[:2], np.uint8)
        for cid, color in MASK_CLASS_MAPPINGS[nc].items():
            labels_full[np.all(raw == color, axis=2)] = cid
        assert labels_full.max() > 0, \
            f"no mapped class colors found in {args.court_img}"
        os.makedirs(args.dst, exist_ok=True)
        tmpl_path = os.path.join(args.dst, "court_template_onehot.png")
        Image.fromarray(labels_full).save(tmpl_path)
        print(f"converted color court mask -> label template: {tmpl_path}"
              f" (set court_img to this path in the training conf)")
    else:   # already label-coded (the NCAA *_onehot.png assets)
        labels_full = np.array(Image.open(args.court_img))
        if labels_full.ndim == 3:
            labels_full = labels_full[..., 0]
    tmpl = np.array(Image.fromarray(labels_full).resize((w, h), Image.NEAREST),
                    np.float32) / float(nc)
    poi = load_court_poi(args.court_poi)            # [-1, 1]
    rng = np.random.RandomState(args.seed)

    warp = jax.jit(lambda t, th: warp_homography(t, th, (h, w), "nearest"))
    chans = [tmpl[:, :, None]]
    if args.uv:
        # normalized (0,1] coordinate ramps in template space, warped by the
        # SAME homography as the label map (ground truth by construction)
        from sports_field_homography_tpu.geometry.court import (
            generate_uv_template)
        u16, v16 = generate_uv_template((w, h), dtype=np.uint16)
        chans += [(u16.astype(np.float32) / w)[:, :, None],
                  (v16.astype(np.float32) / h)[:, :, None]]
    tmpl_b = jnp.asarray(np.tile(np.concatenate(chans, -1)[None],
                                 (32, 1, 1, 1)))
    max16 = float(np.iinfo(np.uint16).max)

    n_val = max(1, int(args.n * args.val_frac))
    splits = [("train_game", args.n - n_val), ("val_game", n_val)]
    idx = 0
    for game, count in splits:
        dirs = ("frames", "masks", "anno") + (("masks_uv",) if args.uv else ())
        for d in dirs:
            os.makedirs(os.path.join(args.dst, d, game), exist_ok=True)
        remaining = count
        while remaining > 0:
            bs = min(32, remaining)
            thetas = np.stack([sample_theta(rng) for _ in range(bs)])
            warped = np.asarray(warp(tmpl_b[:bs], jnp.asarray(thetas)))
            labels = np.round(warped[..., 0] * nc).astype(np.uint8)
            from sports_field_homography_tpu.geometry.homography import (
                inverse_3x3, transform_points)
            inv = np.asarray(inverse_3x3(jnp.asarray(thetas)))
            pts = np.asarray(transform_points(
                jnp.asarray(inv), jnp.asarray(
                    np.tile(poi[None], (bs, 1, 1)).astype(np.float32))))
            pts01 = pts / 2.0 + 0.5
            for i in range(bs):
                name = f"{idx:06d}"
                rgb = onehot_to_image(labels[i], nc)[0].astype(np.float32)
                # light texture + noise so segmentation isn't trivial
                yy = np.linspace(0, 40, h, dtype=np.float32)[:, None, None]
                frame = np.clip(rgb * 0.7 + 40 + yy
                                + rng.randn(h, w, 3) * 12, 0, 255)
                Image.fromarray(frame.astype(np.uint8)).save(
                    os.path.join(args.dst, "frames", game, name + ".png"))
                Image.fromarray(labels[i]).save(
                    os.path.join(args.dst, "masks", game, name + ".png"))
                if args.uv:
                    import cv2
                    uv_mask = np.stack(
                        (labels[i].astype(np.uint16),
                         (warped[i, ..., 1] * max16).astype(np.uint16),
                         (warped[i, ..., 2] * max16).astype(np.uint16)),
                        axis=2)
                    cv2.imwrite(os.path.join(args.dst, "masks_uv", game,
                                             name + ".tif"), uv_mask)
                visible = ((pts01[i, :, 0] > 0) & (pts01[i, :, 0] < 1)
                           & (pts01[i, :, 1] > 0) & (pts01[i, :, 1] < 1))
                anno_poi = np.concatenate(
                    [np.clip(pts01[i], 0, 1),
                     visible[:, None].astype(np.float64)], axis=1)
                with open(os.path.join(args.dst, "anno", game,
                                       name + ".json"), "w") as f:
                    json.dump({"poi": anno_poi.tolist(),
                               "reproj_mse": 0.0001}, f)
                idx += 1
            remaining -= bs
    print(f"wrote {idx} samples to {args.dst}")


if __name__ == "__main__":
    main()
