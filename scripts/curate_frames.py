#!/usr/bin/env python
"""Debug-frame curation CLI — the reference's center_court_dataset.ipynb
workflow (``/root/reference/dataset_utils/center_court_dataset.ipynb``)
as a re-runnable command instead of a notebook:

  1. ``render``  — draw the predicted homography (projected court PoI,
     center marker, top-bottom extent, consistency score) from a
     ``{game}_court.json`` onto each original frame and save the debug
     images to a flat directory (notebook cells 5-7).  Frames whose
     score is below ``--min_score`` can be skipped up front.
  2. A human deletes the bad debug frames (the notebook's implicit
     manual triage step).
  3. ``split``   — split the surviving flat debug dir into per-game
     folders: ``{game}-{frame_id}.ext -> {game}/{frame_id}.ext``
     (notebook cell 9).
  4. ``select``  — for every selected debug frame, move (or ``--copy``)
     the matching original frame into the curated dataset dir
     (notebook cell 11).

Frame naming follows the notebook convention: originals live at
``{frames_dir}/{game}/{game}-{frame_id}.{ext}`` and debug renders are
``{game}-{frame_id}.jpeg`` flat in the debug dir.
"""
import argparse
import os
import shutil
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from sports_field_homography_tpu.geometry.court import (  # noqa: E402
    CourtMapping, CourtSizes, load_court_poi, map_court_to_frame)
from sports_field_homography_tpu.utils.postprocess import draw_text  # noqa: E402

CENTR_POINTS_IDXS = (1, 2)
TOP_Y_IDX = 0
BOTTOM_Y_IDX = 3
_IMG_EXTS = (".jpeg", ".jpg", ".png")


def _split_name(filename: str):
    name, ext = os.path.splitext(filename)
    game, frame_id = name.rsplit("-", 1)
    return game, frame_id, ext


def _find_original(frames_dir: str, game: str, frame_id: str):
    for ext in _IMG_EXTS:
        p = os.path.join(frames_dir, game, f"{game}-{frame_id}{ext}")
        if os.path.exists(p):
            return p
    return None


def render(args):
    import cv2

    court_poi = load_court_poi(args.court_poi)
    mapping = CourtMapping(args.mapping)
    os.makedirs(args.dst_dir, exist_ok=True)
    n_drawn = n_skipped = n_missing = 0
    for name, m in mapping.frames.items():
        if m.score < args.min_score:
            n_skipped += 1
            continue
        game, frame_id = name.rsplit("-", 1)
        img_path = _find_original(args.frames_dir, game, frame_id)
        if img_path is None:
            n_missing += 1
            continue
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        h, w = img.shape[:2]

        # project court PoI into frame pixels (notebook cell 6)
        frame_poi = map_court_to_frame(m.theta_c2f, court_poi)
        frame_poi = frame_poi * np.array(
            [CourtSizes.FRAME_IN_PIXELS[0], CourtSizes.FRAME_IN_PIXELS[1]])
        scale = np.array([w / CourtSizes.FRAME_IN_PIXELS[0],
                          h / CourtSizes.FRAME_IN_PIXELS[1]])
        pts = frame_poi * scale
        center = pts[list(CENTR_POINTS_IDXS)].mean(axis=0)
        dist = abs(frame_poi[BOTTOM_Y_IDX][1] - frame_poi[TOP_Y_IDX][1])

        for pi, (x, y) in enumerate(pts):
            if not (0 <= x < w and 0 <= y < h):
                continue
            cv2.circle(img, (int(round(x)), int(round(y))), 3,
                       color=(255, 255, 255), thickness=2)
            draw_text(img, text=str(pi), pos=(int(x) + 3, int(y) + 3),
                      color=(128, 128, 255), scale=1)
        if 0 <= center[0] < w and 0 <= center[1] < h:
            cv2.drawMarker(img, (int(round(center[0])), int(round(center[1]))),
                           color=(0, 255, 255), markerType=cv2.MARKER_CROSS,
                           markerSize=12, thickness=2)
        draw_text(img, text="score {:.4f}  dist {:.0f}px".format(m.score, dist),
                  pos=(15, 15), color=(0, 255, 0), scale=0.75)
        cv2.imwrite(os.path.join(args.dst_dir, f"{name}.jpeg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        n_drawn += 1
    print(f"rendered {n_drawn} debug frames -> {args.dst_dir} "
          f"({n_skipped} below min_score, {n_missing} originals missing)")


def split(args):
    os.makedirs(args.dst, exist_ok=True)
    n = 0
    for filename in sorted(os.listdir(args.src)):
        if not filename.lower().endswith(_IMG_EXTS):
            continue
        game, frame_id, ext = _split_name(filename)
        dst_dir = os.path.join(args.dst, game)
        os.makedirs(dst_dir, exist_ok=True)
        shutil.move(os.path.join(args.src, filename),
                    os.path.join(dst_dir, frame_id + ext))
        n += 1
    print(f"split {n} debug frames into per-game folders under {args.dst}")


def select(args):
    games = [d for d in sorted(os.listdir(args.selected))
             if os.path.isdir(os.path.join(args.selected, d))]
    n = n_missing = 0
    transfer = shutil.copy2 if args.copy else shutil.move
    for game in games:
        sel_dir = os.path.join(args.selected, game)
        dst_dir = os.path.join(args.dst, game)
        os.makedirs(dst_dir, exist_ok=True)
        for filename in sorted(os.listdir(sel_dir)):
            if not filename.lower().endswith(_IMG_EXTS):
                continue
            frame_id = os.path.splitext(filename)[0]
            src = _find_original(args.frames_dir, game, frame_id)
            if src is None:
                n_missing += 1
                continue
            # notebook cell 11 drops the game prefix: {id}.{ext}
            transfer(src, os.path.join(
                dst_dir, frame_id + os.path.splitext(src)[1]))
            n += 1
    verb = "copied" if args.copy else "moved"
    print(f"{verb} {n} selected originals -> {args.dst} "
          f"({n_missing} originals missing)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render", help="draw predicted homography onto frames")
    r.add_argument("--mapping", required=True,
                   help="{game}_court.json from predict.py")
    r.add_argument("--court_poi",
                   default=os.path.join(_REPO, "assets",
                                        "template_ncaa_v4_points.json"))
    r.add_argument("--frames_dir", required=True,
                   help="original frames root: {game}/{game}-{id}.jpeg")
    r.add_argument("--dst_dir", required=True, help="flat debug output dir")
    r.add_argument("--min_score", type=float, default=0.0,
                   help="skip frames with consistency score below this")
    r.set_defaults(fn=render)

    s = sub.add_parser("split", help="flat debug dir -> per-game folders")
    s.add_argument("--src", required=True)
    s.add_argument("--dst", required=True)
    s.set_defaults(fn=split)

    m = sub.add_parser("select",
                       help="move originals matching selected debug frames")
    m.add_argument("--selected", required=True,
                   help="per-game selected debug dirs (after manual triage)")
    m.add_argument("--frames_dir", required=True, help="original frames root")
    m.add_argument("--dst", required=True, help="curated dataset dir")
    m.add_argument("--copy", action="store_true",
                   help="copy instead of move")
    m.set_defaults(fn=select)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
