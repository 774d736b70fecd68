"""viz_preds frame-rendering pipeline (ffmpeg-free path)."""
import json
import os
import pickle

import numpy as np


def test_vizualize_renders_frames(tmp_path):
    import cv2
    from sports_field_homography_tpu.cli.viz_preds import vizualize

    W, H = 64, 36
    n = 5
    # source video
    video = str(tmp_path / "game.mp4")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10, (W, H))
    rng = np.random.RandomState(0)
    for _ in range(n):
        wr.write(rng.randint(0, 255, (H, W, 3), dtype=np.uint8))
    wr.release()

    # predictions: frames 0-2 good score (warp path), 3-4 bad (segm path)
    preds = {}
    for i in range(n):
        preds[str(i).zfill(6)] = {
            "score": 0.05 if i < 3 else 0.9,
            "theta": [[[1.2, 0.05, 0.0], [0.0, 1.8, 0.4], [0.0, 0.6, 1.0]]],
        }
    preds["model"] = "test_model"
    preds_path = tmp_path / "game_court.json"
    json.dump(preds, open(preds_path, "w"))

    # pickled segm-mask stream
    masks_path = tmp_path / "data.pkl"
    with open(masks_path, "wb") as f:
        for i in range(n):
            m = rng.randint(0, 4, (H, W), dtype=np.uint8)
            _, buf = cv2.imencode(".png", m)
            pickle.dump([str(i).zfill(6), buf], f)

    vizualize(video, str(preds_path), str(tmp_path), 
              "/root/repo/assets/mask_ncaa_v4_nc4_m_onehot.png",
              masks_path=str(masks_path), out_size=(W, H),
              score_threshold=0.17, encode_video=False)

    chunk_dir = tmp_path / "_temp" / "_chunk0"
    files = sorted(os.listdir(chunk_dir))
    assert files == [f"{i:06d}.png" for i in range(n)]
    img = cv2.imread(str(chunk_dir / "000000.png"))
    assert img.shape == (H, W, 3)
