#!/bin/bash
# Download a game video into the inference data dir (twin of the
# reference's scripts/download_video.sh; source URL layout is deployment-
# specific - set VIDEO_BASE_URL).
set -e
GAME=${1:?usage: download_video.sh <game-name>}
DATA_DIR=${DATA_DIR:-$PWD/_inference/data}
VIDEO_BASE_URL=${VIDEO_BASE_URL:?set VIDEO_BASE_URL to your video store}
mkdir -p "$DATA_DIR"
curl -fL "$VIDEO_BASE_URL/$GAME.mp4" -o "$DATA_DIR/$GAME.mp4"
echo "downloaded $DATA_DIR/$GAME.mp4"
