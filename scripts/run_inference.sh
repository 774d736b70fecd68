#!/bin/bash
: '
*****************************************
End-to-end game inference on TPU (twin of the reference run_inference.sh).

Runs predict.py for the given game video (or frame directory) with the
production output preset and merges per-frame results into
{game}_court.json.

Arguments:
  --game       : name (without extension) of the target video to process,
  --model      : checkpoint directory name under $MODELS_DIR (optional),
  --data_dir   : directory containing the video / frame dirs (optional),
  --dst_dir    : directory where the results will be saved (optional),
  --use_imgs   : use a frame directory instead of video (optional),
  --batch      : input batch size (optional, default 32 for one v5e chip),
  --viz        : also render the prediction overlay video (optional).
*****************************************
'
set -e

MODEL=ncaav8-640x360-aug_unet-resnet34-deconv-img+mask_ce-l1-rrmse-focal_pre
MODELS_DIR=${MODELS_DIR:-$PWD/checkpoints}
DATA_DIR=$PWD/_inference/data
DST_DIR=$PWD/_inference/results
BATCH=32
USE_IMGS=false
VIZUALIZE=false

while [ $# -gt 0 ]; do
  case "$1" in
    --game=*) GAME="${1#*=}" ;;
    --model=*) MODEL="${1#*=}" ;;
    --data_dir=*) DATA_DIR="${1#*=}" ;;
    --dst_dir=*) DST_DIR="${1#*=}" ;;
    --batch=*) BATCH="${1#*=}" ;;
    --use_imgs*) USE_IMGS=true ;;
    --viz*) VIZUALIZE=true ;;
    *) echo "unknown argument $1"; exit 1 ;;
  esac
  shift
done

if [ -z "$GAME" ]; then echo "--game is required"; exit 1; fi

CP=$(ls "$MODELS_DIR/$MODEL"/CP_epoch*.msgpack 2>/dev/null | sort -V | tail -1)
if [ -z "$CP" ]; then
  CP=$(ls "$MODELS_DIR/$MODEL"/*.pth 2>/dev/null | tail -1)
fi
if [ -z "$CP" ]; then echo "no checkpoint found in $MODELS_DIR/$MODEL"; exit 1; fi

REQ_OUTPUTS="segm_mask,theta,consistency"
COMMON_ARGS=(
  --load "$CP"
  --dst_dir "$DST_DIR/$GAME"
  --batchsize "$BATCH"
  --req_outputs "$REQ_OUTPUTS"
  --mask_type gray
  --mask_save_format pickle
  --court_img "$PWD/assets/mask_ncaa_v4_nc4_m_onehot.png"
  --court_poi "$PWD/assets/template_ncaa_v4_points.json"
)

if [ "$USE_IMGS" = true ]; then
  python predict.py --img_dir "$DATA_DIR/$GAME" "${COMMON_ARGS[@]}"
else
  python predict.py --video_path "$DATA_DIR/$GAME.mp4" "${COMMON_ARGS[@]}"
fi

if [ "$VIZUALIZE" = true ]; then
  python viz_preds.py \
    --video_path "$DATA_DIR/$GAME.mp4" \
    --preds_path "$DST_DIR/$GAME/${GAME}_court.json" \
    --masks_path "$DST_DIR/$GAME/court/segm_mask/data.pkl" \
    --dst_dir "$DST_DIR/$GAME" \
    --field_path "$PWD/assets/mask_ncaa_v4_nc4_m_onehot.png"
fi
echo "Inference for $GAME done: $DST_DIR/$GAME"
