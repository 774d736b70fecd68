#!/bin/bash
: '
*****************************************
Runs an already-built TPU-host image to do end-to-end game inference
(twin of the reference scripts/docker_run_inference.sh:1-47, minus the
GPU/AWS specifics: --gpus becomes --privileged for TPU VM device access,
and credentials mounting is optional).

Arguments:
  --host_data_dir=...    : host directory with the game videos/frames
  --host_models_dir=...  : host directory with checkpoint subdirectories
  --image=...            : image tag (default sports-field-homography-tpu)
Any other argument is forwarded to scripts/run_inference.sh inside the
container (e.g. --game=mygame --batch=32 --use_imgs).
*****************************************
'
set -e

HOST_DATA_DIR=""
HOST_MODELS_DIR=""
IMAGE=sports-field-homography-tpu
INFER_ARGS=""

while [ $# -gt 0 ]; do
  case "$1" in
    --host_data_dir=*)
      HOST_DATA_DIR="${1#*=}"
      ;;
    --host_models_dir=*)
      HOST_MODELS_DIR="${1#*=}"
      ;;
    --image=*)
      IMAGE="${1#*=}"
      ;;
    *)
      INFER_ARGS+=" ${1}"
  esac
  shift
done

if [ -z "$HOST_DATA_DIR" ]; then
  printf "***Error: --host_data_dir not specified!\n"
  exit 1
fi
if [ -z "$HOST_MODELS_DIR" ]; then
  printf "***Error: --host_models_dir not specified!\n"
  exit 1
fi

# --privileged exposes the TPU VM accelerator devices to the container
# (the TPU analog of the reference's `--gpus all`)
docker run --rm --privileged \
  --shm-size 16G \
  -v "$HOST_DATA_DIR":/workspace/_inference/data \
  -v "$HOST_MODELS_DIR":/workspace/checkpoints \
  "$IMAGE" scripts/run_inference.sh ${INFER_ARGS}
