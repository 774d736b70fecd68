#!/bin/bash
# Build the TPU-host image and run inference inside it (twin of the
# reference's scripts/docker_build_and_run.sh).
set -e
IMAGE=${IMAGE:-sports-field-homography-tpu}
docker build -t "$IMAGE" .
docker run --rm -it --privileged \
  -v "${DATA_DIR:-$PWD/_inference/data}":/data \
  -v "${DST_DIR:-$PWD/_inference/results}":/results \
  -v "${MODELS_DIR:-$PWD/checkpoints}":/workspace/checkpoints \
  "$IMAGE" scripts/run_inference.sh "$@"
