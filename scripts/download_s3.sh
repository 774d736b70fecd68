#!/bin/bash
# Fetch a trained model dir from object storage (twin of the reference's
# scripts/download_s3.sh; requires aws CLI + credentials).
set -e
MODEL=${1:?usage: download_s3.sh <model-name>}
MODELS_DIR=${MODELS_DIR:-$PWD/checkpoints}
S3_MODELS_URI=${S3_MODELS_URI:?set S3_MODELS_URI, e.g. s3://bucket/models}
mkdir -p "$MODELS_DIR/$MODEL"
aws s3 sync "$S3_MODELS_URI/$MODEL" "$MODELS_DIR/$MODEL"
