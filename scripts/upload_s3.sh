#!/bin/bash
# Upload inference results to object storage (twin of the reference's
# scripts/upload_s3.sh; requires aws CLI + credentials).
set -e
GAME=${1:?usage: upload_s3.sh <game-name>}
DST_DIR=${DST_DIR:-$PWD/_inference/results}
S3_RESULTS_URI=${S3_RESULTS_URI:?set S3_RESULTS_URI, e.g. s3://bucket/results}
aws s3 sync "$DST_DIR/$GAME" "$S3_RESULTS_URI/$GAME"
