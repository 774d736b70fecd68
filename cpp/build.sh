#!/bin/bash
# Build the C++ PJRT runtimes:
#   pjrt_serve      — single-tensor StableHLO artifact server (no deps
#                     beyond dl)
#   pjrt_predict    — full frames->JSON predict pipeline (links OpenCV for
#                     decode/resize; skipped with a notice if OpenCV dev
#                     files are absent)
#   pjrt_http_serve — online HTTP serving with dynamic batching (links
#                     OpenCV for decode/encode; skipped likewise)
#
# The PJRT C API header ships with the installed tensorflow package (the
# API is append-only and version-negotiated, so a newer header drives an
# older plugin).
#
# Usage: cpp/build.sh [pjrt_serve|pjrt_predict|pjrt_http_serve ...]
#        (default: all)
set -euo pipefail
cd "$(dirname "$0")"

INC=$(python - <<'EOF'
import os, tensorflow
print(os.path.join(os.path.dirname(tensorflow.__file__), "include",
                   "tensorflow", "compiler"))
EOF
)

TARGETS=("$@")
[ ${#TARGETS[@]} -eq 0 ] && TARGETS=(pjrt_serve pjrt_predict pjrt_http_serve)

for t in "${TARGETS[@]}"; do
  case "$t" in
    pjrt_serve)
      g++ -std=c++17 -O2 -I "$INC" -o pjrt_serve pjrt_serve.cc -ldl
      echo "built $PWD/pjrt_serve"
      ;;
    pjrt_predict)
      if [ ! -d /usr/include/opencv4 ]; then
        echo "skipping pjrt_predict: /usr/include/opencv4 not found" >&2
        continue
      fi
      g++ -std=c++17 -O2 -I "$INC" -I /usr/include/opencv4 \
          -o pjrt_predict pjrt_predict.cc \
          -ldl -lpthread -lopencv_core -lopencv_imgproc -lopencv_imgcodecs \
          -lopencv_videoio
      echo "built $PWD/pjrt_predict"
      ;;
    pjrt_http_serve)
      if [ ! -d /usr/include/opencv4 ]; then
        echo "skipping pjrt_http_serve: /usr/include/opencv4 not found" >&2
        continue
      fi
      g++ -std=c++17 -O2 -I "$INC" -I /usr/include/opencv4 \
          -o pjrt_http_serve pjrt_http_serve.cc \
          -ldl -lpthread -lopencv_core -lopencv_imgproc -lopencv_imgcodecs
      echo "built $PWD/pjrt_http_serve"
      ;;
    *)
      echo "unknown target $t" >&2; exit 2;;
  esac
done
