#!/bin/bash
# Build the C++ PJRT runtimes:
#   pjrt_serve   — single-tensor StableHLO artifact server (no deps beyond dl)
#   pjrt_predict — full frames->JSON predict pipeline (links OpenCV for
#                  decode/resize; skipped with a notice if OpenCV dev files
#                  are absent)
#
# The PJRT C API header ships with the installed tensorflow package (the
# API is append-only and version-negotiated, so a newer header drives an
# older plugin).
#
# Usage: cpp/build.sh [pjrt_serve|pjrt_predict ...]   (default: both)
set -euo pipefail
cd "$(dirname "$0")"

INC=$(python - <<'EOF'
import os, tensorflow
print(os.path.join(os.path.dirname(tensorflow.__file__), "include",
                   "tensorflow", "compiler"))
EOF
)

TARGETS=("$@")
[ ${#TARGETS[@]} -eq 0 ] && TARGETS=(pjrt_serve pjrt_predict)

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
    *)
      echo "unknown target $t" >&2; exit 2;;
  esac
done
