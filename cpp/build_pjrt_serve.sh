#!/bin/bash
# Build the C++ PJRT serving runtime.
#
# The PJRT C API header ships with the installed tensorflow package (the
# API is append-only and version-negotiated, so a newer header drives an
# older plugin); no other dependencies — the runtime dlopens the plugin.
#
# Usage: cpp/build_pjrt_serve.sh [out_binary]
set -euo pipefail
cd "$(dirname "$0")"

OUT=${1:-pjrt_serve}
INC=$(python - <<'EOF'
import os, tensorflow
print(os.path.join(os.path.dirname(tensorflow.__file__), "include",
                   "tensorflow", "compiler"))
EOF
)
g++ -std=c++17 -O2 -I "$INC" -o "$OUT" pjrt_serve.cc -ldl
echo "built $PWD/$OUT"
