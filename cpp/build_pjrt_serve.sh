#!/bin/bash
# Back-compat shim: build the pjrt_serve binary (see cpp/build.sh, which
# also builds the full pjrt_predict pipeline).
set -euo pipefail
cd "$(dirname "$0")"
if [ $# -ge 1 ]; then
  # legacy out-name argument
  INC=$(python - <<'EOF'
import os, tensorflow
print(os.path.join(os.path.dirname(tensorflow.__file__), "include",
                   "tensorflow", "compiler"))
EOF
)
  g++ -std=c++17 -O2 -I "$INC" -o "$1" pjrt_serve.cc -ldl
  echo "built $PWD/$1"
else
  ./build.sh pjrt_serve
fi
