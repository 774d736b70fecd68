#!/usr/bin/env python
"""Root CLI shim: online HTTP serving (no reference twin — the reference
has no serving layer; see sports_field_homography_tpu/serve/server.py)."""
from sports_field_homography_tpu.serve.server import main

if __name__ == "__main__":
    main()
