#!/usr/bin/env python
"""Root CLI shim: checkpoint-sweep evaluation (mirrors the reference's
``test.py``; not a unit test — the pytest suite lives in tests/)."""
from sports_field_homography_tpu.cli.test import main

if __name__ == "__main__":
    main()
