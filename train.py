#!/usr/bin/env python
"""Root CLI shim: training (mirrors the reference's ``train.py``)."""
from sports_field_homography_tpu.cli.train import main

if __name__ == "__main__":
    main()
