#!/usr/bin/env python
"""Root CLI shim: batch inference (mirrors the reference's ``predict.py``)."""
from sports_field_homography_tpu.cli.predict import process

if __name__ == "__main__":
    process()
