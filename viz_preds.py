#!/usr/bin/env python
"""Root CLI shim: prediction-video rendering (mirrors reference ``viz_preds.py``)."""
from sports_field_homography_tpu.cli.viz_preds import main

if __name__ == "__main__":
    main()
