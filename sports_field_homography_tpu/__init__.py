"""sports-field-homography on TPU: a from-scratch JAX/XLA/Pallas rebuild.

TPU-native framework with the full capability surface of
darkAlert/sports-field-homography (UNet court segmentation + ResNet STN
homography regression + template warping), re-designed for XLA's
compilation model: NHWC layouts, static shapes, fused jitted forward,
matmul-formulated resampling, Pallas kernels for the warp hot path, and
``jax.sharding`` meshes for multi-chip scale-out.
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401


def __getattr__(name):
    # lazy subpackage access: sfh.models, sfh.ops, ... without import cost
    import importlib
    if name in ("models", "ops", "data", "train", "parallel", "compat",
                "utils", "cli", "prep"):
        return importlib.import_module("." + name, __name__)
    raise AttributeError(name)
