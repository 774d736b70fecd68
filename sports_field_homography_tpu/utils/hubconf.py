"""Model-hub style entry points (vestigial twin of reference
``utils/hubconf.py`` which exposed the milesial torch-hub UNet).

Exposes named constructors usable as ``hub entry points`` for this
framework's models.
"""
from __future__ import annotations

__all__ = ["unet", "reconstructor"]


def unet(mask_classes: int = 4, bilinear: bool = False):
    """Segmentation-only UNet (legacy family)."""
    from ..models.legacy import UNet

    return UNet(n_classes=mask_classes, bilinear=bilinear)


def reconstructor(**kwargs):
    """Production Reconstructor from keyword config."""
    from ..models import Reconstructor, ReconstructorConfig

    return Reconstructor(ReconstructorConfig(**kwargs))
