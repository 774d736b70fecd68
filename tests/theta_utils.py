"""Shared homography-comparison helper for the parity test modules."""
import numpy as np


def unit_theta(t):
    """Project a homography onto the unit Frobenius sphere (sign-fixed).

    Every homography consumer divides by z, so the raw scale is
    loss-invariant and drifts arbitrarily during training (barely-trained
    checkpoints reach |theta| ~ 1e5-1e6 via part-adapted BN running
    stats); cross-framework/cross-program comparisons are only meaningful
    on the normalized matrix (docs/PARITY.md trained-checkpoint caveat).
    """
    t = np.asarray(t, np.float64).reshape(3, 3)
    t = t / np.linalg.norm(t)
    return -t if t[2, 2] < 0 else t
