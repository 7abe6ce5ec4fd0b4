"""GT alignment helpers (reference: slam/core/trajectory_utils.py:20-52).

``compute_gt_alignment`` returns the rigid transform mapping ground-truth
poses into the cam0 (world) frame — i.e. relative to the first GT pose;
``apply_alignment`` applies it. The live reference driver calls the former
once and discards the result (main_revamped.py:280) — kept for parity.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def compute_gt_alignment(gt_T: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(R, t) such that aligned = R @ (gt - t): expresses GT relative to the
    first pose."""
    T0 = np.asarray(gt_T[0])
    R0 = T0[:3, :3]
    t0 = T0[:3, 3]
    return R0.T, t0


def apply_alignment(positions: np.ndarray, R: np.ndarray,
                    t: np.ndarray) -> np.ndarray:
    return (np.asarray(positions) - t) @ R.T
