"""Metric-scale stereo visual odometry.

The reference's stereo tracker is an EMPTY file
(slam/stereo/ROUGHstereo_tracker.py, 0 bytes — SURVEY.md §0); its intended
behavior survives in the SfM prototype's stereo path (refrences/sfm.py:
346-389,669-688: disparity-checked features, depth back-projection, stereo
PnP). This module implements that design on the TPU ops:

  per frame t:
    1. detect features on the left image;
    2. block-matching disparity -> per-keypoint depth (disparity-checked);
    3. back-project to metric 3-D in camera t;
  per frame t -> t+1:
    4. descriptor-match left_t <-> left_{t+1};
    5. PnP-RANSAC: 3-D (world frame via T_t) vs 2-D in t+1 -> T_{t+1}
       with TRUE metric scale from the stereo baseline.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.core import frontend
from simpleslam_tpu.core.types import Features
from simpleslam_tpu.ops import pnp
from simpleslam_tpu.ops.features import rgb_to_gray
from simpleslam_tpu.ops.stereo import (disparity_block_match,
                                       keypoints_to_3d, sample_disparity)

logger = logging.getLogger("stereo")


class StereoTracker:
    def __init__(self, cfg: SLAMConfig, K: np.ndarray, baseline: float,
                 max_disp: int = 64):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.baseline = float(baseline)
        self.max_disp = int(max_disp)
        self.detector, self.matcher = frontend.init_feature_pipeline(cfg)
        self.poses: List[np.ndarray] = [np.eye(4)]   # T_cw per frame
        self._key = jax.random.PRNGKey(cfg.seed)
        self._prev: Optional[tuple] = None           # (feats, X_cam, has3d)
        self.n_tracked = 0
        self.n_lost = 0

    def _k(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _gray(self, img):
        img = jnp.asarray(img)
        return rgb_to_gray(img) if img.ndim == 3 else img.astype(jnp.float32)

    def _frame_3d(self, left, right):
        """Features + per-keypoint metric 3-D (camera frame) + validity."""
        gl = self._gray(left)
        gr = self._gray(right)
        feats = self.detector.fn(gl)
        disp, dvalid = disparity_block_match(gl, gr, max_disp=self.max_disp)
        d_at, ok = sample_disparity(disp, dvalid, feats.kpts)
        X = keypoints_to_3d(feats.kpts, d_at, jnp.asarray(self.K, jnp.float32),
                            self.baseline)
        # precision gate: block matching is only trustworthy in a disparity
        # band — too small (far) means meter-scale depth noise, too large
        # (very near, oblique floor) means slant-biased blocks
        z = X[:, 2]
        z_max = float(self.K[0, 0]) * self.baseline / 8.0   # disp >= 8 px
        has3d = (feats.valid & ok & (d_at > 2.0)
                 & (z > 4.0 * self.baseline) & (z < z_max))
        return feats, X, has3d

    def step(self, left: np.ndarray, right: np.ndarray) -> bool:
        """Process one stereo pair; returns True once tracking produces a
        new pose (first call just initializes)."""
        feats, X_cam, has3d = self._frame_3d(left, right)
        if self._prev is None:
            self._prev = (feats, X_cam, has3d)
            return False

        pf, pX, phas = self._prev
        m = frontend.feature_matcher(self.cfg, pf, feats, self.matcher)
        valid = m.valid & phas[m.idx0]

        # world-frame 3D of previous-frame points: X_w = T_cw^-1 x_cam
        T_prev = self.poses[-1]
        T_wc = np.linalg.inv(T_prev)
        Xw = jnp.asarray(
            np.asarray(pX) @ T_wc[:3, :3].T + T_wc[:3, 3], jnp.float32)
        pts3d = Xw[m.idx0]
        pts2d = feats.kpts[m.idx1]

        n_cand = int(np.asarray(valid).sum())
        if n_cand < max(8, self.cfg.pnp_min_inliers // 2):
            logger.info("[stereo] too few 3D-2D pairs (%d); dead-reckon", n_cand)
            self.poses.append(self.poses[-1].copy())
            self.n_lost += 1
            self._prev = (feats, X_cam, has3d)
            return True

        T_est, inl, n_inl, ok = pnp.solve_pnp_ransac(
            self._k(), pts3d, pts2d, valid,
            jnp.asarray(self.K, jnp.float32), self.cfg.ransac_thresh,
            Tcw_init=jnp.asarray(T_prev, jnp.float32),
            n_hyp=self.cfg.ransac_hypotheses)
        if bool(ok) and int(n_inl) >= max(8, self.cfg.pnp_min_inliers // 2):
            self.poses.append(np.asarray(T_est, np.float64))
            self.n_tracked += 1
        else:
            logger.info("[stereo] PnP failed (inl=%d); dead-reckon", int(n_inl))
            self.poses.append(self.poses[-1].copy())
            self.n_lost += 1
        self._prev = (feats, X_cam, has3d)
        return True
