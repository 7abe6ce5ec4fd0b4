"""Legacy driver 1: per-frame 2D-2D E-vs-H tracking (no PnP).

Behavior parity with the reference's legacy entrypoint
(slam/monocular/main.py:206-681):
  * match prev<->cur + F-RANSAC at 1.0 px (:387-388); <8 matches ->
    dead-reckon by keeping the previous pose (:390-394);
  * estimate E (RANSAC, 3.0 px) and H (RANSAC, 2.0 px) every frame
    (:402-410);
  * median rotation-compensated parallax for each model (:355-366);
  * rotation-only update when the homography dominates and parallax is
    below 1.2 deg (:421-435); otherwise full R + unit-t scaled by the last
    baseline (fixed 1.0 in the reference, :437-459);
  * optional pose-only BA each frame when a map exists (:479-484).

Run: python -m simpleslam_tpu.legacy.run_ef --dataset kitti --base_dir ...
"""
from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.config import SLAMConfig, parse_config
from simpleslam_tpu.core import frontend
from simpleslam_tpu.core.ba import pose_only_ba
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.types import Features
from simpleslam_tpu.data import Sequence
from simpleslam_tpu.ops import epipolar, se3
from simpleslam_tpu.ops.maskops import masked_median
from simpleslam_tpu.viz import Trajectory2D

logger = logging.getLogger("legacy_ef")

PARALLAX_THR_DEG = 1.2     # main.py:422 "MAGIC VARIABLE parallax_thr"


def median_parallax_deg(K, p0, p1, R, mask) -> float:
    """Median rotation-compensated ray angle (main.py:355-366)."""
    Kinv = jnp.linalg.inv(jnp.asarray(K, jnp.float32))
    ones = jnp.ones((p0.shape[0], 1), jnp.float32)
    u0 = jnp.concatenate([p0, ones], 1) @ Kinv.T
    u1 = jnp.concatenate([p1, ones], 1) @ Kinv.T
    u0 = u0 / jnp.linalg.norm(u0, axis=1, keepdims=True)
    u1 = u1 / jnp.linalg.norm(u1, axis=1, keepdims=True)
    Ru0 = u0 @ jnp.asarray(R, jnp.float32).T
    ang = jnp.degrees(jnp.arccos(jnp.clip(jnp.sum(Ru0 * u1, axis=1), -1, 1)))
    return float(masked_median(ang, mask))


def best_h_decomposition(H, K, p0, p1, inl):
    """Best (R, t) homography candidate by cheirality count (main.py:368-383)."""
    from simpleslam_tpu.ops.triangulation import (projection_matrix,
                                                  triangulate_two_view)
    Rs, ts, _ = epipolar.decompose_homography(H, K)
    P0 = projection_matrix(K, jnp.eye(4))

    def count(R, t):
        P1 = projection_matrix(K, se3.rt_to_T(R, t))
        X = triangulate_two_view(P0, P1, p0, p1)
        z0 = X[:, 2]
        z1 = (X @ R.T + t)[:, 2]
        return jnp.sum(((z0 > 0) & (z1 > 0) & inl).astype(jnp.int32))

    cnts = jax.vmap(count)(Rs, ts)
    b = int(jnp.argmax(cnts))
    return np.asarray(Rs[b]), np.asarray(ts[b]), int(cnts[b])


class EFTracker:
    """Frame-sequential E/H tracker (reusable by tests and the CLI)."""

    def __init__(self, cfg: SLAMConfig, K):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.detector, self.matcher = frontend.init_feature_pipeline(cfg)
        self.world_map = Map()
        self.world_map.add_pose(np.eye(4), is_keyframe=True)
        self.kfs: List = []
        self._key = jax.random.PRNGKey(cfg.seed)
        self.n_rot_only = 0
        self.n_full = 0
        self.n_deadreckon = 0

    def _k(self):
        self._key, k = jax.random.split(self._key)
        return k

    def step(self, frame_idx: int, prev_feats: Features, feats: Features):
        cfg = self.cfg
        Kj = jnp.asarray(self.K, jnp.float32)
        m = frontend.feature_matcher(cfg, prev_feats, feats, self.matcher)
        m = frontend.filter_matches_ransac(prev_feats, feats, m, 1.0,
                                           key=self._k())
        n_m = int(np.asarray(m.valid).sum())
        if n_m < 8:
            logger.warning("[Track] Too few matches for E/F: %d", n_m)
            self.world_map.add_pose(self.world_map.poses[-1].copy(), False)
            self.n_deadreckon += 1
            return

        p0 = prev_feats.kpts[m.idx0]
        p1 = feats.kpts[m.idx1]

        E, inlE, okE = epipolar.find_essential(self._k(), p0, p1, m.valid,
                                               Kj, 3.0,
                                               n_hyp=cfg.ransac_hypotheses)
        nE = int(np.asarray(inlE).sum()) if bool(okE) else 0
        R_E = t_E = maskE = None
        if bool(okE) and nE >= 8:
            R_E, t_E, maskE, _ = epipolar.recover_pose_essential(
                E, p0, p1, inlE, Kj)

        Hm, inlH, okH = epipolar.find_homography(self._k(), p0, p1, m.valid,
                                                 2.0,
                                                 n_hyp=cfg.ransac_hypotheses)
        nH = int(np.asarray(inlH).sum()) if bool(okH) else 0
        R_H = t_H = None
        if bool(okH) and nH >= 4:
            R_H, t_H, _cnt = best_h_decomposition(Hm, Kj, p0, p1, inlH)

        parE = (median_parallax_deg(Kj, p0, p1, R_E, maskE)
                if R_E is not None else 999.0)
        parH = (median_parallax_deg(Kj, p0, p1, jnp.asarray(R_H), inlH)
                if R_H is not None else 999.0)
        logger.debug("[Track] inliers E=%d H=%d parE=%.2f parH=%.2f",
                     nE, nH, parE, parH)

        use_rot_only = ((nH >= max(30, int(1.1 * nE)) and parH <= PARALLAX_THR_DEG)
                        or (R_E is not None and parE <= PARALLAX_THR_DEG
                            and nH >= max(20, int(0.8 * nE))))

        if use_rot_only and R_H is not None:
            T_rel = np.asarray(se3.rt_to_T(jnp.asarray(R_H, jnp.float32),
                                           jnp.zeros(3)), np.float64)
            self.n_rot_only += 1
        elif R_E is not None and nE >= 5:
            last_baseline = 1.0        # reference hard-codes 1.0 (:445)
            t = np.asarray(t_E) * last_baseline
            T_rel = np.asarray(se3.rt_to_T(R_E, jnp.asarray(t, jnp.float32)),
                               np.float64)
            self.n_full += 1
        else:
            self.world_map.add_pose(self.world_map.poses[-1].copy(), False)
            self.n_deadreckon += 1
            return

        T_new = T_rel @ self.world_map.poses[-1]
        self.world_map.add_pose(T_new, is_keyframe=False)

        # pose-only BA each frame when a landmark map exists (:479-484)
        if self.kfs and len(self.world_map) >= 10:
            try:
                pose_only_ba(self.world_map, self.K, self.kfs,
                             kf_idx=len(self.kfs) - 1)
            except Exception as e:
                logger.debug("pose-only BA skipped: %s", e)


def run(cfg: SLAMConfig):
    logging.basicConfig(level=logging.INFO)
    from simpleslam_tpu.utils.platform import enable_compile_cache
    enable_compile_cache()
    seq = Sequence.load(cfg)
    gt = seq.gt
    gt44 = None
    if gt is not None:
        gt44 = np.tile(np.eye(4), (len(gt), 1, 1))
        gt44[:, :3, :4] = gt
    tracker = EFTracker(cfg, seq.K)
    traj = Trajectory2D(gt44, dataset=cfg.dataset)
    prev = frontend.feature_extractor(cfg, seq.frame(0), tracker.detector)
    traj.push(0, np.eye(4))
    for i in range(1, len(seq)):
        feats = frontend.feature_extractor(cfg, seq.frame(i), tracker.detector)
        tracker.step(i, prev, feats)
        traj.push(i, tracker.world_map.poses[-1])
        prev = feats
    traj.save(f"trajectory_{cfg.dataset}_ef.png")
    logger.info("legacy E/F done: %d poses (%d rot-only, %d full, %d dead)",
                len(tracker.world_map.poses), tracker.n_rot_only,
                tracker.n_full, tracker.n_deadreckon)
    return tracker


if __name__ == "__main__":
    run(parse_config())
