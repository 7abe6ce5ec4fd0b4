"""Legacy driver 2: pyramidal KLT optical-flow tracking.

Behavior parity with the reference's KLT entrypoint
(slam/monocular/main4.py:206-764):
  * tracked points flow frame-to-frame via pyramidal LK with
    forward+backward consistency and photometric-error gates (:386-437);
  * when the live track count drops below a floor, re-seed by detecting and
    descriptor-matching fresh keypoints (:439-446);
  * model choice per frame by inlier ratio: homography wins when
    nH > 1.5 * nE (:457-475), rotation-only update in that case, else
    full R + unit-t;
  * colored ageing KLT trails via the track overlay (:717-743 ->
    simpleslam_tpu.viz.draw_tracks).

Run: python -m simpleslam_tpu.legacy.run_klt --dataset kitti --base_dir ...
"""
from __future__ import annotations

import logging
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.config import SLAMConfig, parse_config
from simpleslam_tpu.core import frontend
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.data import Sequence
from simpleslam_tpu.ops import epipolar, se3
from simpleslam_tpu.ops.features import rgb_to_gray
from simpleslam_tpu.ops.klt import fb_track
from simpleslam_tpu.viz import Trajectory2D, draw_tracks

logger = logging.getLogger("legacy_klt")


class KLTTracker:
    def __init__(self, cfg: SLAMConfig, K, min_tracks: int = 150):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.min_tracks = min_tracks
        self.detector, self.matcher = frontend.init_feature_pipeline(cfg)
        self.world_map = Map()
        self.world_map.add_pose(np.eye(4), is_keyframe=True)
        self.pts: np.ndarray = np.zeros((0, 2), np.float32)
        self.track_ids: np.ndarray = np.zeros((0,), np.int64)
        self._next_tid = 0
        self.trails: Dict[int, List] = {}
        self._key = jax.random.PRNGKey(cfg.seed)
        self.n_rot_only = 0
        self.n_full = 0
        self.n_reseed = 0

    def _k(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _gray(self, img) -> jnp.ndarray:
        img = jnp.asarray(img)
        return rgb_to_gray(img) if img.ndim == 3 else img.astype(jnp.float32)

    def seed(self, img) -> None:
        feats = frontend.feature_extractor(self.cfg, img, self.detector)
        v = np.asarray(feats.valid)
        self.pts = np.asarray(feats.kpts)[v].astype(np.float32)
        self.track_ids = np.arange(self._next_tid,
                                   self._next_tid + len(self.pts))
        self._next_tid += len(self.pts)
        for tid, p in zip(self.track_ids, self.pts):
            self.trails[int(tid)] = [tuple(p)]
        self.n_reseed += 1

    def step(self, img_prev, img_cur) -> None:
        g0 = self._gray(img_prev)
        g1 = self._gray(img_cur)
        if len(self.pts) < 8:
            self.seed(img_prev)
        pts0 = self.pts
        n = len(pts0)
        # pad to a bucketed static size for jit stability
        cap = max(256, 1 << (n - 1).bit_length())
        pad = np.zeros((cap, 2), np.float32)
        pad[:n] = pts0
        p1, good, err = fb_track(g0, g1, jnp.asarray(pad), fb_thresh=1.0,
                                 err_thresh=25.0)
        p1 = np.asarray(p1)[:n]
        good = np.asarray(good)[:n]

        if good.sum() >= 8:
            q0 = jnp.asarray(pad[:cap])
            q1 = jnp.asarray(np.vstack([p1, np.zeros((cap - n, 2), np.float32)]))
            gmask = jnp.asarray(np.concatenate([good, np.zeros(cap - n, bool)]))
            Kj = jnp.asarray(self.K, jnp.float32)

            E, inlE, okE = epipolar.find_essential(
                self._k(), q0, q1, gmask, Kj, 2.0,
                n_hyp=self.cfg.ransac_hypotheses)
            nE = int(np.asarray(inlE).sum()) if bool(okE) else 0
            Hm, inlH, okH = epipolar.find_homography(
                self._k(), q0, q1, gmask, 2.0,
                n_hyp=self.cfg.ransac_hypotheses)
            nH = int(np.asarray(inlH).sum()) if bool(okH) else 0

            # reference model choice: H dominates at nH > 1.5 nE (:457-475)
            if bool(okH) and nH > 1.5 * max(nE, 1):
                from simpleslam_tpu.legacy.run_ef import best_h_decomposition
                R, t, _ = best_h_decomposition(Hm, Kj, q0, q1, inlH)
                T_rel = np.asarray(se3.rt_to_T(jnp.asarray(R, jnp.float32),
                                               jnp.zeros(3)), np.float64)
                self.n_rot_only += 1
            elif bool(okE) and nE >= 8:
                R, t, _, _ = epipolar.recover_pose_essential(E, q0, q1, inlE, Kj)
                T_rel = np.asarray(se3.rt_to_T(R, t), np.float64)
                self.n_full += 1
            else:
                T_rel = np.eye(4)
            self.world_map.add_pose(T_rel @ self.world_map.poses[-1], False)
        else:
            self.world_map.add_pose(self.world_map.poses[-1].copy(), False)

        # carry surviving tracks forward + trails
        self.pts = p1[good].astype(np.float32)
        self.track_ids = self.track_ids[good]
        for tid, p in zip(self.track_ids, self.pts):
            self.trails.setdefault(int(tid), []).append(tuple(p))

        # descriptor-match re-seeding when the track pool runs low (:439-446)
        if len(self.pts) < self.min_tracks:
            self.seed(img_cur)

    def overlay(self, img_cur) -> np.ndarray:
        live = {int(t): self.trails[int(t)] for t in self.track_ids
                if int(t) in self.trails}
        img = np.asarray(img_cur)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=2)
        return draw_tracks(img, live)


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
    tracker = KLTTracker(cfg, seq.K)
    traj = Trajectory2D(gt44, dataset=cfg.dataset)
    tracker.seed(seq.frame(0))
    traj.push(0, np.eye(4))
    prev = seq.frame(0)
    for i in range(1, len(seq)):
        cur = seq.frame(i)
        tracker.step(prev, cur)
        traj.push(i, tracker.world_map.poses[-1])
        prev = cur
    traj.save(f"trajectory_{cfg.dataset}_klt.png")
    logger.info("legacy KLT done: %d poses (%d rot-only, %d full, %d reseeds)",
                len(tracker.world_map.poses), tracker.n_rot_only,
                tracker.n_full, tracker.n_reseed)
    return tracker


if __name__ == "__main__":
    run(parse_config())
