"""Main SLAM driver: the live monocular pipeline state machine.

Re-implements the reference entrypoint (slam/monocular/main_revamped.py:85-727)
over the TPU-native stack: delayed two-view bootstrap -> frame-to-map
PnP tracking (with the 2D-2D essential fallback) -> keyframe policy ->
KF-pair triangulation -> local bundle adjustment -> visualization/outputs.

State machine parity notes (all thresholds inherited, SURVEY.md §5):
  * bootstrap reference reseeding when matches < 80 or age > 30
    (main_revamped.py:101-106,350-353);
  * InitParams overrides: posdepth 0.90, parallax 0.5 deg, ratio_H 0.45
    (:358-362);
  * PnP: const-velocity prediction, proj_radius window, accept at
    >= pnp_min_inliers, iters=300 / conf=0.999 (:449-499);
  * fallback 2D-2D: essential matrix on the prev<->cur matches, unit t
    scaled by the last relative translation magnitude (:502-542);
  * per-frame keyframe selection + triangulation (parallax_min 2.0 deg,
    :551-567) and local BA when >= local_ba_min_new_points landmarks were
    added (:576);
  * GBA milestone check scaffolded but disabled, like the reference
    (:597-614);
  * always saves ``trajectory_<dataset>.png`` at the end (:717-718); also
    prints ATE-RMSE vs GT (the reference left its eval tool empty).

Run:  python -m simpleslam_tpu.run_slam --dataset kitti --base_dir <dir> \
          --headless --no_viz3d
"""
from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.config import SLAMConfig, parse_config
from simpleslam_tpu.core import frontend
from simpleslam_tpu.core.ba import (global_bundle_adjustment,
                                    local_bundle_adjustment)
from simpleslam_tpu.core.bootstrap import InitParams, bootstrap_two_view_map
from simpleslam_tpu.core.keyframe import Keyframe, make_thumb, select_keyframe
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.trajectory_utils import compute_gt_alignment
from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.core.triangulate import triangulate_between_kfs_2view
from simpleslam_tpu.data import Sequence
from simpleslam_tpu.ops import epipolar, pnp, projection, se3
from simpleslam_tpu.tools.trajectory_eval import ate_rmse
from simpleslam_tpu.utils.profiling import StageTimer, jax_trace
from simpleslam_tpu.viz import Trajectory2D, Visualizer3D, VizUI

logger = logging.getLogger("main")


@dataclass
class BootstrapState:
    """Reference anchor for the delayed bootstrap (main_revamped.py:85-106)."""
    ref_idx: int = -1
    ref_feats: Optional[Features] = None
    ref_img: Optional[np.ndarray] = None

    def seed(self, idx: int, feats: Features, img: np.ndarray) -> None:
        self.ref_idx = idx
        self.ref_feats = feats
        self.ref_img = img

    def clear(self) -> None:
        self.ref_idx = -1
        self.ref_feats = None
        self.ref_img = None

    def refresh_needed(self, n_matches: int, cur_idx: int,
                       min_matches: int = 80, max_age: int = 30) -> bool:
        """Reseed when the pair went stale (main_revamped.py:101-106)."""
        return n_matches < min_matches or (cur_idx - self.ref_idx) > max_age


@dataclass
class SLAMResult:
    poses_cw: List[np.ndarray] = field(default_factory=list)
    frame_ids: List[int] = field(default_factory=list)
    n_keyframes: int = 0
    n_landmarks: int = 0
    ate: Optional[float] = None
    fps: float = 0.0
    n_frames: int = 0
    tracking_lost_count: int = 0
    map_compactions: int = 0    # fused-mode eviction passes (long sequences)
    kf_frames: List[int] = field(default_factory=list)  # KF source frame ids
    loop_closures: int = 0      # accepted loop closures (--loop_closure)
    # accepted closure records (core/loop.LoopClosure: cur_kf/cand_kf are
    # keyframe sequence ids; scale is the measured Sim3 drift) — the
    # host-vs-fused parity test asserts the two modes accept the same edges
    closure_events: List[object] = field(default_factory=list)
    gba_runs: int = 0           # completed global-BA solves (--gba_enable)


class SLAMSystem:
    """The live pipeline, reusable by the CLI, tests and benchmarks."""

    def __init__(self, cfg: SLAMConfig, K: np.ndarray,
                 D: Optional[np.ndarray] = None,
                 img_hw: Optional[tuple] = None):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.timer = StageTimer()
        self.detector, self.matcher = frontend.init_feature_pipeline(cfg)
        self.world_map = Map()
        self.kfs: List[Keyframe] = []
        self.last_kf_frame_no = -999
        self.bs = BootstrapState()
        self.initialised = False
        self.tracking_lost_count = 0
        self.frame_ids: List[int] = []
        self.want_viz = False          # run() enables for non-headless runs
        self._prev_img: Optional[np.ndarray] = None
        self._last_matches = None      # (feats_prev, feats_cur, Matches)
        self._trackbook = None
        self._snap_cache = None
        self.loop_closer = None        # created on demand (--loop_closure)
        self.gba_runs = 0              # completed global BA solves (--gba_enable)
        self._last_gba_kf_count = -1   # milestone dedup (main_revamped.py:304)
        self._lost_streak = 0          # consecutive lost frames (greloc gate)
        self._vel_reset = False        # zero the motion model after a reloc jump
        self._place_vecs: List[np.ndarray] = []   # per-KF place vectors
        self._key = jax.random.PRNGKey(cfg.seed)
        self._base_key = jax.random.PRNGKey(cfg.seed)
        self._undistort_maps = None
        self._new_K = self.K
        self.img_hw = img_hw
        if D is not None and np.any(np.abs(np.asarray(D)) > 1e-12) and img_hw:
            H, W = img_hw
            Kj = jnp.asarray(self.K, jnp.float32)
            Dj = jnp.asarray(D, jnp.float32)
            newK = projection.optimal_new_camera_matrix(Kj, Dj, (W, H))
            mapx, mapy = projection.undistort_rectify_map(Kj, Dj, newK, (W, H))
            self._undistort_maps = (mapx, mapy)
            self._new_K = np.asarray(newK, np.float64)
            self.K = self._new_K
        self.init_params = InitParams(
            ransac_px=cfg.ransac_thresh,
            min_posdepth=cfg.bootstrap_min_posdepth,
            min_parallax_deg=cfg.bootstrap_min_parallax_deg,
            score_ratio_H=cfg.bootstrap_score_ratio_h,
            n_hyp=cfg.ransac_hypotheses)

    # ------------------------------------------------------------------ utils
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _site_key(self, frame_idx: int, site: int):
        """Per-(frame, site) key — the SAME derivation the fused loop uses
        (core/fused.frame_key), so both drivers consume identical randomness
        at equivalent RANSAC/matching sites."""
        from simpleslam_tpu.core.fused import frame_key

        return frame_key(self._base_key, frame_idx, site)

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        if self._undistort_maps is not None:
            mapx, mapy = self._undistort_maps
            img = np.asarray(projection.remap_bilinear(jnp.asarray(img),
                                                       mapx, mapy))
        return img

    def extract(self, img: np.ndarray) -> Features:
        return frontend.feature_extractor(self.cfg, img, self.detector)

    def match(self, f0: Features, f1: Features, key=None) -> Matches:
        return frontend.match_with_ransac(
            self.cfg, self.matcher, f0, f1,
            key=key if key is not None else self._next_key())

    def _map_snapshot(self):
        """Padded map view for the jitted tracking step, CACHED ON DEVICE:
        the map only mutates at bootstrap/keyframe events, so between
        keyframes the snapshot (several MB) stays resident instead of being
        rebuilt + re-uploaded every frame (a ~40 ms/frame cost through this
        machine's host->device tunnel)."""
        ver = self.world_map.version
        if self._snap_cache is not None and self._snap_cache[0] == ver:
            return self._snap_cache[1]
        desc = np.asarray(self.kfs[-1].feats.desc) if self.kfs else None
        desc_dim = desc.shape[1] if desc is not None else 32
        desc_dtype = desc.dtype if desc is not None else np.uint8
        host = self.world_map.snapshot(self.cfg.map_capacity, desc_dim,
                                       desc_dtype)
        snap = {k: (jnp.asarray(v) if k != "pid" else v)
                for k, v in host.items()}
        self._snap_cache = (ver, snap)
        return snap

    def _refresh_rings(self, snap, assoc, inl, feats) -> None:
        """Keep landmark descriptor rings current with this frame's matched
        descriptors (PnP inliers only). Without this, association quality
        decays between keyframes as viewpoint drifts and one weak frame can
        cascade into tracking loss. Updates the DEVICE snapshot in place
        (tiny scatter, no re-upload) and mirrors into the host map's rings
        (no version bump: the next full rebuild sees the same state).
        """
        sel = np.flatnonzero(np.asarray(assoc.valid & inl))
        if sel.size == 0:
            return
        rows = jnp.asarray(sel, jnp.int32)
        kp_sel = assoc.kp_idx[rows]
        descs = feats.desc[kp_sel]
        ring = snap["desc"]
        nd = snap["n_desc"]
        slots = nd[rows] % ring.shape[1]
        snap["desc"] = ring.at[rows, slots].set(descs)
        snap["n_desc"] = nd.at[rows].add(1)
        if self._snap_cache is not None:
            self._snap_cache = (self._snap_cache[0], snap)
        # host mirror (authoritative for the next full snapshot rebuild)
        pids = snap["pid"][sel]
        descs_np = np.asarray(descs)
        for pid, d in zip(pids, descs_np):
            if pid >= 0:
                self.world_map.refresh_ring(int(pid), d)

    # ------------------------------------------------------------ bootstrap
    def _try_bootstrap(self, frame_idx: int, img: np.ndarray, feats: Features
                       ) -> bool:
        cfg = self.cfg
        if self.bs.ref_feats is None:
            self.bs.seed(frame_idx, feats, img)
            return False

        matches = self.match(self.bs.ref_feats, feats)
        n_m = int(np.asarray(matches.valid).sum())
        if self.bs.refresh_needed(n_m, frame_idx,
                                  cfg.bootstrap_refresh_min_matches,
                                  cfg.bootstrap_refresh_max_age):
            logger.info("[BOOTSTRAP] reseeding reference (matches=%d age=%d)",
                        n_m, frame_idx - self.bs.ref_idx)
            self.bs.seed(frame_idx, feats, img)
            return False

        ok, T0, T1 = bootstrap_two_view_map(
            self.K, self.bs.ref_feats, feats, matches, cfg, self.world_map,
            self.init_params, key=self._next_key())
        if not ok:
            return False

        self.world_map.add_pose(T0, is_keyframe=True)
        self.world_map.add_pose(T1, is_keyframe=True)
        self.frame_ids.extend([self.bs.ref_idx, frame_idx])
        ref_img = self.bs.ref_img
        thumb0 = make_thumb(ref_img, tuple(cfg.kf_thumb_hw)) if ref_img is not None else b""
        thumb1 = make_thumb(img, tuple(cfg.kf_thumb_hw)) if img is not None else b""
        self.kfs.append(Keyframe(0, self.bs.ref_idx, "", self.bs.ref_feats,
                                 T0, thumb0))
        self.kfs.append(Keyframe(1, frame_idx, "", feats, T1, thumb1))
        self.last_kf_frame_no = frame_idx
        self.initialised = True
        self.bs.clear()
        logger.info("[BOOTSTRAP] initialised at frame %d (map=%d)",
                    frame_idx, len(self.world_map))
        return True

    # ------------------------------------------------------------- tracking
    def _track(self, frame_idx: int, feats: Features,
               prev_feats: Features, matches_prev: Matches) -> bool:
        """State B: PnP tracking with 2D-2D fallback. Returns success."""
        cfg = self.cfg
        poses = self.world_map.poses
        T_prev = poses[-1]
        T_prevprev = poses[-2] if len(poses) >= 2 else poses[-1]
        if self._vel_reset:
            # the two latest poses straddle a relocalization jump — the
            # const-vel "velocity" between them is meaningless
            T_pred = T_prev.copy()
            self._vel_reset = False
        else:
            T_pred = np.asarray(pnp.predict_pose_const_vel(
                jnp.asarray(T_prevprev, jnp.float32),
                jnp.asarray(T_prev, jnp.float32)), np.float64)

        snap = self._map_snapshot()
        H, W = self.img_hw if self.img_hw else (10000, 10000)
        from simpleslam_tpu.core.fused import SITE_PNP

        def attempt(radius_px):
            """One assoc+PnP pass; returns (T_est, inl, assoc) or
            (None, why, assoc). radius_px is a traced scalar of the jitted
            association program — a widened retry reuses the compile."""
            assoc = pnp.reproject_and_match_2d3d(
                snap["positions"], snap["alive"],
                snap["desc"], snap["n_desc"],
                feats.kpts, feats.desc, feats.valid,
                jnp.asarray(self.K, jnp.float32),
                jnp.asarray(T_pred, jnp.float32),
                img_w=int(W), img_h=int(H), radius_px=radius_px,
                max_hamm=cfg.match_max_hamm, max_l2=cfg.match_max_l2)
            n_cand = int(np.asarray(assoc.valid).sum())
            if n_cand < cfg.pnp_min_inliers:
                return None, f"too few 2D-3D candidates ({n_cand})", assoc
            pts2d = feats.kpts[assoc.kp_idx]
            T_est, inl, n_inl, ok = pnp.solve_pnp_ransac(
                self._site_key(frame_idx, SITE_PNP), snap["positions"],
                pts2d, assoc.valid, jnp.asarray(self.K, jnp.float32),
                cfg.ransac_thresh,
                Tcw_init=jnp.asarray(T_pred, jnp.float32),
                n_hyp=cfg.ransac_hypotheses)
            if bool(ok) and int(n_inl) >= cfg.pnp_min_inliers:
                return (T_est, inl), "", assoc
            return None, (f"PnP rejected (inl={int(n_inl)} < "
                          f"{cfg.pnp_min_inliers})"), assoc

        hit, why, assoc = attempt(cfg.proj_radius)
        wf = float(getattr(cfg, "assoc_wide_factor", 0.0))
        if hit is None and wf > 1.0:
            # widened-window retry (ORB-SLAM's recovery): covers prediction
            # error beyond proj_radius — e.g. unmodelled yaw onset, whose
            # rotation flow exceeds the window on the first corner frame
            hit, why2, assoc = attempt(cfg.proj_radius * wf)
            if hit is not None:
                logger.info("[TRACK] wide-window retry recovered (%s at "
                            "r=%.0f px)", why, cfg.proj_radius)
            else:
                why = f"{why}; wide retry: {why2}"

        tracking_lost = True
        if hit is not None:
            T_est, inl = hit
            self.world_map.add_pose(np.asarray(T_est, np.float64),
                                    is_keyframe=False)
            self.frame_ids.append(frame_idx)
            if not cfg.localize_only:   # rings are map state: frozen there
                self._refresh_rings(snap, assoc, inl, feats)
            tracking_lost = False
        else:
            logger.info("[TRACK] %s", why)

        if tracking_lost and cfg.reloc and self.kfs:
            with self.timer.stage("reloc"):
                if self._relocalize(frame_idx, feats, T_pred):
                    tracking_lost = False
        if (tracking_lost and cfg.global_reloc and self.kfs
                and self._lost_streak + 1 >= cfg.global_reloc_after):
            with self.timer.stage("greloc"):
                if self._global_relocalize(frame_idx, feats):
                    tracking_lost = False
        if tracking_lost:
            self.tracking_lost_count += 1
            self._fallback_2d2d(frame_idx, feats, prev_feats, matches_prev)
        self._lost_streak = self._lost_streak + 1 if tracking_lost else 0
        return not tracking_lost

    def _pnp_against_kf(self, frame_idx: int, feats: Features, kf,
                        T_init: np.ndarray, site: Optional[int] = None):
        """Match the current frame against one keyframe and PnP on the
        landmarks its keypoints observe. Returns (T_cw, n_inliers, n_pairs)
        or None. Shared core of local and global relocalization."""
        cfg = self.cfg
        m = frontend.feature_matcher(cfg, kf.feats, feats, self.matcher)
        kp2pid = {}
        for pid, mp in self.world_map.points.items():
            for (kf_idx, kp_idx, _d) in mp.observations:
                if kf_idx == kf.idx:
                    kp2pid[int(kp_idx)] = pid
        idx0 = np.asarray(m.idx0)
        idx1 = np.asarray(m.idx1)
        mv = np.asarray(m.valid)
        kpts = np.asarray(feats.kpts)
        pts3d, pts2d = [], []
        for a, b, v in zip(idx0, idx1, mv):
            pid = kp2pid.get(int(a))
            if v and pid is not None:
                pts3d.append(np.asarray(
                    self.world_map.points[pid].position, np.float32))
                pts2d.append(kpts[int(b)])
        if len(pts3d) < cfg.pnp_min_inliers:
            return None
        M = len(pts3d)
        Mp = 1 << (max(M, 8) - 1).bit_length()      # pow2 pad: jit reuse
        P3 = np.zeros((Mp, 3), np.float32)
        P3[:M] = pts3d
        P2 = np.zeros((Mp, 2), np.float32)
        P2[:M] = pts2d
        val = np.zeros(Mp, bool)
        val[:M] = True
        from simpleslam_tpu.core.fused import SITE_RELOC
        if site is None:
            site = SITE_RELOC
        T_r, _inl, n_inl, ok = pnp.solve_pnp_ransac(
            self._site_key(frame_idx, site), jnp.asarray(P3),
            jnp.asarray(P2),
            jnp.asarray(val), jnp.asarray(self.K, jnp.float32),
            cfg.ransac_thresh, Tcw_init=jnp.asarray(T_init, jnp.float32),
            n_hyp=cfg.ransac_hypotheses)
        if bool(ok) and int(n_inl) >= cfg.pnp_min_inliers:
            return np.asarray(T_r, np.float64), int(n_inl), M
        return None

    def _relocalize(self, frame_idx: int, feats: Features,
                    T_pred: np.ndarray) -> bool:
        """Keyframe 2D-3D relocalization: match the current frame against
        the last keyframe, PnP on the landmarks its keypoints observe (the
        reference's unimplemented 'trigger relocalization here in the
        future' hook, main_revamped.py:501)."""
        kf = self.kfs[-1]
        hit = self._pnp_against_kf(frame_idx, feats, kf, T_pred)
        if hit is None:
            return False
        T_r, n_inl, M = hit
        self.world_map.add_pose(T_r, is_keyframe=False)
        self.frame_ids.append(frame_idx)
        logger.info("[RELOC] recovered pose via KF %d (inliers=%d/%d)",
                    kf.idx, n_inl, M)
        return True

    def _global_relocalize(self, frame_idx: int, feats: Features) -> bool:
        """Kidnapped-robot recovery (beyond reference): place-recognition
        candidates over ALL keyframes (pooled-descriptor cosine, the loop-
        closure place vectors), then 2D-3D PnP against each candidate with
        the CANDIDATE's own pose as the initial guess — after sustained
        loss the motion-model prediction is meaningless. A wrong candidate
        simply fails the PnP inlier gate; it never rewrites anything."""
        cfg = self.cfg
        if self.img_hw is None:
            logger.debug("[GRELOC] no image size known; skipping")
            return False
        from simpleslam_tpu.core.loop import place_vector
        while len(self._place_vecs) < len(self.kfs):
            kf = self.kfs[len(self._place_vecs)]
            self._place_vecs.append(
                place_vector(kf.feats, self.img_hw, cfg.loop_grid))
        vec = place_vector(feats, self.img_hw, cfg.loop_grid)
        sims = np.stack(self._place_vecs) @ vec
        order = np.argsort(-sims)[: int(cfg.global_reloc_topk)]
        for cand in order:
            if sims[cand] < cfg.global_reloc_min_sim:
                break
            kf = self.kfs[int(cand)]
            from simpleslam_tpu.core.fused import SITE_GRELOC
            hit = self._pnp_against_kf(frame_idx, feats, kf,
                                       np.asarray(kf.pose, np.float64),
                                       site=SITE_GRELOC)
            if hit is None:
                continue
            T_r, n_inl, M = hit
            self.world_map.add_pose(T_r, is_keyframe=False)
            self.frame_ids.append(frame_idx)
            self._vel_reset = True    # const-vel across the jump is garbage
            logger.info("[GRELOC] kidnapped-robot recovery via KF %d "
                        "(sim=%.3f, inliers=%d/%d)", kf.idx,
                        float(sims[cand]), n_inl, M)
            return True
        return False

    def _fallback_2d2d(self, frame_idx: int, feats: Features,
                       prev_feats: Features, matches: Matches) -> None:
        """Essential-matrix 2D-2D step with const-velocity scale
        (main_revamped.py:502-542)."""
        cfg = self.cfg
        poses = self.world_map.poses
        from simpleslam_tpu.core.fused import SITE_ESS
        p0 = prev_feats.kpts[matches.idx0]
        p1 = feats.kpts[matches.idx1]
        E, inl, ok = epipolar.find_essential(
            self._site_key(frame_idx, SITE_ESS), p0, p1, matches.valid,
            jnp.asarray(self.K, jnp.float32), cfg.ransac_thresh,
            n_hyp=cfg.ransac_hypotheses)
        if not bool(ok):
            logger.info("[FALLBACK] essential failed; dead-reckoning")
            self.world_map.add_pose(poses[-1].copy(), is_keyframe=False)
            self.frame_ids.append(frame_idx)
            return
        R, t, _good, _n = epipolar.recover_pose_essential(
            E, p0, p1, inl, jnp.asarray(self.K, jnp.float32))
        # scale |t| by the last relative translation (0 if unknown)
        scale = 0.0
        if len(poses) >= 2:
            T_rel_last = poses[-1] @ np.linalg.inv(poses[-2])
            scale = float(np.linalg.norm(T_rel_last[:3, 3]))
        T_rel = np.asarray(se3.rt_to_T(R, t * scale), np.float64)
        T_new = T_rel @ poses[-1]
        self.world_map.add_pose(T_new, is_keyframe=False)
        self.frame_ids.append(frame_idx)
        logger.info("[FALLBACK] 2D-2D pose applied (scale=%.3f)", scale)

    # ------------------------------------------------------------ keyframes
    def _maybe_keyframe(self, frame_idx: int, img: np.ndarray,
                        feats: Features) -> int:
        """Keyframe policy + triangulation + local BA. Returns #new points."""
        from simpleslam_tpu.core.fused import SITE_KF_MATCH, SITE_KF_MATCH2

        cfg = self.cfg
        T_cur = self.world_map.poses[-1]
        n_before = len(self.kfs)
        k_kfm = self._site_key(frame_idx, SITE_KF_MATCH)
        self.kfs, self.last_kf_frame_no = select_keyframe(
            cfg, frame_idx, img, feats, T_cur,
            lambda a, b: self.match(a, b, key=k_kfm), self.kfs,
            self.last_kf_frame_no)
        if len(self.kfs) == n_before:
            return 0
        # record which FRAME this KF corresponds to
        self.world_map.keyframe_indices.append(len(self.world_map.poses) - 1)

        new_ids = []
        if len(self.kfs) >= 2:
            with self.timer.stage("triangulate"):
                new_ids = triangulate_between_kfs_2view(
                    cfg, self.K, self.kfs[-2], self.kfs[-1], self.world_map,
                    self.matcher,
                    parallax_min_deg=cfg.triangulation_parallax_min_deg,
                    key=k_kfm)
                if getattr(cfg, "tri_kf2", False) and len(self.kfs) >= 3:
                    # second pass vs the KF before: doubled baseline recovers
                    # the forward-motion geometry the 2 deg parallax gate
                    # rejects at single-KF baselines
                    used = {self.world_map.points[p].observations[-1][1]
                            for p in new_ids
                            if p in self.world_map.points}
                    new_ids += triangulate_between_kfs_2view(
                        cfg, self.K, self.kfs[-3], self.kfs[-1],
                        self.world_map, self.matcher,
                        parallax_min_deg=cfg.triangulation_parallax_min_deg,
                        key=self._site_key(frame_idx, SITE_KF_MATCH2),
                        exclude_cur_kp=used)
        if len(new_ids) >= cfg.local_ba_min_new_points and len(self.kfs) >= 2:
            try:
                poses_before = None
                if cfg.viz_ba:
                    poses_before = {kf.idx: np.asarray(kf.pose).copy()
                                    for kf in self.kfs}
                with self.timer.stage("local_ba"):
                    local_bundle_adjustment(
                        self.world_map, self.K, self.kfs,
                        center_kf_idx=len(self.kfs) - 1,
                        window_size=cfg.local_ba_window,
                        max_points=cfg.local_ba_max_points,
                        max_iters=cfg.local_ba_max_iters)
                if cfg.viz_ba:
                    from simpleslam_tpu.viz.visualize_ba import \
                        visualize_ba_window
                    first = max(1, len(self.kfs) - cfg.local_ba_window)
                    visualize_ba_window(
                        self.world_map, self.K, self.kfs,
                        list(range(first, len(self.kfs))), poses_before,
                        show=self.want_viz)
            except Exception as e:  # BA must never kill tracking (parity)
                logger.warning("[Local BA] failed: %s", e)

        if cfg.loop_closure and len(self.kfs) >= 2:
            from simpleslam_tpu.core.fused import SITE_LOOP
            from simpleslam_tpu.core.loop import LoopCloser
            if self.loop_closer is None:
                self.loop_closer = LoopCloser(cfg, self.K, self.matcher)
            with self.timer.stage("loop"):
                lc = self.loop_closer.on_new_keyframe(
                    self.kfs, self.world_map, self.img_hw,
                    self._site_key(frame_idx, SITE_LOOP))
            if lc is not None and cfg.gba_enable:
                # Polish the PGO-rewritten map with a full metric BA: the
                # Sim(3) graph solve corrects poses/scale but leaves each
                # landmark at its per-segment transformed position.
                self.run_global_ba()
        return len(new_ids)

    def run_global_ba(self) -> bool:
        """Full-map Schur-LM BA (--gba_enable). The reference scaffolds this
        milestone but disables it (main_revamped.py:597-614); here it is a
        working opt-in."""
        if len(self.kfs) < 2 or self.cfg.localize_only:
            return False
        cfg = self.cfg
        # GBA writes back only KEYFRAME poses; trailing non-KF frames would
        # keep their pre-polish values and the next motion-model prediction
        # (host const-vel, or the fused reseed from poses[-1]/[-2]) would be
        # inconsistent with the polished landmarks. Capture the last KF pose
        # so its delta can be propagated through the tail afterwards.
        ki = self.world_map.keyframe_indices
        anchor = ki[-1] if ki else None
        T_pre = (np.array(self.world_map.poses[anchor])
                 if anchor is not None and anchor < len(self.world_map.poses)
                 else None)
        try:
            with self.timer.stage("gba"):
                ok = global_bundle_adjustment(
                    self.world_map, self.K, self.kfs,
                    max_points=cfg.gba_max_points,
                    max_iters=cfg.gba_max_iters,
                    fix_first=bool(cfg.gba_fix_first))
        except Exception as e:  # BA must never kill tracking (parity)
            logger.warning("[Global BA] failed: %s", e)
            return False
        if ok:
            self.gba_runs += 1
            if T_pre is not None:
                # B_post = (B_pre @ A_pre^-1) @ A_post keeps each trailing
                # frame's relative pose to the last keyframe fixed
                T_post = np.asarray(self.world_map.poses[anchor])
                corr = np.linalg.inv(T_pre) @ T_post
                for i in range(anchor + 1, len(self.world_map.poses)):
                    self.world_map.poses[i] = self.world_map.poses[i] @ corr
        return ok

    # ------------------------------------------------------------ main step
    def process_frame(self, frame_idx: int, img: np.ndarray,
                      prev_feats: Optional[Features]) -> Features:
        with self.timer.stage("preprocess"):
            img = self.preprocess(img)
        if self.img_hw is None:
            self.img_hw = img.shape[:2]
        with self.timer.stage("extract"):
            feats = self.extract(img)
        if self.cfg.localize_only and not self.world_map.poses:
            # frozen-map localization starts kidnapped: the first pose must
            # come from place recognition, not bootstrap or a motion model
            with self.timer.stage("greloc"):
                self._global_relocalize(frame_idx, feats)
            return feats
        if prev_feats is None:
            if not self.initialised:
                self.bs.seed(frame_idx, feats, img)
            return feats

        if not self.initialised:
            with self.timer.stage("bootstrap"):
                self._try_bootstrap(frame_idx, img, feats)
            return feats

        with self.timer.stage("match_prev"):
            from simpleslam_tpu.core.fused import SITE_PREV_MATCH
            matches_prev = self.match(
                prev_feats, feats,
                key=self._site_key(frame_idx, SITE_PREV_MATCH))
        with self.timer.stage("track"):
            self._track(frame_idx, feats, prev_feats, matches_prev)
        with self.timer.stage("keyframe"):
            if not self.cfg.localize_only:   # the map is frozen in that mode
                self._maybe_keyframe(frame_idx, img, feats)

        if self.want_viz:
            from simpleslam_tpu.viz.windows import TrackBook
            if self._trackbook is None:
                self._trackbook = TrackBook()
            kp_prev = np.asarray(prev_feats.kpts)
            kp_cur = np.asarray(feats.kpts)
            i0 = np.asarray(matches_prev.idx0)
            i1 = np.asarray(matches_prev.idx1)
            mv = np.asarray(matches_prev.valid)
            self._trackbook.advance(kp_prev, kp_cur, i0, i1, mv)
            self._last_matches = (self._prev_img, img, kp_prev, kp_cur,
                                  i0, i1, mv)
        self._prev_img = img

        # Global BA milestone — scaffolded but DISABLED by default, like the
        # reference (main_revamped.py:597-612: keyed on KEYFRAME count with a
        # last-GBA dedup, so frames that add no KFs never re-solve an
        # unchanged map); --gba_enable makes it real.
        if self.cfg.gba_every and self.cfg.gba_enable and self.initialised:
            kfc = len(self.kfs)
            if (kfc > 0 and kfc % self.cfg.gba_every == 0
                    and kfc != self._last_gba_kf_count):
                self.run_global_ba()
                self._last_gba_kf_count = kfc
        return feats


def _host_assist_reloc(cfg: SLAMConfig, system: "SLAMSystem", state, fc,
                       host: dict):
    """Fused-mode kidnapped-robot rescue at a loop sync (beyond reference).

    The on-device global reloc only sees the Kw-slot keyframe RING
    (core/fused.py kf_place) — after a long outage the ring holds only
    dead-zone keyframes, so the device can never jump back to the early
    map (measured on the 1200-frame square soak: 360 consecutive lost
    frames straight through a revisit of the densest mapped region). The
    HOST at sync time has every keyframe, the full place-vector index and
    the landmark archive: relocalize the newest synced keyframe against
    ALL of them, then push the recovered pose AND the matched region's
    archived landmarks (positions + descriptors recovered through their
    observing keyframes) back into free device map rows so tracking has
    something to associate against on the next dispatch.

    Returns the updated FusedState, or None if no rescue happened."""
    import jax.numpy as jnp

    fl = host["log_flags"]
    n_log = int(host["log_n"])
    after = int(getattr(cfg, "fused_rescue_after", 24))
    if after <= 0 or n_log == 0:
        return None
    streak = 0
    for i in range(n_log - 1, -1, -1):
        if fl[i, 0] > 0.5:
            break
        streak += 1
    if streak < after:
        return None
    # query view: the newest synced keyframe that still carries real
    # features (ring-materialized this sync)
    kf_q = next((kf for kf in reversed(system.kfs)
                 if int(np.asarray(kf.feats.valid).sum()) > 0), None)
    if kf_q is None or system.loop_closer is None:
        return None
    wm = system.world_map
    lc = system.loop_closer
    from simpleslam_tpu.core import frontend
    from simpleslam_tpu.core.fused import SITE_GRELOC
    from simpleslam_tpu.core.loop import place_vector
    while len(system._place_vecs) < len(system.kfs):
        kf = system.kfs[len(system._place_vecs)]
        system._place_vecs.append(
            place_vector(kf.feats, system.img_hw, cfg.loop_grid))
    vec = place_vector(kf_q.feats, system.img_hw, cfg.loop_grid)
    sims = np.stack(system._place_vecs) @ vec
    order = [c for c in np.argsort(-sims)
             if system.kfs[int(c)].idx != kf_q.idx]
    kpts_q = np.asarray(kf_q.feats.kpts)
    for cand in order[: max(4, int(cfg.global_reloc_topk))]:
        if sims[cand] < cfg.global_reloc_min_sim:
            break
        kf_c = system.kfs[int(cand)]
        kp2pid = lc._kp2pid(wm, kf_c.idx)
        if len(kp2pid) < cfg.pnp_min_inliers:
            continue                    # dead-zone KF: maps nothing
        m = frontend.feature_matcher(cfg, kf_c.feats, kf_q.feats,
                                     system.matcher)
        pts3d, pts2d = [], []
        for a, b, v in zip(np.asarray(m.idx0), np.asarray(m.idx1),
                           np.asarray(m.valid)):
            pid = kp2pid.get(int(a))
            if v and pid is not None:
                pts3d.append(lc._position_of(wm, pid).astype(np.float32))
                pts2d.append(kpts_q[int(b)])
        if len(pts3d) < cfg.pnp_min_inliers:
            continue
        M = len(pts3d)
        Mp = 1 << (max(M, 8) - 1).bit_length()
        P3 = np.zeros((Mp, 3), np.float32)
        P2 = np.zeros((Mp, 2), np.float32)
        val = np.zeros(Mp, bool)
        P3[:M], P2[:M], val[:M] = pts3d, pts2d, True
        T_r, _inl, n_inl, ok = pnp.solve_pnp_ransac(
            system._site_key(kf_q.frame_idx, SITE_GRELOC),
            jnp.asarray(P3), jnp.asarray(P2), jnp.asarray(val),
            jnp.asarray(system.K, jnp.float32), cfg.ransac_thresh,
            Tcw_init=jnp.asarray(kf_c.pose, jnp.float32),
            n_hyp=cfg.ransac_hypotheses)
        # a junk-drift keyframe can pass a marginal PnP on locally-
        # consistent garbage; a real revisit of a mapped region clears a
        # 2x gate easily
        if not bool(ok) or int(n_inl) < 2 * cfg.pnp_min_inliers:
            continue
        T_r = np.asarray(T_r, np.float64)
        # ---- re-inject the matched region's landmarks into the device map
        n_points = int(host["n_points"])
        C = fc.map_capacity
        dev_alive = {int(p) for p, a in zip(host["pid"][:n_points],
                                            host["alive"][:n_points]) if a}
        inject = {}
        for nb in range(max(0, int(cand) - 2),
                        min(len(system.kfs), int(cand) + 3)):
            kf_n = system.kfs[nb]
            if int(np.asarray(kf_n.feats.valid).sum()) == 0:
                continue
            desc_n = np.asarray(kf_n.feats.desc)
            valid_n = np.asarray(kf_n.feats.valid)
            for kp, pid in lc._kp2pid(wm, kf_n.idx).items():
                if pid in dev_alive or pid in inject or kp >= len(desc_n) \
                        or not valid_n[kp]:
                    continue
                inject[pid] = (lc._position_of(wm, pid), desc_n[kp])
        free = C - n_points
        items = list(inject.items())[: min(free, 2048)]
        frame_now = int(np.asarray(state.frame_no))
        if items:
            rows = jnp.arange(n_points, n_points + len(items))
            pos_i = jnp.asarray(np.stack([p for _, (p, _d) in items])
                                .astype(np.float32))
            desc_i = jnp.asarray(np.stack([d for _, (_p, d) in items])
                                 .astype(np.float32))
            pids_i = jnp.asarray(np.array([p for p, _ in items], np.int32))
            state = state.replace(
                positions=state.positions.at[rows].set(pos_i),
                alive=state.alive.at[rows].set(True),
                desc_ring=state.desc_ring.at[rows, 0].set(desc_i),
                n_desc=state.n_desc.at[rows].set(1),
                obs_kf=state.obs_kf.at[rows].set(-1),
                obs_n=state.obs_n.at[rows].set(0),
                pid=state.pid.at[rows].set(pids_i),
                last_seen=state.last_seen.at[rows].set(frame_now),
                n_points=jnp.int32(n_points + len(items)))
            # host map: the injected pids are live again (sync reconciles
            # by pid; leaving them archived would re-archive them)
            grey = np.full((3,), 0.7, np.float32)
            for pid, (pos, _d) in items:
                if pid in wm.archived:
                    _apos, obs_pairs, created = wm.archived.pop(pid)
                    if wm.upsert_point(pid, np.asarray(pos, np.float64),
                                       colour=grey, keyframe_idx=created):
                        mp = wm.points[pid]
                        for (k, kp) in obs_pairs:
                            kfk = system.kfs[k] if k < len(system.kfs) \
                                else None
                            if kfk is not None and \
                                    kp < len(np.asarray(kfk.feats.desc)):
                                mp.add_observation(
                                    k, kp, np.asarray(kfk.feats.desc)[kp])
            wm.version += 1
        state = state.replace(
            Tcw=jnp.asarray(T_r, jnp.float32),
            Tcw_prev=jnp.asarray(T_r, jnp.float32),   # zero velocity
            lost_streak=jnp.int32(0))
        logger.info(
            "[RESCUE] host-assisted reloc after %d lost frames: KF %d "
            "recovered via KF %d (sim %.3f, %d/%d inliers), %d landmarks "
            "re-injected (%d archived remain)", streak, kf_q.idx, kf_c.idx,
            float(sims[cand]), int(n_inl), M, len(items), len(wm.archived))
        return state
    return None


def _run_fused_loop(cfg: SLAMConfig, seq: Sequence, system: "SLAMSystem",
                    prev_feats: Features, start_idx: int) -> None:
    """Device-resident tracking for frames [start_idx, len(seq)): one jitted
    dispatch per frame, no host readbacks until the final sync (core/fused).
    Host work per frame = decode + upload, overlapped by the Prefetcher."""
    from simpleslam_tpu.core.fused import (SITE_LOOP, apply_host_correction,
                                           build_fused_step,
                                           make_fused_config,
                                           state_from_host, sync_to_host)
    from simpleslam_tpu.data.dataloader import Prefetcher

    desc = np.asarray(prev_feats.desc)
    log_cap = 1 << max(10, (len(seq)).bit_length())
    fc = make_fused_config(cfg, system.img_hw,
                           n_kp=int(prev_feats.kpts.shape[0]),
                           desc_dim=int(desc.shape[1]), log_capacity=log_cap)
    match_fn = getattr(system.matcher, "fn_fast", None) or system.matcher.fn
    step = build_fused_step(fc, system.K, system.detector.fn,
                            match_fn, system._undistort_maps)
    state = state_from_host(system, fc, prev_feats)

    if cfg.stage_all:
        # soak benchmarking: decode + upload everything up front so the
        # timed loop measures the fused step, not the single-core PNG
        # decoder or the debug tunnel's ~150 MB/s host->device path (the
        # same staging tools/diagnose e2e --stage_all uses)
        logging.getLogger("main").info(
            "[FUSED] staging %d frames on device...", len(seq) - start_idx)
        staged = [jax.device_put(jnp.asarray(seq.frame(i)))
                  for i in range(start_idx, len(seq))]
        _ = np.asarray(staged[-1][:1, :1])          # force the uploads
        pf = zip(range(start_idx, len(seq)), staged)
    else:
        pf = Prefetcher(seq, depth=max(1, cfg.prefetch), start=start_idx,
                        transform=jnp.asarray)
    sync_every = int(cfg.fused_sync_every)
    # loop-closure mode needs REAL periodic syncs (keyframe features must be
    # captured off the device ring before newer keyframes overwrite them, and
    # place recognition/verification run on the host between dispatches)
    loop_on = bool(cfg.loop_closure)
    lc_every = sync_every or 32
    log_consumed = 0
    t_warm = None
    with system.timer.stage("fused_loop"):
        n_dispatched = 0
        for i, img in pf:
            with system.timer.stage("fused_dispatch"):
                state = step(state, img)
            n_dispatched += 1
            if n_dispatched == 10:
                # dispatches are ASYNC (and this platform's
                # block_until_ready returns early): force the first ten via
                # a device->host transfer, then measure wall time from here
                # to the final sync (which observes every later dispatch) —
                # the compile-free sustained rate
                _ = np.asarray(state.Tcw)
                t_warm = time.perf_counter()
            if loop_on and n_dispatched % lc_every == 0:
                with system.timer.stage("fused_sync"):
                    host = sync_to_host(system, state, fc,
                                        from_row=log_consumed)
                    log_consumed = int(host["log_n"])
                with system.timer.stage("loop"):
                    if system.loop_closer is None:
                        from simpleslam_tpu.core.loop import LoopCloser
                        system.loop_closer = LoopCloser(cfg, system.K,
                                                        system.matcher)
                    closed = system.loop_closer.scan(
                        system.kfs, system.world_map, system.img_hw,
                        system._site_key(int(host["log_n"]), SITE_LOOP))
                    if closed is not None:
                        if cfg.gba_enable:
                            # polish the PGO rewrite with a full metric BA
                            # before it is pushed back to the device
                            system.run_global_ba()
                        # push the corrected map/poses back to the device
                        state = apply_host_correction(state, system, fc,
                                                      host)
                    else:
                        # sustained-loss rescue: the device greloc only sees
                        # the KF ring; the host sees everything. Best-effort:
                        # a failed rescue must never take down the run the
                        # device loop could still recover on its own.
                        try:
                            rescued = _host_assist_reloc(cfg, system, state,
                                                         fc, host)
                        except Exception:
                            logger.exception("[RESCUE] host-assisted reloc "
                                             "failed; continuing unrescued")
                            rescued = None
                        if rescued is not None:
                            state = rescued
            elif sync_every and n_dispatched % sync_every == 0:
                with system.timer.stage("fused_sync"):
                    # partial sync: force the pose log so far (observes all
                    # dispatches; keeps divergence bounded for live viz)
                    _ = np.asarray(state.Tcw)
        getattr(pf, "close", lambda: None)()        # staged zip has no close
    with system.timer.stage("fused_sync"):
        host = sync_to_host(system, state, fc, from_row=log_consumed)
    if t_warm is not None and n_dispatched > 30:
        sustained = (n_dispatched - 10) / (time.perf_counter() - t_warm)
        logging.getLogger("main").info(
            "[FUSED] sustained %.2f frames/s over %d post-warm-up frames "
            "(incl. %s syncs/loop-closure work)", sustained,
            n_dispatched - 10, "periodic" if (loop_on or sync_every) else "no")
    system.kf_count_override = int(host["kf_count"])
    system._key = state.key
    if loop_on:
        # final sweep: keyframes that arrived after the last periodic sync
        # (e.g. a revisit near the end of the sequence) still get their
        # detect/verify/close chance; the rewrite lands in the host map that
        # the results/ATE are computed from
        with system.timer.stage("loop"):
            if system.loop_closer is None:
                from simpleslam_tpu.core.loop import LoopCloser
                system.loop_closer = LoopCloser(cfg, system.K, system.matcher)
            closed = system.loop_closer.scan(
                system.kfs, system.world_map, system.img_hw,
                system._site_key(int(host["log_n"]) + 1, SITE_LOOP))
            if closed is not None and cfg.gba_enable:
                system.run_global_ba()


def _show_driver_windows(system: "SLAMSystem") -> None:
    """KF thumbnail strip + prev->cur match overlay + track trails
    (reference main_revamped.py:622-706)."""
    try:
        import cv2
    except Exception:
        return
    from simpleslam_tpu.viz.tracks import draw_tracks
    from simpleslam_tpu.viz.windows import build_kf_strip, build_match_overlay

    strip = build_kf_strip(system.kfs)
    if strip is not None:
        cv2.imshow("keyframes", strip)
    if system._last_matches is not None:
        prev_img, cur_img, kp0, kp1, i0, i1, mv = system._last_matches
        if prev_img is not None:
            overlay = build_match_overlay(prev_img, cur_img, kp0, kp1,
                                          i0, i1, mv)
            if overlay is not None:
                cv2.imshow("matches prev->cur", overlay)
        if system._trackbook is not None:
            img = cur_img if cur_img.ndim == 3 else \
                cv2.cvtColor(np.asarray(cur_img, np.uint8),
                             cv2.COLOR_GRAY2BGR)
            cv2.imshow("tracks", draw_tracks(img, system._trackbook.tracks))
    cv2.waitKey(1)


def run(cfg: SLAMConfig) -> SLAMResult:
    from simpleslam_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s:%(name)s: %(message)s")
    # per-subsystem loggers exist for DEBUG toggling, mirroring
    # main_revamped.py:30-37
    for name in ("main", "two_view_bootstrap", "pnp", "triangulation", "ba"):
        logging.getLogger(name).setLevel(logging.INFO)

    seq = Sequence.load(cfg)
    gt_T = seq.gt
    if gt_T is not None:
        gt44 = np.tile(np.eye(4), (len(gt_T), 1, 1))
        gt44[:, :3, :4] = gt_T
        compute_gt_alignment(gt44)       # parity: computed, result unused
    else:
        gt44 = None

    img0 = seq.frame(0)
    system = SLAMSystem(cfg, seq.K, seq.D, img_hw=img0.shape[:2])

    headless = cfg.headless
    system.want_viz = not headless
    traj2d = Trajectory2D(gt44, dataset=cfg.dataset, live=not headless)
    viz3d = Visualizer3D(enabled=not (cfg.no_viz3d or headless))
    ui = VizUI(enabled=not headless)

    t_start = time.perf_counter()
    n = len(seq)
    start_idx = 1
    if cfg.localize_only and not cfg.resume:
        raise ValueError("--localize_only needs a map: pass --resume <state>")
    if cfg.localize_only and cfg.fused:
        raise ValueError("--localize_only runs the host driver (drop --fused)")
    if cfg.localize_only and cfg.save_state:
        # run() rebuilds poses as the localization trajectory while kfs keep
        # the mapping run's indices — persisting that mix would corrupt the
        # KF->frame mapping on a later --resume
        raise ValueError("--localize_only does not modify the map; "
                         "drop --save_state (the resumed state is canonical)")
    if cfg.resume:
        from simpleslam_tpu.utils.serialize import load_state

        m, kfs, _cfgd, frame_ids = load_state(cfg.resume)
        system.world_map = m
        system.kfs = kfs
        system.frame_ids = frame_ids
        system.initialised = len(kfs) >= 2
        system.last_kf_frame_no = kfs[-1].frame_idx if kfs else -999
        if cfg.localize_only:
            # frozen-map localization: keep landmarks + keyframes, discard
            # the mapping run's trajectory — this run's poses start from
            # kidnapped-robot global relocalization on the given sequence
            if not kfs:
                raise ValueError("resumed state has no keyframes to "
                                 "localize against")
            system.world_map.poses = []
            system.world_map.keyframe_indices = []
            system.frame_ids = []
            system.initialised = True
            prev_feats = system.process_frame(0, seq.frame(0), None)
            start_idx = 1
            logger.info("localize-only against %s: %d KFs, %d landmarks "
                        "(map frozen)", cfg.resume, len(kfs), len(m))
        else:
            last = frame_ids[-1] if frame_ids else 0
            img_last = system.preprocess(seq.frame(last))
            prev_feats = system.extract(img_last)
            system._prev_img = img_last
            start_idx = last + 1
            logger.info("resumed from %s: %d poses, %d KFs, %d landmarks; "
                        "continuing at frame %d", cfg.resume,
                        len(m.poses), len(kfs), len(m), start_idx)
    else:
        prev_feats = system.process_frame(0, img0, None)

    # graceful SIGINT: finish the in-flight frame, save state, then report
    stop_flag = {"stop": False}
    if cfg.save_state:
        import signal

        def _on_sigint(_sig, _frm):
            stop_flag["stop"] = True
            logger.warning("SIGINT: stopping after this frame; state -> %s",
                           cfg.save_state)
        signal.signal(signal.SIGINT, _on_sigint)

    frame_idx = start_idx - 1
    if cfg.fused:
        # host-orchestrated bootstrap (runs once), then hand the whole loop
        # to the device-resident fused program
        if not system.initialised:
            for frame_idx in range(start_idx, n):
                with system.timer.stage("frame_load"):
                    img = seq.frame(frame_idx)
                prev_feats = system.process_frame(frame_idx, img, prev_feats)
                if system.initialised:
                    break
            start_idx = frame_idx + 1
        if system.initialised and start_idx < n:
            _run_fused_loop(cfg, seq, system, prev_feats, start_idx)
        if system.initialised and system.world_map.poses:
            while len(traj2d.est) < len(system.world_map.poses):
                i = len(traj2d.est)
                fid = (system.frame_ids[i]
                       if i < len(system.frame_ids) else frame_idx)
                traj2d.push(fid, system.world_map.poses[i])
        start_idx = n          # skip the host loop below
    for frame_idx in range(start_idx, n):
        if stop_flag["stop"]:
            break
        with system.timer.stage("frame_load"):
            img = seq.frame(frame_idx)
        prev_feats = system.process_frame(frame_idx, img, prev_feats)

        if system.initialised and system.world_map.poses:
            # push any poses not yet pushed
            while len(traj2d.est) < len(system.world_map.poses):
                i = len(traj2d.est)
                fid = system.frame_ids[i] if i < len(system.frame_ids) else frame_idx
                traj2d.push(fid, system.world_map.poses[i])
        if not headless:
            try:
                viz3d.update(system.world_map.get_point_array(),
                             system.world_map.get_color_array(),
                             np.asarray([(-p[:3, :3].T @ p[:3, 3])
                                         for p in system.world_map.poses]))
                traj2d.draw()
                _show_driver_windows(system)
            except Exception as e:
                logger.warning("viz failed: %s", e)
            if not ui.poll():
                break

    dt = time.perf_counter() - t_start
    res = SLAMResult(
        poses_cw=list(system.world_map.poses),
        frame_ids=list(system.frame_ids),
        n_keyframes=getattr(system, "kf_count_override", 0) or len(system.kfs),
        n_landmarks=len(system.world_map),
        fps=(n / dt) if dt > 0 else 0.0,
        n_frames=n,
        tracking_lost_count=system.tracking_lost_count,
        map_compactions=int(getattr(system, "_fused_compactions", 0)),
        kf_frames=[system.frame_ids[i]
                   for i in system.world_map.keyframe_indices
                   if i < len(system.frame_ids)],
        loop_closures=(len(system.loop_closer.closures)
                       if system.loop_closer is not None else 0),
        closure_events=(list(system.loop_closer.closures)
                        if system.loop_closer is not None else []),
        gba_runs=system.gba_runs)

    out_png = f"trajectory_{cfg.dataset}.png"
    try:
        traj2d.save(out_png)
        logger.info("saved %s", out_png)
    except Exception as e:
        logger.warning("could not save trajectory png: %s", e)
    if cfg.save_state:
        try:
            from simpleslam_tpu.utils.serialize import save_state

            save_state(cfg.save_state, system.world_map, system.kfs, cfg,
                       system.frame_ids)
            logger.info("saved pipeline state to %s", cfg.save_state)
        except Exception as e:
            logger.warning("could not save state: %s", e)
    ui.close()
    viz3d.close()

    if gt44 is not None and len(res.poses_cw) >= 2 and res.frame_ids:
        est = np.stack(res.poses_cw)
        gt_sel = gt44[[min(f, len(gt44) - 1) for f in res.frame_ids]]
        res.ate, stats = ate_rmse(est, gt_sel, align="sim3")
        logger.info("ATE-RMSE (Sim3): %.4f m over %d frames (scale %.3f)",
                    res.ate, stats.get("n", 0), stats.get("scale", 1.0))
        if stats.get("n_nonfinite"):
            logger.warning("ATE computed on the finite subset: %d non-finite "
                           "pose rows dropped (diverged run)",
                           stats["n_nonfinite"])
    logger.info("done: %d frames, %.2f FPS, %d KFs, %d landmarks, %d lost",
                res.n_frames, res.fps, res.n_keyframes, res.n_landmarks,
                res.tracking_lost_count)
    if cfg.loop_closure:
        logger.info("loop closures accepted: %d; archived landmarks: %d "
                    "(cap %d)", res.loop_closures,
                    len(system.world_map.archived),
                    system.world_map.archive_cap)
    # Per-stage breakdown (SURVEY.md §5: per-stage FPS counters for the
    # >=60 FPS north star). 'keyframe' wholly contains the 'triangulate' and
    # 'local_ba' rows; 'host-gap' is loop time none of the stages account for.
    accounted = sum(t for nm, t in system.timer.totals.items()
                    if nm not in ("triangulate", "local_ba"))
    system.timer.totals["host-gap"] = max(dt - accounted, 0.0)
    system.timer.counts["host-gap"] = n
    logger.info("per-stage breakdown:\n%s", system.timer.report())
    return res


def main(argv=None) -> int:
    from simpleslam_tpu.utils.platform import respect_platform_env
    respect_platform_env()
    # Persistent compilation cache: the remote TPU compiler takes minutes on
    # the fused program; repeated driver runs should hit the cache (same
    # setup bench.py uses).
    try:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = parse_config(argv)
    run(cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
