"""Loop closure: place recognition -> Sim(3) verification -> pose-graph
correction.

Beyond reference parity: the reference lists BOTH loop closure and pose-graph
optimization as future work (reference: README.md:317,
slam/monocular/main_revamped.py:501 "trigger relocalization here in the
future"). This module is the TPU-native implementation:

  * Place recognition: each keyframe gets a pooled-descriptor place vector
    (a G x G spatial grid of L2-normalized mean descriptors — a
    static-shape, one-matmul stand-in for a BoW vocabulary; the pooling runs
    as one jitted program). Candidates = top-k cosine similarity against all
    keyframes older than ``loop_gap_kfs``.
  * Geometric verification: descriptor matching between the two keyframes,
    lifted to 3D-3D landmark correspondences (each side expressed in its OWN
    camera frame, so monocular drift between the two map regions is exactly
    what the estimator sees), robustly fit with the batched Sim(3) RANSAC
    (ops/sim3.sim3_ransac_3d3d). Sim(3), not SE(3): monocular VO drifts in
    scale (Strasdat's scale-drift-aware formulation).
  * Correction: one Sim(3) pose-graph LM solve over all keyframes
    (ops/pgo.pgo_solve — a single jitted program, padded to pow2 node count
    so repeated closures reuse the compiled solver), then the whole map is
    rewritten: keyframe poses, every landmark (anchored to its first
    observing keyframe), and all per-frame trajectory poses (anchored to the
    preceding keyframe, translation rescaled by the anchor's scale
    correction).

False-positive defense (perceptual aliasing). Repetitive environments can
pass ONE Sim3 RANSAC on coincidental structure — measured on the 1200-frame
square soak: a 31-inlier aliased fit between two keyframes ~30 m apart was
accepted and its pose-graph rewrite (max pose delta 8 m) warped the map away
from reality, collapsing tracking. Two independent gates fix this class:

  * ``loop_min_inlier_frac``: the inlier gate scales with the keypoint
    budget (max(loop_min_inliers, frac * valid kpts)) — 31 inliers is
    decisive at 512 kpts and noise at 2048 (genuine soak revisits carry
    400-550).
  * ``loop_confirm``: a verified closure is held PENDING until a second
    geometric verification on a LATER keyframe implies the same drift
    correction (the Sim3 error transported through odometry must agree in
    rotation/scale/translation). Independent aliased fits almost never
    agree twice; a genuine revisit re-verifies on the very next scan. The
    pending record expires after ``loop_confirm_window`` keyframes.
  * ``loop_drift_frac_max``: STABLE aliasing (periodic texture: the box
    grid repeats along a straight) defeats two-scan consistency because
    consecutive keyframes alias the same way — measured on the same soak,
    two fits to KF 0 agreeing to 7.4 deg before an 8.2 m rewrite killed
    the run. The un-fakeable signal: the correction magnitude |E_t| a
    closure demands is bounded by the drift its odometry span could have
    accumulated. The alias claimed ~100% of a 70 m continuously-tracked
    path; genuine closures measure 8-26% of the span.

Everything hot is jitted + static-shape; the host side is only candidate
bookkeeping and the (rare, out-of-hot-loop) map rewrite.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.core import frontend
from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.ops import pgo, sim3

logger = logging.getLogger("loop")


# --------------------------------------------------------------------------- #
# Host-side Sim(3) algebra (tiny (R, t, s) tuples; X -> s R X + t).
# The confirmation gate composes a handful of 3x3s per verified candidate —
# numpy is the right tool, no dispatch worth jitting.
# --------------------------------------------------------------------------- #

def _s_comp(A, B):
    """A o B: apply B, then A."""
    Ra, ta, sa = A
    Rb, tb, sb = B
    return (Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb)


def _s_inv(A):
    Ra, ta, sa = A
    Rt = Ra.T
    return (Rt, -(Rt @ ta) / sa, 1.0 / sa)


def _s_from_se3(T) -> tuple:
    T = np.asarray(T, np.float64)
    return (T[:3, :3].copy(), T[:3, 3].copy(), 1.0)


# --------------------------------------------------------------------------- #
# Place recognition: pooled-descriptor place vectors
# --------------------------------------------------------------------------- #

@partial(jax.jit, static_argnames=("grid",))
def _pool_place_vector(kpts: jax.Array, desc: jax.Array, valid: jax.Array,
                       wh: jax.Array, *, grid: int) -> jax.Array:
    """(G*G*D,) pooled place vector: per-cell mean descriptor, cell- and
    globally L2-normalized. One (G2, N) @ (N, D) matmul — MXU-friendly."""
    G = grid
    cx = jnp.clip((kpts[:, 0] / wh[0] * G).astype(jnp.int32), 0, G - 1)
    cy = jnp.clip((kpts[:, 1] / wh[1] * G).astype(jnp.int32), 0, G - 1)
    cell = cy * G + cx
    oh = ((cell[:, None] == jnp.arange(G * G)[None, :]) & valid[:, None])
    ohf = oh.astype(jnp.float32)
    sums = ohf.T @ desc.astype(jnp.float32)                   # (G2, D)
    cnt = jnp.maximum(jnp.sum(ohf, axis=0), 1.0)[:, None]
    cv = sums / cnt
    cv = cv / (jnp.linalg.norm(cv, axis=1, keepdims=True) + 1e-8)
    v = cv.reshape(-1)
    return v / (jnp.linalg.norm(v) + 1e-8)


def place_vector(feats, img_hw: Tuple[int, int], grid: int) -> np.ndarray:
    """Host wrapper: unpack binary descriptors to bits, pool on device."""
    desc = np.asarray(feats.desc)
    if desc.dtype == np.uint8:
        desc = np.unpackbits(desc, axis=1).astype(np.float32)
    H, W = int(img_hw[0]), int(img_hw[1])
    v = _pool_place_vector(feats.kpts, jnp.asarray(desc, jnp.float32),
                           feats.valid,
                           jnp.asarray([W, H], jnp.float32), grid=grid)
    return np.asarray(v)


# --------------------------------------------------------------------------- #
# Result record
# --------------------------------------------------------------------------- #

@dataclass
class LoopClosure:
    """One accepted loop closure (for logs/tests)."""
    cur_kf: int                 # newest keyframe (sequence id)
    cand_kf: int                # matched past keyframe
    similarity: float           # place-vector cosine similarity
    n_inliers: int              # Sim3-RANSAC inliers
    scale: float                # measured relative scale s (drift indicator)
    cost_before: float          # PGO robust cost before/after
    cost_after: float
    max_pose_delta: float       # largest KF camera-center move applied (m)


# --------------------------------------------------------------------------- #
# LoopCloser
# --------------------------------------------------------------------------- #

class LoopCloser:
    """Detect-and-close driver component. One instance per SLAM run."""

    def __init__(self, cfg, K: np.ndarray, matcher):
        self.cfg = cfg
        self.K = np.asarray(K, np.float64)
        self.matcher = matcher
        self._vecs: List[np.ndarray] = []       # aligned with the kfs list
        self._cooldown_until = -1               # KF id; skip detection until
        self._scanned_until = 0                 # fused-mode scan() progress
        self.closures: List[LoopClosure] = []
        # accepted loop edges (i, j, R, t, s, weight): RELATIVE Sim(3)
        # constraints are invariant to world rewrites, so every solve keeps
        # ALL of them — otherwise a later closure's PGO redistributes its
        # drift into segments earlier closures already made consistent
        self._edges: List[tuple] = []
        # verified-but-unconfirmed closures awaiting an odometry-consistent
        # second verification (loop_confirm >= 2; see module docstring)
        self._pending: List[dict] = []

    # ------------------------------------------------------------- detection
    def _ingest(self, kfs: List[Keyframe], img_hw) -> None:
        while len(self._vecs) < len(kfs):
            kf = kfs[len(self._vecs)]
            self._vecs.append(
                place_vector(kf.feats, img_hw, self.cfg.loop_grid))

    def detect(self, kfs: List[Keyframe], img_hw,
               cur: Optional[int] = None) -> List[Tuple[int, float]]:
        """Candidate (kf_idx, similarity) list for keyframe ``cur``
        (default: the newest)."""
        self._ingest(kfs, img_hw)
        if cur is None:
            cur = len(kfs) - 1
        gap = int(self.cfg.loop_gap_kfs)
        if cur < gap + 1 or cur <= self._cooldown_until:
            return []
        vec = self._vecs[cur]
        if not np.any(vec):            # featureless/placeholder KF record
            return []
        past = np.stack(self._vecs[:cur - gap])
        sims = past @ vec
        order = np.argsort(-sims)[: int(self.cfg.loop_topk)]
        return [(int(i), float(sims[i])) for i in order
                if sims[i] >= self.cfg.loop_min_sim]

    # ---------------------------------------------------------- verification
    def _kp2pid(self, world_map: Map, kf_idx: int) -> Dict[int, int]:
        """kp index -> landmark id for one keyframe, from the observation
        lists (reference obs tuples are (kf_idx, kp_idx, desc),
        landmark_utils.py:46-74). ARCHIVED landmarks count too: a revisit
        after on-device compaction finds the old region's points only
        there.

        One pass over every observation builds the whole kf->(kp->pid)
        index, cached by map version: per-candidate rebuilds are O(total
        observations) and the dense tracked-observation record makes that
        ~KFs x inliers entries — rebuilding it for each of the ~10
        verifies per fused-mode scan was the scan's hotspot."""
        cache = getattr(self, "_kp_index_cache", None)
        if cache is None or cache[0] != world_map.version:
            idx: Dict[int, Dict[int, int]] = {}
            for pid in world_map.points:
                for (k, kp, _d) in world_map.points[pid].observations:
                    idx.setdefault(int(k), {})[int(kp)] = pid
            for pid, (_pos, obs, _ckf) in world_map.archived.items():
                for (k, kp) in obs:     # archived obs are (kf, kp) pairs
                    idx.setdefault(int(k), {})[int(kp)] = pid
            cache = (world_map.version, idx)
            self._kp_index_cache = cache
        return cache[1].get(kf_idx, {})

    @staticmethod
    def _position_of(world_map: Map, pid: int) -> np.ndarray:
        if pid in world_map.points:
            return np.asarray(world_map.points[pid].position, np.float64)
        return np.asarray(world_map.archived[pid][0], np.float64)

    def verify(self, kfs: List[Keyframe], world_map: Map, cur: int,
               cand: int, key) -> Optional[Tuple[sim3.Sim3, int, float]]:
        """Geometric verification: returns (S_cur_from_cand, n_inliers,
        median candidate depth) or None.

        The Sim3 acts on CAMERA-frame points: S . X_cand_cam ~= X_cur_cam,
        i.e. the measured relative similarity between the two keyframe
        cameras — exactly the pose-graph edge ``M_ij = S_iw o S_jw^-1`` with
        i=cur, j=cand.
        """
        cfg = self.cfg
        kfc, kfq = kfs[cand], kfs[cur]
        # inlier gate scales with the keypoint budget: a fixed count tuned on
        # 512-kpt fixtures is noise at 2048 kpts (module docstring)
        n_kp_valid = int(np.asarray(kfq.feats.valid).sum())
        min_inl = max(int(cfg.loop_min_inliers),
                      int(round(float(getattr(cfg, "loop_min_inlier_frac",
                                              0.0)) * n_kp_valid)))
        m = frontend.feature_matcher(cfg, kfc.feats, kfq.feats, self.matcher)
        map_c = self._kp2pid(world_map, cand)
        map_q = self._kp2pid(world_map, cur)
        i0 = np.asarray(m.idx0)
        i1 = np.asarray(m.idx1)
        mv = np.asarray(m.valid)
        Xw_c, Xw_q = [], []
        for a, b, v in zip(i0, i1, mv):
            if not v:
                continue
            pc = map_c.get(int(a))
            pq = map_q.get(int(b))
            if pc is None or pq is None or pc == pq:
                # pc == pq: the map already links the two views of this
                # landmark — a zero-information constraint that would bias
                # the fit toward the current (drifted) relative pose
                continue
            Xw_c.append(self._position_of(world_map, pc))
            Xw_q.append(self._position_of(world_map, pq))
        n = len(Xw_c)
        if n < max(3, min_inl):
            # INFO, not DEBUG: pair starvation is the one silent way a
            # genuine revisit dies (obs-slot pressure / same-pid exclusion) —
            # it must be visible in run logs
            logger.info("[LOOP] cand %d: only %d 3D-3D pairs "
                        "(%d matches, %d/%d kps mapped)", cand, n,
                        int(mv.sum()), len(map_q), len(map_c))
            return None

        Tc = np.asarray(kfc.pose, np.float64)
        Tq = np.asarray(kfq.pose, np.float64)
        Xc = (Tc[:3, :3] @ np.asarray(Xw_c).T).T + Tc[:3, 3]
        Xq = (Tq[:3, :3] @ np.asarray(Xw_q).T).T + Tq[:3, 3]
        # per-side thresholds in each cloud's OWN scale (monocular scale is
        # arbitrary and the two map regions may have drifted apart in scale;
        # the RANSAC gates symmetrically: fwd error vs the query threshold,
        # bwd error vs the candidate threshold)
        depth = float(np.median(Xc[:, 2]))
        depth_q = float(np.median(Xq[:, 2]))
        thresh_c = float(cfg.loop_ransac_thresh) * max(abs(depth), 1e-3)
        thresh_q = float(cfg.loop_ransac_thresh) * max(abs(depth_q), 1e-3)

        cap = 1 << (max(n, 64) - 1).bit_length()         # pow2 pad: jit reuse
        Xc_p = np.zeros((cap, 3), np.float32)
        Xq_p = np.zeros((cap, 3), np.float32)
        val = np.zeros((cap,), bool)
        Xc_p[:n], Xq_p[:n], val[:n] = Xc, Xq, True
        S, _inl, n_inl, ok = sim3.sim3_ransac_3d3d(
            key, jnp.asarray(Xc_p), jnp.asarray(Xq_p), jnp.asarray(val),
            thresh_q, thresh_c,
            n_hyp=int(getattr(cfg, "ransac_hypotheses", 256)))
        n_inl = int(n_inl)
        if not bool(ok) or n_inl < min_inl:
            logger.info("[LOOP] cand %d rejected (%d/%d inliers, gate %d)",
                        cand, n_inl, n, min_inl)
            return None
        # plausibility gate: a real revisit's relative scale is bounded by
        # accumulated monocular drift (a few x at worst). Extreme values mean
        # RANSAC latched onto coincidental structure (repetitive texture) —
        # applying such an "alignment" rewrites the whole map wrongly.
        s = float(np.asarray(S.s))
        smax = float(getattr(cfg, "loop_max_scale", 4.0))
        if not (1.0 / smax <= s <= smax):
            logger.info("[LOOP] cand %d rejected (implausible scale %.4f, "
                        "%d inliers)", cand, s, n_inl)
            return None
        return S, n_inl, depth

    # ------------------------------------------------------------ correction
    def close(self, kfs: List[Keyframe], world_map: Map, cur: int, cand: int,
              S_meas: sim3.Sim3) -> Tuple[float, float, float]:
        """Pose-graph solve + full map rewrite.

        Returns (cost_before, cost_after, max_kf_center_delta_m).
        """
        cfg = self.cfg
        K = len(kfs)
        Kp = 1 << (max(K, 8) - 1).bit_length()       # pow2 node pad

        Told = np.stack([np.asarray(kf.pose, np.float64) for kf in kfs])
        R0 = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        t0 = np.zeros((Kp, 3), np.float32)
        s0 = np.ones((Kp,), np.float32)
        R0[:K] = Told[:, :3, :3]
        t0[:K] = Told[:, :3, 3]
        nodes = sim3.Sim3(R=jnp.asarray(R0), t=jnp.asarray(t0),
                          s=jnp.asarray(s0))

        # edges: odometry chain over live nodes + ALL accepted loop edges,
        # slots padded to a pow2 bucket for jit reuse. Like the sequential
        # edges, RETAINED loop edges are refreshed from the current
        # (post-previous-closure) estimates — their original measurements
        # were satisfied by that closure's solve and the subsequent map
        # rescale makes the raw values stale; refreshed, they are
        # zero-residual STIFFENERS that stop a later closure's PGO from
        # bending relative poses earlier closures already made consistent
        # (measured: without them the second lap's solve dragged lap-1
        # landmarks 0.6 m off their corrected positions).
        def _rel(i: int, j: int) -> tuple:
            Si = sim3.from_se3(jnp.asarray(Told[i], jnp.float32))
            Sj = sim3.from_se3(jnp.asarray(Told[j], jnp.float32))
            M = sim3.compose(Si, sim3.inverse(Sj))
            return (np.asarray(M.R, np.float32), np.asarray(M.t, np.float32),
                    float(np.asarray(M.s)))

        loops = [(li, lj) + _rel(li, lj) + (lw,)
                 for (li, lj, _R, _t, _s, lw) in self._edges] \
            + [(cur, cand, np.asarray(S_meas.R, np.float32),
                np.asarray(S_meas.t, np.float32),
                float(np.asarray(S_meas.s)),
                float(cfg.loop_weight))]
        L = 1 << (max(len(loops), 8) - 1).bit_length()
        Ep = Kp + L
        ei = np.zeros((Ep,), np.int32)
        ej = np.zeros((Ep,), np.int32)
        ev = np.zeros((Ep,), bool)
        ew = np.ones((Ep,), np.float32)
        ei[:K - 1] = np.arange(1, K)
        ej[:K - 1] = np.arange(0, K - 1)
        ev[:K - 1] = True

        live = jax.tree.map(lambda a: a[:K], nodes)
        _si, _sj, meas_seq = pgo.sequential_edges(live)       # (K-1,) edges
        mR = np.tile(np.eye(3, dtype=np.float32), (Ep, 1, 1))
        mt = np.zeros((Ep, 3), np.float32)
        ms = np.ones((Ep,), np.float32)
        mR[:K - 1] = np.asarray(meas_seq.R)
        mt[:K - 1] = np.asarray(meas_seq.t)
        ms[:K - 1] = np.asarray(meas_seq.s)
        for n, (li, lj, lR, lt, ls, lw) in enumerate(loops):
            r = K - 1 + n
            ei[r], ej[r], ev[r], ew[r] = li, lj, True, lw
            mR[r], mt[r], ms[r] = lR, lt, ls
        meas = sim3.Sim3(R=jnp.asarray(mR), t=jnp.asarray(mt),
                         s=jnp.asarray(ms))

        free = np.zeros((Kp,), bool)
        free[1:K] = True                              # node 0 pins the gauge

        problem = pgo.PGOProblem(
            nodes=nodes, edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            meas=meas, e_valid=jnp.asarray(ev), e_weight=jnp.asarray(ew),
            node_free=jnp.asarray(free))
        nodes_new, c0, c1, _n_good = pgo.pgo_solve(
            problem, max_iters=int(cfg.loop_pgo_iters))

        Rn = np.asarray(nodes_new.R, np.float64)[:K]
        tn = np.asarray(nodes_new.t, np.float64)[:K]
        sn = np.asarray(nodes_new.s, np.float64)[:K]

        # --- rewrite keyframe poses: T_new = [R | t/s] (sim3.to_se3)
        Tnew = np.tile(np.eye(4), (K, 1, 1))
        Tnew[:, :3, :3] = Rn
        Tnew[:, :3, 3] = tn / sn[:, None]
        centers_old = -np.einsum("kji,kj->ki", Told[:, :3, :3], Told[:, :3, 3])
        centers_new = -np.einsum("kji,kj->ki", Rn, tn) / sn[:, None]
        max_delta = float(np.max(np.linalg.norm(
            centers_new - centers_old, axis=1))) if K else 0.0
        for i, kf in enumerate(kfs):
            kf.pose = Tnew[i].copy()

        # --- rewrite landmarks, anchored to their first observing keyframe:
        # X_new = S_new_a^{-1}( S_old_a (X_old) ), s_old = 1
        ids = world_map.point_ids()
        if ids:
            pos = world_map.get_point_array()                 # insertion order
            anchors = np.empty((len(ids),), np.int64)
            for r, pid in enumerate(ids):
                mp = world_map.points[pid]
                obs = mp.observations
                a = obs[0][0] if obs else mp.keyframe_idx
                anchors[r] = min(max(int(a), 0), K - 1)
            Ro = Told[anchors, :3, :3]
            to = Told[anchors, :3, 3]
            Xc = np.einsum("nij,nj->ni", Ro, pos) + to        # cam frame
            Xn = np.einsum("nji,nj->ni", Rn[anchors],
                           Xc - tn[anchors]) / sn[anchors][:, None]
            rows = np.fromiter(world_map._row.values(), np.int64, len(ids))
            world_map._positions[rows] = Xn
            world_map.version += 1

        # archived landmarks ride the same anchored rewrite (their next use
        # is a later closure's 3D-3D verification — they must live in the
        # corrected world like everything else)
        for pid, (pos, obs, ckf) in world_map.archived.items():
            a = obs[0][0] if obs else ckf
            a = min(max(int(a), 0), K - 1)
            Xc1 = Told[a, :3, :3] @ pos + Told[a, :3, 3]
            Xn1 = Rn[a].T @ (Xc1 - tn[a]) / sn[a]
            world_map.archived[pid] = (Xn1, obs, ckf)

        # --- rewrite the per-frame trajectory, each frame anchored to the
        # latest keyframe at-or-before it (relative translation rescaled by
        # the anchor's scale correction)
        kf_pose_rows = np.asarray(world_map.keyframe_indices, np.int64)
        if kf_pose_rows.size:
            n_anchor = min(kf_pose_rows.size, K)
            kf_rows = kf_pose_rows[:n_anchor]
            for p_idx in range(len(world_map.poses)):
                a = int(np.searchsorted(kf_rows, p_idx, side="right")) - 1
                a = min(max(a, 0), n_anchor - 1)
                T_rel = world_map.poses[p_idx] @ np.linalg.inv(
                    Told[a] if a < K else Told[-1])
                T_rel[:3, 3] /= sn[a]
                world_map.poses[p_idx] = T_rel @ Tnew[a]

        self._edges = loops                     # retain for future solves
        return float(c0), float(c1), max_delta

    # ----------------------------------------------------------- confirmation
    # Agreement tolerances between two verifications' implied drift
    # corrections (transported through odometry). Genuine revisits one scan
    # apart agree far inside these; independent aliased RANSAC fits land
    # tens of degrees / map-scale translations apart.
    _CONFIRM_ROT_DEG = 20.0
    _CONFIRM_SCALE = 1.5
    _CONFIRM_TRANS_FRAC = 0.3          # x median candidate scene depth

    def _consistent(self, p: dict, q: dict) -> bool:
        """Do two verified closures imply the SAME drift correction?

        Each verification measures M_k = S(cur_k <- cand_k). With the poses
        ESTIMATED at verification time, Mhat_k = T_cur_k o T_cand_k^-1, the
        implied correction is E_k = M_k o Mhat_k^-1 (expressed in cur_k's
        camera frame, scale = the measured drift scale). E_p transported
        into cur_q's frame via the odometry G = T_cur_q o T_cur_p^-1 must
        match E_q; the residual C = E_q^-1 o (G E_p G^-1) is gated on
        rotation angle, scale, and translation."""
        def _err(r):
            Mhat = _s_comp(_s_from_se3(r["Tq"]), _s_inv(_s_from_se3(r["Tc"])))
            return _s_comp(r["S"], _s_inv(Mhat))

        G = _s_comp(_s_from_se3(q["Tq"]), _s_inv(_s_from_se3(p["Tq"])))
        Ep = _s_comp(G, _s_comp(_err(p), _s_inv(G)))
        C = _s_comp(_s_inv(_err(q)), Ep)
        rot = float(np.degrees(np.arccos(
            np.clip((np.trace(C[0]) - 1.0) / 2.0, -1.0, 1.0))))
        sc = float(max(C[2], 1.0 / max(C[2], 1e-12)))
        tn = float(np.linalg.norm(C[1]))
        t_tol = self._CONFIRM_TRANS_FRAC * max(abs(q["depth"]), 1.0)
        ok = (rot <= self._CONFIRM_ROT_DEG and sc <= self._CONFIRM_SCALE
              and tn <= t_tol)
        logger.info("[LOOP] confirm KF %d<->%d vs pending KF %d<->%d: "
                    "rot %.1f deg, scale x%.2f, trans %.2f/%.2f m -> %s",
                    q["cur"], q["cand"], p["cur"], p["cand"],
                    rot, sc, tn, t_tol, "CONSISTENT" if ok else "reject")
        return ok

    def _implied_drift(self, kfs: List[Keyframe], rec: dict) -> tuple:
        """(|E_t|, estimated arc length cand->cur).

        E = M o Mhat^-1 is the odometry error the closure claims
        accumulated between cand and cur; the arc length (sum of
        consecutive estimated KF-center steps over that span) is the path
        that must have produced it. Their ratio is the claimed drift
        fraction."""
        Mhat = _s_comp(_s_from_se3(rec["Tq"]), _s_inv(_s_from_se3(rec["Tc"])))
        E = _s_comp(rec["S"], _s_inv(Mhat))
        c = []
        for k in range(rec["cand"], rec["cur"] + 1):
            T = np.asarray(kfs[k].pose, np.float64)
            c.append(-(T[:3, :3].T @ T[:3, 3]))
        c = np.asarray(c)
        c = c[np.isfinite(c).all(axis=1)]
        if len(c) < 2:
            return float(np.linalg.norm(E[1])), 0.0
        steps = np.linalg.norm(np.diff(c, axis=0), axis=1)
        # dead-reckoned stretches log finite-garbage poses whose steps
        # inflate the arc by orders of magnitude (measured 2e20 m on the
        # square soak after a 728-frame outage) — clip each step to 10x the
        # median so the gate stays meaningful across an outage
        med = float(np.median(steps))
        if med > 0:
            steps = np.minimum(steps, 10.0 * med)
        return float(np.linalg.norm(E[1])), float(steps.sum())

    def _gate_and_apply(self, kfs: List[Keyframe], world_map: Map, cur: int,
                        cand: int, sim_score: float,
                        ver) -> Optional[LoopClosure]:
        """Confirmation gating for one geometric verification; applies the
        closure (PGO + rewrite) once ``loop_confirm`` odometry-consistent
        verifications on distinct keyframes have accumulated."""
        S_meas, n_inl, depth = ver
        rec = {"cur": cur, "cand": cand, "n_inl": n_inl, "depth": depth,
               "sim": sim_score, "S_meas": S_meas,
               "S": (np.asarray(S_meas.R, np.float64),
                     np.asarray(S_meas.t, np.float64),
                     float(np.asarray(S_meas.s))),
               "Tq": np.asarray(kfs[cur].pose, np.float64).copy(),
               "Tc": np.asarray(kfs[cand].pose, np.float64).copy()}
        # plausible-drift gate (STABLE-aliasing defense, the round-5 soak's
        # second find): in a periodic scene consecutive keyframes alias the
        # SAME way, so two false fits pass the odometry-consistency check —
        # measured on the box-field soak (88- and 90-inlier fits to KF 0
        # agreeing to 7.4 deg / x1.00 / 4.9 m, then an 8.2 m rewrite killed
        # the run). What no alias can fake: a genuine closure's correction
        # magnitude is bounded by the drift the path could have accumulated.
        # The alias claimed ~100% of a continuously-tracked 70 m path;
        # genuine closures measure 8-26% (fixtures + soak).
        drift, arc = self._implied_drift(kfs, rec)
        frac_max = float(getattr(self.cfg, "loop_drift_frac_max", 0.0))
        if arc > 1e-6:
            logger.info("[LOOP] drift check KF %d<->%d: correction |E_t| "
                        "%.2f m over %.2f m estimated path (%.0f%%)",
                        cur, cand, drift, arc, 100.0 * drift / arc)
        if frac_max > 0 and arc > 1e-6 and drift > frac_max * arc:
            logger.info("[LOOP] cand %d REJECTED by drift plausibility "
                        "(%.0f%% > %.0f%% max) — periodic-texture alias "
                        "signature", cand, 100.0 * drift / arc,
                        100.0 * frac_max)
            return None
        n_kp_valid = max(int(np.asarray(kfs[cur].feats.valid).sum()), 1)
        strong = (n_inl / n_kp_valid
                  >= float(getattr(self.cfg, "loop_confirm_strong", 1.0)))
        if int(getattr(self.cfg, "loop_confirm", 1)) >= 2 and not strong:
            win = int(getattr(self.cfg, "loop_confirm_window", 12))
            self._pending = [p for p in self._pending
                             if cur - p["cur"] <= win]
            if not any(cur > p["cur"] and self._consistent(p, rec)
                       for p in self._pending):
                self._pending.append(rec)
                if len(self._pending) > 4:
                    self._pending.pop(0)
                logger.info("[LOOP] pending: KF %d <-> KF %d (sim %.3f, %d "
                            "inliers) awaits odometry-consistent "
                            "confirmation", cur, cand, sim_score, n_inl)
                return None
        c0, c1, max_delta = self.close(kfs, world_map, cur, cand, S_meas)
        lc = LoopClosure(
            cur_kf=cur, cand_kf=cand, similarity=sim_score,
            n_inliers=n_inl, scale=float(np.asarray(S_meas.s)),
            cost_before=c0, cost_after=c1, max_pose_delta=max_delta)
        self.closures.append(lc)
        self._cooldown_until = cur + int(self.cfg.loop_gap_kfs)
        self._pending = []      # rewrite invalidates stored poses/Sim3s
        logger.info(
            "[LOOP] closed: KF %d <-> KF %d (sim %.3f, %d inliers, "
            "scale %.3f, cost %.2f -> %.2f, max pose delta %.3f m)",
            cur, cand, sim_score, n_inl, lc.scale, c0, c1, max_delta)
        return lc

    # ------------------------------------------------------------ entrypoint
    def on_new_keyframe(self, kfs: List[Keyframe], world_map: Map,
                        img_hw, key, cur: Optional[int] = None,
                        cands=None) -> Optional[LoopClosure]:
        """Full detect -> verify -> gate -> close pass for keyframe ``cur``
        (default: the newest). ``cands`` short-circuits detection when the
        caller already ran it (scan() logs candidate counts — the
        place-recognition pass over all past KFs must not run twice).
        Returns the accepted LoopClosure (already applied) or None (which
        includes verifications parked as pending by the confirmation gate)."""
        if cur is None:
            cur = len(kfs) - 1
        if cands is None:
            cands = self.detect(kfs, img_hw, cur=cur)
        tried = set()
        for cand, sim_score in cands:
            tried.add(cand)
            ver = self.verify(kfs, world_map, cur, cand, key)
            if ver is None:
                continue
            lc = self._gate_and_apply(kfs, world_map, cur, cand, sim_score,
                                      ver)
            if lc is not None:
                return lc
        # targeted re-verification: place recognition may not re-surface a
        # pending closure's region in this keyframe's top-k, but the revisit
        # (if genuine) has advanced along the OLD path by the same number of
        # keyframes — verify that predicted candidate directly so pendings
        # get their confirmation chance even when detection is flaky
        win = int(getattr(self.cfg, "loop_confirm_window", 12))
        self._pending = [p for p in self._pending if cur - p["cur"] <= win]
        if self._pending:
            gap = int(self.cfg.loop_gap_kfs)
            for p in list(self._pending):
                if cur <= p["cur"]:
                    continue
                exp = p["cand"] + (cur - p["cur"])
                for cand in (exp, p["cand"]):
                    if cand in tried or cand < 0 or cand >= cur - gap:
                        continue
                    tried.add(cand)
                    ver = self.verify(kfs, world_map, cur, cand, key)
                    if ver is None:
                        continue
                    sim_score = float(self._vecs[cur] @ self._vecs[cand]) \
                        if cur < len(self._vecs) and cand < len(self._vecs) \
                        else 0.0
                    lc = self._gate_and_apply(kfs, world_map, cur, cand,
                                              sim_score, ver)
                    if lc is not None:
                        return lc
        return None

    def scan(self, kfs: List[Keyframe], world_map: Map, img_hw,
             key) -> Optional[LoopClosure]:
        """Fused-mode entrypoint: several keyframes may have arrived since
        the last host sync (run_slam._run_fused_loop syncs every
        ``--fused_sync_every`` frames) — try detect/verify/close for each
        not-yet-scanned keyframe in order. Returns the first accepted
        closure of this sweep (at most one per sweep; the map rewrite
        invalidates the other candidates' geometry)."""
        start = self._scanned_until
        self._scanned_until = len(kfs)
        n_cand = 0
        for cur in range(start, len(kfs)):
            cands = self.detect(kfs, img_hw, cur=cur)
            n_cand += len(cands)
            lc = self.on_new_keyframe(kfs, world_map, img_hw, key, cur=cur,
                                      cands=cands)
            if lc is not None:
                return lc
        if len(kfs) > start:
            logger.info("[LOOP] scan KFs %d..%d: %d candidates, no closure",
                        start, len(kfs) - 1, n_cand)
        return None
