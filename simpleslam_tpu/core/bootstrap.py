"""Two-view bootstrap: H-vs-F model competition + initial map.

Re-implements the reference bootstrap (slam/core/two_view_bootstrap.py:39-418)
with identical decision semantics but a TPU-shaped execution plan: the H
branch, the F branch, both RANSACs, the truncated-chi^2 scores, all four
homography pose candidates and the essential pose recovery are evaluated in
ONE jitted program with no data-dependent host branching; the (cheap) decision
tree then runs on host over the returned scalars, exactly mirroring the
reference flow:

  1. H-RANSAC + F-RANSAC at ``ransac_px`` (two_view_bootstrap.py:230-231).
  2. ORB-style truncated scores over ALL matches: symmetric transfer error vs
     chi2_H=5.99 for H, Sampson vs chi2_F=3.84 for F; prefer H when
     ratio_H = S_H/(S_H+S_F) > 0.45 (:107-123,244-253).
  3. H path: decompose into 4 candidates, validate each by triangulation
     metrics (posdepth fraction >= 0.90, median parallax >= threshold,
     N >= 60), pick best by (posdepth, parallax) (:174-200).
  4. F path: E = K^T F K, recoverPose cheirality vote, validate on the
     recovered-inlier subset (:202-220).
  5. Final inlier mask: F-RANSAC mask & recoverPose mask for F, H-RANSAC
     mask for H (:265-297). (The reference re-runs RANSAC for this; we reuse
     the masks already computed in the same jitted evaluation.)
  6. ``bootstrap_two_view_map``: >=50 matches gate, >= min_pts inliers,
     triangulation in the cam0(=world) frame, depth-window gate in both
     views, >=80 surviving points, landmarks added grey (0.7) with
     observations on KF0/KF1; returns (ok, T0_cw=I, T1_cw=[R|t]) (:328-411).
"""
from __future__ import annotations

from dataclasses import dataclass
from enum import Enum, auto
from functools import partial
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.ops import epipolar, se3
from simpleslam_tpu.ops.maskops import masked_fraction, masked_median
from simpleslam_tpu.ops.triangulation import triangulate_two_view

logger = logging.getLogger("two_view_bootstrap")

_EPS = 1e-12


class TwoViewModel(Enum):
    HOMOGRAPHY = auto()
    FUNDAMENTAL = auto()


@dataclass
class InitParams:
    """Thresholds; defaults identical to the reference (two_view_bootstrap.py:44-51)."""
    ransac_px: float = 1.5
    chi2_H: float = 5.99
    chi2_F: float = 3.84
    min_pts_for_tests: int = 60
    min_posdepth: float = 0.90
    min_parallax_deg: float = 1.5
    score_ratio_H: float = 0.45
    n_hyp: int = 256


@dataclass
class TwoViewPose:
    model: TwoViewModel
    R: np.ndarray
    t: np.ndarray
    posdepth: float
    parallax_deg: float


@dataclass
class TwoViewDecision:
    pose: TwoViewPose
    inlier_mask: np.ndarray


# --------------------------------------------------------------------------- #
# jitted evaluation of both branches
# --------------------------------------------------------------------------- #

def _triangulation_metrics(R: jax.Array, t: jax.Array, p0n: jax.Array,
                           p1n: jax.Array, mask: jax.Array):
    """(posdepth fraction, median parallax deg) over masked normalized points.

    Same quantity as reference triangulation_metrics (:127-156): triangulate
    with P1=[I|0], P2=[R|t] in normalized coords, fraction z>0 in both views,
    median ray angle.
    """
    eye34 = jnp.concatenate([jnp.eye(3, dtype=R.dtype),
                             jnp.zeros((3, 1), R.dtype)], axis=1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_two_view(eye34, P2, p0n, p1n)
    z0 = X[:, 2]
    X1 = X @ R.T + t
    z1 = X1[:, 2]
    posdepth = masked_fraction((z0 > 0) & (z1 > 0), mask)

    C1 = jnp.zeros(3, R.dtype)
    C2 = -R.T @ t
    v0 = X - C1
    v1 = X - C2
    cos = jnp.sum(v0 * v1, axis=1) / (
        jnp.linalg.norm(v0, axis=1) * jnp.linalg.norm(v1, axis=1) + _EPS)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    parallax = masked_median(ang, mask)
    return posdepth, parallax


@partial(jax.jit, static_argnames=("n_hyp",))
def evaluate_two_view_jit(key: jax.Array, p0: jax.Array, p1: jax.Array,
                          valid: jax.Array, K: jax.Array,
                          ransac_px: float, chi2_H: float, chi2_F: float,
                          n_hyp: int = 256):
    """All bootstrap computations, no host branching. Returns a dict of
    scalars/arrays the host decision tree consumes."""
    kH, kF = jax.random.split(key)
    H, maskH, okH = epipolar.find_homography(kH, p0, p1, valid, ransac_px,
                                             n_hyp=n_hyp)
    F, maskF, okF = epipolar.find_fundamental(kF, p0, p1, valid, ransac_px,
                                              n_hyp=n_hyp)

    # truncated chi^2 scores over ALL matches (two_view_bootstrap.py:107-123)
    dH = epipolar.symmetric_transfer_error_sq(H, p0, p1)
    dF = epipolar.sampson_error_sq(F, p0, p1)
    S_H = jnp.sum(jnp.where(valid, jnp.maximum(0.0, chi2_H - dH), 0.0))
    S_F = jnp.sum(jnp.where(valid, jnp.maximum(0.0, chi2_F - dF), 0.0))
    S_H = jnp.where(okH, S_H, 0.0)
    S_F = jnp.where(okF, S_F, 0.0)
    ratio_H = S_H / (S_H + S_F + _EPS)

    # normalized points for metric computations
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    p0n = jnp.stack([(p0[:, 0] - cx) / fx, (p0[:, 1] - cy) / fy], axis=1)
    p1n = jnp.stack([(p1[:, 0] - cx) / fx, (p1[:, 1] - cy) / fy], axis=1)

    # --- H branch: 4 candidates + metrics ---
    Rs, ts, _ns = epipolar.decompose_homography(H, K)
    ts_unit = ts / jnp.maximum(jnp.linalg.norm(ts, axis=1, keepdims=True), _EPS)
    pdH, parH = jax.vmap(
        lambda R, t: _triangulation_metrics(R, t, p0n, p1n, valid))(Rs, ts_unit)

    # --- F branch: E + recoverPose + metrics over recovered inliers ---
    # The reference lifts E = K^T F K directly (two_view_bootstrap.py:206);
    # a linear-F-derived E is noticeably biased under near-forward motion, so
    # we re-fit on the F-inliers directly on the essential manifold and
    # polish with a Sampson Gauss-Newton pass (matches cv2's 5-point quality).
    wF = (maskF & valid).astype(p0.dtype)
    E_fit = epipolar.fit_essential(p0n, p1n, wF)
    E = epipolar.refine_essential_sampson(E_fit, p0n, p1n, wF)
    R_F, t_F, cheir_mask, n_cheir = epipolar.recover_pose_essential(
        E, p0, p1, valid, K)
    pdF, parF = _triangulation_metrics(R_F, t_F, p0n, p1n, cheir_mask)

    return dict(
        H=H, F=F, maskH=maskH & valid, maskF=maskF & valid,
        okH=okH, okF=okF, S_H=S_H, S_F=S_F, ratio_H=ratio_H,
        H_Rs=Rs, H_ts=ts_unit, H_posdepth=pdH, H_parallax=parH,
        F_R=R_F, F_t=t_F, F_cheir=cheir_mask & valid, F_n_cheir=n_cheir,
        F_posdepth=pdF, F_parallax=parF,
        n_valid=jnp.sum(valid.astype(jnp.int32)),
    )


# --------------------------------------------------------------------------- #
# host decision tree (parity with the reference flow)
# --------------------------------------------------------------------------- #

def evaluate_two_view_bootstrap_with_masks(
    K, pts_ref, pts_cur, params: InitParams = InitParams(),
    valid=None, key=None,
) -> Optional[TwoViewDecision]:
    """H-vs-F selection + pose + final inlier mask.

    Same contract as the reference (two_view_bootstrap.py:224-310); accepts
    padded arrays with a ``valid`` mask (defaults to all-valid).
    """
    pts_ref = np.asarray(pts_ref, np.float32)
    pts_cur = np.asarray(pts_cur, np.float32)
    n = len(pts_ref)
    if valid is None:
        valid = np.ones(n, bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    if n < 8:
        return None

    out = evaluate_two_view_jit(
        key, jnp.asarray(pts_ref), jnp.asarray(pts_cur), jnp.asarray(valid),
        jnp.asarray(K, jnp.float32), float(params.ransac_px),
        float(params.chi2_H), float(params.chi2_F), n_hyp=params.n_hyp)
    out = {k: np.asarray(v) for k, v in out.items()}

    okH, okF = bool(out["okH"]), bool(out["okF"])
    if not okH and not okF:
        logger.info("Both H and F estimation failed -> reject pair.")
        return None
    ratio_H = float(out["ratio_H"])
    logger.info("Scores  S_H=%.1f  S_F=%.1f  -> ratio_H=%.3f",
                float(out["S_H"]), float(out["S_F"]), ratio_H)

    n_valid = int(out["n_valid"])

    def _h_pose() -> Optional[TwoViewPose]:
        best, best_key = None, (-1.0, -1.0)
        for i in range(4):
            pd, ang = float(out["H_posdepth"][i]), float(out["H_parallax"][i])
            ok = (n_valid >= params.min_pts_for_tests
                  and pd >= params.min_posdepth
                  and ang >= params.min_parallax_deg)
            logger.info("  H-cand #%d: ok=%s posdepth=%.3f parallax=%.2f deg",
                        i, ok, pd, ang)
            if ok and (pd, ang) > best_key:
                best = TwoViewPose(TwoViewModel.HOMOGRAPHY,
                                   out["H_Rs"][i].astype(np.float64),
                                   out["H_ts"][i].astype(np.float64), pd, ang)
                best_key = (pd, ang)
        return best

    def _f_pose() -> Optional[TwoViewPose]:
        n_cheir = int(out["F_n_cheir"])
        if n_cheir < params.min_pts_for_tests:
            logger.info("F/E rejected: not enough inliers for validation.")
            return None
        pd, ang = float(out["F_posdepth"]), float(out["F_parallax"])
        if (n_cheir >= params.min_pts_for_tests
                and pd >= params.min_posdepth
                and ang >= params.min_parallax_deg):
            logger.info("F/E accepted: posdepth=%.3f parallax=%.2f deg", pd, ang)
            return TwoViewPose(TwoViewModel.FUNDAMENTAL,
                               out["F_R"].astype(np.float64),
                               out["F_t"].astype(np.float64), pd, ang)
        logger.info("F/E rejected after validation.")
        return None

    pose: Optional[TwoViewPose] = None
    if ratio_H > params.score_ratio_H and okH:
        logger.info("Model selection: prefer HOMOGRAPHY (ratio_H=%.3f > %.2f)",
                    ratio_H, params.score_ratio_H)
        pose = _h_pose()
        if pose is None:
            logger.info("H path failed validation -> trying F/E fallback.")
    else:
        logger.info("Model selection: prefer FUNDAMENTAL/E (ratio_H=%.3f <= %.2f)",
                    ratio_H, params.score_ratio_H)
    if pose is None and okF:
        pose = _f_pose()
    if pose is None:
        logger.info("Pair rejected: ambiguous or too weak for initialization.")
        return None

    if pose.model is TwoViewModel.FUNDAMENTAL:
        mask = out["maskF"] & out["F_cheir"]
    else:
        mask = out["maskH"]
    return TwoViewDecision(pose=pose, inlier_mask=mask.astype(bool) & valid)


# --------------------------------------------------------------------------- #
# map construction
# --------------------------------------------------------------------------- #

@jax.jit
def _triangulate_cam0(K, R, t, p0, p1):
    """Triangulate in the cam0(=world) frame with normalized projections
    (reference _triangulate_points_cv, two_view_bootstrap.py:318-326)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    p0n = jnp.stack([(p0[:, 0] - cx) / fx, (p0[:, 1] - cy) / fy], axis=1)
    p1n = jnp.stack([(p1[:, 0] - cx) / fx, (p1[:, 1] - cy) / fy], axis=1)
    P1 = jnp.concatenate([jnp.eye(3, dtype=K.dtype), jnp.zeros((3, 1), K.dtype)], 1)
    P2 = jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate_two_view(P1, P2, p0n, p1n)
    z0 = X[:, 2]
    z1 = (X @ R.T + t)[:, 2]
    return X, z0, z1


def bootstrap_two_view_map(K, feats_ref, feats_cur, matches, args, world_map,
                           params: InitParams = InitParams(),
                           decision: Optional[TwoViewDecision] = None,
                           key=None) -> Tuple[bool, Optional[np.ndarray], Optional[np.ndarray]]:
    """Build the initial map from one accepted pair (reference :328-411).

    ``feats_ref``/``feats_cur`` are padded :class:`Features`; ``matches`` a
    padded :class:`Matches`. Returns (ok, T0_cw, T1_cw); on success the map
    gained the triangulated landmarks (grey 0.7) with observations on KF0/KF1.
    NOTE: like the reference, poses are NOT inserted here — the driver does
    that (main_revamped.py:391-395).
    """
    mvalid = np.asarray(matches.valid)
    n_matches = int(mvalid.sum())
    if n_matches < 50:
        logger.info("[BOOTSTRAP] Not enough matches for init (%d < 50).", n_matches)
        return False, None, None

    kp_ref = np.asarray(feats_ref.kpts)
    kp_cur = np.asarray(feats_cur.kpts)
    i0 = np.asarray(matches.idx0)
    i1 = np.asarray(matches.idx1)
    pts_ref = kp_ref[i0].astype(np.float32)
    pts_cur = kp_cur[i1].astype(np.float32)

    if decision is None:
        decision = evaluate_two_view_bootstrap_with_masks(
            K, pts_ref, pts_cur, params, valid=mvalid, key=key)
        if decision is None:
            logger.info("[BOOTSTRAP] Pair rejected by gate; aborting.")
            return False, None, None

    pose = decision.pose
    mask = decision.inlier_mask & mvalid
    ninl = int(mask.sum())
    logger.info("[BOOTSTRAP] Using model=%s with %d inliers.", pose.model.name, ninl)
    if ninl < params.min_pts_for_tests:
        logger.info("[BOOTSTRAP] Too few inliers after gating (%d < %d).",
                    ninl, params.min_pts_for_tests)
        return False, None, None

    Kj = jnp.asarray(K, jnp.float32)
    X, z0, z1 = _triangulate_cam0(Kj, jnp.asarray(pose.R, jnp.float32),
                                  jnp.asarray(pose.t, jnp.float32).reshape(3),
                                  jnp.asarray(pts_ref), jnp.asarray(pts_cur))
    X = np.asarray(X)
    z0 = np.asarray(z0)
    z1 = np.asarray(z1)

    min_d = float(getattr(args, "min_depth", 0.0))
    max_d = float(getattr(args, "max_depth", 1e6))
    ok = mask & (z0 > min_d) & (z0 < max_d) & (z1 > min_d) & (z1 < max_d)
    n_kept = int(ok.sum())
    logger.info("[BOOTSTRAP] Triangulated=%d kept=%d after depth filter [%g, %g].",
                ninl, n_kept, min_d, max_d)
    if n_kept < 80:
        logger.info("[BOOTSTRAP] Not enough 3D points to seed the map (%d < 80).",
                    n_kept)
        return False, None, None

    T0_cw = np.eye(4)
    T1_cw = np.asarray(se3.rt_to_T(jnp.asarray(pose.R, jnp.float32),
                                   jnp.asarray(pose.t, jnp.float32).reshape(3)),
                       np.float64)

    sel = np.flatnonzero(ok)
    cols = np.full((n_kept, 3), 0.7, np.float32)
    ids = world_map.add_points(X[sel], cols, keyframe_idx=0)

    desc_ref = np.asarray(feats_ref.desc)
    desc_cur = np.asarray(feats_cur.desc)
    for pid, s in zip(ids, sel):
        world_map.points[pid].add_observation(0, int(i0[s]), desc_ref[i0[s]])
        world_map.points[pid].add_observation(1, int(i1[s]), desc_cur[i1[s]])

    logger.info("[BOOTSTRAP] Map initialised: %d landmarks, 2 keyframes "
                "(KF0=I, KF1=[R|t]).", len(ids))
    return True, T0_cw, T1_cw
