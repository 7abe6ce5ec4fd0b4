"""Keyframe-pair triangulation: grow the map between the last two keyframes.

Reference-parity behavior (slam/core/triangulation_utils.py:113-271):
  * match prev_kf <-> cur_kf (+ F-RANSAC filter) (:131-132);
  * P = K @ T_cw[:3, :]; batched DLT triangulation + finite filter (:148-159);
  * world-frame rotation-aware parallax gate (pure rotation -> 0 deg)
    (:54-77, :178-187);
  * cheirality + depth window in both views (:228-241);
  * dual-view reprojection gate max(e0, e1) <= reproj_px_max (:202-249);
  * per-gate rejection counters logged (:171, :267-269);
  * surviving points inserted with observations in BOTH keyframes, with
    rollback if the second observation fails (:80-108, :257);
  * returns the new landmark ids.

The gates run as one jitted batch (ops/triangulation.two_view_gates); only
the final map insertion walks the host map structure.
"""
from __future__ import annotations

import logging
from collections import Counter
from typing import List

import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.core.frontend import match_with_ransac
from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.ops.triangulation import (projection_matrix,
                                              triangulate_two_view,
                                              two_view_gates)

logger = logging.getLogger("triangulation")


def triangulate_between_kfs_2view(
    args, K: np.ndarray, prev_kf: Keyframe, cur_kf: Keyframe, world_map,
    matcher, *, parallax_min_deg: float = 2.0, key=None,
    exclude_cur_kp=None,
) -> List[int]:
    """Triangulate new landmarks between two keyframes.

    ``exclude_cur_kp``: optional set/array of cur-KF keypoint indices that
    already observe a landmark (used by the --tri_kf2 second pass to avoid
    duplicating points for the same current-frame keypoint)."""
    matches = match_with_ransac(args, matcher, prev_kf.feats, cur_kf.feats,
                                key=key)
    mvalid = np.asarray(matches.valid)
    n_m = int(mvalid.sum())
    if n_m < 8:
        logger.info("[TRI] too few KF matches (%d)", n_m)
        return []

    Kj = jnp.asarray(K, jnp.float32)
    T0 = jnp.asarray(prev_kf.pose, jnp.float32)
    T1 = jnp.asarray(cur_kf.pose, jnp.float32)
    P0 = projection_matrix(Kj, T0)
    P1 = projection_matrix(Kj, T1)

    uv0 = prev_kf.feats.kpts[matches.idx0]
    uv1 = cur_kf.feats.kpts[matches.idx1]
    X = triangulate_two_view(P0, P1, uv0, uv1)

    keep, why = two_view_gates(
        X, Kj, T0, T1, uv0, uv1,
        min_depth=float(getattr(args, "min_depth", 0.0)),
        max_depth=float(getattr(args, "max_depth", 1e6)),
        min_parallax_deg=float(parallax_min_deg),
        max_reproj_px=float(getattr(args, "mvt_rep_err",
                                    getattr(args, "ransac_thresh", 2.0))))

    finite = np.asarray(jnp.all(jnp.isfinite(X), axis=1))
    keep = np.asarray(keep) & mvalid & finite
    if exclude_cur_kp is not None and len(exclude_cur_kp):
        keep &= ~np.isin(np.asarray(matches.idx1),
                         np.fromiter(exclude_cur_kp, np.int64))

    # rejection bookkeeping (reference logs a reason Counter,
    # triangulation_utils.py:171,267-269)
    reasons = Counter()
    for name, mask in why.items():
        reasons[f"fail_{name}"] = int((~np.asarray(mask) & mvalid & finite).sum())
    reasons["fail_nonfinite"] = int((~finite & mvalid).sum())
    logger.info("[TRI] matches=%d kept=%d rejects=%s", n_m, int(keep.sum()),
                dict(reasons))

    sel = np.flatnonzero(keep)
    if sel.size == 0:
        return []

    Xh = np.asarray(X)[sel]
    i0 = np.asarray(matches.idx0)[sel]
    i1 = np.asarray(matches.idx1)[sel]
    desc0 = np.asarray(prev_kf.feats.desc)
    desc1 = np.asarray(cur_kf.feats.desc)

    # grey points, like the bootstrap (colour sampling is a viz nicety the
    # reference also skips here)
    cols = np.full((sel.size, 3), 0.7, np.float32)
    new_ids = world_map.add_points(Xh, cols, keyframe_idx=prev_kf.idx)
    done: List[int] = []
    for pid, a, b in zip(new_ids, i0, i1):
        try:
            world_map.points[pid].add_observation(prev_kf.idx, int(a), desc0[a])
            world_map.points[pid].add_observation(cur_kf.idx, int(b), desc1[b])
            done.append(pid)
        except Exception:
            # rollback a half-registered landmark (reference :80-108)
            world_map.points.pop(pid, None)
    return done
