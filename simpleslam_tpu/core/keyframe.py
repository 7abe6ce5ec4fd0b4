"""Keyframes + keyframe insertion policy.

Re-implements the reference keyframe layer (slam/core/keyframe_utils.py:12-172)
over padded array state:

  * :class:`Keyframe` — frame metadata, padded :class:`Features`, T_cw pose,
    LZ4-compressed JPEG thumbnail (native codec, simpleslam_tpu.native).
  * :func:`keyframe_signals` — jit-friendly batched computation of the policy
    signals (inlier count / ratio / median flow) the reference derives from
    DMatch lists (keyframe_utils.py:72-86).
  * :func:`is_new_keyframe` — the decision, with the reference's exact
    trigger semantics including the "pessimistic cooldown" quirk where
    age > kf_cooldown ALWAYS promotes (keyframe_utils.py:69-70).
  * :func:`select_keyframe` — per-frame orchestration incl. the cooldown
    fast-path that skips the expensive KF<->frame matching
    (keyframe_utils.py:150-151).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu import native
from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.ops import se3


# --------------------------------------------------------------------------- #
# Keyframe container
# --------------------------------------------------------------------------- #

@dataclass
class Keyframe:
    """One keyframe (reference: keyframe_utils.py:12-20).

    ``feats`` replaces the reference's (kps, desc) pair with a padded pytree.
    """
    idx: int                 # keyframe sequence id (0-based)
    frame_idx: int           # source frame number
    path: str                # "" for in-memory frames
    feats: Features
    pose: np.ndarray         # 4x4 T_cw
    thumb: bytes             # LZ4-compressed JPEG (native codec)

    @property
    def kps(self) -> np.ndarray:
        """(N_valid, 2) pixel coordinates of the valid keypoints."""
        v = np.asarray(self.feats.valid)
        return np.asarray(self.feats.kpts)[v]

    @property
    def desc(self) -> np.ndarray:
        v = np.asarray(self.feats.valid)
        return np.asarray(self.feats.desc)[v]


def make_thumb(bgr: np.ndarray, hw: Tuple[int, int] = (640, 360)) -> bytes:
    """Resize -> JPEG q70 -> LZ4 (reference: keyframe_utils.py:26-30)."""
    try:
        import cv2
        th = cv2.resize(bgr, tuple(hw))
        ok, enc = cv2.imencode(".jpg", th, [int(cv2.IMWRITE_JPEG_QUALITY), 70])
        if not ok:
            return b""
        return native.compress(enc.tobytes())
    except Exception:
        return b""


def decode_thumb(blob: bytes) -> Optional[np.ndarray]:
    """Inverse of :func:`make_thumb` -> BGR uint8 array (or None)."""
    if not blob:
        return None
    try:
        import cv2
        jpeg = native.decompress(blob)
        return cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    except Exception:
        return None


# --------------------------------------------------------------------------- #
# Policy signals (jit-friendly)
# --------------------------------------------------------------------------- #

def rot_deg_between(Tcw_prev: np.ndarray, Tcw_curr: np.ndarray) -> float:
    """Angular change between two T_cw poses in degrees
    (reference: keyframe_utils.py:34-40)."""
    R = jnp.asarray(Tcw_curr)[:3, :3] @ jnp.asarray(Tcw_prev)[:3, :3].T
    return float(se3.rotation_angle_deg(R))


def keyframe_signals(kf_feats: Features, cur_feats: Features,
                     matches: Matches) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(n_inliers, inlier_ratio, median_flow_px) from a padded match set.

    Masked equivalents of keyframe_utils.py:72-86 (ratio denominator is the
    number of *keyframe* keypoints; flow uses the median displacement).
    """
    m = matches.valid
    n_inl = jnp.sum(m.astype(jnp.int32))
    n_ref = jnp.maximum(jnp.sum(kf_feats.valid.astype(jnp.int32)), 1)
    ratio = n_inl.astype(jnp.float32) / n_ref.astype(jnp.float32)

    d = cur_feats.kpts[matches.idx1] - kf_feats.kpts[matches.idx0]
    disp = jnp.hypot(d[:, 0], d[:, 1])
    # masked median: sort invalid entries to the top, take the middle of the
    # valid prefix (static-shape replacement for np.median over a ragged set)
    big = jnp.where(m, disp, jnp.inf)
    s = jnp.sort(big)
    k = jnp.maximum(n_inl, 1)
    lo = s[jnp.maximum((k - 1) // 2, 0)]
    hi = s[jnp.maximum(k // 2, 0)]
    med = jnp.where(n_inl > 0, 0.5 * (lo + hi), 0.0)
    return n_inl, ratio, med


# --------------------------------------------------------------------------- #
# Decision
# --------------------------------------------------------------------------- #

def is_new_keyframe(
    frame_no: int,
    n_matches: int,
    median_flow_px: float,
    n_kf_kpts: int,
    rot_deg: float,
    *,
    kf_cooldown: int = 5,
    kf_min_inliers: float = 125,
    kf_min_ratio: float = 0.35,
    kf_max_disp: float = 30.0,
    kf_min_rot_deg: float = 8.0,
    last_kf_frame_no: int = -999,
) -> bool:
    """Keyframe promotion decision (reference: keyframe_utils.py:42-96).

    Trigger order preserved exactly:
      1. pessimistic cooldown — ``age > kf_cooldown`` ALWAYS promotes
         (reference quirk, keyframe_utils.py:69-70);
      2. weak track (few inliers or low ratio vs KF keypoint count);
      3. large median flow;
      4. rotation above threshold.
    """
    age = frame_no - last_kf_frame_no
    if age > kf_cooldown:
        return True
    ratio = n_matches / max(1, n_kf_kpts)
    weak_track = (n_matches < kf_min_inliers) or (ratio < kf_min_ratio)
    large_flow = median_flow_px > kf_max_disp
    view_change = rot_deg > kf_min_rot_deg
    return bool(weak_track or large_flow or view_change)


# --------------------------------------------------------------------------- #
# Per-frame orchestration
# --------------------------------------------------------------------------- #

MatchFn = Callable[[Features, Features], Matches]


def select_keyframe(
    cfg,
    frame_no: int,
    img2: Optional[np.ndarray],
    feats2: Features,
    Tcw_curr: Optional[np.ndarray],
    match_fn: MatchFn,
    kfs: List[Keyframe],
    last_kf_frame_no: int,
    path: str = "",
) -> Tuple[List[Keyframe], int]:
    """Maybe promote frame ``frame_no`` to a keyframe.

    Mirrors reference keyframe_utils.select_keyframe (:98-172): the cooldown
    fast-path skips the expensive KF<->frame matching when inside cooldown
    and below the rotation gate; otherwise matches against the last KF
    (``match_fn`` must include the F-RANSAC geometric filter) and applies
    :func:`is_new_keyframe`. ``path`` is the source file recorded on the
    keyframe ("" for in-memory frames) — the reference took the whole
    sequence list just to read this one entry (keyframe_utils.py:166).
    """
    if not kfs:
        return kfs, last_kf_frame_no

    prev_kf = kfs[-1]
    rot = 0.0
    if prev_kf.pose is not None and Tcw_curr is not None:
        rot = rot_deg_between(prev_kf.pose, Tcw_curr)

    if (frame_no - last_kf_frame_no) <= cfg.kf_cooldown and rot < cfg.kf_min_rot_deg:
        return kfs, last_kf_frame_no

    matches = match_fn(prev_kf.feats, feats2)
    n_inl, _ratio, med = keyframe_signals(prev_kf.feats, feats2, matches)
    n_kf = int(np.asarray(prev_kf.feats.valid).sum())

    if is_new_keyframe(
        frame_no, int(n_inl), float(med), n_kf, rot,
        kf_cooldown=cfg.kf_cooldown,
        kf_min_inliers=cfg.kf_min_inliers,
        kf_min_ratio=cfg.kf_min_ratio,
        kf_max_disp=cfg.kf_max_disp,
        kf_min_rot_deg=cfg.kf_min_rot_deg,
        last_kf_frame_no=last_kf_frame_no,
    ):
        thumb = make_thumb(img2, tuple(cfg.kf_thumb_hw)) if img2 is not None else b""
        kfs.append(Keyframe(len(kfs), frame_no, path, feats2,
                            np.asarray(Tcw_curr) if Tcw_curr is not None else np.eye(4),
                            thumb))
        last_kf_frame_no = frame_no

    return kfs, last_kf_frame_no
