"""Driver HighGUI windows: keyframe thumbnail strip + prev->cur match
overlay (reference main_revamped.py:622-706) and the feature-track trail
window. All builders return BGR arrays so tests can run headless and the
driver decides whether to cv2.imshow them.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from simpleslam_tpu.core.keyframe import decode_thumb


def build_kf_strip(kfs, max_n: int = 6, height: int = 120) -> Optional[np.ndarray]:
    """Horizontal strip of the last ``max_n`` keyframe thumbnails (decoded
    through the native LZ4 codec), newest on the right, each labelled with
    its frame number (reference main_revamped.py:630-659)."""
    try:
        import cv2
    except Exception:
        return None
    tiles: List[np.ndarray] = []
    for kf in kfs[-max_n:]:
        img = decode_thumb(kf.thumb)
        if img is None:
            continue
        w = int(round(img.shape[1] * height / img.shape[0]))
        tile = cv2.resize(img, (w, height))
        cv2.putText(tile, f"KF{kf.idx} f{kf.frame_idx}", (4, 16),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, (0, 255, 255), 1,
                    cv2.LINE_AA)
        tiles.append(tile)
    if not tiles:
        return None
    return np.concatenate(tiles, axis=1)


def build_match_overlay(img_prev: np.ndarray, img_cur: np.ndarray,
                        kpts_prev: np.ndarray, kpts_cur: np.ndarray,
                        idx0: np.ndarray, idx1: np.ndarray,
                        valid: np.ndarray, max_draw: int = 120
                        ) -> Optional[np.ndarray]:
    """Side-by-side prev|cur frame with match lines (the reference's
    cv2.drawMatches window, main_revamped.py:662-693)."""
    try:
        import cv2
    except Exception:
        return None

    def _bgr(im):
        im = np.asarray(im)
        if im.ndim == 2:
            im = cv2.cvtColor(im.astype(np.uint8), cv2.COLOR_GRAY2BGR)
        return im

    a, b = _bgr(img_prev), _bgr(img_cur)
    H = max(a.shape[0], b.shape[0])
    canvas = np.zeros((H, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[:a.shape[0], :a.shape[1]] = a
    canvas[:b.shape[0], a.shape[1]:] = b
    off = a.shape[1]
    sel = np.flatnonzero(np.asarray(valid))[:max_draw]
    for i in sel:
        p = kpts_prev[int(idx0[i])]
        q = kpts_cur[int(idx1[i])]
        p = (int(p[0]), int(p[1]))
        q = (int(q[0]) + off, int(q[1]))
        cv2.circle(canvas, p, 2, (0, 255, 0), -1)
        cv2.circle(canvas, q, 2, (0, 255, 0), -1)
        cv2.line(canvas, p, q, (0, 180, 255), 1, cv2.LINE_AA)
    return canvas


class TrackBook:
    """Keypoint track maintenance across frames for the trail overlay
    (feeds viz.tracks.draw_tracks; reference draw_tracks,
    visualization_utils.py:230-270)."""

    def __init__(self, max_len: int = 12):
        self.max_len = max_len
        self._by_kp: Dict[int, int] = {}     # prev-frame kp idx -> track id
        self.tracks: Dict[int, List[Tuple[float, float]]] = {}
        self._next = 0

    def advance(self, kpts_prev, kpts_cur, idx0, idx1, valid) -> None:
        new_by_kp: Dict[int, int] = {}
        live: Dict[int, List[Tuple[float, float]]] = {}
        v = np.asarray(valid)
        for i in np.flatnonzero(v):
            k0, k1 = int(idx0[i]), int(idx1[i])
            tid = self._by_kp.get(k0)
            if tid is None:
                tid = self._next
                self._next += 1
                pts = [tuple(map(float, kpts_prev[k0]))]
            else:
                pts = self.tracks.get(tid, [])
            pts = (pts + [tuple(map(float, kpts_cur[k1]))])[-self.max_len:]
            live[tid] = pts
            new_by_kp[k1] = tid
        self._by_kp = new_by_kp
        self.tracks = live
