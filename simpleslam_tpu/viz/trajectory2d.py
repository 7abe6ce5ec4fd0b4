"""2-D x-z trajectory plot vs ground truth.

Parity with reference ``Trajectory2D`` (visualization_utils.py:278-447):
  * ``push(frame_idx, T_cw)`` stores camera centers ``-R^T t`` plus the
    paired GT center for that frame (:338-364);
  * Umeyama Sim(3) alignment is implemented but DISABLED by default, exactly
    like the reference (the ``_maybe_update_alignment`` call is commented out
    at :364 and ``draw()`` forces align_ok=True with s=2.0, R=I, t=0 at
    :295,390) — pass ``umeyama=True`` to enable the real alignment;
  * square axis limits, legend, live-info box, ``save(path)``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def umeyama_sim3(src: np.ndarray, dst: np.ndarray):
    """Similarity (s, R, t) minimizing ||dst - (s R src + t)||^2 (Umeyama)."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (sc ** 2).sum() / len(src)
    s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    t = mu_d - s * R @ mu_s
    return s, R, t


class Trajectory2D:
    def __init__(self, gt_T: Optional[np.ndarray] = None, dataset: str = "",
                 live: bool = False, umeyama: bool = False):
        self.gt_T = gt_T            # (N,4,4) or None
        self.dataset = dataset
        self.live = live
        self.umeyama = umeyama
        self.est: list[np.ndarray] = []
        self.gt: list[np.ndarray] = []
        # reference default "alignment": s=2.0, R=I, t=0, align_ok forced
        # (visualization_utils.py:295,390)
        self.s, self.R, self.t = 2.0, np.eye(3), np.zeros(3)
        self.align_ok = True
        self._fig = None

    def push(self, frame_idx: int, T_cw: np.ndarray) -> None:
        R = np.asarray(T_cw)[:3, :3]
        t = np.asarray(T_cw)[:3, 3]
        self.est.append(-R.T @ t)
        if self.gt_T is not None and frame_idx < len(self.gt_T):
            g = self.gt_T[frame_idx]
            self.gt.append(np.asarray(g)[:3, 3])

    def _aligned_est(self) -> np.ndarray:
        est = np.asarray(self.est)
        if self.umeyama and len(self.est) >= 10 and len(self.gt) == len(self.est):
            self.s, self.R, self.t = umeyama_sim3(est, np.asarray(self.gt))
        return (self.s * (est @ self.R.T)) + self.t

    def draw(self, block: bool = False) -> None:
        import matplotlib.pyplot as plt

        if self._fig is None:
            self._fig, self._ax = plt.subplots(
                num="Trajectory 2D (x-z)", figsize=(6, 6))
        ax = self._ax
        ax.clear()
        if self.est:
            e = self._aligned_est()
            ax.plot(e[:, 0], e[:, 2], "b-", lw=1.2, label="estimate")
            ax.plot(e[-1, 0], e[-1, 2], "bo", ms=4)
        if self.gt:
            g = np.asarray(self.gt)
            ax.plot(g[:, 0], g[:, 2], "r--", lw=1.0, label="ground truth")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_title(f"Trajectory 2D (x-z) {self.dataset}")
        ax.legend(loc="upper left", fontsize=8)
        ax.set_aspect("equal", adjustable="datalim")
        # square limits (reference :366-382)
        pts = []
        if self.est:
            pts.append(self._aligned_est()[:, [0, 2]])
        if self.gt:
            pts.append(np.asarray(self.gt)[:, [0, 2]])
        if pts:
            allp = np.concatenate(pts)
            c = allp.mean(0)
            r = max(float(np.abs(allp - c).max()) * 1.1, 1.0)
            ax.set_xlim(c[0] - r, c[0] + r)
            ax.set_ylim(c[1] - r, c[1] + r)
        info = f"frames: {len(self.est)}"
        ax.text(0.02, 0.02, info, transform=ax.transAxes, fontsize=8,
                bbox=dict(fc="w", alpha=0.6, ec="none"))
        if self.live:
            self._fig.canvas.draw_idle()
            import matplotlib.pyplot as plt
            plt.pause(0.001)

    def save(self, path: str) -> None:
        self.draw()
        self._fig.savefig(path, dpi=120, bbox_inches="tight")
