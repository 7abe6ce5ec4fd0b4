"""Synthetic KITTI-format sequence generator.

No real datasets ship with this machine, so benchmarks, end-to-end tests and
the verify flow drive the pipeline on generated sequences: a raycast textured
corridor (ground plane + two walls, procedurally 3-D-textured) rendered along
a smooth KITTI-like trajectory (forward motion + gentle yaw), written in the
exact KITTI odometry layout the dataloader expects
(``<base>/kitti/05/image_0/%06d.png`` + ``<base>/kitti/poses/05.txt`` —
reference dataloader.py:32-34,224-226).

The texture is a fixed sum of random 3-D sinusoids evaluated at the ray-plane
hit points, so appearance is geometrically consistent across views — real
parallax, stable descriptors, exactly what a feature-based VO needs.
Rendering is fully vectorized numpy (one H x W ray grid per frame).

CLI: python -m simpleslam_tpu.tools.synth --out /tmp/synthkitti --frames 100
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np

DEFAULT_K = np.array([[707.0912, 0.0, 601.8873],
                      [0.0, 707.0912, 183.1104],
                      [0.0, 0.0, 1.0]])
DEFAULT_HW = (370, 1226)      # KITTI grayscale camera resolution


def make_trajectory(n_frames: int, speed: float = 0.5,
                    yaw_rate_deg: float = 0.25) -> np.ndarray:
    """(N,4,4) T_wc camera-to-world poses: forward motion with gentle yaw."""
    out = [np.eye(4)]
    yaw = 0.0
    pos = np.zeros(3)
    for _ in range(n_frames - 1):
        yaw += np.radians(yaw_rate_deg)
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                      [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        pos = pos + R @ np.array([0.0, 0.0, speed])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        out.append(T)
    return np.stack(out)


class ProceduralTexture:
    """Fixed random sum-of-sinusoids over R^3 -> [0, 255] intensity."""

    def __init__(self, seed: int = 0, n_waves: int = 48):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n_waves, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        # mixture of coarse and fine spatial frequencies (cycles/meter)
        freqs = np.concatenate([rng.uniform(0.3, 1.5, n_waves // 2),
                                rng.uniform(2.0, 8.0, n_waves - n_waves // 2)])
        self.k = d * freqs[:, None] * 2 * np.pi
        self.phase = rng.uniform(0, 2 * np.pi, n_waves)
        amps = 1.0 / np.sqrt(freqs)
        self.amp = amps / amps.sum()

    def __call__(self, p: np.ndarray) -> np.ndarray:
        """p: (..., 3) world points -> (...,) intensity [0, 255]."""
        v = np.tensordot(p, self.k.T, axes=1) + self.phase   # (..., W)
        s = (np.sin(v) * self.amp).sum(-1)                    # ~[-1, 1]
        return (127.5 + 120.0 * np.clip(s * 2.2, -1, 1)).astype(np.float32)


class CorridorScene:
    """Ground plane + two walls + far wall, textured; raycast renderer."""

    def __init__(self, seed: int = 0, ground_y: float = 1.6,
                 wall_x: float = 10.0, hw: Tuple[int, int] = DEFAULT_HW,
                 K: np.ndarray = DEFAULT_K):
        self.tex = ProceduralTexture(seed)
        self.ground_y = ground_y
        self.wall_x = wall_x
        self.hw = hw
        self.K = K
        H, W = hw
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        Kinv = np.linalg.inv(K)
        rays = np.stack([u, v, np.ones_like(u)], -1) @ Kinv.T  # cam-frame dirs
        self._rays_cam = rays / np.linalg.norm(rays, axis=-1, keepdims=True)

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        return self.render_with_geometry(T_wc)[0]

    def render_with_geometry(self, T_wc: np.ndarray):
        """(image u8 (H,W), hit world points (H,W,3), ray depth (H,W)).

        The hit points give EXACT dense correspondences between any two
        views (project the world point into the other camera and compare
        depths for occlusion) — the supervision source for the learned
        front-end's scene-pair training (models/train.py).
        """
        H, W = self.hw
        Rwc = T_wc[:3, :3]
        C = T_wc[:3, 3]
        d = self._rays_cam @ Rwc.T                # (H, W, 3) world dirs
        eps = 1e-9

        t_best = np.full((H, W), np.inf)
        hit = np.zeros((H, W, 3))

        def plane(axis: int, value: float, sign_cond):
            nonlocal t_best, hit
            denom = d[..., axis]
            t = (value - C[axis]) / np.where(np.abs(denom) < eps, eps, denom)
            ok = (t > 0.2) & sign_cond(denom) & (t < t_best)
            p = C[None, None, :] + t[..., None] * d
            t_best = np.where(ok, t, t_best)
            hit = np.where(ok[..., None], p, hit)

        # ALL planes are STATIC world geometry — scenery anchored to the
        # camera would be inconsistent across views and poison stereo /
        # multi-view estimation. The far wall re-anchors on a 10 m world
        # grid so it stays ~200 m ahead of any trajectory length: each
        # re-anchor moves it 10 m (a 5% depth change at 200 m), which the
        # matcher rides out. A 50 m grid measurably poisons long runs —
        # the 1200-frame soak lost association (n_cand=0 -> reloc) exactly
        # at the 50 m crossings because the whole central image region
        # teleported 25% deeper between two frames. Far-wall hits are
        # beyond max_depth=100 so they never become landmarks either way.
        plane(1, self.ground_y, lambda dn: dn > 0)               # ground
        plane(0, self.wall_x, lambda dn: dn > 0)                 # right wall
        plane(0, -self.wall_x, lambda dn: dn < 0)                # left wall
        plane(1, -3.0 * self.wall_x, lambda dn: dn < 0)          # high ceiling
        far_z = np.floor(C[2] / 10.0) * 10.0 + 200.0
        plane(2, far_z, lambda dn: dn > 0)

        img = self.tex(hit)
        # mild distance shading for realism
        shade = 1.0 / (1.0 + 0.004 * np.clip(t_best, 0, 200))
        out = np.clip(img * shade, 0, 255).astype(np.uint8)
        return out, hit, t_best


class BoxScene:
    """SECOND scene family (held-out generalization eval, VERDICT round-2
    item 1b): textured ground plane + scattered axis-aligned boxes under an
    untextured sky — different geometry (finite objects, occlusion
    boundaries, depth discontinuities, featureless regions) AND different
    texture statistics (sinusoids mixed with hard-edged square waves) from
    :class:`CorridorScene`, which is all large planes with smooth texture.
    Same raycast API: ``render`` / ``render_with_geometry``."""

    def __init__(self, seed: int = 0, ground_y: float = 1.6,
                 n_boxes: int = 48, hw: Tuple[int, int] = DEFAULT_HW,
                 K: np.ndarray = DEFAULT_K, span_z: float = 250.0):
        rng = np.random.default_rng(seed + 77000)
        self.tex = ProceduralTexture(seed + 50000)
        # square-wave component: sharp edges change the local gradient
        # statistics (corridor texture is band-limited smooth)
        d = rng.normal(size=(12, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        self._sq_k = d * rng.uniform(0.5, 4.0, 12)[:, None] * 2 * np.pi
        self._sq_phase = rng.uniform(0, 2 * np.pi, 12)
        self.ground_y = ground_y
        self.hw = hw
        self.K = K
        # boxes: a 3-D field of AABBs around and above the camera path (the
        # path runs near x ~ 0, y = 0, going +z). Boxes fill ANY field of
        # view — including the narrow-FOV case where the full-resolution
        # KITTI K is used at a reduced image size — while leaving sky gaps
        # between them (featureless regions the corridor never has). Boxes
        # intersecting a radius-2.5 tube around the path are rejected so the
        # camera never flies through geometry.
        boxes = []
        n_target = max(n_boxes, 30)
        while len(boxes) < n_target:
            sx, sy, sz = rng.uniform(1.0, 6.0, 3)
            cx = rng.uniform(-25.0, 25.0)
            cy = rng.uniform(-18.0, ground_y)
            cz = rng.uniform(4.0, max(span_z, 250.0))
            if abs(cx) < 2.5 + sx / 2 and abs(cy) < 2.5 + sy / 2:
                continue
            lo = np.array([cx - sx / 2, cy - sy / 2, cz - sz / 2])
            hi = np.array([cx + sx / 2, cy + sy / 2, cz + sz / 2])
            boxes.append((lo, hi))
        self._boxes = boxes
        H, W = hw
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        Kinv = np.linalg.inv(K)
        rays = np.stack([u, v, np.ones_like(u)], -1) @ Kinv.T
        self._rays_cam = rays / np.linalg.norm(rays, axis=-1, keepdims=True)

    def _texture(self, p: np.ndarray) -> np.ndarray:
        smooth = self.tex(p)                                   # [0, 255]
        v = np.tensordot(p, self._sq_k.T, axes=1) + self._sq_phase
        sq = np.sign(np.sin(v)).mean(-1)                       # ~[-1, 1]
        return np.clip(0.6 * smooth + 0.4 * (127.5 + 120.0 * sq), 0, 255)

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        return self.render_with_geometry(T_wc)[0]

    def render_with_geometry(self, T_wc: np.ndarray):
        H, W = self.hw
        Rwc = T_wc[:3, :3]
        C = T_wc[:3, 3]
        d = self._rays_cam @ Rwc.T
        eps = 1e-12
        dn = np.where(np.abs(d) < eps, eps, d)

        t_best = np.full((H, W), np.inf)
        # ground plane (re-anchored never needed: infinite plane)
        tg = (self.ground_y - C[1]) / dn[..., 1]
        okg = (tg > 0.2) & (d[..., 1] > 0)
        t_best = np.where(okg, tg, t_best)
        # boxes: slab test, vectorized per box
        for lo, hi in self._boxes:
            t1 = (lo[None, None, :] - C[None, None, :]) / dn
            t2 = (hi[None, None, :] - C[None, None, :]) / dn
            tn = np.minimum(t1, t2).max(-1)
            tf = np.maximum(t1, t2).min(-1)
            ok = (tn < tf) & (tf > 0.2) & (tn > 0.2) & (tn < t_best)
            t_best = np.where(ok, tn, t_best)

        hitmask = np.isfinite(t_best)
        t_safe = np.where(hitmask, t_best, 0.0)
        hit = C[None, None, :] + t_safe[..., None] * d
        img = np.where(hitmask, self._texture(hit), 230.0)     # flat sky
        shade = 1.0 / (1.0 + 0.004 * np.clip(t_safe, 0, 200))
        out = np.clip(img * np.where(hitmask, shade, 1.0), 0,
                      255).astype(np.uint8)
        depth = np.where(hitmask, t_best, np.inf)
        return out, np.where(hitmask[..., None], hit, 0.0), depth


SCENE_FAMILIES = {"corridor": CorridorScene, "boxes": BoxScene}


def generate_kitti_sequence(out_dir: str, n_frames: int = 60, seed: int = 0,
                            hw: Tuple[int, int] = DEFAULT_HW,
                            speed: float = 0.5,
                            yaw_rate_deg: float = 0.25,
                            n_points: int = 0,
                            scene: str = "corridor") -> str:
    """Write a KITTI-layout synthetic sequence; returns the base_dir to pass
    as ``--base_dir`` with ``--dataset kitti``. (``n_points`` accepted for
    backward compatibility; the raycast scene has continuous texture.)"""
    import cv2

    T_wc = make_trajectory(n_frames, speed=speed, yaw_rate_deg=yaw_rate_deg)
    scene = SCENE_FAMILIES[scene](seed=seed, hw=hw)

    img_dir = os.path.join(out_dir, "kitti", "05", "image_0")
    pose_dir = os.path.join(out_dir, "kitti", "poses")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)

    for i in range(n_frames):
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"),
                    scene.render(T_wc[i]))
    np.savetxt(os.path.join(pose_dir, "05.txt"),
               T_wc[:, :3, :4].reshape(n_frames, 12))
    return out_dir


def main(argv=None) -> int:
    p = argparse.ArgumentParser("synth")
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--speed", type=float, default=0.5)
    p.add_argument("--yaw_rate_deg", type=float, default=0.25)
    p.add_argument("--scene", choices=sorted(SCENE_FAMILIES), default="corridor")
    a = p.parse_args(argv)
    base = generate_kitti_sequence(a.out, a.frames, a.seed, speed=a.speed,
                                   yaw_rate_deg=a.yaw_rate_deg, scene=a.scene)
    print(f"synthetic KITTI sequence at {base} "
          f"(use --dataset kitti --base_dir {base})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
