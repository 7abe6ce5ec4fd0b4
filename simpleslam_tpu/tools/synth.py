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


def renderer_version() -> str:
    """Short hash of this module's source: disk caches of rendered views
    (bench frames, models/train.ScenePairPool blocks) fold it into their
    keys so ANY renderer change invalidates them instead of silently
    reusing stale imagery."""
    import hashlib

    with open(__file__, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()[:12]


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


def make_loop_trajectory(n_frames: int, speed: float = 0.5,
                         closure_frac: float = 0.8) -> np.ndarray:
    """(N,4,4) T_wc poses on a CLOSED circle: constant yaw rate chosen so the
    camera returns exactly to its start viewpoint after
    ``closure_frac * n_frames`` frames, then keeps driving the same circle.
    The revisit is what loop closure (core/loop.py) detects; the reference
    has no closed trajectories because it has no loop closure (future work,
    reference README.md:317). Circle radius ~= speed / yaw_step."""
    n_close = max(int(round(n_frames * closure_frac)), 8)
    yaw_step = 2.0 * np.pi / n_close
    out = [np.eye(4)]
    yaw, pos = 0.0, np.zeros(3)
    for _ in range(n_frames - 1):
        yaw += yaw_step
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                      [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        pos = pos + R @ np.array([0.0, 0.0, speed])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        out.append(T)
    return np.stack(out)


def make_square_loop_trajectory(n_frames: int, speed: float = 0.5,
                                closure_frac: float = 0.8,
                                corner_frames: int = 24) -> np.ndarray:
    """(N,4,4) T_wc poses on a CLOSED rounded square: four straight segments
    joined by four 90-degree arcs of ``corner_frames`` frames each, closing
    exactly at ``closure_frac * n_frames`` (then re-driving the same lap).

    This is the KITTI-shaped loop fixture: KITTI-00's loops are mostly
    straight blocks with short corners, unlike the constant-yaw circle of
    make_loop_trajectory (3.6 deg/frame sustained — a hard monocular case
    where scale drifts under permanent rotation). Closure is exact by
    symmetry: the four quarter-laps are identical up to 90-degree rotations,
    so their displacements sum to zero."""
    n_close = max(int(round(n_frames * closure_frac)), 16)
    n_close -= n_close % 4                       # identical quarters
    c = min(int(corner_frames), n_close // 4 - 1)
    s_q = n_close // 4 - c                       # straight frames per side
    quarter = [0.0] * s_q + [np.pi / 2 / c] * c
    lap = quarter * 4
    out = [np.eye(4)]
    yaw, pos = 0.0, np.zeros(3)
    for i in range(n_frames - 1):
        yaw += lap[i % n_close]
        R = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                      [0, 1, 0],
                      [-np.sin(yaw), 0, np.cos(yaw)]])
        pos = pos + R @ np.array([0.0, 0.0, speed])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = pos
        out.append(T)
    return np.stack(out)


_JTEX = None


def _jax_tex():
    """Jitted texture evaluator (11x the numpy path: XLA fuses the
    (H, W, n_waves) sin/exp/mul chain and vectorizes the transcendentals).
    Lazily built; callers fall back to numpy if jax/cpu is unavailable."""
    global _JTEX
    if _JTEX is None:
        import jax
        import jax.numpy as jnp

        def f(p, fpx, smear, k, phase, amp, knorm):
            v = jnp.tensordot(p, k.T, axes=1) + phase
            q = (0.5 * fpx[..., None] * knorm) ** 2
            q = q + jnp.tensordot(smear, k.T, axes=1) ** 2
            a = amp * jnp.exp(-0.5 * q)
            s = (jnp.sin(v) * a).sum(-1)
            return 127.5 + 120.0 * jnp.clip(s * 2.2, -1, 1)

        _JTEX = jax.jit(f)
    return _JTEX


class ProceduralTexture:
    """Fixed random sum-of-sinusoids over R^3 -> [0, 255] intensity.

    Anti-aliased: pass ``footprint`` (per-point world-space pixel size in
    meters, ~ depth / focal) and each wave is attenuated by the Gaussian
    pixel-integration factor exp(-0.5 (sigma |k|)^2), sigma = footprint/2 —
    the closed-form supersample of a sinusoid. Without it, the 2-8 cycle/m
    waves alias into high-contrast noise wherever one pixel spans more than
    half a period (depth > ~44 m at KITTI focal): the detector then dumps
    its keypoint budget on unstable far-field junk, which measurably
    destabilized long soaks (weak-inlier stretches whenever deep corridor
    dominated the view)."""

    def __init__(self, seed: int = 0, n_waves: int = 48):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n_waves, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        # mixture of coarse and fine spatial frequencies (cycles/meter)
        freqs = np.concatenate([rng.uniform(0.3, 1.5, n_waves // 2),
                                rng.uniform(2.0, 8.0, n_waves - n_waves // 2)])
        self.k = d * freqs[:, None] * 2 * np.pi
        self.knorm = freqs * 2 * np.pi                 # |k| rad/meter
        self.phase = rng.uniform(0, 2 * np.pi, n_waves)
        amps = 1.0 / np.sqrt(freqs)
        self.amp = amps / amps.sum()
        self.k32 = self.k.astype(np.float32)
        self.knorm32 = self.knorm.astype(np.float32)
        self.phase32 = self.phase.astype(np.float32)
        self.amp32 = self.amp.astype(np.float32)

    def __call__(self, p: np.ndarray, footprint=None,
                 smear_vec=None) -> np.ndarray:
        """p: (..., 3) world points -> (...,) intensity [0, 255].

        ``footprint``: isotropic in-surface pixel size (meters). Optional
        ``smear_vec`` (..., 3): ADDITIONAL anisotropic smear (EWA-style) —
        the world-space major half-axis of the pixel's surface ellipse at
        grazing incidence. Each wave is attenuated by
        exp(-0.5 [sigma_iso^2 |k|^2 + (k . smear_vec)^2]), so texture
        perpendicular to the smear survives (a real camera sees stripes on
        a grazing wall, not uniform blur — and trackers need them).

        float32 throughout — the (H, W, n_waves) sin/exp grids dominate
        render time and f64 doubles it for no visible difference."""
        p32 = np.asarray(p, np.float32)
        if footprint is not None and smear_vec is not None:
            try:
                import jax

                # only when the process explicitly runs the cpu platform:
                # on this machine sitecustomize pins an experimental TPU
                # platform, and jax.devices("cpu") would try to initialize
                # it (and hang if the tunnel is down) — numpy is the safe
                # default everywhere else
                if "cpu" not in (jax.config.jax_platforms or ""):
                    raise RuntimeError("non-cpu jax platform")
                cpu = jax.devices("cpu")[0]

                def put(x):
                    return jax.device_put(np.asarray(x, np.float32), cpu)

                out = _jax_tex()(put(p32), put(footprint), put(smear_vec),
                                 put(self.k32), put(self.phase32),
                                 put(self.amp32), put(self.knorm32))
                return np.asarray(out)
            except Exception:
                pass                       # no jax / no cpu backend: numpy
        v = np.tensordot(p32, self.k32.T, axes=1) + self.phase32
        if footprint is not None:
            sig = 0.5 * np.asarray(footprint, np.float32)[..., None]
            q = (sig * self.knorm32) ** 2
            if smear_vec is not None:
                ks = np.tensordot(np.asarray(smear_vec, np.float32),
                                  self.k32.T, axes=1)
                q = q + ks ** 2
            amp = self.amp32 * np.exp(-0.5 * q)
            s = (np.sin(v) * amp).sum(-1)                     # ~[-1, 1]
        else:
            s = np.sin(v) @ self.amp32
        return 127.5 + 120.0 * np.clip(s * 2.2, -1, 1)


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
        smear = np.zeros((H, W, 3), np.float32)
        inv_f = 1.0 / float(self.K[0, 0])

        def plane(axis: int, value: float, sign_cond):
            nonlocal t_best, hit, smear
            denom = d[..., axis]
            t = (value - C[axis]) / np.where(np.abs(denom) < eps, eps, denom)
            ok = (t > 0.2) & sign_cond(denom) & (t < t_best)
            p = C[None, None, :] + t[..., None] * d
            t_best = np.where(ok, t, t_best)
            hit = np.where(ok[..., None], p, hit)
            # anisotropic pixel footprint on this plane: the major half-axis
            # the surface ellipse is 0.5 (t/f) tan(incidence) along the
            # in-plane ray direction = 0.5 (t/f) d_perp / |d.n| (rays are
            # unit, so |d.axis| is the cosine vs the axis-aligned normal)
            d_perp = d.copy()
            d_perp[..., axis] = 0.0
            s_vec = (0.5 * inv_f * t / np.maximum(np.abs(denom), 1e-3)
                     )[..., None] * d_perp
            mag = np.linalg.norm(s_vec, axis=-1, keepdims=True)
            s_vec = s_vec * (np.minimum(mag, 25.0) / np.maximum(mag, 1e-12))
            smear = np.where(ok[..., None], s_vec.astype(np.float32), smear)

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

        # per-pixel texture anti-aliasing: isotropic footprint depth/focal
        # (pixels are ~1/f radians wide) + the anisotropic grazing smear
        # collected per plane above
        fpx = np.clip(t_best, 0.0, 1e4) / float(self.K[0, 0])
        img = self.tex(hit, footprint=fpx, smear_vec=smear)
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
                 K: np.ndarray = DEFAULT_K, span_z: float = 250.0,
                 path: np.ndarray = None):
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
        # optional explicit camera path (e.g. a closed loop): the box field
        # then covers the path's bounding region instead of the default
        # straight +z run, and collision rejection uses true path distance
        if path is not None:
            path = np.asarray(path, np.float64)
            x_lo, x_hi = path[:, 0].min() - 25.0, path[:, 0].max() + 25.0
            z_lo, z_hi = path[:, 2].min() - 10.0, path[:, 2].max() + 25.0
        while len(boxes) < n_target:
            sx, sy, sz = rng.uniform(1.0, 6.0, 3)
            cy = rng.uniform(-18.0, ground_y)
            if path is not None:
                cx = rng.uniform(x_lo, x_hi)
                cz = rng.uniform(z_lo, z_hi)
                half_diag = 0.5 * float(np.linalg.norm([sx, sy, sz]))
                d_path = np.min(np.linalg.norm(
                    path[:, [0, 2]] - np.array([cx, cz]), axis=1))
                if d_path < 2.5 + half_diag and cy > -2.5 - sy / 2:
                    continue
            else:
                cx = rng.uniform(-25.0, 25.0)
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

    def _texture(self, p: np.ndarray, footprint=None,
                 smear_vec=None) -> np.ndarray:
        smooth = self.tex(p, footprint=footprint, smear_vec=smear_vec)
        p32 = np.asarray(p, np.float32)
        sqk = self._sq_k.astype(np.float32)
        v = np.tensordot(p32, sqk.T, axes=1) + \
            self._sq_phase.astype(np.float32)
        sq = np.sign(np.sin(v))                                # ~[-1, 1]
        if footprint is not None:
            # attenuate each square wave by the pixel-footprint Gaussian on
            # its fundamental (harmonics are strictly smaller — bound, not
            # exact; keeps the hard edges sharp only where resolvable)
            sig = 0.5 * np.asarray(footprint, np.float32)[..., None]
            knorm = np.linalg.norm(sqk, axis=1)
            q = (sig * knorm) ** 2
            if smear_vec is not None:
                ks = np.tensordot(np.asarray(smear_vec, np.float32),
                                  sqk.T, axes=1)
                q = q + ks ** 2
            sq = sq * np.exp(-0.5 * q)
        sq = sq.mean(-1)
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
        smear = np.zeros((H, W, 3), np.float32)
        inv_f = 1.0 / float(self.K[0, 0])

        def _smear_for(axis_arr, t):
            # anisotropic half-axis 0.5 (t/f) d_perp / |d.n| (see
            # CorridorScene.render_with_geometry)
            cosi = np.abs(np.take_along_axis(d, axis_arr[..., None],
                                             -1))[..., 0]
            d_perp = d.copy()
            np.put_along_axis(d_perp, axis_arr[..., None], 0.0, -1)
            s = (0.5 * inv_f * t / np.maximum(cosi, 1e-3))[..., None] * d_perp
            mag = np.linalg.norm(s, axis=-1, keepdims=True)
            return (s * (np.minimum(mag, 25.0) / np.maximum(mag, 1e-12))
                    ).astype(np.float32)

        # ground plane (re-anchored never needed: infinite plane)
        tg = (self.ground_y - C[1]) / dn[..., 1]
        okg = (tg > 0.2) & (d[..., 1] > 0)
        t_best = np.where(okg, tg, t_best)
        ax_g = np.ones((H, W), np.intp)
        smear = np.where(okg[..., None], _smear_for(ax_g, tg), smear)
        # boxes: slab test, vectorized per box
        for lo, hi in self._boxes:
            t1 = (lo[None, None, :] - C[None, None, :]) / dn
            t2 = (hi[None, None, :] - C[None, None, :]) / dn
            tmin = np.minimum(t1, t2)
            tn = tmin.max(-1)
            tf = np.maximum(t1, t2).min(-1)
            ok = (tn < tf) & (tf > 0.2) & (tn > 0.2) & (tn < t_best)
            t_best = np.where(ok, tn, t_best)
            face = tmin.argmax(-1)          # entry face axis
            smear = np.where(ok[..., None], _smear_for(face, tn), smear)

        hitmask = np.isfinite(t_best)
        t_safe = np.where(hitmask, t_best, 0.0)
        hit = C[None, None, :] + t_safe[..., None] * d
        fpx = t_safe / float(self.K[0, 0])
        img = np.where(hitmask,
                       self._texture(hit, footprint=fpx, smear_vec=smear),
                       230.0)                                  # flat sky
        shade = 1.0 / (1.0 + 0.004 * np.clip(t_safe, 0, 200))
        out = np.clip(img * np.where(hitmask, shade, 1.0), 0,
                      255).astype(np.uint8)
        depth = np.where(hitmask, t_best, np.inf)
        return out, np.where(hitmask[..., None], hit, 0.0), depth


REAL_PHOTO_GLOB = "/root/reference/config/calibrate_camera/images/*.png"


def _default_photo_set():
    """Held-out REAL photographs for :class:`PhotoScene` textures.

    EVEN-indexed reference webcam frames. The odd half (plus matplotlib's
    grace_hopper portrait) is the real-image TRAINING set
    (models/train.train_photo_paths) — the two halves are disjoint so this
    eval family never shows training imagery. All are real camera sensor
    data — none were produced by the procedural renderer the learned
    front-end trains on."""
    import glob as globmod

    return sorted(globmod.glob(REAL_PHOTO_GLOB))[::2]


class PhotoScene:
    """THIRD scene family (VERDICT r3 weak-8): corridor-style geometry
    textured with REAL PHOTOGRAPHS via mip-mapped bilinear texture lookup —
    a genuinely different image formation from the procedural-wave EWA
    renderer both other families (and the learned front-end's training)
    use. Pixel statistics are real sensor data: webcam photos committed by
    the reference (held-out split; see :func:`_default_photo_set`).

    Same raycast API as the other families: ``render`` /
    ``render_with_geometry`` -> (u8 image, (H,W,3) world hit points,
    (H,W) depth) with exact dense correspondences for eval tooling."""

    #: meters of wall covered by one photo tile (mirror-tiled beyond)
    TILE_M = 8.0
    MIP_LEVELS = 5

    def __init__(self, seed: int = 0, ground_y: float = 1.6,
                 wall_x: float = 10.0, hw: Tuple[int, int] = DEFAULT_HW,
                 K: np.ndarray = DEFAULT_K, photos=None):
        import cv2

        paths = photos or _default_photo_set()
        if not paths:
            raise FileNotFoundError("PhotoScene: no real photos available")
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(paths))
        self._pyramids = []
        for i in order:
            img = cv2.imread(paths[i], cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            img = img.astype(np.float32)
            # per-photo contrast normalization: webcam exposures vary
            lo, hi = np.percentile(img, [2, 98])
            img = np.clip((img - lo) * (235.0 / max(hi - lo, 1.0)) + 10.0,
                          0, 255)
            pyr = [img]
            for _l in range(self.MIP_LEVELS - 1):
                pyr.append(cv2.GaussianBlur(
                    pyr[-1], (0, 0), sigmaX=2.0 ** len(pyr) * 0.5))
            self._pyramids.append(pyr)
        if not self._pyramids:
            raise FileNotFoundError("PhotoScene: photos failed to load")
        self.ground_y = ground_y
        self.wall_x = wall_x
        self.hw = hw
        self.K = K
        H, W = hw
        u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                           np.arange(H, dtype=np.float64))
        Kinv = np.linalg.inv(K)
        rays = np.stack([u, v, np.ones_like(u)], -1) @ Kinv.T
        self._rays_cam = rays / np.linalg.norm(rays, axis=-1, keepdims=True)

    def _sample_photo(self, idx: int, pu, pv, footprint):
        """Mip-mapped bilinear lookup of photo ``idx`` at in-plane world
        coords (pu, pv) in meters; ``footprint`` is the pixel's in-surface
        size in meters (isotropic + grazing smear magnitude)."""
        pyr = self._pyramids[idx % len(self._pyramids)]
        h, w = pyr[0].shape
        texel = self.TILE_M / w                        # meters per texel
        # mip level from footprint measured in texels
        lvl = np.log2(np.maximum(footprint, 1e-9) / texel)
        lvl = np.clip(np.rint(lvl).astype(np.int32), 0, len(pyr) - 1)
        # world meters -> texels, mirror-tiled
        x = pu / texel
        y = pv / (self.TILE_M * h / w) * h
        x0 = np.floor(x).astype(np.int64)
        y0 = np.floor(y).astype(np.int64)
        fx2, fy2 = (x - x0).astype(np.float32), (y - y0).astype(np.float32)

        def mirror(i, n):
            m = i % (2 * n)
            return np.where(m < n, m, 2 * n - 1 - m)

        stack = np.stack(pyr)                          # (LVL, h, w)
        out = np.zeros(x.shape, np.float32)
        wsum = ((1 - fx2) * (1 - fy2), fx2 * (1 - fy2),
                (1 - fx2) * fy2, fx2 * fy2)
        offs = ((0, 0), (1, 0), (0, 1), (1, 1))
        for (dx, dy), wgt in zip(offs, wsum):
            xi = mirror(x0 + dx, w)
            yi = mirror(y0 + dy, h)
            out += wgt * stack[lvl, yi, xi]
        return out

    def render(self, T_wc: np.ndarray) -> np.ndarray:
        return self.render_with_geometry(T_wc)[0]

    def render_with_geometry(self, T_wc: np.ndarray):
        H, W = self.hw
        Rwc = T_wc[:3, :3]
        C = T_wc[:3, 3]
        d = self._rays_cam @ Rwc.T
        eps = 1e-9

        t_best = np.full((H, W), np.inf)
        hit = np.zeros((H, W, 3))
        img = np.full((H, W), 230.0, np.float32)
        inv_f = 1.0 / float(self.K[0, 0])

        def plane(axis: int, value: float, sign_cond, photo_idx: int):
            nonlocal t_best, hit, img
            denom = d[..., axis]
            t = (value - C[axis]) / np.where(np.abs(denom) < eps, eps, denom)
            ok = (t > 0.2) & sign_cond(denom) & (t < t_best)
            if not ok.any():
                return
            p = C[None, None, :] + t[..., None] * d
            # in-surface footprint: isotropic depth/f plus the grazing
            # smear magnitude (same bound the EWA families use)
            fp = t * inv_f * (1.0 + np.minimum(
                np.linalg.norm(np.where(
                    np.arange(3)[None, None, :] == axis, 0.0, d), axis=-1)
                / np.maximum(np.abs(denom), 1e-3), 25.0))
            axes = [a for a in range(3) if a != axis]
            tex = self._sample_photo(photo_idx, p[..., axes[0]],
                                     p[..., axes[1]], fp)
            t_best = np.where(ok, t, t_best)
            hit = np.where(ok[..., None], p, hit)
            img = np.where(ok, tex, img)

        plane(1, self.ground_y, lambda dn: dn > 0, 0)            # ground
        plane(0, self.wall_x, lambda dn: dn > 0, 1)              # right wall
        plane(0, -self.wall_x, lambda dn: dn < 0, 2)             # left wall
        plane(1, -3.0 * self.wall_x, lambda dn: dn < 0, 3)       # ceiling
        far_z = np.floor(C[2] / 10.0) * 10.0 + 200.0             # far wall
        plane(2, far_z, lambda dn: dn > 0, 4)

        shade = 1.0 / (1.0 + 0.004 * np.clip(np.where(
            np.isfinite(t_best), t_best, 200.0), 0, 200))
        out = np.clip(img * shade, 0, 255).astype(np.uint8)
        return out, hit, t_best


SCENE_FAMILIES = {"corridor": CorridorScene, "boxes": BoxScene,
                  "photo": PhotoScene}


def generate_kitti_sequence(out_dir: str, n_frames: int = 60, seed: int = 0,
                            hw: Tuple[int, int] = DEFAULT_HW,
                            speed: float = 0.5,
                            yaw_rate_deg: float = 0.25,
                            n_points: int = 0,
                            scene: str = "corridor",
                            trajectory: str = "straight",
                            closure_frac: float = 0.8,
                            corner_frames: int = 24,
                            calib: str = "fov") -> str:
    """Write a KITTI-layout synthetic sequence; returns the base_dir to pass
    as ``--base_dir`` with ``--dataset kitti``. (``n_points`` accepted for
    backward compatibility; the raycast scene has continuous texture.)

    ``trajectory="loop"`` drives a closed circle that revisits its start
    viewpoint at ``closure_frac * n_frames`` (the loop-closure fixture); the
    scene geometry auto-adapts (corridor widens past the circle, box field
    covers the path)."""
    import cv2

    scene_kw = {}
    if trajectory in ("loop", "square"):
        if trajectory == "square":
            T_wc = make_square_loop_trajectory(n_frames, speed=speed,
                                               closure_frac=closure_frac,
                                               corner_frames=corner_frames)
        else:
            T_wc = make_loop_trajectory(n_frames, speed=speed,
                                        closure_frac=closure_frac)
        if scene in ("corridor", "photo"):
            scene_kw["wall_x"] = float(
                max(10.0, np.abs(T_wc[:, 0, 3]).max() + 6.0))
        else:
            scene_kw["path"] = T_wc[:, :3, 3]
            # a circling camera sweeps EVERY heading: densify the field so
            # no viewing direction is left facing featureless sky (measured:
            # at the default 48 boxes, the fixture has 66-103 ORB corners on
            # outward-facing frames vs ~300 elsewhere, and tracking starves)
            scene_kw["n_boxes"] = 160
    else:
        T_wc = make_trajectory(n_frames, speed=speed,
                               yaw_rate_deg=yaw_rate_deg)
    H, W = hw
    Ks = DEFAULT_K.copy()
    if calib == "crop":
        # focal-preserving CROP: render an HxW window of the native image
        # plane at the native focal (principal point at the window center).
        # Per-pixel depth observability (px of disparity per meter) then
        # matches full-resolution KITTI instead of degrading with the render
        # size — the defect VERDICT r3 weak-5 measured on the 180x410 box
        # fixture (focal 707 -> ~236 px). The camera is written to the
        # sequence's calib.txt (standard KITTI odometry layout) which the
        # data layer honors verbatim.
        Ks[0, 2] = W / 2.0
        Ks[1, 2] = H / 2.0
    else:
        # FOV-preserving rescale: shrink the intrinsics to the render size
        # exactly the way the data layer rescales the hard-coded calibration
        # to non-native frames (data/dataloader.py
        # Sequence._rescale_calib_to_frames) — fixture and driver then agree
        # on the camera at ANY hw, and low-res fixtures keep KITTI's wide
        # FOV (near-field texture) instead of becoming telescopes
        Ks[0] *= W / DEFAULT_HW[1]
        Ks[1] *= H / DEFAULT_HW[0]
    scene = SCENE_FAMILIES[scene](seed=seed, hw=hw, K=Ks, **scene_kw)

    img_dir = os.path.join(out_dir, "kitti", "05", "image_0")
    pose_dir = os.path.join(out_dir, "kitti", "poses")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)
    if calib == "crop":
        P0 = np.hstack([Ks, np.zeros((3, 1))])
        P1 = P0.copy()
        P1[0, 3] = -386.1448       # KITTI seq-05 stereo baseline term (fx*b)
        with open(os.path.join(out_dir, "kitti", "05", "calib.txt"), "w") as f:
            for name_, P_ in (("P0", P0), ("P1", P1)):
                f.write(name_ + ": " + " ".join(f"{v:.12e}"
                                                for v in P_.ravel()) + "\n")

    for i in range(n_frames):
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"),
                    scene.render(T_wc[i]))
    np.savetxt(os.path.join(pose_dir, "05.txt"),
               T_wc[:, :3, :4].reshape(n_frames, 12))
    return out_dir


def main(argv=None) -> int:
    from simpleslam_tpu.utils.platform import respect_platform_env
    respect_platform_env()
    p = argparse.ArgumentParser("synth")
    p.add_argument("--out", required=True)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--speed", type=float, default=0.5)
    p.add_argument("--yaw_rate_deg", type=float, default=0.25)
    p.add_argument("--scene", choices=sorted(SCENE_FAMILIES), default="corridor")
    p.add_argument("--trajectory", choices=["straight", "loop", "square"],
                   default="straight",
                   help="'loop' drives a closed circle, 'square' a closed "
                        "rounded square (KITTI-shaped: straights + short "
                        "corners); both revisit the start viewpoint "
                        "(loop-closure fixtures)")
    p.add_argument("--closure_frac", type=float, default=0.8,
                   help="loop/square mode: fraction of frames at which the "
                        "lap closes (the rest re-drives the lap)")
    p.add_argument("--corner_frames", type=int, default=24,
                   help="square mode: frames per 90-degree corner arc")
    p.add_argument("--calib", choices=["fov", "crop"], default="fov",
                   help="'fov' rescales intrinsics to the render size "
                        "(keeps KITTI's wide FOV); 'crop' renders a native-"
                        "focal window and writes the camera to calib.txt "
                        "(keeps full-res depth observability at low res)")
    p.add_argument("--hw", type=int, nargs=2, default=list(DEFAULT_HW),
                   metavar=("H", "W"),
                   help="render resolution (default: native KITTI 370 1226; "
                        "intrinsics are rescaled to match, so low-res "
                        "fixtures keep KITTI's FOV — the full-res EWA render "
                        "is ~100x slower than 180x410)")
    a = p.parse_args(argv)
    base = generate_kitti_sequence(a.out, a.frames, a.seed,
                                   hw=(a.hw[0], a.hw[1]), speed=a.speed,
                                   yaw_rate_deg=a.yaw_rate_deg, scene=a.scene,
                                   trajectory=a.trajectory,
                                   closure_frac=a.closure_frac,
                                   corner_frames=a.corner_frames,
                                   calib=a.calib)
    print(f"synthetic KITTI sequence at {base} "
          f"(use --dataset kitti --base_dir {base})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
