"""Self-supervised training for the learned front-end (ALIKED + LightGlue).

The reference consumes pretrained torch checkpoints; this machine has no
network access, so the TPU build ships the full training loop instead:
synthetic homography pairs (procedural texture images warped by random
homographies give exact dense ground-truth correspondences) drive

  * a descriptor InfoNCE loss at corresponding points (ALIKED desc head),
  * a score-map repeatability loss (score of view 1 warped into view 0),
  * an assignment negative-log-likelihood on the LightGlue double-softmax
    at the ground-truth correspondence permutation, plus matchability
    supervision for out-of-view points.

``train_step`` is one jitted program over the joint parameter tree;
``shard_train_step`` runs it under a (dp, tp) mesh: batch sharded over dp,
the transformer's hidden dimension sharded over tp (XLA inserts the
all-reduces over ICI) — the multi-chip training path validated by
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simpleslam_tpu.models import aliked as aliked_mod
from simpleslam_tpu.models import lightglue as lg_mod


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jax.Array


def make_models(key, desc_dim: int = 64, n_kp: int = 64, dim: int = 128,
                n_layers: int = 3, image_hw=(64, 64)):
    k1, k2 = jax.random.split(key)
    a_model, a_params = aliked_mod.init_aliked(k1, desc_dim=desc_dim,
                                               image_hw=image_hw)
    l_model, l_params = lg_mod.init_lightglue(k2, desc_dim=desc_dim,
                                              n_kp=n_kp, dim=dim,
                                              heads=4, n_layers=n_layers)
    return a_model, l_model, {"aliked": a_params, "lightglue": l_params}


def make_train_state(key, lr: float = 1e-4, warmup: int = 100,
                     total_steps: int = 10000, **model_kw):
    a_model, l_model, params = make_models(key, **model_kw)
    # transformer-safe recipe: non-finite-gradient zapping + global-norm
    # clipping + warmup-cosine schedule. bf16 forward passes occasionally
    # produce NaN/inf gradients on TPU; optax.zero_nans only replaces NaN
    # (an inf flowing into clip_by_global_norm turns the whole step into
    # NaN), so sanitize every non-finite entry before clipping.
    def _sanitize():
        def update(grads, state, params=None):
            grads = jax.tree.map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            return grads, state
        return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                            update)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(total_steps, warmup + 1), lr * 0.1)
    tx = optax.chain(_sanitize(),
                     optax.clip_by_global_norm(1.0),
                     optax.adamw(sched))
    return (a_model, l_model, tx,
            TrainState(params, tx.init(params), jnp.int32(0)))


# --------------------------------------------------------------------------- #
# Synthetic homography pair batches
# --------------------------------------------------------------------------- #

def _smooth_noise(key, B, H, W, octaves=(4, 8, 16)):
    imgs = jnp.zeros((B, H, W))
    for i, o in enumerate(octaves):
        key, k = jax.random.split(key)
        coarse = jax.random.uniform(k, (B, H // o + 2, W // o + 2))
        up = jax.image.resize(coarse, (B, H, W), "bicubic")
        imgs = imgs + up / (i + 1)
    lo = imgs.min(axis=(1, 2), keepdims=True)
    hi = imgs.max(axis=(1, 2), keepdims=True)
    return (imgs - lo) / jnp.maximum(hi - lo, 1e-6)


def _random_homography(key, H, W, mag: float = 0.12):
    """Random perturbation homography mapping view0 pixel coords -> view1."""
    k1, k2 = jax.random.split(key)
    # perturb the 4 corners
    corners0 = jnp.array([[0.0, 0], [W - 1.0, 0], [0, H - 1.0],
                          [W - 1.0, H - 1.0]])
    jitter = jax.random.uniform(k1, (4, 2), minval=-mag, maxval=mag)
    corners1 = corners0 + jitter * jnp.array([W, H])
    # DLT for the 4-point homography
    from simpleslam_tpu.ops.epipolar import fit_homography
    return fit_homography(corners0.astype(jnp.float32),
                          corners1.astype(jnp.float32))


def _warp_points(Hm, pts):
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = ph @ Hm.T
    return q[..., :2] / jnp.maximum(jnp.abs(q[..., 2:3]), 1e-9) * jnp.sign(q[..., 2:3])


def _warp_image(img, Hm_inv):
    """Sample img at H^-1(dest coords) -> warped image (bilinear)."""
    H, W = img.shape
    yy, xx = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    dst = jnp.stack([xx, yy], -1).reshape(-1, 2)
    src = _warp_points(Hm_inv, dst)
    x = jnp.clip(src[:, 0], 0, W - 1.001)
    y = jnp.clip(src[:, 1], 0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
         + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    return v.reshape(H, W)


@partial(jax.jit, static_argnames=("B", "H", "W", "G"))
def synthetic_pair_batch(key, B: int, H: int, W: int, G: int):
    """Batch of correspondence-labelled homography pairs.

    Returns dict: img0/img1 (B,H,W,1) in [0,1], pts0/pts1 (B,G,2) pixel
    correspondences, pt_valid (B,G), Hmats (B,3,3), plus the dense
    warp01 (B,H,W,2) view0-pixel -> view1-pixel field and warp_valid
    (B,H,W) for the peak-alignment repeatability loss.
    """
    keys = jax.random.split(key, 4)
    img0 = _smooth_noise(keys[0], B, H, W)
    Hmats = jax.vmap(lambda k: _random_homography(k, H, W))(
        jax.random.split(keys[1], B))
    Hinv = jnp.linalg.inv(Hmats)
    img1 = jax.vmap(_warp_image)(img0, Hmats)   # img1(x) = img0(H^-1 x)? see note

    # note: warp_image samples img at Hm_inv(dest): passing Hmats means
    # img1(dest) = img0(H(dest)) i.e. correspondence x0 = H(x1);
    # so pts1 -> pts0 via H. We generate pts1 on a margin grid and map back.
    m = 6
    pts1 = jnp.stack([
        jax.random.uniform(keys[2], (B, G), minval=m, maxval=W - m),
        jax.random.uniform(keys[3], (B, G), minval=m, maxval=H - m)], -1)
    pts0 = jax.vmap(_warp_points)(Hmats, pts1)
    valid = ((pts0[..., 0] >= m) & (pts0[..., 0] < W - m)
             & (pts0[..., 1] >= m) & (pts0[..., 1] < H - m))

    # dense view0 -> view1 warp (x1 = H^-1 x0)
    yy, xx = jnp.mgrid[0:H, 0:W].astype(jnp.float32)
    grid = jnp.stack([xx, yy], -1).reshape(-1, 2)
    w01 = jax.vmap(lambda Hi: _warp_points(Hi, grid))(Hinv)
    w01 = w01.reshape(B, H, W, 2)
    wv = ((w01[..., 0] >= m) & (w01[..., 0] < W - m)
          & (w01[..., 1] >= m) & (w01[..., 1] < H - m))
    return dict(img0=img0[..., None], img1=img1[..., None],
                pts0=pts0, pts1=pts1, pt_valid=valid, Hmats=Hmats,
                warp01=w01, warp_valid=wv)


# --------------------------------------------------------------------------- #
# Scene-pair batches (domain-matched: real viewpoint changes + parallax)
# --------------------------------------------------------------------------- #

class ScenePairPool:
    """Pre-rendered pool of (image, world-hit-point, depth) views of a
    textured 3-D scene; batches sample nearby-view pairs with EXACT raycast
    correspondences (occlusion-checked). Homography warps of noise images
    (synthetic_pair_batch) have no parallax and no scene structure — this
    pool closes that domain gap for the front-end the SLAM pipeline runs.
    """

    def __init__(self, hw, n_views: int = 160, seed: int = 0,
                 n_scenes: int = 4, render_hw=None,
                 families: Tuple[str, ...] = ("corridor",),
                 cache_dir: str = "/tmp/scenepool_cache"):
        from simpleslam_tpu.tools.synth import (DEFAULT_K, SCENE_FAMILIES,
                                                make_trajectory,
                                                renderer_version)
        H, W = hw
        if render_hw is None:
            render_hw = (H, W)
        Hr, Wr = render_hw
        assert Hr >= H and Wr >= W, "render_hw must contain the crop hw"
        # K for the RENDER resolution: pipeline-matched appearance. Training
        # crops of (H, W) out of (Hr, Wr) views see exactly the pixel-scale
        # texture statistics the SLAM pipeline runs at — the 144x256-native
        # rendering this replaces had ~(Wr/W)x finer texture per pixel, which
        # is why the round-1 checkpoint's descriptors collapsed at 376x1232.
        s = Wr / 1232.0
        K = DEFAULT_K.copy()
        K[0] *= s
        K[1] *= s
        K[1, 2] = 0.487 * Hr
        self.K = K.astype(np.float64)
        self.hw = (H, W)
        self.render_hw = (Hr, Wr)
        rng = np.random.default_rng(seed)
        self.imgs, self.pts, self.depth, self.poses = [], [], [], []
        per = max(2, n_views // n_scenes)
        # renders are deterministic in (family, seed, hw, K, trajectory):
        # cache per scene block on disk — a full-res 160-view pool costs
        # ~1 h of single-core raycasting, a retrain should not re-pay it
        import hashlib
        import os

        for sc in range(n_scenes):
            fam = families[sc % len(families)]
            T = make_trajectory(per, speed=float(rng.uniform(0.2, 0.8)),
                                yaw_rate_deg=float(rng.uniform(0.0, 0.8)))
            # the photo family's DEFAULT texture set is the held-out eval
            # split (tools/synth._default_photo_set) — training scenes must
            # use the disjoint TRAINING half or the eval family would show
            # training imagery
            fam_kw = {}
            split_tag = ""
            if fam == "photo":
                fam_kw["photos"] = train_photo_paths()
                split_tag = "|trainsplit"
            # renderer_version(): a renderer change must invalidate cached
            # blocks, not silently retrain on stale imagery
            key = hashlib.sha1(
                f"{fam}|{seed + sc}|{Hr}x{Wr}|{per}|{renderer_version()}"
                f"{split_tag}"
                .encode() + K.tobytes() + T.tobytes()).hexdigest()[:16]
            cpath = os.path.join(cache_dir, f"block_{key}.npz") \
                if cache_dir else None
            if cpath and os.path.exists(cpath):
                z = np.load(cpath)
                imgs, pts, depth = z["imgs"], z["pts"], z["depth"]
            else:
                scene = SCENE_FAMILIES[fam](seed=seed + sc, hw=(Hr, Wr), K=K,
                                            **fam_kw)
                # box scenes have featureless sky; keep yaw gentle so the
                # view retains geometry, and always move forward for parallax
                out = [scene.render_with_geometry(T[i]) for i in range(per)]
                imgs = np.stack([o[0] for o in out])
                pts = np.stack([o[1] for o in out]).astype(np.float32)
                depth = np.nan_to_num(
                    np.stack([o[2] for o in out]),
                    posinf=1e9).astype(np.float32)
                if cpath:
                    os.makedirs(cache_dir, exist_ok=True)
                    np.savez(cpath, imgs=imgs, pts=pts, depth=depth)
            for i in range(per):
                self.imgs.append(imgs[i])
                self.pts.append(pts[i])
                self.depth.append(depth[i])
                self.poses.append(T[i].astype(np.float64))
        self.n = len(self.imgs)
        self._per = per

    def batch(self, rng: np.random.Generator, B: int, G: int,
              max_gap: int = 4,
              scale_jitter: float = 0.25) -> Dict[str, np.ndarray]:
        """Correspondence-labelled view pairs, same dict layout as
        synthetic_pair_batch (Hmats omitted). When the pool renders larger
        than the training hw, each sample is an independent random crop of
        both views; view 1's crop is additionally scale-jittered (cropped at
        a random size and resized to hw) so descriptors learn the
        forward-motion scale changes that dominate close-range SLAM
        matching. A dense warp01/warp_valid field (exact raycast
        correspondence for EVERY view-0 crop pixel, occlusion-checked)
        drives the peak-alignment repeatability loss."""
        import cv2

        H, W = self.hw
        Hr, Wr = self.render_hw
        K = self.K
        img0 = np.zeros((B, H, W, 1), np.float32)
        img1 = np.zeros((B, H, W, 1), np.float32)
        pts0 = np.zeros((B, G, 2), np.float32)
        pts1 = np.zeros((B, G, 2), np.float32)
        valid = np.zeros((B, G), bool)
        warp01 = np.zeros((B, H, W, 2), np.float32)
        warp_valid = np.zeros((B, H, W), bool)
        m = 6
        yy, xx = np.mgrid[0:H, 0:W]
        for b in range(B):
            i = int(rng.integers(0, self.n))
            # pairs must stay inside one scene block (views are concatenated
            # per-scene; a cross-scene pair would yield bogus supervision)
            blk = i // self._per
            lo_i, hi_i = blk * self._per, min((blk + 1) * self._per,
                                              self.n) - 1
            j = int(np.clip(i + rng.integers(1, max_gap + 1)
                            * (1 if rng.random() < 0.5 else -1), lo_i, hi_i))
            if j == i:
                j = min(i + 1, hi_i)
            # crop offsets; view 1 crops at a jittered size then resizes
            s = float(np.exp(rng.uniform(-np.log(1 + scale_jitter),
                                         np.log(1 + scale_jitter)))) \
                if scale_jitter > 0 else 1.0
            H1 = int(np.clip(round(H * s), 32, Hr))
            W1 = int(np.clip(round(W * s), 32, Wr))
            ox0 = int(rng.integers(0, Wr - W + 1))
            oy0 = int(rng.integers(0, Hr - H + 1))
            # center view-1's crop on the projected center of view-0's crop
            # (plus jitter) so the pair always overlaps when geometry allows
            Xc0 = self.pts[i][oy0 + H // 2, ox0 + W // 2]
            T1c = np.linalg.inv(self.poses[j])
            pc = T1c[:3, :3] @ Xc0 + T1c[:3, 3]
            zc = max(float(pc[2]), 1e-3)
            uc = float(pc[0] / zc * K[0, 0] + K[0, 2])
            vc = float(pc[1] / zc * K[1, 1] + K[1, 2])
            jx = float(rng.uniform(-0.25, 0.25)) * W1
            jy = float(rng.uniform(-0.25, 0.25)) * H1
            ox1 = int(np.clip(round(uc - W1 / 2 + jx), 0, Wr - W1))
            oy1 = int(np.clip(round(vc - H1 / 2 + jy), 0, Hr - H1))
            img0[b, ..., 0] = self.imgs[i][oy0:oy0 + H, ox0:ox0 + W] / 255.0
            crop1 = self.imgs[j][oy1:oy1 + H1, ox1:ox1 + W1]
            img1[b, ..., 0] = cv2.resize(
                crop1.astype(np.float32), (W, H),
                interpolation=cv2.INTER_AREA if s > 1 else cv2.INTER_LINEAR) \
                / 255.0
            sx, sy = W / W1, H / H1

            # dense warp: EVERY view-0 crop pixel's raycast hit point,
            # projected into view 1 and mapped to view-1 crop coordinates
            Xw = self.pts[i][oy0:oy0 + H, ox0:ox0 + W].reshape(-1, 3)
            T1_cw = np.linalg.inv(self.poses[j])
            Xc = Xw @ T1_cw[:3, :3].T + T1_cw[:3, 3]
            z = Xc[:, 2]
            uv = (Xc[:, :2] / np.maximum(z[:, None], 1e-6)) \
                * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            # occlusion: the other view's ray depth at uv must match |Xc|
            ui = np.clip(uv[:, 0].astype(int), 0, Wr - 1)
            vi = np.clip(uv[:, 1].astype(int), 0, Hr - 1)
            d1 = self.depth[j][vi, ui]
            r1 = np.linalg.norm(Xc, axis=1)
            inb_r = (z > 0.2) & (uv[:, 0] >= 0) & (uv[:, 0] < Wr) \
                & (uv[:, 1] >= 0) & (uv[:, 1] < Hr)
            vis = inb_r & (np.abs(d1 - r1) < 0.15 * np.maximum(r1, 1.0))
            u1 = (uv[:, 0] - ox1) * sx
            v1 = (uv[:, 1] - oy1) * sy
            in_crop1 = (u1 >= m) & (u1 < W - m) & (v1 >= m) & (v1 < H - m)
            warp01[b] = np.stack([u1, v1], 1).reshape(H, W, 2)
            warp_valid[b] = (vis & in_crop1).reshape(H, W)

            # sparse correspondences: sample from the valid warp field
            # (inside the view-0 margin)
            in0 = (xx >= m) & (xx < W - m) & (yy >= m) & (yy < H - m)
            cand = np.flatnonzero((warp_valid[b] & in0).reshape(-1))
            if len(cand):
                sel = rng.choice(cand, size=min(G, len(cand)), replace=False)
                k = len(sel)
                pts0[b, :k] = np.stack([(sel % W), (sel // W)], 1)
                pts1[b, :k] = warp01[b].reshape(-1, 2)[sel]
                valid[b, :k] = True
        return dict(img0=img0, img1=img1, pts0=pts0, pts1=pts1,
                    pt_valid=valid, warp01=warp01, warp_valid=warp_valid)


class PhotoPairPool:
    """Homography pairs over REAL photographs (the training half of the
    machine's real-image corpus; see ``train_photo_paths``).

    The synthetic pools above teach geometry (parallax, occlusion) but their
    pixel statistics come from a procedural renderer; webcam photographs
    carry real sensor statistics — demosaic noise, optical blur, JPEG-ish
    texture, real scene clutter. Each sample: random (H,W) crop of a random
    photo at a random pre-scale, warped by a random homography (corner
    jitter + similarity component) with the EXACT dense correspondence
    field, same dict layout as ``synthetic_pair_batch``/``ScenePairPool``.

    Mirrors the role of MegaDepth/homography pre-training for the
    reference's pretrained ALIKED+LightGlue weights (reference:
    slam/core/features_utils.py:24-26) with the imagery available here.
    """

    def __init__(self, hw, paths, seed: int = 0):
        import cv2

        H, W = hw
        self.hw = (int(H), int(W))
        self.imgs = []
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            img = img.astype(np.float32)
            # per-photo contrast normalization (webcam exposures vary);
            # photometric_augment re-jitters per sample afterwards
            lo, hi = np.percentile(img, [2, 98])
            img = np.clip((img - lo) / max(hi - lo, 1.0), 0.0, 1.0)
            # keep a small pyramid of pre-scales so crops see the photo at
            # several pixel scales (the SLAM pipeline's effective texture
            # scale varies with depth)
            pyr = [img]
            for _ in range(2):
                if min(pyr[-1].shape) < 2 * min(H, W):
                    break
                pyr.append(cv2.resize(pyr[-1], (pyr[-1].shape[1] // 2,
                                                pyr[-1].shape[0] // 2),
                                      interpolation=cv2.INTER_AREA))
            self.imgs.extend(p2 for p2 in pyr
                             if p2.shape[0] >= H + 8 and p2.shape[1] >= W + 8)
        if not self.imgs:
            raise FileNotFoundError("PhotoPairPool: no usable photos")

    @staticmethod
    def _random_h(rng: np.random.Generator, H: int, W: int,
                  mag: float = 0.15) -> np.ndarray:
        """Corner-jitter homography composed with a random similarity
        (rotation up to ~15 deg, scale 1 +- 25%) about the crop center."""
        import cv2

        c0 = np.float32([[0, 0], [W - 1, 0], [0, H - 1], [W - 1, H - 1]])
        c1 = c0 + rng.uniform(-mag, mag, (4, 2)).astype(np.float32) \
            * np.float32([W, H])
        Hm = cv2.getPerspectiveTransform(c0, c1).astype(np.float64)
        ang = rng.uniform(-15.0, 15.0)
        s = float(np.exp(rng.uniform(-0.22, 0.22)))
        S = np.eye(3)
        S[:2] = cv2.getRotationMatrix2D((W / 2.0, H / 2.0), ang, s)
        return (S @ Hm).astype(np.float64)

    def batch(self, rng: np.random.Generator, B: int, G: int
              ) -> Dict[str, np.ndarray]:
        import cv2

        H, W = self.hw
        img0 = np.zeros((B, H, W, 1), np.float32)
        img1 = np.zeros((B, H, W, 1), np.float32)
        pts0 = np.zeros((B, G, 2), np.float32)
        pts1 = np.zeros((B, G, 2), np.float32)
        valid = np.zeros((B, G), bool)
        warp01 = np.zeros((B, H, W, 2), np.float32)
        warp_valid = np.zeros((B, H, W), bool)
        m = 6
        yy, xx = np.mgrid[0:H, 0:W]
        grid = np.stack([xx, yy, np.ones_like(xx)], -1).reshape(-1, 3) \
            .astype(np.float64)
        for b in range(B):
            src = self.imgs[int(rng.integers(0, len(self.imgs)))]
            oy = int(rng.integers(0, src.shape[0] - H + 1))
            ox = int(rng.integers(0, src.shape[1] - W + 1))
            crop = src[oy:oy + H, ox:ox + W]
            Hm = self._random_h(rng, H, W)
            img0[b, ..., 0] = crop
            img1[b, ..., 0] = cv2.warpPerspective(crop, Hm.astype(np.float32),
                                                  (W, H))
            q = grid @ Hm.T
            uv = q[:, :2] / np.maximum(np.abs(q[:, 2:3]), 1e-9) \
                * np.sign(q[:, 2:3])
            warp01[b] = uv.reshape(H, W, 2).astype(np.float32)
            wv = ((uv[:, 0] >= m) & (uv[:, 0] < W - m)
                  & (uv[:, 1] >= m) & (uv[:, 1] < H - m)).reshape(H, W)
            warp_valid[b] = wv
            in0 = (xx >= m) & (xx < W - m) & (yy >= m) & (yy < H - m)
            cand = np.flatnonzero((wv & in0).reshape(-1))
            if len(cand):
                sel = rng.choice(cand, size=min(G, len(cand)), replace=False)
                k = len(sel)
                pts0[b, :k] = np.stack([(sel % W), (sel // W)], 1)
                pts1[b, :k] = warp01[b].reshape(-1, 2)[sel]
                valid[b, :k] = True
        return dict(img0=img0, img1=img1, pts0=pts0, pts1=pts1,
                    pt_valid=valid, warp01=warp01, warp_valid=warp_valid)


def train_photo_paths() -> list:
    """The TRAINING half of the machine's real photographs: odd-indexed
    reference webcam frames + matplotlib's grace_hopper portrait. The
    even-indexed half is reserved for evaluation (tools/synth.PhotoScene
    textures and tools/real_eval --split heldout) so real-image training
    never sees the eval imagery."""
    import glob as globmod
    import os

    from simpleslam_tpu.tools.synth import REAL_PHOTO_GLOB

    paths = sorted(globmod.glob(REAL_PHOTO_GLOB))[1::2]
    try:
        import matplotlib

        gh = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                          "sample_data", "grace_hopper.jpg")
        if os.path.exists(gh):
            paths.append(gh)
    except Exception:
        pass
    return paths


def photometric_augment(rng: np.random.Generator,
                        batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Independent brightness/contrast/gamma/noise jitter per view — the
    descriptor must survive exposure changes between frames."""
    out = dict(batch)
    for k in ("img0", "img1"):
        img = np.asarray(batch[k], np.float32)
        B = img.shape[0]
        gain = rng.uniform(0.6, 1.4, (B, 1, 1, 1)).astype(np.float32)
        bias = rng.uniform(-0.15, 0.15, (B, 1, 1, 1)).astype(np.float32)
        gamma = rng.uniform(0.7, 1.4, (B, 1, 1, 1)).astype(np.float32)
        noise = rng.normal(0, rng.uniform(0.0, 0.03),
                           img.shape).astype(np.float32)
        img = np.clip(img, 0, 1) ** gamma
        img = np.clip(img * gain + bias + noise, 0.0, 1.0)
        out[k] = img
    return out


# --------------------------------------------------------------------------- #
# Loss
# --------------------------------------------------------------------------- #

def _sample_many(desc_map, pts):
    """(Hf,Wf,D) at half-res; pts are full-res pixels -> (G, D) normalized."""
    d = aliked_mod._bilinear_sample(desc_map, pts[:, 0] * 0.5, pts[:, 1] * 0.5)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


def _peak_align_loss(score0, score1, warp01, wvalid, n_peaks: int = 128,
                     r: int = 3, tau: float = 0.5):
    """Detector repeatability via peak alignment (ONE image pair).

    Take view0's strongest NMS peaks (selection stop-gradded), carry each
    through the dense GT warp into view1, and require view1's score map to
    peak AT the warped location within its (2r+1)^2 window — a local
    softmax NLL with the warped pixel as the target bin. This is what
    'repeatable detector' actually means (the score-VALUE equality loss it
    supplements cannot align argmaxes); the recipe is the standard
    reprojection-peakiness training used by modern learned detectors.
    """
    H, W = score0.shape
    nms = aliked_mod._nms_mask(score0[None], 2)[0]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    border = 8
    inb = ((xx >= border) & (xx < W - border)
           & (yy >= border) & (yy < H - border))
    gated = jnp.where(nms & inb & wvalid, score0, -jnp.inf)
    v, idx = jax.lax.top_k(
        jax.lax.stop_gradient(gated).reshape(-1), n_peaks)
    ys = (idx // W).astype(jnp.int32)
    xs = (idx % W).astype(jnp.int32)
    ok = jnp.isfinite(v)
    q = warp01[ys, xs]                                   # (P,2) view1 px
    ok &= (q[:, 0] >= r + 1) & (q[:, 0] < W - r - 1) \
        & (q[:, 1] >= r + 1) & (q[:, 1] < H - r - 1)
    qx = jnp.clip(jnp.round(q[:, 0]).astype(jnp.int32), r, W - 1 - r)
    qy = jnp.clip(jnp.round(q[:, 1]).astype(jnp.int32), r, H - 1 - r)

    def win(y, x):
        return jax.lax.dynamic_slice(score1, (y - r, x - r),
                                     (2 * r + 1, 2 * r + 1))

    Wn = jax.vmap(win)(qy, qx).reshape(n_peaks, -1)       # (P, (2r+1)^2)
    logp = jax.nn.log_softmax(Wn / tau, axis=-1)
    center = (2 * r + 1) * r + r
    return -jnp.sum(jnp.where(ok, logp[:, center], 0.0)) \
        / jnp.maximum(jnp.sum(ok), 1)


def loss_fn(params, a_model, l_model, batch, image_hw):
    score0, dmap0 = a_model.apply(params["aliked"], batch["img0"])
    score1, dmap1 = a_model.apply(params["aliked"], batch["img1"])

    pts0, pts1 = batch["pts0"], batch["pts1"]
    pv = batch["pt_valid"]

    d0 = jax.vmap(_sample_many)(dmap0, pts0)   # (B, G, D)
    d1 = jax.vmap(_sample_many)(dmap1, pts1)

    # descriptor InfoNCE within each image pair, BOTH directions (the
    # windowed 2D-3D association queries map-desc -> frame-desc and the
    # matcher the reverse; symmetric training covers both)
    sim = jnp.einsum("bgd,bhd->bgh", d0, d1) / 0.1
    sim01 = jnp.where(pv[:, None, :], sim, -1e9)
    logp01 = jax.nn.log_softmax(sim01, axis=-1)
    sim10 = jnp.where(pv[:, :, None], sim, -1e9)
    logp10 = jax.nn.log_softmax(sim10, axis=-2)
    diag = (jnp.einsum("bgg->bg", logp01) + jnp.einsum("bgg->bg", logp10)) \
        * 0.5
    l_desc = -jnp.sum(jnp.where(pv, diag, 0.0)) / jnp.maximum(jnp.sum(pv), 1)

    # score repeatability: score1 at pts1 should equal score0 at pts0
    def sample_score(s, p):
        return aliked_mod._bilinear_sample(s[..., None], p[:, 0], p[:, 1])[:, 0]

    s0 = jax.vmap(sample_score)(score0, pts0)
    s1 = jax.vmap(sample_score)(score1, pts1)
    l_rep = jnp.sum(jnp.where(pv, (s0 - s1) ** 2, 0.0)) / jnp.maximum(jnp.sum(pv), 1)

    # peak ALIGNMENT across views (repeatability proper) when the batch
    # carries a dense warp field
    if "warp01" in batch:
        l_peak = jnp.mean(jax.vmap(_peak_align_loss)(
            score0, score1, batch["warp01"], batch["warp_valid"]))
    else:
        l_peak = jnp.float32(0.0)
    # keep score responses informative (anti-collapse); clamp the magnitude
    # penalty — a transient activation blow-up must not inf the total loss
    l_reg = jnp.mean(jax.nn.relu(1.0 - jnp.std(score0, axis=(1, 2)))) \
        + 0.01 * jnp.mean(jnp.minimum(score0 ** 2, 1e4))

    # LightGlue assignment NLL at the GT permutation (identity over G points)
    P, sig0, sig1 = l_model.apply(
        params["lightglue"], pts0, d0, pv, pts1, d1, pv, image_hw)
    diagP = jnp.einsum("bgg->bg", P)
    l_match = -jnp.sum(jnp.where(pv, jnp.log(diagP + 1e-9), 0.0)) \
        / jnp.maximum(jnp.sum(pv), 1)
    # matchability supervision: valid points should be matchable
    sig0c = jnp.clip(sig0, 1e-6, 1.0 - 1e-6)
    l_sig = -jnp.mean(jnp.where(pv, jnp.log(sig0c), jnp.log(1.0 - sig0c)))

    total = (l_desc + 0.5 * l_rep + 0.5 * l_peak + 0.1 * l_reg
             + l_match + 0.1 * l_sig)
    return total, {"desc": l_desc, "rep": l_rep, "peak": l_peak,
                   "match": l_match, "sig": l_sig, "total": total}


def make_train_step(a_model, l_model, tx, image_hw):
    @jax.jit
    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, a_model, l_model, batch,
                                   image_hw)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


# --------------------------------------------------------------------------- #
# Multi-chip sharded training (dp x tp mesh)
# --------------------------------------------------------------------------- #

def shard_params_for_tp(params, mesh):
    """NamedShardings: shard large Dense kernels' output dim over 'tp',
    replicate everything else."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec_of(path, leaf):
        if leaf.ndim == 2 and leaf.shape[1] % mesh.shape["tp"] == 0 \
                and leaf.shape[1] >= 64:
            return NamedSharding(mesh, P(None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_of, params)


def make_sharded_train_step(a_model, l_model, tx, image_hw, mesh):
    """jit with explicit (dp, tp) shardings: batch over dp, hidden over tp."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_spec = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(None, batch_spec),
             out_shardings=None)
    def train_step(state: TrainState, batch):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, a_model, l_model, batch,
                                   image_hw)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
