"""Real-image front-end evaluation: repeatability + matching under known
homographies and illumination jitter on actual photographs.

The reference's evidentiary record is real-world imagery (reference:
README.md:4 demo video, media/*); the real photos shipped on this machine
are the 31 webcam calibration frames
(``/root/reference/config/calibrate_camera/images/*.png``). This tool
measures a front-end on them with the standard HPatches-style protocol:
warp each image by a random homography, jitter gain/bias/gamma
(illumination axis), extract on both views, and score

  * repeatability  — fraction of keypoints (visible in both views) whose
    warped location has a detected keypoint within ``tol`` px,
  * descriptor separation — median L2 of true pairs vs nearest distractor
    (float descriptors only),
  * matcher precision/recall — LightGlue (or BF) matches gated at min_conf
    vs the ground-truth warp.

``--compare`` runs the learned pipeline AND the classical ORB/AKAZE
front-ends over the IDENTICAL episode list (same homographies, same
illumination draws) — the apples-to-apples table VERDICT r3 item 7 asks
for ("is the learned front-end worth it on real data").

Usage:
  python -m simpleslam_tpu.tools.real_eval [--glob PATTERN] [--n 31]
         [--warps 5] [--frontend learned|orb|akaze|sift] [--compare]
         [--no_illum] [--hw H W] [--json]
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import sys

import numpy as np

DEFAULT_GLOB = "/root/reference/config/calibrate_camera/images/*.png"


def select_split(paths, split: str):
    """Real-photo train/eval split. ``heldout`` = the even-indexed half
    (never used by real-image training, which takes the odd half +
    grace_hopper — models/train.train_photo_paths); ``train`` = that odd
    half; ``all`` = everything (pre-round-4 protocol)."""
    paths = sorted(paths)
    if split == "heldout":
        return paths[::2]
    if split == "train":
        return paths[1::2]
    return paths


def _load_gray(path: str, hw):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        return None
    if hw is not None:
        img = cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_AREA)
    H8, W8 = (img.shape[0] // 8) * 8, (img.shape[1] // 8) * 8
    return img[:H8, :W8]


def _random_h(rng, H, W, mag=0.12):
    import cv2

    c0 = np.float32([[0, 0], [W - 1, 0], [0, H - 1], [W - 1, H - 1]])
    c1 = np.float32(c0 + rng.uniform(-mag, mag, (4, 2)) * [W, H])
    return cv2.getPerspectiveTransform(c0, c1)


def _warp_pts(Hm, pts):
    ph = np.concatenate([pts, np.ones_like(pts[:, :1])], 1)
    q = ph @ Hm.T
    return q[:, :2] / np.maximum(np.abs(q[:, 2:3]), 1e-9) * np.sign(q[:, 2:3])


def _apply_photometric(img: np.ndarray, ph) -> np.ndarray:
    """gain/bias/gamma jitter in [0,255] space (the illumination axis)."""
    if ph is None:
        return img
    x = (img.astype(np.float32) / 255.0) ** ph["gamma"]
    x = x * 255.0 * ph["gain"] + ph["bias"]
    return np.clip(x, 0, 255).astype(np.uint8)


def build_episodes(paths, warps, hw, seed=0, illum=True, mag=0.12):
    """Shared episode list: (path, gray image, homography, photometric) —
    built ONCE so every compared front-end sees identical inputs."""
    rng = np.random.default_rng(seed)
    eps = []
    for p in paths:
        img = _load_gray(p, hw)
        if img is None:
            continue
        for _w in range(warps):
            Hm = _random_h(rng, *img.shape, mag=mag)
            ph = ({"gain": float(rng.uniform(0.7, 1.4)),
                   "bias": float(rng.uniform(-20, 20)),
                   "gamma": float(rng.uniform(0.7, 1.4))} if illum else None)
            eps.append({"path": p, "img": img, "H": Hm, "photo": ph})
    return eps


def evaluate_pair(det, mat, img0, Hm, photo=None, tol=3.0):
    """One (image, warped+jittered image) episode -> metric dict."""
    import cv2
    import jax
    import jax.numpy as jnp

    H, W = img0.shape
    img1 = _apply_photometric(cv2.warpPerspective(img0, Hm, (W, H)), photo)
    f0 = jax.tree.map(np.asarray, det.fn(jnp.asarray(img0, jnp.float32)))
    f1 = jax.tree.map(np.asarray, det.fn(jnp.asarray(img1, jnp.float32)))
    kp0, d0 = f0.kpts[f0.valid], f0.desc[f0.valid]
    kp1, d1 = f1.kpts[f1.valid], f1.desc[f1.valid]
    if len(kp0) < 16 or len(kp1) < 16:
        return None

    gt1 = _warp_pts(Hm, kp0)
    m = 8
    vis = (gt1[:, 0] >= m) & (gt1[:, 0] < W - m) \
        & (gt1[:, 1] >= m) & (gt1[:, 1] < H - m)
    if vis.sum() < 32:
        return None
    dist = np.linalg.norm(gt1[vis][:, None] - kp1[None], axis=-1)
    nn = dist.argmin(1)
    rep = dist.min(1) < tol

    out = {"n_vis": int(vis.sum()), "repeatability": float(rep.mean())}
    if d0.dtype != np.uint8 and rep.any():
        true_l2 = np.linalg.norm(d0[vis][rep] - d1[nn[rep]], axis=-1)
        sim = np.linalg.norm(d0[vis][rep][:, None] - d1[None], axis=-1)
        distract = np.where(dist[rep] > 10.0, sim, np.inf).min(1)
        out["true_l2_p50"] = float(np.median(true_l2))
        out["distractor_l2_p50"] = float(np.median(distract))
        out["frac_true_under_gate"] = float((true_l2 < 0.8).mean())

    # matcher episode (full padded sets, like the pipeline)
    if mat is not None:
        mm = jax.tree.map(np.asarray, mat.fn(
            jax.tree.map(jnp.asarray, f0), jax.tree.map(jnp.asarray, f1)))
        sel = mm.valid
        if sel.any():
            p0 = f0.kpts[mm.idx0[sel]]
            p1 = f1.kpts[mm.idx1[sel]]
            err = np.linalg.norm(_warp_pts(Hm, p0) - p1, axis=-1)
            out["n_matches"] = int(sel.sum())
            out["match_precision"] = float((err < tol).mean())
            out["match_recall_vs_vis"] = float((err < tol).sum()
                                               / max(int(vis.sum()), 1))
        else:
            out["n_matches"] = 0
            out["match_precision"] = 0.0
            out["match_recall_vs_vis"] = 0.0
    return out


def _frontend(name: str, max_kp: int, min_conf: float):
    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.core.frontend import init_feature_pipeline

    argv = ["--dataset", "kitti", "--headless",
            "--max_features", str(max_kp), "--min_conf", str(min_conf)]
    if name == "learned":
        argv.append("--use_lightglue")
    else:
        argv += ["--detector", name]
    return init_feature_pipeline(parse_config(argv))


AGG_KEYS = ("repeatability", "true_l2_p50", "distractor_l2_p50",
            "frac_true_under_gate", "match_precision", "match_recall_vs_vis",
            "n_matches")


def eval_frontend(name, episodes, max_kp=1024, min_conf=0.7, verbose=True):
    """Run one front-end over a shared episode list -> (aggregate, rows)."""
    det, mat = _frontend(name, max_kp, min_conf)
    rows = []
    for ep in episodes:
        r = evaluate_pair(det, mat, ep["img"], ep["H"], ep["photo"])
        if r is None:
            continue
        r["image"] = os.path.basename(ep["path"])
        rows.append(r)
        if verbose:
            print(f"[{name}] {r['image']}: rep={r['repeatability']:.2f} "
                  f"prec={r.get('match_precision', float('nan')):.2f} "
                  f"rec={r.get('match_recall_vs_vis', float('nan')):.2f} "
                  f"n={r.get('n_matches', 0)}", flush=True)
    if not rows:
        raise RuntimeError(f"no valid evaluation episodes for {name}")
    agg = {}
    for k in AGG_KEYS:
        vals = [e[k] for e in rows if k in e]
        if vals:
            agg[k] = float(np.mean(vals))
    agg["n_episodes"] = len(rows)
    return agg, rows


def run_eval(image_glob=DEFAULT_GLOB, n_images=31, warps=5, hw=None,
             classical=False, max_kp=1024, min_conf=0.7, seed=0,
             verbose=True, frontend=None, illum=True):
    """Single-frontend evaluation (kept for tests/back-compat);
    ``classical=True`` means the ORB front-end."""
    paths = sorted(globmod.glob(image_glob))[:n_images]
    if not paths:
        raise FileNotFoundError(f"no images match {image_glob}")
    episodes = build_episodes(paths, warps, hw, seed=seed, illum=illum)
    name = frontend or ("orb" if classical else "learned")
    agg, rows = eval_frontend(name, episodes, max_kp, min_conf, verbose)
    agg["n_images"] = len(paths)
    return agg, rows


def main(argv=None) -> int:
    from simpleslam_tpu.utils.platform import respect_platform_env
    respect_platform_env()
    p = argparse.ArgumentParser("real_eval")
    p.add_argument("--glob", default=DEFAULT_GLOB)
    p.add_argument("--n", type=int, default=31)
    p.add_argument("--warps", type=int, default=5)
    p.add_argument("--hw", type=int, nargs=2, default=None,
                   help="resize images to H W before eval")
    p.add_argument("--frontend", default="learned",
                   choices=["learned", "orb", "akaze", "sift"])
    p.add_argument("--classical", action="store_true",
                   help="alias for --frontend orb (back-compat)")
    p.add_argument("--compare", action="store_true",
                   help="run learned + ORB + AKAZE on identical episodes")
    p.add_argument("--no_illum", action="store_true",
                   help="disable the gain/bias/gamma illumination jitter")
    p.add_argument("--split", default="all",
                   choices=["all", "heldout", "train"],
                   help="photo split: 'heldout' = the even-indexed half "
                        "(disjoint from real-image training)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_kp", type=int, default=1024)
    p.add_argument("--min_conf", type=float, default=0.7)
    p.add_argument("--json", action="store_true")
    a = p.parse_args(argv)
    from simpleslam_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()

    paths = select_split(globmod.glob(a.glob), a.split)[:a.n]
    if not paths:
        raise FileNotFoundError(f"no images match {a.glob}")
    hw = tuple(a.hw) if a.hw else None
    episodes = build_episodes(paths, a.warps, hw, seed=a.seed,
                              illum=not a.no_illum)
    names = (["learned", "orb", "akaze"] if a.compare
             else ["orb" if a.classical else a.frontend])
    results = {}
    for name in names:
        agg, _rows = eval_frontend(name, episodes, a.max_kp, a.min_conf,
                                   verbose=not a.json)
        agg["n_images"] = len(paths)
        results[name] = agg

    if a.json:
        print(json.dumps(results if a.compare else results[names[0]]))
    elif a.compare:
        cols = ["repeatability", "match_precision", "match_recall_vs_vis",
                "n_matches"]
        print(f"\n{'frontend':<10}" + "".join(f"{c:>22}" for c in cols)
              + f"{'episodes':>10}")
        for name, agg in results.items():
            print(f"{name:<10}" + "".join(
                f"{agg.get(c, float('nan')):>22.4f}" for c in cols)
                + f"{agg['n_episodes']:>10d}")
    else:
        print("aggregate:", {k: (round(v, 4) if isinstance(v, float) else v)
                             for k, v in results[names[0]].items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
