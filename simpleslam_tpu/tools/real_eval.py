"""Real-image front-end evaluation: repeatability + matching under known
homographies on actual photographs.

The reference's evidentiary record is real-world imagery (reference:
README.md:4 demo video, media/*); the only real photos shipped on this
machine are the 31 webcam calibration frames
(``/root/reference/config/calibrate_camera/images/*.png``). This tool
measures the learned (or classical) front-end on them with the standard
HPatches-style protocol: warp each image by a random homography, extract on
both, and score

  * repeatability  — fraction of keypoints (visible in both views) whose
    warped location has a detected keypoint within ``tol`` px,
  * descriptor separation — median L2 of true pairs vs nearest distractor,
  * matcher precision/recall — LightGlue (or BF) matches gated at min_conf
    vs the ground-truth warp.

Usage:
  python -m simpleslam_tpu.tools.real_eval [--glob PATTERN] [--n 8]
         [--warps 2] [--classical] [--hw H W] [--json]
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import sys

import numpy as np

DEFAULT_GLOB = "/root/reference/config/calibrate_camera/images/*.png"


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


def evaluate_pair(det, mat, img0, Hm, tol=3.0):
    """One (image, warped image) episode -> metric dict."""
    import cv2
    import jax
    import jax.numpy as jnp

    H, W = img0.shape
    img1 = cv2.warpPerspective(img0, Hm, (W, H))
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


def run_eval(image_glob=DEFAULT_GLOB, n_images=8, warps=2, hw=None,
             classical=False, max_kp=1024, min_conf=0.7, seed=0,
             verbose=True):
    from simpleslam_tpu.config import parse_config

    paths = sorted(globmod.glob(image_glob))[:n_images]
    if not paths:
        raise FileNotFoundError(f"no images match {image_glob}")
    argv = ["--dataset", "kitti", "--headless",
            "--max_features", str(max_kp), "--min_conf", str(min_conf)]
    if not classical:
        argv.append("--use_lightglue")
    cfg = parse_config(argv)
    from simpleslam_tpu.core.frontend import init_feature_pipeline

    det, mat = init_feature_pipeline(cfg)

    rng = np.random.default_rng(seed)
    episodes = []
    for p in paths:
        img = _load_gray(p, hw)
        if img is None:
            continue
        for _w in range(warps):
            Hm = _random_h(rng, *img.shape)
            r = evaluate_pair(det, mat, img, Hm)
            if r is not None:
                r["image"] = os.path.basename(p)
                episodes.append(r)
                if verbose:
                    print(f"{r['image']}: rep={r['repeatability']:.2f} "
                          f"trueL2={r.get('true_l2_p50', float('nan')):.3f} "
                          f"distL2={r.get('distractor_l2_p50', float('nan')):.3f} "
                          f"prec={r.get('match_precision', float('nan')):.2f} "
                          f"n={r.get('n_matches', 0)}", flush=True)

    if not episodes:
        raise RuntimeError("no valid evaluation episodes")
    agg = {}
    for k in ("repeatability", "true_l2_p50", "distractor_l2_p50",
              "frac_true_under_gate", "match_precision",
              "match_recall_vs_vis"):
        vals = [e[k] for e in episodes if k in e]
        if vals:
            agg[k] = float(np.mean(vals))
    agg["n_episodes"] = len(episodes)
    agg["n_images"] = len(paths)
    return agg, episodes


def main(argv=None) -> int:
    from simpleslam_tpu.utils.platform import respect_platform_env
    respect_platform_env()
    p = argparse.ArgumentParser("real_eval")
    p.add_argument("--glob", default=DEFAULT_GLOB)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--warps", type=int, default=2)
    p.add_argument("--hw", type=int, nargs=2, default=None,
                   help="resize images to H W before eval")
    p.add_argument("--classical", action="store_true")
    p.add_argument("--max_kp", type=int, default=1024)
    p.add_argument("--min_conf", type=float, default=0.7)
    p.add_argument("--json", action="store_true")
    a = p.parse_args(argv)
    from simpleslam_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    agg, _eps = run_eval(a.glob, a.n, a.warps, tuple(a.hw) if a.hw else None,
                         a.classical, a.max_kp, a.min_conf)
    if a.json:
        print(json.dumps(agg))
    else:
        print("aggregate:", {k: (round(v, 4) if isinstance(v, float) else v)
                             for k, v in agg.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
