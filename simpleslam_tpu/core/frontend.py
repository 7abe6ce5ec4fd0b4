"""Feature front-end facade: one API over the classical (ORB-style JAX) and
learned (ALIKED + LightGlue JAX) backends.

Reference-parity surface (slam/core/features_utils.py:18-200):
  * :func:`init_feature_pipeline`  (:18-30)  -> (detector, matcher)
  * :func:`feature_extractor`      (:85-107) -> padded :class:`Features`
  * :func:`feature_matcher`        (:109-178)-> padded :class:`Matches`
  * :func:`filter_matches_ransac`  (:185-200) F-RANSAC geometric filter with
    the <8-matches passthrough quirk.

Differences by design: keypoints/descriptors/matches are static-shape padded
pytrees (core/types.py) rather than cv2.KeyPoint/DMatch lists; the detectors
run as jitted TPU programs; 'bf' and 'flann' both map to the exhaustive
MXU matcher (N<=4096 makes exhaustive optimal on TPU — SURVEY.md §2).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.ops import epipolar
from simpleslam_tpu.ops.features import orb_detect_and_describe, rgb_to_gray
from simpleslam_tpu.ops.matching import bf_match


@dataclass
class Detector:
    name: str
    max_kp: int
    fn: Callable  # img (H,W) gray -> Features
    learned: bool = False
    extractor: object = None  # ALIKED module bundle for the learned path


@dataclass
class Matcher:
    name: str
    fn: Callable  # (Features, Features) -> Matches
    learned: bool = False
    # order-free variant for fully-jitted consumers (the reference sorts
    # matches by distance, features_utils.py:176-178, but nothing downstream
    # depends on order; the sort is a real cost on TPU)
    fn_fast: Optional[Callable] = None


def init_feature_pipeline(args) -> Tuple[Detector, Matcher]:
    """Build (detector, matcher) from config (features_utils.py:18-55).

    ``--use_lightglue`` (or detector='aliked') selects the learned pipeline:
    ALIKED keypoints + LightGlue attention matching. 'orb'/'akaze' use the
    binary FAST+BRIEF front-end (ops/features); 'sift' uses the DoG +
    gradient-histogram float front-end (ops/features_sift).
    """
    max_kp = int(getattr(args, "max_features", 4000))
    n_pad = ((max_kp + 127) // 128) * 128

    use_lg = bool(getattr(args, "use_lightglue", False)) or \
        getattr(args, "detector", "orb") == "aliked"
    if use_lg:
        from simpleslam_tpu.models.pipeline import (build_learned_extractor,
                                                    build_learned_matcher)
        det = build_learned_extractor(args, n_pad)
        mat = build_learned_matcher(args, det)
        return det, mat

    name = getattr(args, "detector", "orb")
    if name == "sift":
        from simpleslam_tpu.ops.features_sift import sift_detect_and_describe

        def detect(img_gray: jax.Array) -> Features:
            return sift_detect_and_describe(img_gray, max_kp=n_pad)
    elif name == "akaze":
        # true AKAZE: FED nonlinear-diffusion scale space + Hessian extrema
        # + rotated M-LDB binary descriptors (reference:
        # features_utils.py:39-41 via cv2.AKAZE_create)
        from simpleslam_tpu.ops.features_akaze import akaze_detect_and_describe

        def detect(img_gray: jax.Array) -> Features:
            return akaze_detect_and_describe(img_gray, max_kp=n_pad)
    else:
        def detect(img_gray: jax.Array) -> Features:
            return orb_detect_and_describe(img_gray, max_kp=n_pad,
                                           fast_thresh=20.0)

    def match(f0: Features, f1: Features) -> Matches:
        return bf_match(f0, f1, cross_check=True)

    def match_fast(f0: Features, f1: Features) -> Matches:
        return bf_match(f0, f1, cross_check=True, sort=False)

    return (Detector(name=name, max_kp=n_pad, fn=detect),
            Matcher(name=getattr(args, "matcher", "bf"), fn=match,
                    fn_fast=match_fast))


def feature_extractor(args, img: np.ndarray, detector: Detector) -> Features:
    """Extract padded features from a BGR or grayscale uint8 frame
    (features_utils.py:85-107)."""
    img = jnp.asarray(img)
    if img.ndim == 3:
        gray = rgb_to_gray(img)
    else:
        gray = img.astype(jnp.float32)
    return detector.fn(gray)


def feature_matcher(args, feats0: Features, feats1: Features,
                    matcher: Matcher) -> Matches:
    """Match two padded feature sets (features_utils.py:109-178).

    Learned path applies the LightGlue confidence gate at ``args.min_conf``
    inside the matcher; classical path is mutual-NN sorted by distance.
    """
    return matcher.fn(feats0, feats1)


def filter_matches_ransac(feats0: Features, feats1: Features,
                          matches: Matches, thresh: float,
                          key: Optional[jax.Array] = None,
                          n_hyp: int = 256) -> Matches:
    """Geometric F-RANSAC filter on matches (features_utils.py:185-200).

    Keeps the reference quirk: fewer than 8 valid matches -> passthrough.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = int(np.asarray(matches.valid).sum())
    if n < 8:
        return matches
    p0 = feats0.kpts[matches.idx0]
    p1 = feats1.kpts[matches.idx1]
    F, inl, ok = epipolar.find_fundamental(key, p0, p1, matches.valid,
                                           float(thresh), n_hyp=n_hyp)
    if not bool(ok):
        return matches
    return Matches(idx0=matches.idx0, idx1=matches.idx1,
                   score=matches.score, valid=matches.valid & inl)


def match_with_ransac(args, matcher: Matcher, feats0: Features,
                      feats1: Features, key=None) -> Matches:
    """feature_matcher + filter_matches_ransac in one call — the driver's
    `_match_with_ransac` helper (main_revamped.py:118-126)."""
    m = feature_matcher(args, feats0, feats1, matcher)
    return filter_matches_ransac(feats0, feats1, m,
                                 getattr(args, "ransac_thresh", 2.5), key=key)


def detect_and_match(args, img0, img1, detector: Detector, matcher: Matcher,
                     ransac: bool = True, key=None):
    """One-shot detect-both + match (the reference's legacy
    ``detect_and_match`` convenience, features_utils.py:208-255).
    Returns (feats0, feats1, matches)."""
    f0 = feature_extractor(args, img0, detector)
    f1 = feature_extractor(args, img1, detector)
    if ransac:
        m = match_with_ransac(args, matcher, f0, f1, key=key)
    else:
        m = feature_matcher(args, f0, f1, matcher)
    return f0, f1, m
