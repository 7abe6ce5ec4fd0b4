"""ORB-style front-end tests (replaces cv2.ORB; reference features_utils.py:33-55)."""
import numpy as np
import jax.numpy as jnp
import pytest

from simpleslam_tpu.ops.features import (fast_score_map, orb_detect_and_describe,
                                         rgb_to_gray)
from simpleslam_tpu.ops.matching import bf_match


def _textured_image(rng, H=240, W=320, n_blobs=120):
    """Random bright rectangles on dark background -> strong corners."""
    img = np.zeros((H, W), np.float32)
    for _ in range(n_blobs):
        y = rng.integers(20, H - 30)
        x = rng.integers(20, W - 30)
        h = rng.integers(4, 14)
        w = rng.integers(4, 14)
        img[y:y + h, x:x + w] = rng.uniform(90, 255)
    return img


def test_fast_score_map_detects_rectangle_corners():
    img = np.zeros((64, 64), np.float32)
    img[24:40, 24:40] = 200.0
    score = np.asarray(fast_score_map(jnp.asarray(img), thresh=20.0))
    finite = np.isfinite(score)
    ys, xs = np.nonzero(finite)
    assert len(ys) > 0
    # responses concentrate near the 4 corners of the square
    corners = np.array([[24, 24], [24, 39], [39, 24], [39, 39]])
    d = np.min(np.linalg.norm(
        np.stack([ys, xs], 1)[:, None, :] - corners[None, :, ::-1], axis=-1), axis=1)
    assert np.median(d) < 4.0
    # flat regions must NOT fire
    assert not finite[30:34, 30:34].any()
    assert not finite[5:15, 5:15].any()


def test_orb_detect_returns_padded_features():
    rng = np.random.default_rng(0)
    img = _textured_image(rng)
    feats = orb_detect_and_describe(jnp.asarray(img), max_kp=256, n_levels=4)
    assert feats.kpts.shape == (256, 2)
    assert feats.desc.shape == (256, 32) and feats.desc.dtype == jnp.uint8
    n = int(np.asarray(feats.valid).sum())
    assert n > 50
    kp = np.asarray(feats.kpts)[np.asarray(feats.valid)]
    assert kp[:, 0].max() < 320 and kp[:, 1].max() < 240
    # scores sorted descending among valid
    sc = np.asarray(feats.scores)[np.asarray(feats.valid)]
    assert (np.diff(sc) <= 1e-3).all()


def test_orb_translation_matching():
    """Detect on an image and a translated copy; matches should recover the
    translation — the end-to-end front-end contract the VO loop relies on."""
    rng = np.random.default_rng(1)
    img = _textured_image(rng, H=256, W=320)
    dx, dy = 7, 4
    img2 = np.zeros_like(img)
    img2[dy:, dx:] = img[:-dy, :-dx]

    f0 = orb_detect_and_describe(jnp.asarray(img), max_kp=384, n_levels=3)
    f1 = orb_detect_and_describe(jnp.asarray(img2), max_kp=384, n_levels=3)
    m = bf_match(f0, f1)
    v = np.asarray(m.valid)
    assert v.sum() > 40
    kp0 = np.asarray(f0.kpts)[np.asarray(m.idx0)[v]]
    kp1 = np.asarray(f1.kpts)[np.asarray(m.idx1)[v]]
    d = kp1 - kp0
    # median displacement matches (dx, dy) within a pixel
    med = np.median(d, axis=0)
    assert abs(med[0] - dx) < 1.0 and abs(med[1] - dy) < 1.0
    # and the distances of correct matches are small (few flipped bits)
    good = (np.abs(d - [dx, dy]) < 2).all(axis=1)
    assert good.mean() > 0.7


def test_rgb_to_gray():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 2] = 255  # pure red in BGR
    g = np.asarray(rgb_to_gray(jnp.asarray(img)))
    np.testing.assert_allclose(g, 0.299 * 255, atol=0.5)
