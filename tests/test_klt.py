"""Pyramidal Lucas-Kanade tests (replaces cv2.calcOpticalFlowPyrLK)."""
import numpy as np
import jax.numpy as jnp

from simpleslam_tpu.ops.klt import build_pyramid, fb_track, lk_track


def _textured(rng, H=120, W=160):
    img = np.zeros((H, W), np.float32)
    # smooth random texture (sum of sinusoids) so LK has gradients everywhere
    for _ in range(24):
        fx, fy = rng.uniform(0.02, 0.25, 2)
        ph = rng.uniform(0, 6.28)
        yy, xx = np.mgrid[0:H, 0:W]
        img += rng.uniform(5, 25) * np.sin(fx * xx + fy * yy + ph)
    img -= img.min()
    return (img / img.max() * 255).astype(np.float32)


def test_pyramid_shapes():
    img = jnp.zeros((64, 96))
    pyr = build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24), (8, 12)]


def test_lk_translation():
    rng = np.random.default_rng(0)
    img = _textured(rng)
    dx, dy = 6.3, -3.7   # subpixel shift via roll + interpolation
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    from scipy.ndimage import map_coordinates
    img1 = map_coordinates(img, [yy + dy, xx + dx], order=1, mode="nearest")

    pts = np.stack([rng.uniform(30, 130, 40), rng.uniform(30, 90, 40)], 1)
    p1, ok, err = lk_track(jnp.asarray(img), jnp.asarray(img1.astype(np.float32)),
                           jnp.asarray(pts, jnp.float32), iters=15)
    ok = np.asarray(ok)
    assert ok.sum() >= 30
    d = np.asarray(p1)[ok] - pts[ok]
    # true flow is (-dx, -dy) since img1(x) = img(x + d)
    assert np.abs(np.median(d, 0) - [-dx, -dy]).max() < 0.3


def test_fb_track_rejects_occluded():
    rng = np.random.default_rng(1)
    img = _textured(rng)
    img1 = np.roll(img, (0, 5), (0, 1)).astype(np.float32)
    # destroy a region in img1 -> points there can't track back
    img1[40:80, 60:100] = 0.0
    pts = np.array([[30.0, 30.0], [75.0, 60.0]], np.float32)  # 2nd in hole
    p1, good, err = fb_track(jnp.asarray(img), jnp.asarray(img1),
                             jnp.asarray(pts), fb_thresh=1.0, err_thresh=15.0)
    good = np.asarray(good)
    assert good[0]
    assert not good[1]


def test_lk_flat_region_degenerate():
    img = np.full((64, 64), 100.0, np.float32)
    pts = np.array([[32.0, 32.0]], np.float32)
    p1, ok, err = lk_track(jnp.asarray(img), jnp.asarray(img), jnp.asarray(pts))
    assert not bool(ok[0])   # zero-gradient window must be flagged
