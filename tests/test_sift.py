"""SIFT-style front-end tests (DoG + gradient-histogram descriptors)."""
import numpy as np
import jax.numpy as jnp

from simpleslam_tpu.ops.features_sift import sift_detect_and_describe
from simpleslam_tpu.ops.matching import bf_match


def _blob_image(rng, H=192, W=256, n=70):
    img = np.full((H, W), 40.0, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(n):
        cy, cx = rng.integers(25, H - 25), rng.integers(25, W - 25)
        s = rng.uniform(2.0, 6.0)
        img += rng.uniform(60, 180) * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                                             / (2 * s * s))
    return np.clip(img, 0, 255)


def test_sift_detects_blobs():
    rng = np.random.default_rng(0)
    img = _blob_image(rng)
    f = sift_detect_and_describe(jnp.asarray(img), max_kp=256, n_octaves=3)
    v = np.asarray(f.valid)
    assert v.sum() > 30
    d = np.asarray(f.desc)[v]
    assert d.shape[1] == 128 and d.dtype == np.float32
    norms = np.linalg.norm(d, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_sift_translation_matching():
    rng = np.random.default_rng(1)
    img = _blob_image(rng)
    dx, dy = 9, 5
    img2 = np.full_like(img, 40.0)
    img2[dy:, dx:] = img[:-dy, :-dx]
    f0 = sift_detect_and_describe(jnp.asarray(img), max_kp=256)
    f1 = sift_detect_and_describe(jnp.asarray(img2), max_kp=256)
    m = bf_match(f0, f1)
    v = np.asarray(m.valid)
    assert v.sum() > 15
    kp0 = np.asarray(f0.kpts)[np.asarray(m.idx0)[v]]
    kp1 = np.asarray(f1.kpts)[np.asarray(m.idx1)[v]]
    med = np.median(kp1 - kp0, axis=0)
    assert abs(med[0] - dx) < 1.5 and abs(med[1] - dy) < 1.5


def test_sift_via_facade():
    from simpleslam_tpu.config import SLAMConfig
    from simpleslam_tpu.core import frontend

    cfg = SLAMConfig(detector="sift", max_features=128)
    det, mat = frontend.init_feature_pipeline(cfg)
    rng = np.random.default_rng(2)
    f = frontend.feature_extractor(cfg, _blob_image(rng).astype(np.uint8), det)
    assert f.desc.shape[1] == 128
    assert int(np.asarray(f.valid).sum()) > 10
