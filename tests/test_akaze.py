"""AKAZE front-end: nonlinear diffusion, detection, description, matching.

VERDICT round-1 item 5: '--detector akaze' must run a real FED
nonlinear-diffusion scale space (NOT a Gaussian pyramid alias) and complete
the synthetic corridor.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from simpleslam_tpu.ops.features_akaze import (akaze_detect_and_describe,
                                               nonlinear_scale_space)
from simpleslam_tpu.ops.features import _sep_conv, _gaussian_kernel
from simpleslam_tpu.ops.matching import bf_match


def _step_image(H=96, W=128):
    """Sharp vertical edge + textured halves: diffusion must preserve the
    edge that a Gaussian of equal scale blurs away."""
    rng = np.random.default_rng(0)
    img = rng.uniform(40, 70, (H, W))
    img[:, W // 2:] += 120.0
    return np.clip(img, 0, 255).astype(np.float32)


def test_diffusion_is_not_gaussian():
    img = jnp.asarray(_step_image())
    levels = nonlinear_scale_space(img, n_octaves=1, n_sublevels=4)
    L_nl, sigma, _ = levels[-1]
    # Gaussian of the same scale
    rad = max(2, int(3 * sigma))
    g = _gaussian_kernel(sigma, rad)
    L_g = _sep_conv(_sep_conv(img / 255.0, g).T, g).T

    H, W = img.shape
    col = W // 2
    # edge contrast across the step, after equal evolution time
    def edge_contrast(L):
        return float(jnp.abs(jnp.mean(L[:, col + 2:col + 5])
                             - jnp.mean(L[:, col - 5:col - 2])))

    c_nl = edge_contrast(L_nl)
    c_g = edge_contrast(L_g)
    assert c_nl > c_g * 1.05, (c_nl, c_g)  # diffusion preserved the edge
    # but smooth regions really did diffuse (not identity)
    patch = np.s_[8:40, 8:40]
    var0 = float(jnp.var(img[patch] / 255.0))
    var_nl = float(jnp.var(L_nl[patch]))
    assert var_nl < 0.8 * var0


def test_akaze_detect_and_match_shifted():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    base = np.asarray(_sep_conv(jnp.asarray(base), _gaussian_kernel(1.2, 3)))
    img0 = base[:, :144]
    img1 = base[:, 8:152]          # 8-px horizontal shift

    f0 = akaze_detect_and_describe(jnp.asarray(img0), max_kp=256)
    f1 = akaze_detect_and_describe(jnp.asarray(img1), max_kp=256)
    assert int(f0.valid.sum()) > 30
    assert f0.desc.shape == (256, 64) and f0.desc.dtype == jnp.uint8

    m = bf_match(f0, f1, cross_check=True)
    v = np.asarray(m.valid)
    assert v.sum() > 20
    d = (np.asarray(f0.kpts)[np.asarray(m.idx0)[v]]
         - np.asarray(f1.kpts)[np.asarray(m.idx1)[v]])
    dx = np.median(d[:, 0])
    dy = np.median(d[:, 1])
    assert abs(dx - 8.0) < 1.5 and abs(dy) < 1.5, (dx, dy)


def test_akaze_via_frontend_facade():
    from simpleslam_tpu.config import SLAMConfig
    from simpleslam_tpu.core import frontend

    cfg = SLAMConfig(detector="akaze", max_features=256)
    det, mat = frontend.init_feature_pipeline(cfg)
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (100, 140, 3)).astype(np.uint8)
    feats = frontend.feature_extractor(cfg, img, det)
    assert feats.desc.shape[1] == 64
    assert int(feats.valid.sum()) > 10
