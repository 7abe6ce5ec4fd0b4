"""Keyframe policy + thumbnail codec tests (reference: keyframe_utils.py)."""
import numpy as np
import pytest

from simpleslam_tpu.config import SLAMConfig
from simpleslam_tpu.core.keyframe import (
    Keyframe, decode_thumb, is_new_keyframe, keyframe_signals, make_thumb,
    rot_deg_between, select_keyframe,
)
from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.ops import se3
import jax.numpy as jnp


def _feats(kpts, n_pad=16):
    kpts = np.asarray(kpts, np.float32)
    return Features.from_arrays(kpts, np.zeros((len(kpts), 4), np.float32),
                                n_pad=n_pad)


def test_rot_deg_between():
    T0 = np.eye(4)
    R = np.asarray(se3.so3_exp(jnp.array([0.0, np.deg2rad(10.0), 0.0])))
    T1 = np.eye(4); T1[:3, :3] = R
    assert abs(rot_deg_between(T0, T1) - 10.0) < 1e-3


def test_keyframe_signals_median_flow():
    kf = _feats([[0, 0], [10, 0], [20, 0], [30, 0]])
    cur = _feats([[3, 4], [10, 5], [20, 1], [30, 0]])  # disps: 5, 5, 1, 0
    m = Matches.from_arrays([0, 1, 2, 3], [0, 1, 2, 3], m_pad=8)
    n, ratio, med = keyframe_signals(kf, cur, m)
    assert int(n) == 4
    assert abs(float(ratio) - 1.0) < 1e-6
    assert abs(float(med) - 3.0) < 1e-6  # median of [0,1,5,5] = 3


def test_keyframe_signals_empty():
    kf = _feats([[0, 0]])
    cur = _feats([[0, 0]])
    m = Matches.empty(4)
    n, ratio, med = keyframe_signals(kf, cur, m)
    assert int(n) == 0 and float(med) == 0.0


def test_is_new_keyframe_pessimistic_cooldown():
    # age > cooldown ALWAYS promotes, even with a perfect track
    assert is_new_keyframe(10, n_matches=1000, median_flow_px=0.0,
                           n_kf_kpts=1000, rot_deg=0.0,
                           kf_cooldown=5, last_kf_frame_no=0)


def test_is_new_keyframe_triggers():
    kw = dict(kf_cooldown=5, kf_min_inliers=150, kf_min_ratio=0.35,
              kf_max_disp=45, kf_min_rot_deg=8.0, last_kf_frame_no=0)
    # inside cooldown + healthy track -> no
    assert not is_new_keyframe(3, 500, 1.0, 1000, 0.0, **kw)
    # weak track (few inliers)
    assert is_new_keyframe(3, 100, 1.0, 1000, 0.0, **kw)
    # weak ratio
    assert is_new_keyframe(3, 200, 1.0, 1000, 0.0, **kw)  # 200/1000 < .35
    # large flow
    assert is_new_keyframe(3, 500, 50.0, 1000, 0.0, **kw)
    # rotation
    assert is_new_keyframe(3, 500, 1.0, 1000, 9.0, **kw)


def test_thumb_roundtrip():
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((100, 160, 3), np.uint8)
    img[:, :80] = (255, 0, 0)
    blob = make_thumb(img, (64, 36))
    assert isinstance(blob, bytes) and len(blob) > 0
    back = decode_thumb(blob)
    assert back.shape == (36, 64, 3)
    assert back[:, :30, 0].mean() > 200  # blue half survives JPEG


def test_select_keyframe_cooldown_fastpath_and_promotion():
    cfg = SLAMConfig(kf_cooldown=5, kf_min_rot_deg=8.0, kf_min_inliers=2,
                     kf_min_ratio=0.1, kf_max_disp=1000.0, kf_thumb_hw=[32, 18])
    feats0 = _feats([[0, 0], [10, 0], [20, 0]])
    kf0 = Keyframe(0, 0, "", feats0, np.eye(4), b"")
    calls = []

    def match_fn(a, b):
        calls.append(1)
        return Matches.from_arrays([0, 1, 2], [0, 1, 2], m_pad=8)

    # frame 1: inside cooldown, no rotation -> fast path, no match call
    kfs, last = select_keyframe(cfg, 1, None,
                                feats0, np.eye(4), match_fn, [kf0], 0)
    assert len(kfs) == 1 and last == 0 and not calls

    # frame 7 (age 7 > 5): matching runs and promotion happens
    kfs, last = select_keyframe(cfg, 7, None, feats0, np.eye(4),
                                match_fn, [kf0], 0, path="p7")
    assert calls and len(kfs) == 2
    assert kfs[1].frame_idx == 7 and last == 7
    assert kfs[1].path == "p7"


def test_select_keyframe_empty_kfs_noop():
    cfg = SLAMConfig()
    kfs, last = select_keyframe(cfg, 1, None, _feats([[0, 0]]), np.eye(4),
                                lambda a, b: Matches.empty(4), [], -999)
    assert kfs == [] and last == -999
