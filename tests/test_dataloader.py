"""Dataset-layer tests on synthetic on-disk fixtures (no real datasets needed).

Covers the reference contracts: KITTI seq-05 layout + poses, TUM rgb list /
groundtruth nearest-timestamp alignment, Malaga GPS interpolation with the
[-y, z, x] axis remap and in-place sequence trimming
(reference: slam/core/dataloader.py:23-346).
"""
import os
from types import SimpleNamespace

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from simpleslam_tpu.data import (
    load_calibration,
    load_frame_pair,
    load_groundtruth,
    load_sequence,
    load_stereo_paths,
    Sequence,
)


def _write_img(path, val):
    img = np.full((8, 12, 3), val, dtype=np.uint8)
    cv2.imwrite(path, img)


@pytest.fixture
def kitti_dir(tmp_path):
    base = tmp_path
    img0 = base / "kitti" / "05" / "image_0"
    img1 = base / "kitti" / "05" / "image_1"
    poses = base / "kitti" / "poses"
    img0.mkdir(parents=True)
    img1.mkdir(parents=True)
    poses.mkdir(parents=True)
    for i in range(4):
        _write_img(str(img0 / f"{i:06d}.png"), i * 10)
        _write_img(str(img1 / f"{i:06d}.png"), i * 10 + 1)
    # 4 GT poses: identity rotation, translation along +z
    rows = []
    for i in range(4):
        P = np.eye(4)[:3]
        P[2, 3] = float(i)
        rows.append(P.reshape(-1))
    np.savetxt(str(poses / "05.txt"), np.stack(rows))
    return str(base)


def test_kitti_sequence_and_gt(kitti_dir):
    args = SimpleNamespace(dataset="kitti", base_dir=kitti_dir)
    seq = load_sequence(args)
    assert len(seq) == 4 and seq == sorted(seq)
    f0, f1 = load_frame_pair(args, seq, 0)
    assert f0.shape == (8, 12, 3) and f0[0, 0, 0] == 0 and f1[0, 0, 0] == 10
    right = load_stereo_paths(args)
    assert len(right) == 4 and "image_1" in right[0]
    gt = load_groundtruth(args)
    assert gt.shape == (4, 3, 4)
    np.testing.assert_allclose(gt[:, 2, 3], [0, 1, 2, 3])
    calib = load_calibration(args)
    assert calib["K_l"].shape == (3, 3)
    assert abs(calib["K_l"][0, 0] - 707.0912) < 1e-6
    assert calib["P_r"][0, 3] < 0  # right camera baseline offset


def test_kitti_sequence_too_short(tmp_path):
    d = tmp_path / "kitti" / "05" / "image_0"
    d.mkdir(parents=True)
    _write_img(str(d / "000000.png"), 1)
    args = SimpleNamespace(dataset="kitti", base_dir=str(tmp_path))
    with pytest.raises(RuntimeError):
        load_sequence(args)


@pytest.fixture
def tum_dir(tmp_path):
    seq_dir = tmp_path / "tum-rgbd" / "rgbd_dataset_freiburg3_long_office_household"
    rgb = seq_dir / "rgb"
    rgb.mkdir(parents=True)
    stamps = [10.00, 10.05, 10.10]
    with open(seq_dir / "rgb.txt", "w") as f:
        f.write("# comment line\n")
        for t in stamps:
            name = f"rgb/{t:.6f}.png"
            _write_img(str(seq_dir / "rgb" / f"{t:.6f}.png"), 5)
            f.write(f"{t:.6f} {name}\n")
    # GT at slightly offset timestamps; position encodes the stamp
    with open(seq_dir / "groundtruth.txt", "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n")
        for t in [9.99, 10.046, 10.12]:
            f.write(f"{t:.6f} {t:.2f} 0 0 0 0 0 1\n")
    return str(tmp_path)


def test_tum_gt_alignment(tum_dir):
    args = SimpleNamespace(dataset="tum-rgbd", base_dir=tum_dir)
    gt = load_groundtruth(args)
    assert gt.shape == (3, 3, 4)
    # nearest-timestamp picks: 10.00->9.99, 10.05->10.046, 10.10->10.12
    np.testing.assert_allclose(gt[:, 0, 3], [9.99, 10.05, 10.12], atol=1e-6)
    np.testing.assert_allclose(gt[0, :3, :3], np.eye(3), atol=1e-9)
    calib = load_calibration(args)
    assert calib["D_l"] is not None and np.all(calib["D_l"] == 0)


@pytest.fixture
def malaga_dir(tmp_path):
    d = tmp_path / "malaga" / "malaga-urban-dataset-extract-07_rectified_800x600_Images"
    d.mkdir(parents=True)
    # filenames: img_CAMERA1_<ts>_left.jpg
    for ts in [100.0, 100.5, 101.0, 105.0]:   # 105.0 outside GT window
        _write_img(str(d / f"img_CAMERA1_{ts:.6f}_left.jpg"), 7)
        _write_img(str(d / f"img_CAMERA1_{ts:.6f}_right.jpg"), 7)
    gps = tmp_path / "malaga" / "malaga-urban-dataset-extract-07_all-sensors_GPS.txt"
    with open(gps, "w") as f:
        f.write("% header comment\n")
        # Time .. LocalX(9th col) LocalY LocalZ ... (25 columns total)
        for t, x, y, z in [(99.0, 0, 0, 0), (101.0, 2, 4, 6)]:
            row = [t, 0, 0, 0, 0, 0, 0, 0, x, y, z] + [0] * 14
            f.write(" ".join(str(v) for v in row) + "\n")
    return str(tmp_path)


def test_malaga_gt_interpolation(malaga_dir):
    args = SimpleNamespace(dataset="malaga", base_dir=malaga_dir)
    gt = load_groundtruth(args)
    # 105.0 is outside [99, 101] and must be dropped
    assert gt.shape == (3, 3, 4)
    # at ts=100.0 alpha=0.5: Local (1,2,3) -> camera [-y,z,x] = [-2,3,1]
    np.testing.assert_allclose(gt[0, :, 3], [-2, 3, 1], atol=1e-9)
    # at ts=101.0: Local (2,4,6) -> [-4,6,2]
    np.testing.assert_allclose(gt[2, :, 3], [-4, 6, 2], atol=1e-9)


def test_sequence_wrapper(kitti_dir):
    args = SimpleNamespace(dataset="kitti", base_dir=kitti_dir)
    seq = Sequence.load(args)
    assert len(seq) == 4
    assert seq.frame(1)[0, 0, 0] == 10
    assert seq.K.shape == (3, 3)
    assert seq.gt is not None


def test_kitti_calib_txt_honored(kitti_dir):
    """A per-sequence calib.txt (standard KITTI odometry layout) overrides
    the hard-coded seq-05 constants and is NOT rescaled to the frame size —
    it describes the actual frames (focal-preserving crop fixtures)."""
    K = np.array([[707.0912, 0.0, 6.0], [0.0, 707.0912, 4.0], [0, 0, 1.0]])
    P0 = np.hstack([K, np.zeros((3, 1))])
    P1 = P0.copy()
    P1[0, 3] = -386.1448
    with open(os.path.join(kitti_dir, "kitti", "05", "calib.txt"), "w") as f:
        f.write("P0: " + " ".join(f"{v:.12e}" for v in P0.ravel()) + "\n")
        f.write("P1: " + " ".join(f"{v:.12e}" for v in P1.ravel()) + "\n")
    args = SimpleNamespace(dataset="kitti", base_dir=kitti_dir)
    calib = load_calibration(args)
    assert calib["native"] is True
    np.testing.assert_allclose(calib["K_l"], K)
    np.testing.assert_allclose(calib["P_r"][0, 3], -386.1448)
    # Sequence.load must keep it verbatim even though the 8x12 frames are
    # nowhere near KITTI's native 370x1226
    seq = Sequence.load(args)
    np.testing.assert_allclose(seq.K, K)
