import os

from simpleslam_tpu.config import SLAMConfig, build_parser, parse_config


def test_defaults_match_reference():
    # Reference defaults (main_revamped.py:192-256 / SURVEY.md §5)
    c = SLAMConfig()
    assert c.detector == "orb" and c.matcher == "bf"
    assert c.max_features == 4000 and c.min_conf == 0.7
    assert c.ransac_thresh == 2.5
    assert c.kf_max_disp == 45 and c.kf_min_inliers == 150
    assert c.kf_min_ratio == 0.35 and c.kf_min_rot_deg == 8.0
    assert c.kf_cooldown == 5 and c.kf_thumb_hw == [640, 360]
    assert c.min_depth == 0.40 and c.max_depth == 100.0 and c.mvt_rep_err == 2.0
    assert c.pnp_min_inliers == 30 and c.proj_radius == 10.0 and c.merge_radius == 0.10
    assert c.local_ba_window == 10 and c.local_ba_min_new_points == 60
    assert c.local_ba_max_points == 5000 and c.local_ba_max_iters == 12
    assert c.gba_every == 100 and c.gba_max_iters == 30 and c.gba_fix_first == 1
    # hard-coded reference constants surfaced
    assert c.bootstrap_score_ratio_h == 0.45 and c.bootstrap_min_posdepth == 0.90
    assert c.pnp_iters == 300 and c.pnp_conf == 0.999
    assert c.match_max_hamm == 64 and c.match_max_l2 == 0.8 and c.ba_huber == 2.0


def test_cli_parity_flags():
    p = build_parser()
    args = p.parse_args(
        ["--dataset", "kitti", "--use_lightglue", "--max_features", "1000",
         "--kf_thumb_hw", "320", "180", "--no_viz3d", "--headless"]
    )
    cfg = SLAMConfig.from_args(args)
    assert cfg.dataset == "kitti" and cfg.use_lightglue
    assert cfg.max_features == 1000 and cfg.kf_thumb_hw == [320, 180]
    assert cfg.no_viz3d and cfg.headless


def test_n_kp_padding():
    assert SLAMConfig(max_features=4000).n_kp == 4096
    assert SLAMConfig(max_features=4000, pad_features=2048).n_kp == 2048
    assert SLAMConfig(max_features=128).n_kp == 128


def test_yaml_roundtrip(tmp_path):
    cfg = SLAMConfig(dataset="malaga", max_features=1234, use_lightglue=True)
    path = os.path.join(tmp_path, "cfg.yaml")
    cfg.save_yaml(path)
    cfg2 = SLAMConfig.from_yaml(path)
    assert cfg2 == cfg


def test_parse_config_smoke():
    cfg = parse_config(["--dataset", "tum-rgbd"])
    assert cfg.dataset == "tum-rgbd"
