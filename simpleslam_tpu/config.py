"""Configuration system: CLI parity with the reference + the YAML config the
reference left as an empty placeholder.

The flag set, names, defaults and choices mirror the reference CLI exactly
(reference: slam/monocular/main_revamped.py:192-256), so launch commands from
``scripts/run_tracker_visualization.sh`` work unchanged. On top of that we add
TPU-specific knobs (static pad sizes, precision, mesh shape) under their own
group — the reference has no equivalent (it has no device model at all).

The reference also shipped empty ``config/monocular.yaml`` / ``config/stereo.yaml``
placeholders (SURVEY.md §5); here YAML round-tripping is implemented:
``SLAMConfig.from_yaml`` / ``save_yaml`` map 1:1 onto the CLI flags.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class SLAMConfig:
    # dataset
    dataset: str = "kitti"                 # kitti | malaga | tum-rgbd | custom
    base_dir: str = "../Dataset"

    # feature / detector settings (reference defaults: main_revamped.py:200-208)
    detector: str = "orb"                  # orb | sift | akaze | aliked
    matcher: str = "bf"                    # bf | flann
    use_lightglue: bool = False
    min_conf: float = 0.7
    max_features: int = 4000

    # runtime
    fps: float = 10.0

    # RANSAC
    ransac_thresh: float = 2.5

    # keyframe policy (reference: keyframe_utils.py:42-96)
    kf_max_disp: float = 45.0
    kf_min_inliers: float = 150.0
    kf_min_ratio: float = 0.35
    kf_min_rot_deg: float = 8.0
    kf_cooldown: int = 5
    kf_thumb_hw: List[int] = field(default_factory=lambda: [640, 360])

    # visualization
    no_viz3d: bool = False
    headless: bool = False

    # triangulation depth gates
    min_depth: float = 0.40
    max_depth: float = 100.0
    mvt_rep_err: float = 2.0

    # PnP / map maintenance
    pnp_min_inliers: int = 30
    proj_radius: float = 10.0
    assoc_wide_factor: float = 2.5  # on PnP failure, retry association with
                                    # proj_radius * this (ORB-SLAM's widened
                                    # search window). Covers the corner-entry
                                    # case where yaw onset is unpredicted by
                                    # the const-vel seed: at 180x410 the
                                    # first corner frame carries ~15-22 px of
                                    # rotation flow vs the 10 px window
                                    # (measured: square-loop fixture lost
                                    # 18/130 frames without the retry).
                                    # <= 1 disables.
    merge_radius: float = 0.10

    # local BA
    local_ba_window: int = 10
    local_ba_min_new_points: int = 60
    local_ba_max_points: int = 5000
    local_ba_max_iters: int = 12

    # global BA
    gba_every: int = 100
    gba_max_points: Optional[int] = None
    gba_max_iters: int = 30
    gba_fix_first: int = 1
    # The reference scaffolds the GBA milestone but leaves the body `pass`
    # (main_revamped.py:597-614). Off by default for parity; --gba_enable
    # actually runs the on-device Schur-LM solver over the whole map at the
    # gba_every milestone and as a polish pass after accepted loop closures.
    gba_enable: bool = False
    # Pure localization against a map loaded with --resume: the map is
    # frozen (no keyframes/triangulation/BA/descriptor-ring updates) and the
    # first pose comes from kidnapped-robot global relocalization.
    localize_only: bool = False

    # ---- hard-coded reference constants surfaced as config (SURVEY.md §5) --
    bootstrap_min_posdepth: float = 0.90   # main_revamped.py:358-362
    bootstrap_min_parallax_deg: float = 0.5
    bootstrap_score_ratio_h: float = 0.45
    bootstrap_refresh_min_matches: int = 80   # main_revamped.py:350
    bootstrap_refresh_max_age: int = 30
    pnp_iters: int = 300                   # main_revamped.py:474
    pnp_conf: float = 0.999
    triangulation_parallax_min_deg: float = 2.0  # main_revamped.py:567
    match_max_hamm: int = 64               # main_revamped.py:464
    match_max_l2: float = 0.8              # pnp_utils.py:232
    ba_huber: float = 2.0                  # ba_utils.py:236

    # ---- TPU-native knobs (no reference equivalent) -----------------------
    pad_features: int = 0                  # 0 => round max_features up to 512
    map_capacity: int = 32768              # static landmark-store capacity
    ransac_hypotheses: int = 256           # batched hypotheses per model
    compute_dtype: str = "float32"         # NN compute dtype (bfloat16|float32)
    mesh_devices: int = 0                  # 0 => all available devices
    jit_tracking: bool = True
    seed: int = 0
    fused: bool = False                    # device-resident fused tracking loop
    fused_sync_every: int = 0              # 0 => sync host map only at KF events
    tri_kf2: bool = False                  # triangulate new KFs vs the last TWO
                                           # KFs (2x baseline -> better parallax)
    reloc: bool = True                     # KF 2D-3D relocalization on PnP
                                           # failure (reference future-work)
    fused_ba_points: int = 0               # fused-loop BA window point slice
                                           # (0 => 4096); smaller = faster KFs
    map_evict_age: int = 50                # fused map: evict landmarks unseen
                                           # this many frames when near capacity
    # ---- loop closure + pose-graph optimization (beyond reference: the
    # reference lists both as FUTURE WORK, README.md:317 / main_revamped.py:501)
    loop_closure: bool = False             # enable loop detection + Sim3 PGO
    loop_min_sim: float = 0.70             # pooled-descriptor cosine gate
    loop_gap_kfs: int = 15                 # skip the most recent N keyframes
    loop_min_inliers: int = 25             # Sim3-RANSAC inlier acceptance gate
    loop_ransac_thresh: float = 0.10       # RANSAC threshold as a fraction of
                                           # the median candidate scene depth
                                           # (monocular scale is arbitrary)
    loop_max_scale: float = 16.0           # sanity bound on the measured Sim3
                                           # relative scale: reject if s or
                                           # 1/s exceeds this. Degenerate
                                           # shrink fits are killed by the
                                           # symmetric per-frame RANSAC gate
                                           # (ops/sim3.sim3_ransac_3d3d);
                                           # this bound only guards the
                                           # absurd tail. Measured: a GENUINE
                                           # closure at s=0.089 (11x local
                                           # monocular drift on the square
                                           # fixture) cut ATE 5.16 -> 1.04 m
                                           # — a 4.0 bound wrongly blocked it
    loop_weight: float = 4.0               # loop-edge weight in the pose graph
    loop_grid: int = 4                     # G x G descriptor pooling grid
    loop_topk: int = 2                     # candidates to geometric-verify
    loop_pgo_iters: int = 25               # LM iterations for the pose graph
    loop_min_inlier_frac: float = 0.03     # inlier floor as a FRACTION of the
                                           # current KF's valid keypoints (the
                                           # effective gate is max(min_inliers,
                                           # frac * n_kp)): a fixed count tuned
                                           # on 512-kpt fixtures let a 31-inlier
                                           # aliased fit through at 2048 kpts
                                           # (measured on the 1200-frame square
                                           # soak; genuine revisits there carry
                                           # 400-550 inliers)
    loop_confirm: int = 2                  # odometry-consistent geometric
                                           # verifications (on distinct KFs)
                                           # required before a closure is
                                           # APPLIED. 1 = apply on first verify
                                           # (pre-round-5). Perceptual aliasing
                                           # in repetitive scenes can pass one
                                           # Sim3 RANSAC; an independent fit 1+
                                           # KFs later that implies the SAME
                                           # drift correction almost never does
    loop_confirm_window: int = 12          # pending verification expires after
                                           # the camera advances this many KFs
                                           # without a consistent confirmation
    loop_confirm_strong: float = 0.35      # strong-evidence bypass: a closure
                                           # whose inliers cover >= this
                                           # fraction of the KF's valid
                                           # keypoints applies immediately
                                           # (no 2nd-scan wait). Was 0.15
                                           # until a periodic-texture alias
                                           # measured at exactly 15% coverage
                                           # slipped through on the box-field
                                           # soak; genuine full-scale
                                           # revisits carry 20-27% (those now
                                           # confirm via consistency), unit
                                           # fixtures 60%+ (still bypass)
    fused_rescue_after: int = 24           # fused loop-closure mode: after
                                           # this many consecutive lost
                                           # frames, the periodic sync runs
                                           # HOST-side global reloc over ALL
                                           # keyframes + the archive and
                                           # pushes pose + re-injected
                                           # landmarks to the device (the
                                           # on-device greloc only sees the
                                           # Kw-slot KF ring). 0 disables
    loop_drift_frac_max: float = 0.6       # plausible-drift gate: reject a
                                           # verified closure whose implied
                                           # odometry correction |E_t|
                                           # exceeds this fraction of the
                                           # estimated cand->cur arc length.
                                           # STABLE periodic aliasing passes
                                           # RANSAC *and* two-scan
                                           # consistency (consecutive KFs
                                           # alias identically) but claims
                                           # ~100% drift over a well-tracked
                                           # path; genuine closures measure
                                           # 8-26% (core/loop.py
                                           # _implied_drift). 0 disables
    # ---- global relocalization (kidnapped robot; beyond reference) --------
    global_reloc: bool = True              # after sustained loss, PnP against
                                           # place-recognition candidates over
                                           # ALL keyframes (not just the last)
    global_reloc_after: int = 3            # consecutive lost frames before the
                                           # global search kicks in
    global_reloc_topk: int = 3             # place candidates to PnP-verify
    global_reloc_min_sim: float = 0.30     # place-vector cosine gate (looser
                                           # than loop_min_sim: a wrong reloc
                                           # candidate just fails PnP, it
                                           # never rewrites the map)
    trace_dir: str = ""                    # jax profiler trace output dir
    prefetch: int = 1                      # threaded frame prefetch depth (0=off)
    stage_all: bool = False                # fused mode: pre-decode + upload
                                           # EVERY frame to device memory
                                           # before the timed loop (soak
                                           # benchmarking: measures the SLAM
                                           # system, not host PNG decode)
    save_state: str = ""                   # serialize pipeline state here at end/SIGINT
    resume: str = ""                       # resume pipeline state from this file
    viz_ba: bool = False                   # show before/after-BA reprojection overlays

    # ------------------------------------------------------------------ api
    @property
    def n_kp(self) -> int:
        """Static keypoint pad size (multiple of 128 for TPU lane tiling)."""
        if self.pad_features:
            return self.pad_features
        return ((self.max_features + 127) // 128) * 128

    def replace(self, **kw: Any) -> "SLAMConfig":
        return dataclasses.replace(self, **kw)

    # ---- YAML --------------------------------------------------------------
    @classmethod
    def from_yaml(cls, path: str) -> "SLAMConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        return cls(**raw)

    def save_yaml(self, path: str) -> None:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=False)

    # ---- argparse bridging ---------------------------------------------------
    @classmethod
    def from_args(cls, args: argparse.Namespace) -> "SLAMConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in vars(args).items() if k in known and v is not None}
        cfg = cls(**kw)
        if getattr(args, "config", None):
            base = cls.from_yaml(args.config)
            # CLI flags explicitly set override YAML.
            cli_set = {
                k: v for k, v in kw.items()
                if getattr(args, "_explicit", None) is None or k in args._explicit
            }
            cfg = dataclasses.replace(base, **cli_set)
        return cfg


def build_parser() -> argparse.ArgumentParser:
    """Reference-parity CLI (flag-for-flag with main_revamped.py:192-256)."""
    p = argparse.ArgumentParser("Feature tracking with key-frames (TPU-native)")
    d = SLAMConfig()

    p.add_argument("--config", default=None, help="YAML config file (new)")
    p.add_argument("--dataset", choices=["kitti", "malaga", "tum-rgbd", "custom"],
                   required=False, default=d.dataset)
    p.add_argument("--base_dir", default=d.base_dir)

    p.add_argument("--detector", choices=["orb", "sift", "akaze", "aliked"],
                   default=d.detector)
    p.add_argument("--matcher", choices=["bf", "flann"], default=d.matcher)
    p.add_argument("--use_lightglue", action="store_true")
    p.add_argument("--min_conf", type=float, default=d.min_conf,
                   help="Minimum LightGlue confidence for a match")
    p.add_argument("--max_features", type=int, default=d.max_features,
                   help="Max features/keypoints for classical detectors and ALIKED")
    p.add_argument("--fps", type=float, default=d.fps)
    p.add_argument("--ransac_thresh", type=float, default=d.ransac_thresh)

    p.add_argument("--kf_max_disp", type=float, default=d.kf_max_disp)
    p.add_argument("--kf_min_inliers", type=float, default=d.kf_min_inliers)
    p.add_argument("--kf_min_ratio", type=float, default=d.kf_min_ratio,
                   help="Min inlier ratio (to prev KF kps) before promoting KF")
    p.add_argument("--kf_min_rot_deg", type=float, default=d.kf_min_rot_deg,
                   help="Min rotation (deg) wrt prev KF to trigger KF")
    p.add_argument("--kf_cooldown", type=int, default=d.kf_cooldown)
    p.add_argument("--kf_thumb_hw", type=int, nargs=2, default=list(d.kf_thumb_hw))

    p.add_argument("--no_viz3d", action="store_true",
                   help="Disable 3-D visualization window")
    p.add_argument("--headless", action="store_true",
                   help="Disable ALL visualization during the run; save trajectory graph at the end")

    p.add_argument("--min_depth", type=float, default=d.min_depth)
    p.add_argument("--max_depth", type=float, default=d.max_depth)
    p.add_argument("--mvt_rep_err", type=float, default=d.mvt_rep_err,
                   help="Max mean reprojection error (px) for multi-view triangulation")

    p.add_argument("--pnp_min_inliers", type=int, default=d.pnp_min_inliers)
    p.add_argument("--proj_radius", type=float, default=d.proj_radius)
    p.add_argument("--assoc_wide_factor", type=float,
                   default=d.assoc_wide_factor,
                   help="widened-window association retry factor on PnP "
                        "failure (<=1 disables)")
    p.add_argument("--merge_radius", type=float, default=d.merge_radius)

    p.add_argument("--local_ba_window", type=int, default=d.local_ba_window,
                   help="Window size (number of keyframes) for local BA")
    p.add_argument("--local_ba_min_new_points", type=int, default=d.local_ba_min_new_points,
                   help="Only run local BA when at least this many new landmarks were triangulated")
    p.add_argument("--local_ba_max_points", type=int, default=d.local_ba_max_points,
                   help="Cap landmarks included in local BA for runtime")
    p.add_argument("--local_ba_max_iters", type=int, default=d.local_ba_max_iters,
                   help="Maximum LM iterations for local BA")

    p.add_argument("--gba_every", type=int, default=d.gba_every,
                   help="Run global BA every N frames")
    p.add_argument("--gba_max_points", type=int, default=d.gba_max_points,
                   help="Cap points in GBA (None = all)")
    p.add_argument("--gba_max_iters", type=int, default=d.gba_max_iters,
                   help="LM iterations for GBA")
    p.add_argument("--gba_fix_first", type=int, default=d.gba_fix_first,
                   help="1=fix first KF to anchor gauge, 0=free")
    p.add_argument("--gba_enable", action="store_true",
                   help="Actually run global BA at the gba_every milestone "
                        "and after accepted loop closures (the reference "
                        "scaffolds this but leaves the body disabled, "
                        "main_revamped.py:597-614)")

    # --- TPU-native extensions ---
    g = p.add_argument_group("tpu")
    g.add_argument("--pad_features", type=int, default=d.pad_features)
    g.add_argument("--map_capacity", type=int, default=d.map_capacity)
    g.add_argument("--ransac_hypotheses", type=int, default=d.ransac_hypotheses)
    g.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                   default=d.compute_dtype)
    g.add_argument("--mesh_devices", type=int, default=d.mesh_devices)
    g.add_argument("--seed", type=int, default=d.seed)
    g.add_argument("--fused", action="store_true",
                   help="Run the device-resident fused tracking loop "
                        "(one jitted program per frame, host reads scalars "
                        "only at keyframe syncs)")
    g.add_argument("--fused_sync_every", type=int, default=d.fused_sync_every,
                   help="Force a host sync every N frames in --fused mode "
                        "(0 = only at keyframe events)")
    g.add_argument("--no_reloc", dest="reloc", action="store_false",
                   help="Disable keyframe 2D-3D relocalization on PnP "
                        "failure (the reference's unimplemented "
                        "'trigger relocalization here' hook)")
    g.add_argument("--map_evict_age", type=int, default=d.map_evict_age,
                   help="Fused map eviction: when the store nears capacity, "
                        "drop landmarks unseen for this many frames")
    g.add_argument("--fused_ba_points", type=int, default=d.fused_ba_points,
                   help="Static point-slice size of the fused-loop local BA "
                        "(0 = 4096); the BA assembly cost is linear in it")
    g.add_argument("--tri_kf2", action="store_true",
                   help="Triangulate each new keyframe against the last TWO "
                        "keyframes (doubled baseline doubles the parallax-"
                        "gate pass rate under forward motion; new points "
                        "deduped per current-frame keypoint)")
    g.add_argument("--loop_closure", action="store_true",
                   help="Enable loop closure: pooled-descriptor place "
                        "recognition + Sim3 RANSAC verification + Sim(3) "
                        "pose-graph optimization (reference future work)")
    g.add_argument("--loop_min_sim", type=float, default=d.loop_min_sim)
    g.add_argument("--loop_gap_kfs", type=int, default=d.loop_gap_kfs)
    g.add_argument("--loop_min_inliers", type=int, default=d.loop_min_inliers)
    g.add_argument("--loop_ransac_thresh", type=float,
                   default=d.loop_ransac_thresh)
    g.add_argument("--loop_max_scale", type=float, default=d.loop_max_scale)
    g.add_argument("--loop_weight", type=float, default=d.loop_weight)
    g.add_argument("--loop_grid", type=int, default=d.loop_grid)
    g.add_argument("--loop_topk", type=int, default=d.loop_topk)
    g.add_argument("--loop_pgo_iters", type=int, default=d.loop_pgo_iters)
    g.add_argument("--loop_min_inlier_frac", type=float,
                   default=d.loop_min_inlier_frac)
    g.add_argument("--loop_confirm", type=int, default=d.loop_confirm)
    g.add_argument("--loop_confirm_window", type=int,
                   default=d.loop_confirm_window)
    g.add_argument("--loop_confirm_strong", type=float,
                   default=d.loop_confirm_strong)
    g.add_argument("--loop_drift_frac_max", type=float,
                   default=d.loop_drift_frac_max)
    g.add_argument("--fused_rescue_after", type=int,
                   default=d.fused_rescue_after)
    g.add_argument("--no_global_reloc", dest="global_reloc",
                   action="store_false",
                   help="Disable kidnapped-robot recovery (place-recognition "
                        "PnP over ALL keyframes after sustained loss)")
    g.add_argument("--global_reloc_after", type=int,
                   default=d.global_reloc_after,
                   help="Consecutive lost frames before the global "
                        "place-recognition relocalization kicks in")
    g.add_argument("--global_reloc_topk", type=int,
                   default=d.global_reloc_topk)
    g.add_argument("--global_reloc_min_sim", type=float,
                   default=d.global_reloc_min_sim)
    g.add_argument("--localize_only", action="store_true",
                   help="Pure localization against the map loaded with "
                        "--resume: the map is frozen (no new keyframes, "
                        "triangulation, BA, loop closure or descriptor-ring "
                        "updates); the first pose comes from kidnapped-robot "
                        "global relocalization, then PnP tracking")
    g.add_argument("--trace_dir", default=d.trace_dir,
                   help="Write a jax profiler trace here (open with xprof)")
    g.add_argument("--prefetch", type=int, default=d.prefetch,
                   help="Threaded frame prefetch depth (0 = synchronous)")
    g.add_argument("--stage_all", action="store_true",
                   help="Fused mode: pre-decode + upload every frame to "
                        "device memory before the timed loop (soak "
                        "benchmarking; ~0.5 MB HBM per grayscale KITTI "
                        "frame)")
    g.add_argument("--save_state", default=d.save_state,
                   help="Serialize pipeline state to this file at end of run "
                        "(and on SIGINT)")
    g.add_argument("--resume", default=d.resume,
                   help="Resume pipeline state from a --save_state file")
    g.add_argument("--viz_ba", action="store_true",
                   help="Show before/after-BA reprojection overlay windows")
    g.add_argument("--match_max_hamm", type=float, default=d.match_max_hamm,
                   help="2D-3D association gate for binary descriptors "
                        "(reference constant, main_revamped.py:464)")
    g.add_argument("--match_max_l2", type=float, default=d.match_max_l2,
                   help="2D-3D association gate for float descriptors "
                        "(reference constant, pnp_utils.py:232)")
    return p


def parse_config(argv: Optional[List[str]] = None) -> SLAMConfig:
    args = build_parser().parse_args(argv)
    return SLAMConfig.from_args(args)
