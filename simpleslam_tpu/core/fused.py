"""Device-resident fused tracking loop: the WHOLE per-frame SLAM step —
extract -> match -> associate -> PnP -> fallback -> keyframe policy ->
triangulation -> local BA — as ONE jitted program over a static-shape state
pytree that never leaves the device.

Why this module exists: the host-orchestrated driver (run_slam.SLAMSystem)
mirrors the reference state machine (slam/monocular/main_revamped.py:321-614)
with host decisions between stages. That is correct but issues many small
dispatches with scalar readbacks per frame; on a dispatch-latency-bound link
(and even locally, for 60+ FPS) the host round-trips dominate. Here the host
only streams camera frames in and reads back a trajectory/flag log at the
end (or at periodic syncs) — the TPU-native formulation of the reference's
sequential loop.

State layout (all fixed shapes, SURVEY.md §7 "functional state" design):
  * map: positions (C,3) / alive (C,) / descriptor rings (C,R,D) / n_desc /
    creation-KF tags, plus a per-point observation table obs_kf (C,O) i32
    (global KF number) + obs_uv (C,O,2) — the live pipeline only ever
    records observations at creation (bootstrap/triangulation, reference
    landmark_utils.py:98-116, triangulation_utils.py:251-258), so O=4 slots
    cover parity exactly.
  * keyframes: a ring of Kw slots (pose + padded Features); slot = kf_no % Kw.
  * trajectory/flags log: (Fcap, 4, 4) poses + per-frame scalars, written by
    frame index, transferred to the host in ONE readback.

Behavior parity is the host driver's (same thresholds, same trigger order,
same fallbacks); divergences are those already documented for the vectorized
ops (ops/pnp.py docstring) plus: (a) keyframes older than the Kw-slot ring
drop out of the local-BA gauge (window_size + margin slots keeps every
optimizable KF and its fixed anchors), (b) new landmarks per keyframe are
capped at a static ``max_new`` (the padded match capacity bounds this
anyway), (c) local BA optimizes the contiguous row-slice of points created
inside the window (exactly the points with an observation in an optimizable
KF — creation is the only place observations are recorded), (d) the local
BA window fixes only cameras OLDER than the window (reference semantics,
ba_utils.py:250-257), which leaves the monocular scale as a gauge freedom —
host and fused runs land on slightly different points of that gauge orbit
at each keyframe even with identical RNG (tests/test_fused.py bounds the
effect; pre-keyframe tracking agrees to float noise), (e) global
relocalization verifies only the argmax place candidate over the Kw-slot
ring (the host searches top-``global_reloc_topk`` over ALL keyframes) —
one static-shape matcher+PnP under the cond keeps the lost-frame branch
bounded.

RNG: every random draw uses frame_key(base, frame_no, SITE) — identical to
the host driver's derivation — so RANSAC outcomes match between modes.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from simpleslam_tpu.core.types import Features, Matches
from simpleslam_tpu.ops import epipolar, pnp, se3
from simpleslam_tpu.ops.ba import BAProblem, ba_solve

logger = logging.getLogger("fused")
from simpleslam_tpu.ops.triangulation import (projection_matrix,
                                              triangulate_two_view,
                                              two_view_gates)

_INF = jnp.float32(1e9)

# RNG sites shared by the host driver (run_slam.SLAMSystem) and the fused
# loop: both derive the key for a given (frame, decision site) as
# fold_in(fold_in(base_seed, frame_no), site), so the two modes consume
# IDENTICAL randomness at equivalent RANSAC/matching sites regardless of
# which branches run — the precondition for sharp fused-vs-host parity
# (tests/test_fused.py) and for reproducible runs in general.
SITE_PNP, SITE_PREV_MATCH, SITE_ESS, SITE_RELOC = 0, 1, 2, 3
SITE_KF_MATCH, SITE_KF_MATCH2 = 4, 5
SITE_LOOP = 6
SITE_GRELOC = 7


def frame_key(base: jax.Array, frame_no, site: int) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(base, frame_no), site)


@struct.dataclass
class FusedState:
    """Everything the per-frame program reads/writes, resident on device."""
    # current / previous camera pose (T_cw)
    Tcw: jax.Array            # (4,4) f32
    Tcw_prev: jax.Array       # (4,4) f32
    # previous frame features (for prev<->cur matching)
    prev_kpts: jax.Array      # (N,2)
    prev_desc: jax.Array      # (N,D)
    prev_valid: jax.Array     # (N,)
    # keyframe ring (slot = kf_no % Kw)
    kf_pose: jax.Array        # (Kw,4,4)
    kf_kpts: jax.Array        # (Kw,N,2)
    kf_desc: jax.Array        # (Kw,N,D)
    kf_valid: jax.Array       # (Kw,N)
    kf_frame_no: jax.Array    # (Kw,) i32 source frame number
    kf_first_row: jax.Array   # (Kw,) i32 first map row created AT this KF
    kf_lm_row: jax.Array      # (Kw,N) i32 landmark row observed by each KF
                              # keypoint (-1 = none) — relocalization index
    kf_place: jax.Array       # (Kw,P) f32 pooled-descriptor place vector per
                              # ring slot — global-reloc candidate index
    kf_count: jax.Array       # () i32 number of keyframes so far
    last_kf_frame_no: jax.Array  # () i32
    lost_streak: jax.Array    # () i32 consecutive untracked frames (global-
                              # reloc trigger)
    # map
    positions: jax.Array      # (C,3) f32
    alive: jax.Array          # (C,) bool
    desc_ring: jax.Array      # (C,R,D)
    n_desc: jax.Array         # (C,) i32
    obs_kf: jax.Array         # (C,O) i32 global KF number, -1 = empty
    obs_kp: jax.Array         # (C,O) i32 keypoint index inside that KF
    obs_uv: jax.Array         # (C,O,2) f32
    obs_n: jax.Array          # (C,) i32
    pid: jax.Array            # (C,) i32 stable landmark id (host map id) —
                              # survives compaction; sync reconciles by it
    n_created: jax.Array      # () i32 next pid to assign
    last_seen: jax.Array      # (C,) i32 frame last observed (creation or
                              # PnP-inlier association) — eviction signal
    compactions: jax.Array    # () i32 eviction passes run so far
    n_points: jax.Array       # () i32
    ba_floor_kf: jax.Array    # () i32 first KF number whose geometry is
                              # wholly POST the last host map rewrite (loop
                              # closure). Local BA is suppressed while its
                              # window still touches pre-rewrite keyframes:
                              # the Sim3 PGO's per-node scale gradient makes
                              # their reprojection constraints mutually
                              # inconsistent, and a window BA against them
                              # drags the fresh pose off (measured: tracking
                              # decayed in waves after each KF burst and
                              # died ~25 frames post-closure on the square
                              # soak)
    # frame counter + rng
    frame_no: jax.Array       # () i32 (next frame number to process)
    key: jax.Array            # PRNG key
    # logs (one big readback at sync time)
    log_pose: jax.Array       # (Fcap,4,4) f32
    log_flags: jax.Array      # (Fcap,7) f32: [tracked, kf, n_inl, n_new,
                              #                n_cand, ba_ran, considered]
    log_frame: jax.Array      # (Fcap,) i32 frame number (-1 = unused row)
    log_n: jax.Array          # () i32 rows written


class FusedConfig(NamedTuple):
    """Static compile-time configuration of the fused step."""
    img_w: int
    img_h: int
    n_kp: int
    desc_dim: int
    kf_ring: int          # Kw
    obs_slots: int        # O
    map_capacity: int     # C
    max_new: int          # per-KF new-landmark cap (static)
    tri_kf2: bool         # also triangulate vs the second-to-last KF
    reloc: bool           # keyframe 2D-3D relocalization on PnP failure
    global_reloc: bool    # kidnapped-robot recovery over the whole KF ring
    greloc_after: int     # consecutive lost frames before it kicks in
    greloc_min_sim: float  # place-vector cosine gate
    place_grid: int       # G x G descriptor pooling grid (config.loop_grid)
    ba_points: int        # L_ba window slice
    log_capacity: int     # Fcap
    # thresholds (baked into the jitted program)
    ransac_thresh: float
    ransac_hypotheses: int
    pnp_min_inliers: int
    proj_radius: float
    assoc_wide_factor: float   # widened-window assoc retry on PnP failure
                               # (<= 1 disables; see config.assoc_wide_factor)
    max_hamm: float
    max_l2: float
    kf_cooldown: int
    kf_min_inliers: float
    kf_min_ratio: float
    kf_max_disp: float
    kf_min_rot_deg: float
    min_depth: float
    max_depth: float
    tri_parallax_min_deg: float
    tri_rep_err: float
    local_ba_window: int
    local_ba_min_new_points: int
    local_ba_max_iters: int
    ba_huber: float
    evict_age: int        # landmarks unseen this many frames are evictable


def make_fused_config(cfg, img_hw: Tuple[int, int], n_kp: int,
                      desc_dim: int, log_capacity: int = 8192) -> FusedConfig:
    """Build the static config from a SLAMConfig (thresholds per SURVEY §5)."""
    H, W = int(img_hw[0]), int(img_hw[1])
    return FusedConfig(
        img_w=W, img_h=H, n_kp=int(n_kp), desc_dim=int(desc_dim),
        kf_ring=max(16, int(cfg.local_ba_window) + 6),
        obs_slots=4,
        map_capacity=int(cfg.map_capacity),
        max_new=min(1024, int(n_kp)),
        tri_kf2=bool(getattr(cfg, "tri_kf2", False)),
        reloc=bool(getattr(cfg, "reloc", True)),
        global_reloc=bool(getattr(cfg, "global_reloc", True)),
        greloc_after=int(getattr(cfg, "global_reloc_after", 3)),
        greloc_min_sim=float(getattr(cfg, "global_reloc_min_sim", 0.30)),
        place_grid=int(getattr(cfg, "loop_grid", 4)),
        ba_points=min(int(getattr(cfg, "fused_ba_points", 0) or 4096),
                      int(cfg.map_capacity)),
        log_capacity=int(log_capacity),
        ransac_thresh=float(cfg.ransac_thresh),
        ransac_hypotheses=int(cfg.ransac_hypotheses),
        pnp_min_inliers=int(cfg.pnp_min_inliers),
        proj_radius=float(cfg.proj_radius),
        assoc_wide_factor=float(getattr(cfg, "assoc_wide_factor", 0.0)),
        max_hamm=float(cfg.match_max_hamm),
        max_l2=float(cfg.match_max_l2),
        kf_cooldown=int(cfg.kf_cooldown),
        kf_min_inliers=float(cfg.kf_min_inliers),
        kf_min_ratio=float(cfg.kf_min_ratio),
        kf_max_disp=float(cfg.kf_max_disp),
        kf_min_rot_deg=float(cfg.kf_min_rot_deg),
        min_depth=float(cfg.min_depth),
        max_depth=float(cfg.max_depth),
        tri_parallax_min_deg=float(cfg.triangulation_parallax_min_deg),
        tri_rep_err=float(getattr(cfg, "mvt_rep_err", cfg.ransac_thresh)),
        local_ba_window=int(cfg.local_ba_window),
        local_ba_min_new_points=int(cfg.local_ba_min_new_points),
        local_ba_max_iters=int(cfg.local_ba_max_iters),
        ba_huber=float(cfg.ba_huber),
        evict_age=int(getattr(cfg, "map_evict_age", 50)),
    )


# --------------------------------------------------------------------------- #
# Host <-> device state conversion
# --------------------------------------------------------------------------- #

def state_from_host(system, fc: FusedConfig, prev_feats) -> FusedState:
    """Build the device state from a bootstrapped host SLAMSystem
    (run_slam.SLAMSystem after ``initialised`` went True). ``prev_feats``
    are the features of the last processed frame (the matching anchor)."""
    wm = system.world_map
    kfs = system.kfs
    N, D = fc.n_kp, fc.desc_dim
    C, Kw, O = fc.map_capacity, fc.kf_ring, fc.obs_slots

    desc0 = np.asarray(kfs[-1].feats.desc)
    desc_dtype = desc0.dtype
    snap = wm.snapshot(C, D, desc_dtype)

    # observation table from the host map (pid order == row order)
    obs_kf = np.full((C, O), -1, np.int32)
    obs_kp = np.full((C, O), -1, np.int32)
    obs_uv = np.zeros((C, O, 2), np.float32)
    obs_n = np.zeros((C,), np.int32)
    created = np.full((C,), -1, np.int32)
    for row, pid in enumerate(wm.points.keys()):
        obs = wm.points[pid].observations
        for o, (kf_idx, kp_idx, _d) in enumerate(obs[:O]):
            if kf_idx >= len(kfs):
                continue
            kps = np.asarray(kfs[kf_idx].feats.kpts)
            if kp_idx >= len(kps):
                continue          # placeholder KF (aged out of the ring)
            obs_kf[row, o] = kf_idx
            obs_kp[row, o] = kp_idx
            obs_uv[row, o] = kps[kp_idx]
        obs_n[row] = min(len(obs), O)
        created[row] = wm.points[pid].keyframe_idx

    # keyframe ring
    kf_pose = np.tile(np.eye(4, dtype=np.float32), (Kw, 1, 1))
    kf_kpts = np.zeros((Kw, N, 2), np.float32)
    kf_desc = np.zeros((Kw, N, D), desc_dtype)
    kf_valid = np.zeros((Kw, N), bool)
    kf_frame_no = np.full((Kw,), -1, np.int32)
    kf_first_row = np.zeros((Kw,), np.int32)
    kf_lm_row = np.full((Kw, N), -1, np.int32)
    # place-vector dim: binary descriptors pool as unpacked bits
    Dp = D * 8 if np.issubdtype(desc_dtype, np.unsignedinteger) else D
    P = fc.place_grid * fc.place_grid * Dp
    kf_place = np.zeros((Kw, P), np.float32)
    img_hw = (fc.img_h, fc.img_w)
    from simpleslam_tpu.core.loop import place_vector
    for kf in kfs[-Kw:]:
        s = kf.idx % Kw
        kf_pose[s] = np.asarray(kf.pose, np.float32)
        kf_kpts[s] = np.asarray(kf.feats.kpts, np.float32)[:N]
        kf_desc[s] = np.asarray(kf.feats.desc)[:N]
        kf_valid[s] = np.asarray(kf.feats.valid)[:N]
        kf_frame_no[s] = kf.frame_idx
        rows = np.flatnonzero(created == kf.idx)
        kf_first_row[s] = int(rows.min()) if rows.size else len(wm)
        kf_place[s] = place_vector(kf.feats, img_hw, fc.place_grid)
    # keypoint -> landmark-row index per live KF (from the observation table)
    for row, pid in enumerate(wm.points.keys()):
        for (kf_idx, kp_idx, _d) in wm.points[pid].observations[:O]:
            if kf_idx >= max(0, len(kfs) - Kw) and kf_idx < len(kfs) \
                    and kp_idx < N:
                kf_lm_row[kf_idx % Kw, kp_idx] = row

    poses = wm.poses
    Tcw = np.asarray(poses[-1], np.float32)
    Tcw_prev = np.asarray(poses[-2] if len(poses) >= 2 else poses[-1],
                          np.float32)

    pf = prev_feats
    return FusedState(
        Tcw=jnp.asarray(Tcw), Tcw_prev=jnp.asarray(Tcw_prev),
        prev_kpts=jnp.asarray(np.asarray(pf.kpts, np.float32)[:N]),
        prev_desc=jnp.asarray(np.asarray(pf.desc)[:N]),
        prev_valid=jnp.asarray(np.asarray(pf.valid)[:N]),
        kf_pose=jnp.asarray(kf_pose), kf_kpts=jnp.asarray(kf_kpts),
        kf_desc=jnp.asarray(kf_desc), kf_valid=jnp.asarray(kf_valid),
        kf_frame_no=jnp.asarray(kf_frame_no),
        kf_first_row=jnp.asarray(kf_first_row),
        kf_lm_row=jnp.asarray(kf_lm_row),
        kf_place=jnp.asarray(kf_place),
        kf_count=jnp.int32(len(kfs)),
        last_kf_frame_no=jnp.int32(system.last_kf_frame_no),
        lost_streak=jnp.int32(getattr(system, "_lost_streak", 0)),
        positions=jnp.asarray(snap["positions"]),
        alive=jnp.asarray(snap["alive"]),
        desc_ring=jnp.asarray(snap["desc"]),
        n_desc=jnp.asarray(snap["n_desc"]),
        obs_kf=jnp.asarray(obs_kf), obs_kp=jnp.asarray(obs_kp),
        obs_uv=jnp.asarray(obs_uv), obs_n=jnp.asarray(obs_n),
        pid=jnp.asarray(snap["pid"]),
        n_created=jnp.int32(wm._next_pid),
        last_seen=jnp.where(jnp.asarray(snap["alive"]),
                            jnp.int32(system.frame_ids[-1]), -1),
        compactions=jnp.int32(0),
        n_points=jnp.int32(len(wm)),
        ba_floor_kf=jnp.int32(0),
        frame_no=jnp.int32(system.frame_ids[-1] + 1),
        # site-keyed RNG: fold_in(base, frame, site). COPY the host's base
        # key: step() donates its input state, so handing over the host
        # array itself would delete system._base_key's buffer after the
        # first dispatch (the host still derives loop-closure/viz keys
        # from it mid-run)
        key=jnp.array(system._base_key, copy=True),
        log_pose=jnp.zeros((fc.log_capacity, 4, 4), jnp.float32),
        log_flags=jnp.zeros((fc.log_capacity, 7), jnp.float32),
        log_frame=jnp.full((fc.log_capacity,), -1, jnp.int32),
        log_n=jnp.int32(0),
    )


def abstract_state(fc: FusedConfig, desc_dtype=jnp.float32) -> FusedState:
    """Zeros state with the step's exact shapes/dtypes — enough to LOWER the
    fused program without a bootstrapped system (bench.py's executed-MFU
    accounting lowers branch-forced step programs on the CPU backend for
    cost analysis; nothing is ever executed on this state)."""
    from simpleslam_tpu.core.map import MAX_OBS_DESC

    N, D = fc.n_kp, fc.desc_dim
    C, Kw, O, R = fc.map_capacity, fc.kf_ring, fc.obs_slots, MAX_OBS_DESC
    Dp = D * 8 if jnp.issubdtype(jnp.dtype(desc_dtype), jnp.unsignedinteger) \
        else D
    P = fc.place_grid * fc.place_grid * Dp
    eye = jnp.eye(4, dtype=jnp.float32)
    return FusedState(
        Tcw=eye, Tcw_prev=eye,
        prev_kpts=jnp.zeros((N, 2), jnp.float32),
        prev_desc=jnp.zeros((N, D), desc_dtype),
        prev_valid=jnp.zeros((N,), bool),
        kf_pose=jnp.tile(eye, (Kw, 1, 1)),
        kf_kpts=jnp.zeros((Kw, N, 2), jnp.float32),
        kf_desc=jnp.zeros((Kw, N, D), desc_dtype),
        kf_valid=jnp.zeros((Kw, N), bool),
        kf_frame_no=jnp.full((Kw,), -1, jnp.int32),
        kf_first_row=jnp.zeros((Kw,), jnp.int32),
        kf_lm_row=jnp.full((Kw, N), -1, jnp.int32),
        kf_place=jnp.zeros((Kw, P), jnp.float32),
        kf_count=jnp.int32(0), last_kf_frame_no=jnp.int32(0),
        lost_streak=jnp.int32(0),
        positions=jnp.zeros((C, 3), jnp.float32),
        alive=jnp.zeros((C,), bool),
        desc_ring=jnp.zeros((C, R, D), desc_dtype),
        n_desc=jnp.zeros((C,), jnp.int32),
        obs_kf=jnp.full((C, O), -1, jnp.int32),
        obs_kp=jnp.full((C, O), -1, jnp.int32),
        obs_uv=jnp.zeros((C, O, 2), jnp.float32),
        obs_n=jnp.zeros((C,), jnp.int32),
        pid=jnp.full((C,), -1, jnp.int32),
        n_created=jnp.int32(0),
        last_seen=jnp.full((C,), -1, jnp.int32),
        compactions=jnp.int32(0), n_points=jnp.int32(0),
        ba_floor_kf=jnp.int32(0),
        frame_no=jnp.int32(0), key=jax.random.PRNGKey(0),
        log_pose=jnp.zeros((fc.log_capacity, 4, 4), jnp.float32),
        log_flags=jnp.zeros((fc.log_capacity, 7), jnp.float32),
        log_frame=jnp.full((fc.log_capacity,), -1, jnp.int32),
        log_n=jnp.int32(0),
    )


def sync_to_host(system, state: FusedState, fc: FusedConfig,
                 from_row: int = 0) -> dict:
    """One big device->host readback: trajectory log + map + KF poses.

    Landmarks reconcile BY STABLE ID (``state.pid``): survivors update in
    place keeping their colours/observations, device-evicted points are
    popped, and newly created points arrive with their creation observation
    pairs (KF number, keypoint index, descriptor from ring slots 0/1) — so
    host-side ``--save_state``/resume, ``--viz_ba`` and the MapPoint view
    stay faithful across any number of on-device compactions (round-2
    verdict item 6; the old path rebuilt positions-only after eviction).

    ``from_row``: first trajectory-log row not yet consumed — periodic mid-run
    syncs (loop-closure mode) pass the previous call's ``log_n`` so poses
    append exactly once; the map/KF reconciliation is idempotent either way.
    """
    host = jax.device_get({
        "log_pose": state.log_pose, "log_flags": state.log_flags,
        "log_frame": state.log_frame, "log_n": state.log_n,
        "positions": state.positions, "alive": state.alive,
        "n_points": state.n_points, "compactions": state.compactions,
        "pid": state.pid, "obs_kf": state.obs_kf, "obs_kp": state.obs_kp,
        "desc01": state.desc_ring[:, :2],
        "kf_pose": state.kf_pose, "kf_frame_no": state.kf_frame_no,
        "kf_kpts": state.kf_kpts, "kf_desc": state.kf_desc,
        "kf_valid": state.kf_valid, "kf_lm_row": state.kf_lm_row,
        "kf_count": state.kf_count,
        "last_kf_frame_no": state.last_kf_frame_no,
    })
    n_log = int(host["log_n"])
    wm = system.world_map
    for i in range(from_row, n_log):
        f = int(host["log_frame"][i])
        if f < 0:
            continue
        is_kf = host["log_flags"][i, 1] > 0.5
        wm.add_pose(np.asarray(host["log_pose"][i], np.float64),
                    is_keyframe=bool(is_kf))
        system.frame_ids.append(f)
        if not bool(host["log_flags"][i, 0]):
            system.tracking_lost_count += 1

    # landmark reconciliation by stable id (device row order == insertion
    # order: compaction is stable and the host pop preserves relative order)
    n_pts = int(host["n_points"])
    pid = host["pid"][:n_pts]
    alive = host["alive"][:n_pts]
    dev_pids = {int(p) for p, a in zip(pid, alive) if a}
    for hp in list(wm.points.keys()):
        if hp not in dev_pids:
            # device compaction evicted it; keep observed landmarks in the
            # host-side archive — loop closure across long gaps needs the
            # OLD map region's 3D points (a revisit after eviction otherwise
            # has zero 3D-3D pairs, measured on the 1200-frame square soak)
            if wm.points[hp].observations:
                wm.archive_point(hp)
            else:
                wm.points.pop(hp)
    grey = np.full((3,), 0.7, np.float32)
    for r in range(n_pts):
        if not alive[r]:
            continue
        p = int(pid[r])
        created = int(host["obs_kf"][r, 1])
        if created < 0:
            created = int(host["obs_kf"][r, 0])
        if wm.upsert_point(p, host["positions"][r].astype(np.float64),
                           colour=grey, keyframe_idx=created):
            mp = wm.points[p]
            for o in range(min(fc.obs_slots, host["obs_kf"].shape[1])):
                kf = int(host["obs_kf"][r, o])
                if kf < 0:
                    continue
                mp.add_observation(kf, int(host["obs_kp"][r, o]),
                                   host["desc01"][r, min(o, 1)])
    system._fused_compactions = int(host["compactions"])
    wm.version += 1
    # map-pressure diagnostics: the one observable that distinguishes
    # "tracking died" (n_inl collapses first) from "map starved" (alive
    # saturates at capacity so triangulation output is dropped) on long
    # runs — measured per sync so post-mortems don't need --save_state
    fl = host["log_flags"]
    lo = max(from_row, 0)
    if n_log > lo:
        w = fl[lo:n_log]
        logger.info(
            "[SYNC] frames %d..%d: map %d/%d alive (%d rows, %d "
            "compactions), KFs %d; window tracked %d/%d, med n_inl %.0f, "
            "med n_cand %.0f, new pts %d",
            int(host["log_frame"][lo]), int(host["log_frame"][n_log - 1]),
            int(alive.sum()), fc.map_capacity, n_pts,
            int(host["compactions"]), int(host["kf_count"]),
            int((w[:, 0] > 0.5).sum()), n_log - lo,
            float(np.median(w[:, 2])), float(np.median(w[:, 4])),
            int(w[:, 3].sum()))
        # long single-sync windows (no-loop runs): per-64-frame breakdown so
        # one diagnostic run localizes WHERE tracking degrades (corner onset
        # vs gradual starvation) without --save_state
        if n_log - lo > 128:
            for s in range(lo, n_log, 64):
                e = min(s + 64, n_log)
                v = fl[s:e]
                logger.info(
                    "[SYNC]   frames %d..%d: tracked %d/%d, med n_inl %.0f,"
                    " med n_cand %.0f, kfs %d, new pts %d",
                    int(host["log_frame"][s]), int(host["log_frame"][e - 1]),
                    int((v[:, 0] > 0.5).sum()), e - s,
                    float(np.median(v[:, 2])), float(np.median(v[:, 4])),
                    int((v[:, 1] > 0.5).sum()), int(v[:, 3].sum()))

    # materialize device-created keyframes as host Keyframe objects so
    # --save_state / resume / viz carry the full KF record, not just the
    # bootstrap pair. KFs still in the device ring get their real padded
    # features; KFs that aged out of the ring before this sync become
    # placeholder entries (empty features, logged pose) — their landmarks'
    # BA edges were already outside the window.
    from simpleslam_tpu.core.keyframe import Keyframe
    from simpleslam_tpu.core.types import Features

    kfc = int(host["kf_count"])
    Kw = fc.kf_ring
    kf_rows = [i for i in range(from_row, n_log)
               if host["log_flags"][i, 1] > 0.5 and host["log_frame"][i] >= 0]
    kfc_start = kfc - len(kf_rows)
    N = host["kf_kpts"].shape[1]
    for j, i in enumerate(kf_rows):
        kf_no = kfc_start + j
        if kf_no < len(system.kfs):
            continue
        slot = kf_no % Kw
        frame_no = int(host["log_frame"][i])
        in_ring = (kf_no >= kfc - Kw
                   and int(host["kf_frame_no"][slot]) == frame_no)
        if in_ring:
            feats = Features(kpts=host["kf_kpts"][slot].copy(),
                             desc=host["kf_desc"][slot].copy(),
                             scores=np.zeros((N,), np.float32),
                             valid=host["kf_valid"][slot].copy())
            pose = host["kf_pose"][slot]
        else:
            feats = Features(kpts=np.zeros((N, 2), np.float32),
                             desc=np.zeros_like(host["kf_desc"][0]),
                             scores=np.zeros((N,), np.float32),
                             valid=np.zeros((N,), bool))
            pose = host["log_pose"][i]
        system.kfs.append(Keyframe(idx=kf_no, frame_idx=frame_no, path="",
                                   feats=feats,
                                   pose=np.asarray(pose, np.float64),
                                   thumb=b""))
        if in_ring:
            # Materialize this KF's TRACKED re-observations. do_kf seeds
            # kf_lm_row from the frame's PnP-inlier associations (old
            # landmarks the new KF observes) before triangulate_new adds
            # the created rows — but only creation observations used to
            # reach the host, mapping ~5% of a KF's keypoints. Loop
            # closure's 3D-3D lift starves on that (measured: genuine
            # revisits died with < 20 pairs on the 1200-frame square
            # soak), so record one observation per (landmark, KF) here.
            lm_row = host["kf_lm_row"][slot]
            for kp in np.nonzero(lm_row >= 0)[0]:
                r = int(lm_row[kp])
                if r >= n_pts or not alive[r]:
                    continue
                p = int(pid[r])
                if p not in wm.points:
                    continue
                mp = wm.points[p]
                if any(o[0] == kf_no for o in mp.observations):
                    continue            # creation obs already covers this KF
                mp.add_observation(kf_no, int(kp), feats.desc[kp])

    # keyframe poses (ring slots still alive) — back-written into the
    # trajectory too, mirroring the host BA write-back (core/ba.py:140-146)
    kf_indices = wm.keyframe_indices
    for kf in system.kfs:
        if kf.idx >= kfc - fc.kf_ring:
            kf.pose = np.asarray(host["kf_pose"][kf.idx % fc.kf_ring],
                                 np.float64)
            if kf.idx < len(kf_indices):
                pi = kf_indices[kf.idx]
                if 0 <= pi < len(wm.poses):
                    wm.poses[pi][:] = kf.pose
    system.last_kf_frame_no = int(host["last_kf_frame_no"])
    return host


def apply_host_correction(state: FusedState, system, fc: FusedConfig,
                          host: dict) -> FusedState:
    """Push a host-side global map rewrite (a loop closure: keyframe poses,
    landmark positions, trajectory — core/loop.LoopCloser.close) back into
    the device-resident state so subsequent fused dispatches track against
    the corrected map. Loop closures are rare, out-of-hot-loop events, so
    one host->device upload here is the right trade (the per-frame path
    stays a single dispatch with zero readbacks).

    Updates: landmark positions (reconciled by stable pid), the keyframe
    ring poses, and the current/previous camera pose from the corrected
    trajectory. Observation tables, descriptors and ids are untouched —
    the closure moves geometry, not associations.
    """
    wm = system.world_map
    pos = np.array(host["positions"])                 # (C,3) from the sync
    pid = host["pid"]
    alive = host["alive"]
    n_pts = int(host["n_points"])
    for r in range(n_pts):
        if not alive[r]:
            continue
        hrow = wm._row.get(int(pid[r]))
        if hrow is not None:
            pos[r] = wm._positions[hrow]              # corrected position

    kf_pose = np.array(host["kf_pose"])               # (Kw,4,4)
    kfc = int(host["kf_count"])
    for kf in system.kfs:
        if kfc - fc.kf_ring <= kf.idx < kfc:
            slot = kf.idx % fc.kf_ring
            if int(host["kf_frame_no"][slot]) == kf.frame_idx:
                kf_pose[slot] = kf.pose

    Tcw = np.asarray(wm.poses[-1], np.float32)
    Tcw_prev = (np.asarray(wm.poses[-2], np.float32)
                if len(wm.poses) >= 2 else Tcw)
    return state.replace(
        positions=jnp.asarray(pos, jnp.float32),
        kf_pose=jnp.asarray(kf_pose, jnp.float32),
        Tcw=jnp.asarray(Tcw), Tcw_prev=jnp.asarray(Tcw_prev),
        # keyframes < kf_count carry pre-rewrite geometry — hold local BA
        # until the window rolls wholly past them (see FusedState.ba_floor_kf).
        # copy=True: aliasing kf_count's buffer into a second field would
        # make the next (donating) dispatch donate one buffer twice
        ba_floor_kf=jnp.array(state.kf_count, copy=True))


# --------------------------------------------------------------------------- #
# The fused per-frame program
# --------------------------------------------------------------------------- #

def build_fused_step(fc: FusedConfig,
                     K: np.ndarray,
                     extract_fn: Callable[[jax.Array], Features],
                     match_fn: Callable[[Features, Features], Matches],
                     undistort_maps=None,
                     force_branch: str = None):
    """Compile the single-dispatch per-frame program.

    ``extract_fn``: jittable (H,W) f32 gray -> Features (classical or ALIKED).
    ``match_fn``:   jittable (Features, Features) -> Matches (BF or LightGlue).
    Returns ``step(state, image_u8) -> state`` (jitted, donates the state).

    ``force_branch``: COST-ACCOUNTING ONLY (never run it). XLA cost analysis
    of the real program counts BOTH sides of every ``lax.cond``; forcing the
    keyframe-policy branches gives the per-class program so bench.py can
    weight them by the measured per-class frame counts (executed-average
    MFU, VERDICT r3 weak-2):
      'skip' — cooldown fast path (no KF<->frame match, no burst),
      'eval' — KF candidate evaluated (second matcher call) but not promoted,
      'kf'   — full keyframe burst (insert + triangulate + local BA).
    """
    Kj = jnp.asarray(np.asarray(K), jnp.float32)
    N, Kw, O, C = fc.n_kp, fc.kf_ring, fc.obs_slots, fc.map_capacity

    # NN weights as jit ARGUMENTS, not closure constants. A closed-over
    # param pytree is baked into the HLO as literals, duplicated at every
    # call site and lax.cond branch — measured: a 724 MB compiled fused-step
    # binary whose upload through the ~150 MB/s device tunnel cost ~300 s at
    # every process start (even on a compile-cache HIT). When extract/match
    # are bound methods of the learned bundles (models/pipeline), use their
    # parametric twins (.fn_p) and thread the weights through the dispatch;
    # classical fns have no weights and trace exactly as before.
    _det_owner = getattr(extract_fn, "__self__", None)
    _mat_owner = getattr(match_fn, "__self__", None)
    det_p = getattr(_det_owner, "fn_p", None)
    mat_p = getattr(_mat_owner, "fn_p", None)
    nn_host = (_det_owner.params if det_p else None,
               _mat_owner.params if mat_p else None)
    _nn = [nn_host]          # trace-time cell; step sets it to its traced arg

    def detect(img) -> Features:
        return det_p(_nn[0][0], img) if det_p else extract_fn(img)

    def match(f0: Features, f1: Features) -> Matches:
        return mat_p(_nn[0][1], f0, f1) if mat_p else match_fn(f0, f1)

    def features_of(state) -> Features:
        return Features(kpts=state.prev_kpts, desc=state.prev_desc,
                        scores=jnp.zeros((N,), jnp.float32),
                        valid=state.prev_valid)

    def kf_features(state, slot) -> Features:
        return Features(kpts=state.kf_kpts[slot], desc=state.kf_desc[slot],
                        scores=jnp.zeros((N,), jnp.float32),
                        valid=state.kf_valid[slot])

    def place_vec(feats: Features) -> jax.Array:
        """(P,) pooled-descriptor place vector — the device twin of
        core/loop._pool_place_vector (same G x G pooling, same
        MSB-first bit unpack for binary descriptors, so cosines against
        the host-initialized ``kf_place`` rows are consistent)."""
        G = fc.place_grid
        desc = feats.desc
        if jnp.issubdtype(desc.dtype, jnp.unsignedinteger):
            desc = jnp.unpackbits(desc, axis=1)
        desc = desc.astype(jnp.float32)
        cx = jnp.clip((feats.kpts[:, 0] / fc.img_w * G).astype(jnp.int32),
                      0, G - 1)
        cy = jnp.clip((feats.kpts[:, 1] / fc.img_h * G).astype(jnp.int32),
                      0, G - 1)
        cell = cy * G + cx
        oh = ((cell[:, None] == jnp.arange(G * G)[None, :])
              & feats.valid[:, None]).astype(jnp.float32)
        sums = oh.T @ desc                                     # (G2, Dp)
        cnt = jnp.maximum(jnp.sum(oh, axis=0), 1.0)[:, None]
        cv = sums / cnt
        cv = cv / (jnp.linalg.norm(cv, axis=1, keepdims=True) + 1e-8)
        v = cv.reshape(-1)
        return v / (jnp.linalg.norm(v) + 1e-8)

    def match_ransac(key, f0: Features, f1: Features) -> Matches:
        """feature_matcher + F-RANSAC filter, fully on device (the host
        `frontend.match_with_ransac` without the scalar readbacks; keeps the
        <8-valid-matches passthrough quirk, features_utils.py:185-200)."""
        m = match(f0, f1)
        p0 = f0.kpts[m.idx0]
        p1 = f1.kpts[m.idx1]
        F, inl, ok = epipolar.find_fundamental(
            key, p0, p1, m.valid, fc.ransac_thresh,
            n_hyp=fc.ransac_hypotheses)
        n = jnp.sum(m.valid.astype(jnp.int32))
        keep_filter = (n >= 8) & ok
        valid = jnp.where(keep_filter, m.valid & inl, m.valid)
        return Matches(idx0=m.idx0, idx1=m.idx1, score=m.score, valid=valid)

    # ---------------------------------------------------------------- track
    def track(state, feats, frame_no):
        """PnP with essential fallback; returns (Tcw_new, tracked, n_inl,
        n_cand, assoc, inl_mask).

        Perf note vs the reference: main_revamped.py:328 matches prev<->cur
        unconditionally, but in tracking state the result is consumed ONLY
        by the 2D-2D fallback (:502-542) and the debug overlay. Here the
        prev-match (a full matcher forward + F-RANSAC) runs INSIDE the
        fallback branch, so healthy frames skip it entirely — identical
        outputs, one fewer matcher forward per tracked frame."""
        T_pred = pnp.predict_pose_const_vel(state.Tcw_prev, state.Tcw)

        k_pnp = frame_key(state.key, frame_no, SITE_PNP)
        k_match = frame_key(state.key, frame_no, SITE_PREV_MATCH)
        k_ess = frame_key(state.key, frame_no, SITE_ESS)
        k_reloc = frame_key(state.key, frame_no, SITE_RELOC)

        def attempt(radius_px):
            """One assoc + PnP pass at the given search radius (a traced
            scalar — the wide retry shares the compiled program)."""
            assoc = pnp.reproject_and_match_2d3d(
                state.positions, state.alive, state.desc_ring, state.n_desc,
                feats.kpts, feats.desc, feats.valid, Kj, T_pred,
                img_w=fc.img_w, img_h=fc.img_h, radius_px=radius_px,
                max_hamm=fc.max_hamm, max_l2=fc.max_l2)
            n_cand = jnp.sum(assoc.valid.astype(jnp.int32))
            # compact the associated candidates from map-capacity rows (C)
            # to a dense slot buffer before RANSAC: the hypothesis scoring
            # is linear in the input rows and candidates are a small
            # fraction of capacity
            S = min(2048, C)
            rank = jnp.cumsum(assoc.valid.astype(jnp.int32)) - 1
            slot_ok = assoc.valid & (rank < S)
            dest = jnp.where(slot_ok, rank, S)
            row_of_slot = jnp.full((S + 1,), -1, jnp.int32) \
                .at[dest].set(jnp.arange(C, dtype=jnp.int32))[:S]
            slot_valid = row_of_slot >= 0
            row_s = jnp.maximum(row_of_slot, 0)
            T_est, inl_s, n_inl, ok = pnp.solve_pnp_ransac(
                k_pnp, state.positions[row_s],
                feats.kpts[assoc.kp_idx[row_s]], slot_valid, Kj,
                fc.ransac_thresh, Tcw_init=T_pred,
                n_hyp=fc.ransac_hypotheses)
            inl = jnp.zeros((C,), bool).at[row_s].max(inl_s & slot_valid)
            use_pnp = ok & (n_inl >= fc.pnp_min_inliers) & \
                (n_cand >= fc.pnp_min_inliers)
            return use_pnp, T_est, inl, n_inl, n_cand, assoc

        first = attempt(jnp.float32(fc.proj_radius))
        if fc.assoc_wide_factor > 1.0:
            # widened-window retry on failure (ORB-SLAM's recovery): the
            # const-vel seed cannot predict yaw ONSET, whose rotation flow
            # exceeds proj_radius on the first turning frame — the wide
            # pass runs only on failing frames (lax.cond takes one branch)
            use_pnp, T_est, inl, n_inl, n_cand, assoc = jax.lax.cond(
                first[0], lambda _: first,
                lambda _: attempt(jnp.float32(
                    fc.proj_radius * fc.assoc_wide_factor)), None)
        else:
            use_pnp, T_est, inl, n_inl, n_cand, assoc = first

        def fallback(_):
            """Recovery chain on PnP failure: (1) RELOCALIZE — match the
            current frame against the last keyframe and PnP on the
            landmark rows its keypoints observe (the 'trigger
            relocalization here in the future' the reference left
            unimplemented, main_revamped.py:501); (2) after
            ``greloc_after`` consecutive lost frames, GLOBAL reloc —
            place-recognition argmax over the whole KF ring + PnP with
            the candidate's own pose as the initial guess (kidnapped
            robot; beyond reference); (3) 2D-2D essential with
            const-velocity scale (main_revamped.py:502-542); (4)
            dead-reckon. Returns (T, relocd, grelocd)."""
            def essential(_):
                matches_prev = match_ransac(k_match, features_of(state),
                                            feats)
                p0 = state.prev_kpts[matches_prev.idx0]
                p1 = feats.kpts[matches_prev.idx1]
                E, e_inl, e_ok = epipolar.find_essential(
                    k_ess, p0, p1, matches_prev.valid, Kj, fc.ransac_thresh,
                    n_hyp=fc.ransac_hypotheses)
                R, t, _good, _n = epipolar.recover_pose_essential(
                    E, p0, p1, e_inl, Kj)
                T_rel_last = state.Tcw @ se3.T_inverse(state.Tcw_prev)
                scale = jnp.linalg.norm(T_rel_last[:3, 3])
                T_rel = se3.rt_to_T(R, t * scale)
                T_fb = T_rel @ state.Tcw
                return (jnp.where(e_ok, T_fb, state.Tcw),
                        jnp.asarray(False), jnp.asarray(False))

            def greloc(_):
                """Global relocalization: best place-vector cosine over
                the ring (the last KF slot is excluded — its targeted
                reloc just failed), then the same 2D-3D PnP with the
                CANDIDATE's pose as init (after sustained loss the
                motion-model prediction is meaningless)."""
                v = place_vec(feats)
                sims = state.kf_place @ v
                live = (state.kf_frame_no >= 0) & \
                    (jnp.arange(Kw) != (state.kf_count - 1) % Kw)
                sims = jnp.where(live, sims, -2.0)
                best = jnp.argmax(sims).astype(jnp.int32)
                ok_sim = sims[best] >= fc.greloc_min_sim
                m_g = match(kf_features(state, best), feats)
                rows_g = state.kf_lm_row[best][m_g.idx0]
                rows_gs = jnp.maximum(rows_g, 0)
                ok_g = m_g.valid & (rows_g >= 0) & state.alive[rows_gs] & \
                    (rows_gs < state.n_points)
                k_g = frame_key(state.key, frame_no, SITE_GRELOC)
                T_g, _inl_g, n_g, okp = pnp.solve_pnp_ransac(
                    k_g, state.positions[rows_gs], feats.kpts[m_g.idx1],
                    ok_g, Kj, fc.ransac_thresh,
                    Tcw_init=state.kf_pose[best],
                    n_hyp=fc.ransac_hypotheses)
                use_g = ok_sim & okp & (n_g >= fc.pnp_min_inliers)
                return jax.lax.cond(
                    use_g,
                    lambda _: (T_g, jnp.asarray(False), jnp.asarray(True)),
                    essential, None)

            def greloc_or_essential(_):
                if not fc.global_reloc:
                    return essential(None)
                do_g = (state.lost_streak + 1) >= fc.greloc_after
                return jax.lax.cond(do_g, greloc, essential, None)

            if not fc.reloc:
                return greloc_or_essential(None)

            slot = (state.kf_count - 1) % Kw
            m = match(kf_features(state, slot), feats)
            rows = state.kf_lm_row[slot][m.idx0]
            rows_s = jnp.maximum(rows, 0)
            ok_r = m.valid & (rows >= 0) & state.alive[rows_s] & \
                (rows_s < state.n_points)
            T_r, _inl_r, n_r, ok2 = pnp.solve_pnp_ransac(
                k_reloc, state.positions[rows_s], feats.kpts[m.idx1],
                ok_r, Kj, fc.ransac_thresh, Tcw_init=T_pred,
                n_hyp=fc.ransac_hypotheses)
            use_r = ok2 & (n_r >= fc.pnp_min_inliers)
            return jax.lax.cond(
                use_r,
                lambda _: (T_r, jnp.asarray(True), jnp.asarray(False)),
                greloc_or_essential, None)

        T_new, relocd, grelocd = jax.lax.cond(
            use_pnp,
            lambda _: (T_est, jnp.asarray(False), jnp.asarray(False)),
            fallback, None)
        return T_new, use_pnp, relocd, grelocd, n_inl, n_cand, assoc, inl

    def refresh_rings(state, assoc, inl, feats, frame_no):
        """Scatter this frame's PnP-inlier descriptors into the landmark
        rings (keeps association quality as viewpoint drifts — mirrors
        run_slam._refresh_rings); stamps last_seen for eviction."""
        sel = assoc.valid & inl
        rows = jnp.arange(C, dtype=jnp.int32)
        kp_sel = assoc.kp_idx
        descs = feats.desc[kp_sel]                                # (C,D)
        slots = state.n_desc % state.desc_ring.shape[1]
        ring = state.desc_ring
        cur = ring[rows, slots]
        new = jnp.where(sel[:, None], descs.astype(ring.dtype), cur)
        ring = ring.at[rows, slots].set(new)
        n_desc = state.n_desc + sel.astype(jnp.int32)
        last_seen = jnp.where(sel, frame_no, state.last_seen)
        return state.replace(desc_ring=ring, n_desc=n_desc,
                             last_seen=last_seen)

    # ------------------------------------------------------------- keyframe
    def kf_signals(state, feats, matches):
        """(n_inl, ratio, median flow) vs the last keyframe (masked
        equivalents of keyframe_utils.py:72-86)."""
        slot = (state.kf_count - 1) % Kw
        m = matches.valid
        n_inl = jnp.sum(m.astype(jnp.int32))
        n_ref = jnp.maximum(
            jnp.sum(state.kf_valid[slot].astype(jnp.int32)), 1)
        ratio = n_inl.astype(jnp.float32) / n_ref.astype(jnp.float32)
        d = feats.kpts[matches.idx1] - state.kf_kpts[slot][matches.idx0]
        disp = jnp.hypot(d[:, 0], d[:, 1])
        s = jnp.sort(jnp.where(m, disp, jnp.inf))
        kk = jnp.maximum(n_inl, 1)
        med = jnp.where(n_inl > 0,
                        0.5 * (s[jnp.maximum((kk - 1) // 2, 0)]
                               + s[jnp.maximum(kk // 2, 0)]), 0.0)
        return n_inl, ratio, med

    def tri_candidates(state, feats, kf_matches, src_slot):
        """Gated triangulation candidates for one (source KF <-> current
        frame) match set. Returns (X, keep, uv0, uv1, d0, idx0, idx1)."""
        T0 = state.kf_pose[src_slot]
        T1 = state.Tcw
        P0 = projection_matrix(Kj, T0)
        P1 = projection_matrix(Kj, T1)
        uv0 = state.kf_kpts[src_slot][kf_matches.idx0]
        uv1 = feats.kpts[kf_matches.idx1]
        X = triangulate_two_view(P0, P1, uv0, uv1)
        keep, _why = two_view_gates(
            X, Kj, T0, T1, uv0, uv1,
            min_depth=fc.min_depth, max_depth=fc.max_depth,
            min_parallax_deg=fc.tri_parallax_min_deg,
            max_reproj_px=fc.tri_rep_err)
        keep = keep & kf_matches.valid & jnp.all(jnp.isfinite(X), axis=1)
        d0 = state.kf_desc[src_slot][kf_matches.idx0]
        return X, keep, uv0, uv1, d0, kf_matches.idx0, kf_matches.idx1

    def triangulate_new(state, feats, cands, frame_no):
        """Gate, dedup, and append triangulation candidates to the map
        (core/triangulate.py semantics, compaction by rank-scatter instead
        of host loops). ``cands`` is a list of
        (X, keep, uv0, uv1, d0, idx0, idx1, src_kf_no) tuples — one per
        source keyframe matched against the CURRENT frame (the new KF, whose
        ring slot the caller wrote before this runs). A current-frame
        keypoint already consumed by an earlier candidate set is dropped
        from later ones (one landmark per keypoint, like the host map's
        observation uniqueness)."""
        used = jnp.zeros((N,), bool)
        Xs, keeps, uv0s, uv1s, d0s, srcs = [], [], [], [], [], []
        for X, keep, uv0, uv1, d0, idx0, idx1, src_kf_no in cands:
            keep = keep & ~used[idx1]
            used = used.at[idx1].max(keep)
            Xs.append(X)
            keeps.append(keep)
            uv0s.append(uv0)
            uv1s.append(uv1)
            d0s.append(d0)
            srcs.append(jnp.full(keep.shape, src_kf_no, jnp.int32))
        X = jnp.concatenate(Xs, axis=0)
        keep = jnp.concatenate(keeps, axis=0)
        uv0 = jnp.concatenate(uv0s, axis=0)
        uv1 = jnp.concatenate(uv1s, axis=0)
        d0 = jnp.concatenate(d0s, axis=0)
        src_kf = jnp.concatenate(srcs, axis=0)
        idx0_all = jnp.concatenate([c[5] for c in cands], axis=0)
        idx1_all = jnp.concatenate([c[6] for c in cands], axis=0)
        d1 = feats.desc[idx1_all]

        # rank-compaction: destination row for each kept match
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1       # (M,)
        keep = keep & (rank < fc.max_new) & \
            (state.n_points + rank < C)
        dest = jnp.where(keep, state.n_points + rank, C)    # C = dump row
        n_new = jnp.sum(keep.astype(jnp.int32))

        kf_no_cur = state.kf_count

        # scatter (with one dump row of padding at index C)
        def put(arr, vals):
            pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
            out = jnp.concatenate([arr, pad], axis=0)
            return out.at[dest].set(vals.astype(arr.dtype))[:C]

        positions = put(state.positions, X)
        alive = put(state.alive, keep)
        last_seen = put(state.last_seen, jnp.full_like(dest, 1) * frame_no)
        # descriptor ring: slots 0/1 = the two observing descriptors
        ring = state.desc_ring
        pad_r = jnp.zeros((1,) + ring.shape[1:], ring.dtype)
        ring2 = jnp.concatenate([ring, pad_r], axis=0)
        ring2 = ring2.at[dest, 0].set(d0.astype(ring.dtype))
        ring2 = ring2.at[dest, 1].set(d1.astype(ring.dtype))
        ring = ring2[:C]
        n_desc = put(state.n_desc, jnp.full_like(dest, 2))

        obs_kf = state.obs_kf
        pad_o = jnp.zeros((1, O), obs_kf.dtype)
        obs_kf2 = jnp.concatenate([obs_kf, pad_o], axis=0)
        obs_kf2 = obs_kf2.at[dest, 0].set(src_kf)
        obs_kf2 = obs_kf2.at[dest, 1].set(kf_no_cur)
        obs_kf = obs_kf2[:C]
        obs_kp2 = jnp.concatenate([state.obs_kp, pad_o], axis=0)
        obs_kp2 = obs_kp2.at[dest, 0].set(idx0_all.astype(jnp.int32))
        obs_kp2 = obs_kp2.at[dest, 1].set(idx1_all.astype(jnp.int32))
        obs_kp = obs_kp2[:C]
        pid = put(state.pid, state.n_created + rank)
        obs_uv = state.obs_uv
        pad_u = jnp.zeros((1, O, 2), obs_uv.dtype)
        obs_uv2 = jnp.concatenate([obs_uv, pad_u], axis=0)
        obs_uv2 = obs_uv2.at[dest, 0].set(uv0)
        obs_uv2 = obs_uv2.at[dest, 1].set(uv1)
        obs_uv = obs_uv2[:C]
        obs_n = put(state.obs_n, jnp.full_like(dest, 2))

        # relocalization index for the CURRENT (new) keyframe: each kept
        # candidate's current-frame keypoint observes its new landmark row
        cur_slot = state.kf_count % Kw
        lm_row = state.kf_lm_row[cur_slot]
        lm_row = lm_row.at[idx1_all].max(
            jnp.where(keep, dest, -1).astype(jnp.int32))
        kf_lm_row = state.kf_lm_row.at[cur_slot].set(lm_row)

        return state.replace(
            positions=positions, alive=alive, desc_ring=ring, n_desc=n_desc,
            obs_kf=obs_kf, obs_kp=obs_kp, obs_uv=obs_uv, obs_n=obs_n,
            pid=pid, n_created=state.n_created + n_new,
            kf_lm_row=kf_lm_row, last_seen=last_seen,
            n_points=jnp.minimum(state.n_points + n_new, C)), n_new

    # ------------------------------------------------------------- local BA
    def local_ba(state):
        """Sliding-window BA on the contiguous row-slice of points created
        inside the window (ba_utils.py:146-165 semantics, fixed shapes)."""
        L = fc.ba_points
        kfc = state.kf_count                       # includes the new KF
        center = kfc - 1
        first_opt = jnp.maximum(1, center - fc.local_ba_window + 1)

        # Rows created at KF >= first_opt form a contiguous slice. Start one
        # KF earlier: points created at first_opt-1 are observed by KF
        # first_opt-1 only (creation is the only obs site), so they become
        # frozen padding — but points created at KF first_opt DO have a
        # fixed-KF observation at first_opt-1, which this keeps intact.
        lo_kf = jnp.maximum(first_opt - 1, 0)
        row_lo = state.kf_first_row[lo_kf % Kw]
        row_lo = jnp.clip(row_lo, 0, jnp.maximum(C - L, 0))

        pts = jax.lax.dynamic_slice(state.positions, (row_lo, 0), (L, 3))
        okf = jax.lax.dynamic_slice(state.obs_kf, (row_lo, 0), (L, O))
        ouv = jax.lax.dynamic_slice(state.obs_uv, (row_lo, 0, 0), (L, O, 2))
        aliv = jax.lax.dynamic_slice(state.alive, (row_lo,), (L,))
        rowid = row_lo + jnp.arange(L)
        in_map = rowid < state.n_points

        # cameras = the Kw ring slots; free = global kf in [first_opt, center]
        slots = jnp.arange(Kw)
        # global kf number occupying each slot: largest kf_no < kfc with
        # kf_no % Kw == slot
        kf_no_of_slot = (kfc - 1) - ((kfc - 1 - slots) % Kw)
        slot_live = (kf_no_of_slot >= 0) & (kf_no_of_slot >= kfc - Kw)
        cam_free = slot_live & (kf_no_of_slot >= first_opt) & \
            (kf_no_of_slot <= center)

        # edges: (L*O,)
        e_kf = okf.reshape(-1)
        e_uv = ouv.reshape(-1, 2)
        e_pt = jnp.repeat(jnp.arange(L, dtype=jnp.int32), O)
        e_cam = (e_kf % Kw).astype(jnp.int32)
        e_cam = jnp.where(e_kf >= 0, e_cam, 0)
        # valid: obs exists, KF still in ring, point live
        kf_in_ring = (e_kf >= 0) & (e_kf > kfc - 1 - Kw) & (e_kf < kfc)
        e_valid = kf_in_ring & aliv[e_pt] & in_map[e_pt]

        # points participate iff they have >= 1 edge to a free camera
        pt_has_opt = jnp.zeros((L,), bool).at[e_pt].max(
            e_valid & cam_free[e_cam])
        pt_free = pt_has_opt & aliv & in_map
        e_live = e_valid & pt_free[e_pt]

        # a free camera with (almost) no live edges would make the Schur
        # system singular — pin it instead
        cam_edges = jnp.zeros((Kw,), jnp.int32).at[e_cam].add(
            e_live.astype(jnp.int32))
        cam_free = cam_free & (cam_edges >= 3)

        prob = BAProblem(
            poses=state.kf_pose, points=pts,
            cam_idx=e_cam, pt_idx=e_pt, uv=e_uv,
            e_valid=e_live,
            cam_free=cam_free, pt_free=pt_free)
        new_poses, new_points, _c0, _c1, _ng = ba_solve(
            prob, Kj, huber=fc.ba_huber, max_iters=fc.local_ba_max_iters,
            point_major_obs=O)      # edges are the (L, O) obs-table layout

        positions = jax.lax.dynamic_update_slice(
            state.positions,
            jnp.where(pt_free[:, None], new_points, pts), (row_lo, 0))
        kf_pose = jnp.where(cam_free[:, None, None], new_poses,
                            state.kf_pose)
        # the current frame IS the newest KF: adopt its refined pose
        cur_slot = center % Kw
        return state.replace(positions=positions, kf_pose=kf_pose,
                             Tcw=kf_pose[cur_slot])

    # ----------------------------------------------------------- eviction
    def compact_map(state, frame_no):
        """Stable compaction of the landmark store: drop dead rows and
        landmarks unseen for > evict_age frames (left the FOV under
        forward motion), shifting survivors down IN CREATION ORDER so the
        local-BA window slice stays contiguous. The reference's Python map
        grows without bound (landmark_utils.py Map.points dict); a
        fixed-capacity device map needs this to survive long sequences."""
        in_map = jnp.arange(C, dtype=jnp.int32) < state.n_points
        keep = state.alive & in_map & \
            ((frame_no - state.last_seen) <= fc.evict_age)
        pref = jnp.cumsum(keep.astype(jnp.int32))
        n_new_pts = pref[C - 1]
        remap = jnp.where(keep, pref - 1, -1)               # old -> new
        # stable order: kept rows first, original order preserved
        old_of_new = jnp.argsort(jnp.where(keep, 0, 1), stable=True)

        def g(arr):
            return arr[old_of_new]

        kf_lm_row = jnp.where(state.kf_lm_row >= 0,
                              remap[jnp.maximum(state.kf_lm_row, 0)], -1)
        first = state.kf_first_row
        kf_first_row = jnp.where(
            first > 0, pref[jnp.maximum(first - 1, 0)], 0)
        return state.replace(
            positions=g(state.positions), alive=g(keep),
            desc_ring=g(state.desc_ring), n_desc=g(state.n_desc),
            obs_kf=g(state.obs_kf), obs_kp=g(state.obs_kp),
            obs_uv=g(state.obs_uv), pid=g(state.pid),
            obs_n=g(state.obs_n), last_seen=g(state.last_seen),
            kf_lm_row=kf_lm_row, kf_first_row=kf_first_row,
            compactions=state.compactions + 1,
            n_points=n_new_pts)

    # ------------------------------------------------------------ the step
    def maybe_keyframe(state, feats, img, frame_no, assoc, inl):
        """Keyframe policy + triangulation + BA (select_keyframe +
        triangulate + local BA of the host driver, on device)."""
        prev_slot = (state.kf_count - 1) % Kw
        age = frame_no - state.last_kf_frame_no
        rot = se3.rotation_angle_deg(
            state.Tcw[:3, :3] @ state.kf_pose[prev_slot][:3, :3].T)
        consider = (age > fc.kf_cooldown) | (rot >= fc.kf_min_rot_deg)
        k_kfm = frame_key(state.key, frame_no, SITE_KF_MATCH)
        k_m2 = frame_key(state.key, frame_no, SITE_KF_MATCH2)

        def evaluate(_):
            kf_m = match_ransac(k_kfm, kf_features(state, prev_slot), feats)
            n_inl, ratio, med = kf_signals(state, feats, kf_m)
            weak = (n_inl < fc.kf_min_inliers) | (ratio < fc.kf_min_ratio)
            is_kf = (age > fc.kf_cooldown) | weak | \
                (med > fc.kf_max_disp) | (rot > fc.kf_min_rot_deg)
            return is_kf, kf_m

        def skip(_):
            return jnp.asarray(False), Matches(
                idx0=jnp.zeros((N,), jnp.int32),
                idx1=jnp.zeros((N,), jnp.int32),
                score=jnp.zeros((N,), jnp.float32),
                valid=jnp.zeros((N,), bool))

        if force_branch is None:
            is_kf, kf_m = jax.lax.cond(consider, evaluate, skip, None)
        elif force_branch == "skip":
            is_kf, kf_m = skip(None)
        else:                          # 'eval' and 'kf' both run the matcher
            is_kf, kf_m = evaluate(None)

        def do_kf(state):
            # append the new keyframe to the ring; its relocalization index
            # starts from this frame's PnP-inlier associations (old
            # landmarks this KF observes), then triangulate_new adds the
            # newly created rows
            slot = state.kf_count % Kw
            lm_init = jnp.full((N,), -1, jnp.int32).at[assoc.kp_idx].max(
                jnp.where(assoc.valid & inl,
                          jnp.arange(C, dtype=jnp.int32), -1))
            state = state.replace(
                kf_pose=state.kf_pose.at[slot].set(state.Tcw),
                kf_kpts=state.kf_kpts.at[slot].set(feats.kpts),
                kf_desc=state.kf_desc.at[slot].set(
                    feats.desc.astype(state.kf_desc.dtype)),
                kf_valid=state.kf_valid.at[slot].set(feats.valid),
                kf_frame_no=state.kf_frame_no.at[slot].set(frame_no),
                kf_first_row=state.kf_first_row.at[slot].set(state.n_points),
                kf_lm_row=state.kf_lm_row.at[slot].set(lm_init),
                kf_place=state.kf_place.at[slot].set(place_vec(feats)),
            )
            kf_no_prev = state.kf_count - 1
            cands = [tri_candidates(state, feats, kf_m, prev_slot)
                     + (kf_no_prev,)]
            if fc.tri_kf2:
                # second source KF: double the baseline doubles the
                # parallax-gate pass rate for far/forward-motion geometry —
                # the generalization the reference's multi-view API
                # (multi_view_utils stale tests) points at
                prev2_slot = (state.kf_count - 2) % Kw
                kf_m2 = match_ransac(k_m2, kf_features(state, prev2_slot),
                                     feats)
                X2, keep2, uv02, uv12, d02, idx02, idx12 = tri_candidates(
                    state, feats, kf_m2, prev2_slot)
                keep2 = keep2 & (state.kf_count >= 2)
                cands.append((X2, keep2, uv02, uv12, d02, idx02, idx12,
                              kf_no_prev - 1))
            state, n_new = triangulate_new(state, feats, cands, frame_no)
            state = state.replace(
                kf_count=state.kf_count + 1,
                last_kf_frame_no=frame_no)
            # suppress BA while the window still touches keyframes from
            # before the last host map rewrite (see ba_floor_kf): the
            # window slice reaches down to KF max(0, center-local_ba_window),
            # so the whole window is post-rewrite once that clears the floor
            # (with floor=0 — no rewrite yet — this is always true)
            center_now = state.kf_count - 1
            past_rewrite = jnp.maximum(
                center_now - fc.local_ba_window, 0) >= state.ba_floor_kf
            run_ba = (n_new >= fc.local_ba_min_new_points) & \
                (state.kf_count >= 2) & past_rewrite
            state = jax.lax.cond(run_ba, local_ba, lambda s: s, state)
            # evict stale landmarks when the NEXT keyframe could overflow
            # the store (end of do_kf: every row index captured earlier in
            # this step still refers to the pre-compaction layout)
            need = (state.n_points + fc.max_new) > C
            state = jax.lax.cond(
                need, lambda s: compact_map(s, frame_no), lambda s: s,
                state)
            return state, n_new, run_ba

        def no_kf(state):
            return state, jnp.int32(0), jnp.asarray(False)

        if force_branch is None:
            state, n_new, ba_ran = jax.lax.cond(is_kf, do_kf, no_kf, state)
        elif force_branch == "kf":
            state, n_new, ba_ran = do_kf(state)
        else:
            state, n_new, ba_ran = no_kf(state)
        return state, is_kf, n_new, ba_ran, consider

    def _step_body(state: FusedState, image: jax.Array) -> FusedState:
        """Process one frame fully on device. ``image``: (H,W) or (H,W,3)
        uint8/float; undistortion applied when maps were built."""
        img = image
        if img.ndim == 3:
            w = jnp.asarray([0.114, 0.587, 0.299], jnp.float32)  # BGR
            img = jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))
        else:
            img = img.astype(jnp.float32)
        if undistort_maps is not None:
            from simpleslam_tpu.ops.projection import remap_bilinear
            img = remap_bilinear(img, undistort_maps[0], undistort_maps[1])

        frame_no = state.frame_no

        feats = detect(img)

        T_new, pnp_ok, relocd, grelocd, n_inl, n_cand, assoc, inl = track(
            state, feats, frame_no)
        tracked = pnp_ok | relocd | grelocd

        # after a global-reloc jump the const-vel "velocity" between the
        # two latest poses is meaningless — zero it
        state = state.replace(
            Tcw_prev=jnp.where(grelocd, T_new, state.Tcw), Tcw=T_new,
            lost_streak=jnp.where(tracked, 0, state.lost_streak + 1))
        state = jax.lax.cond(
            pnp_ok, lambda s: refresh_rings(s, assoc, inl, feats, frame_no),
            lambda s: s, state)

        state, is_kf, n_new, ba_ran, considered = maybe_keyframe(
            state, feats, img, frame_no, assoc, inl)

        # log
        i = state.log_n % fc.log_capacity
        flags = jnp.stack([
            tracked.astype(jnp.float32), is_kf.astype(jnp.float32),
            n_inl.astype(jnp.float32), n_new.astype(jnp.float32),
            n_cand.astype(jnp.float32), ba_ran.astype(jnp.float32),
            considered.astype(jnp.float32)])
        state = state.replace(
            log_pose=state.log_pose.at[i].set(state.Tcw),
            log_flags=state.log_flags.at[i].set(flags),
            log_frame=state.log_frame.at[i].set(frame_no),
            log_n=state.log_n + 1,
            prev_kpts=feats.kpts,
            prev_desc=feats.desc.astype(state.prev_desc.dtype),
            prev_valid=feats.valid,
            frame_no=frame_no + 1)
        return state

    if det_p or mat_p:
        @partial(jax.jit, donate_argnums=(0,))
        def step_p(state: FusedState, image: jax.Array, nn) -> FusedState:
            _nn[0] = nn          # traced pytree; inner detect/match read it
            return _step_body(state, image)

        nn_dev = jax.device_put(nn_host)     # resident, uploaded once

        def step(state: FusedState, image: jax.Array) -> FusedState:
            return step_p(state, image, nn_dev)

        # cost-analysis surface for bench.flops_of / tools/fused_cost
        step.lower = lambda state, image: step_p.lower(state, image, nn_dev)
    else:
        step = jax.jit(_step_body, donate_argnums=(0,))
    return step
