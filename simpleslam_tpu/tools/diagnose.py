"""Pipeline diagnostics: quantify each stage of the SLAM loop in isolation.

These are the probes used to localize quality/performance regressions
(the workflow that produced the round-2 learned-front-end fixes):

  * ``desc``  — keypoint repeatability + true-match vs distractor descriptor
                distance across view gaps, at training and pipeline
                resolution (is the front-end scale-robust?).
  * ``tri``   — where keyframe-pair matches die: matcher -> F-RANSAC ->
                each triangulation gate, with depth/parallax percentiles
                (is map replenishment starving?).
  * ``e2e``   — the fused device loop over a synthetic full-scale sequence
                with the per-frame (tracked, kf, n_inl, n_new, n_cand, ba)
                log printed (where does tracking die?).
  * ``ba``    — local-BA solves/s and per-iteration-count latency scaling.

Frames for the full-scale probes are rendered once and cached under /tmp.

Usage: python -m simpleslam_tpu.tools.diagnose <desc|tri|e2e|ba> [options]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def _enable_cache():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _full_scale_frames(H=376, W=1232, n=40, yaw=0.3, seed=0,
                       scene="corridor"):
    # NOTE on yaw: the trajectory curves at speed/yaw_rate radius (~95 m at
    # 0.3 deg/frame) INSIDE a corridor with walls at +-10 m — beyond ~85
    # frames the camera exits the scene and geometry degenerates. Long-run
    # probes must use a gentler yaw (0 keeps the camera in-corridor forever).
    from simpleslam_tpu.tools.synth import (DEFAULT_K, SCENE_FAMILIES,
                                            make_trajectory)

    s = W / 1232.0
    K = DEFAULT_K.copy()
    K[0] *= s
    K[1] *= s
    K[1, 2] = 0.487 * H
    tag = "" if (seed == 0 and scene == "corridor") else f"_{scene}{seed}"
    cache = (f"/tmp/synth_frames_{H}x{W}_{n}{tag}_y{yaw}.npz"
             if yaw != 0.3 else f"/tmp/synth_frames_{H}x{W}_{n}{tag}.npz")
    if os.path.exists(cache):
        frames = np.load(cache)["frames"]
    else:
        print(f"rendering {n} {scene} frames (seed {seed}) at {H}x{W}...",
              flush=True)
        sc = SCENE_FAMILIES[scene](seed=seed, hw=(H, W), K=K)
        T = make_trajectory(n, speed=0.5, yaw_rate_deg=yaw)
        frames = np.stack([sc.render(T[i]) for i in range(n)])
        np.savez_compressed(cache, frames=frames)
    return frames, K, make_trajectory(n, speed=0.5, yaw_rate_deg=yaw)


def cmd_desc(a) -> int:
    """Repeatability + descriptor separation across gaps and resolutions."""
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.models import pipeline as pipe_mod
    from simpleslam_tpu.tools.synth import (DEFAULT_K, SCENE_FAMILIES,
                                            make_trajectory)

    for (H, W, n_kp) in [(144, 256, 512), (376, 1232, 2048)]:
        s = W / 1232.0
        K = DEFAULT_K.copy()
        K[0] *= s
        K[1] *= s
        K[1, 2] = 0.487 * H
        scene = SCENE_FAMILIES[a.scene](seed=a.seed, hw=(H, W), K=K)
        T = make_trajectory(10, speed=0.5, yaw_rate_deg=0.3)
        rend = [scene.render_with_geometry(T[i]) for i in range(10)]

        cfg = parse_config(["--dataset", "kitti", "--headless",
                            "--max_features", str(n_kp), "--use_lightglue"])
        det = pipe_mod.build_learned_extractor(cfg,
                                               ((n_kp + 127) // 128) * 128)
        feats = [jax.tree.map(np.asarray,
                              det.fn(jnp.asarray(rend[i][0], jnp.float32)))
                 for i in range(10)]

        for gap in (1, 3, 6):
            i, j = 0, gap
            f0, f1 = feats[i], feats[j]
            _, hit0, _ = rend[i]
            _, _, depth1 = rend[j]
            kp0 = f0.kpts[f0.valid]
            d0 = f0.desc[f0.valid]
            xs = np.clip(kp0[:, 0].round().astype(int), 0, W - 1)
            ys = np.clip(kp0[:, 1].round().astype(int), 0, H - 1)
            Xw = hit0[ys, xs]
            T1cw = np.linalg.inv(T[j])
            Xc = Xw @ T1cw[:3, :3].T + T1cw[:3, 3]
            z = Xc[:, 2]
            uv = (Xc[:, :2] / np.maximum(z[:, None], 1e-6)) \
                * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
            vi = np.clip(uv[:, 1].astype(int), 0, H - 1)
            ui = np.clip(uv[:, 0].astype(int), 0, W - 1)
            r1 = np.linalg.norm(Xc, axis=1)
            occl = np.abs(depth1[vi, ui] - r1) < 0.1 * np.maximum(r1, 1.0)
            inb = (z > 0.2) & (uv[:, 0] >= 8) & (uv[:, 0] < W - 8) \
                & (uv[:, 1] >= 8) & (uv[:, 1] < H - 8) & occl
            kp1 = f1.kpts[f1.valid]
            d1 = f1.desc[f1.valid]
            dist = np.linalg.norm(uv[inb][:, None, :] - kp1[None], axis=-1)
            nn = dist.argmin(1)
            rep = dist.min(1) < 3.0
            dd = np.linalg.norm(d0[inb][rep] - d1[nn[rep]], axis=-1)
            sim = np.linalg.norm(d0[inb][rep][:, None, :] - d1[None], axis=-1)
            distract = np.where(dist[rep] > 10.0, sim, np.inf).min(1)
            print(f"[{H}x{W}] gap={gap}: visible={inb.sum()} "
                  f"repeat={rep.mean():.2f} "
                  f"trueL2 p50={np.median(dd):.3f} "
                  f"p90={np.percentile(dd, 90):.3f} "
                  f"distractorL2 p50={np.median(distract):.3f} "
                  f"frac_true<0.8={np.mean(dd < 0.8):.2f}", flush=True)
    return 0


def cmd_tri(a) -> int:
    """KF-pair match attrition through RANSAC + triangulation gates."""
    import jax.numpy as jnp

    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.core.frontend import (filter_matches_ransac,
                                              init_feature_pipeline)
    from simpleslam_tpu.ops.triangulation import (projection_matrix,
                                                  triangulate_two_view,
                                                  two_view_gates)

    frames, K, T_wc = _full_scale_frames(seed=a.seed, scene=a.scene)
    argv = ["--dataset", "kitti", "--headless", "--max_features", "2048"]
    if a.learned:
        argv += ["--use_lightglue", "--min_conf", str(a.min_conf)]
    cfg = parse_config(argv)
    det, mat = init_feature_pipeline(cfg)
    Kj = jnp.asarray(K, jnp.float32)
    for (i, j) in [(4, 10), (10, 16), (20, 26)]:
        f0 = det.fn(jnp.asarray(frames[i], jnp.float32))
        f1 = det.fn(jnp.asarray(frames[j], jnp.float32))
        m = mat.fn(f0, f1)
        n_raw = int(np.asarray(m.valid).sum())
        mr = filter_matches_ransac(f0, f1, m, cfg.ransac_thresh)
        T0 = np.linalg.inv(T_wc[i])
        T1 = np.linalg.inv(T_wc[j])
        P0 = projection_matrix(Kj, jnp.asarray(T0, jnp.float32))
        P1 = projection_matrix(Kj, jnp.asarray(T1, jnp.float32))
        uv0 = f0.kpts[mr.idx0]
        uv1 = f1.kpts[mr.idx1]
        X = triangulate_two_view(P0, P1, uv0, uv1)
        keep, why = two_view_gates(
            X, Kj, jnp.asarray(T0, jnp.float32), jnp.asarray(T1, jnp.float32),
            uv0, uv1, min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            min_parallax_deg=cfg.triangulation_parallax_min_deg,
            max_reproj_px=cfg.mvt_rep_err)
        keep = np.asarray(keep & mr.valid)
        why = {k: int(np.asarray(v & mr.valid).sum()) for k, v in why.items()}
        print(f"pair ({i},{j}): raw={n_raw} "
              f"ransac={int(np.asarray(mr.valid).sum())} "
              f"tri_keep={keep.sum()} why={why}", flush=True)
    return 0


def cmd_e2e(a) -> int:
    """Fused loop over the full-scale synthetic sequence, per-frame log."""
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.core.fused import (build_fused_step,
                                           make_fused_config, state_from_host)
    from simpleslam_tpu.run_slam import SLAMSystem

    frames, K, _ = _full_scale_frames(n=a.frames, yaw=a.yaw, seed=a.seed,
                                      scene=a.scene)
    n_frames = len(frames)
    argv = ["--dataset", "kitti", "--headless", "--no_viz3d",
            "--max_features", "2048", "--map_capacity", str(a.capacity)]
    if a.learned:
        argv += ["--use_lightglue", "--min_conf", str(a.min_conf)]
    if a.tri_kf2:
        argv += ["--tri_kf2"]
    if a.extra:
        argv += a.extra.split()
    cfg = parse_config(argv)
    H, W = frames.shape[1:3]

    system = SLAMSystem(cfg, K, None, img_hw=(H, W))
    prev_feats = system.process_frame(0, frames[0], None)
    start = 1
    while start < n_frames and not system.initialised:
        prev_feats = system.process_frame(start, frames[start], prev_feats)
        start += 1
    print(f"bootstrapped at {start - 1}; map={len(system.world_map)}",
          flush=True)

    log_cap = 1 << max(10, n_frames.bit_length())     # no log wrap on soaks
    fc = make_fused_config(cfg, (H, W), n_kp=int(prev_feats.kpts.shape[0]),
                           desc_dim=int(np.asarray(prev_feats.desc).shape[1]),
                           log_capacity=log_cap)
    match_fn = getattr(system.matcher, "fn_fast", None) or system.matcher.fn
    step = build_fused_step(fc, system.K, system.detector.fn, match_fn, None)
    state = state_from_host(system, fc, prev_feats)
    staged = None
    if a.stage_all:
        # Pre-upload every frame to HBM (u8, ~0.46 MB each) so the timed
        # loop measures the fused step, not the debug tunnel's ~150 MB/s
        # host->device path. 1200 KITTI-res frames = ~0.5 GB of HBM.
        print(f"staging {n_frames - start} frames on device "
              f"({(n_frames - start) * frames[0].nbytes / 1e6:.0f} MB)...",
              flush=True)
        t_up = time.perf_counter()
        staged = []
        for i in range(start, n_frames):
            staged.append(jax.device_put(jnp.asarray(frames[i])))
            if (i - start) % 100 == 99:
                _ = float(jnp.sum(staged[-1][0]))
                print(f"  staged {i - start + 1} "
                      f"({time.perf_counter() - t_up:.0f}s)", flush=True)
        _ = float(jnp.sum(staged[-1][0]))
        print(f"staged in {time.perf_counter() - t_up:.0f}s", flush=True)
    t0 = time.perf_counter()
    t_warm = None
    for i in range(start, n_frames):
        img = staged[i - start] if staged is not None \
            else jnp.asarray(frames[i])
        state = step(state, img)
        if i == start + 9:
            _ = float(jnp.sum(state.Tcw))      # force the first 10 frames
            t_warm = time.perf_counter()
    flags = np.asarray(state.log_flags)
    frames_log = np.asarray(state.log_frame)
    n = int(np.asarray(state.log_n))
    dt = time.perf_counter() - t0
    print(f"ran {n} frames in {dt:.1f}s (incl compile)")
    if t_warm is not None and n_frames - start > 20:
        sustained = (n_frames - start - 10) / (time.perf_counter() - t_warm)
        print(f"sustained (post-warm-up) {sustained:.2f} frames/s over "
              f"{n_frames - start - 10} frames")
    print("frame tracked kf n_inl n_new n_cand ba")
    for i in range(0, n, max(1, a.log_every)):
        f = flags[i]
        print(f"{frames_log[i]:5d} {int(f[0]):7d} {int(f[1]):2d}"
              f" {int(f[2]):5d} {int(f[3]):5d} {int(f[4]):6d} {int(f[5]):2d}")

    # ATE vs the generator's ground-truth trajectory (bootstrap frames from
    # the host map + fused-loop log)
    from simpleslam_tpu.tools.synth import make_trajectory
    from simpleslam_tpu.tools.trajectory_eval import ate_rmse

    T_wc = make_trajectory(n_frames, speed=0.5, yaw_rate_deg=a.yaw)
    est = {fi: np.asarray(p) for fi, p in
           zip(system.frame_ids, system.world_map.poses)}
    log_pose = np.asarray(state.log_pose)
    for i in range(n):
        if frames_log[i] >= 0:
            est[int(frames_log[i])] = log_pose[i]
    fids = sorted(est.keys())
    est_T = np.stack([est[f] for f in fids])
    np.savez("/tmp/diag_e2e_traj.npz", est_T=est_T, fids=np.asarray(fids),
             gt_T=T_wc[fids])
    ate, stats = ate_rmse(est_T, T_wc[fids][:, :3, :4], align="sim3")
    lost = n - int(flags[:n, 0].sum())
    print(f"ATE-RMSE (Sim3): {ate:.4f} m over {len(fids)} frames "
          f"(scale {stats.get('scale', 0.0):.3f}), {lost} lost, "
          f"map {int(np.asarray(state.n_points))} pts, "
          f"{int(np.asarray(state.kf_count))} KFs, "
          f"{int(np.asarray(state.compactions))} compactions")
    return 0


def cmd_ba(a) -> int:
    """Local-BA solves/s + iteration-count latency scaling."""
    import jax.numpy as jnp

    from simpleslam_tpu.ops.ba import BAProblem, ba_solve

    rngb = np.random.default_rng(0)
    P_, L_, E_ = 10, 2048, 16384
    pts = jnp.asarray(np.stack([rngb.uniform(-5, 5, L_),
                                rngb.uniform(-3, 3, L_),
                                rngb.uniform(4, 30, L_)], 1), jnp.float32)
    poses = jnp.asarray(np.tile(np.eye(4), (P_, 1, 1)), jnp.float32)
    poses = poses.at[:, 0, 3].set(jnp.arange(P_) * 0.3)
    cam_idx = jnp.asarray(rngb.integers(0, P_, E_), jnp.int32)
    pt_idx = jnp.asarray(rngb.integers(0, L_, E_), jnp.int32)
    Kb = jnp.asarray([[707.0, 0, 601.0], [0, 707.0, 183.0], [0, 0, 1.0]],
                     jnp.float32)
    pc = jnp.einsum("eij,ej->ei", poses[cam_idx][:, :3, :3], pts[pt_idx]) \
        + poses[cam_idx][:, :3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) * 707.0 + jnp.asarray([601.0, 183.0])
    uv = uv + jnp.asarray(rngb.normal(0, 0.5, (E_, 2)), jnp.float32)
    prob = BAProblem(poses=poses, points=pts, cam_idx=cam_idx, pt_idx=pt_idx,
                     uv=uv, e_valid=jnp.ones(E_, bool),
                     cam_free=jnp.ones(P_, bool).at[0].set(False),
                     pt_free=jnp.ones(L_, bool))
    out = ba_solve(prob, Kb, huber=2.0, max_iters=12)
    print(f"warm: cost {float(out[2]):.1f} -> {float(out[3]):.1f}, "
          f"good iters {int(out[4])}", flush=True)
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [ba_solve(prob._replace(uv=uv + jnp.float32(1e-6 * (r + 1))),
                         Kb, huber=2.0, max_iters=12)[3] for r in range(5)]
        tot = outs[0]
        for o in outs[1:]:
            tot = tot + o
        _ = float(tot)
        dt = time.perf_counter() - t0
        print(f"round {rep}: 5 solves in {dt:.3f}s -> {5 / dt:.2f} solves/s",
              flush=True)
    for it in (1, 4, 12):
        o = ba_solve(prob, Kb, huber=2.0, max_iters=it)
        _ = float(o[3])
        t0 = time.perf_counter()
        for _r in range(2):
            o = ba_solve(prob, Kb, huber=2.0, max_iters=it)
            _ = float(o[3])
        print(f"max_iters={it:2d}: {(time.perf_counter() - t0) / 2:.3f}s/solve",
              flush=True)
    return 0


def main(argv=None) -> int:
    from simpleslam_tpu.utils.platform import respect_platform_env
    respect_platform_env()
    p = argparse.ArgumentParser("diagnose")
    sub = p.add_subparsers(dest="cmd", required=True)
    spd = sub.add_parser("desc")
    for name in ("tri", "e2e"):
        sp = sub.add_parser(name)
        sp.add_argument("--learned", action="store_true", default=True)
        sp.add_argument("--classical", dest="learned", action="store_false")
        sp.add_argument("--min_conf", type=float, default=0.7)
        if name == "e2e":
            sp.add_argument("--tri_kf2", action="store_true")
            sp.add_argument("--frames", type=int, default=40)
            sp.add_argument("--yaw", type=float, default=0.3)
            sp.add_argument("--capacity", type=int, default=8192)
            sp.add_argument("--log_every", type=int, default=1,
                            help="print every Nth per-frame log row")
            sp.add_argument("--extra", default="",
                            help="extra run_slam CLI flags, space-separated")
            sp.add_argument("--stage_all", action="store_true",
                            help="pre-upload all frames to HBM so the timed "
                                 "loop excludes the debug tunnel's slow "
                                 "host->device path (long soaks)")
    sub.add_parser("ba")
    # held-out evaluation controls (VERDICT round-2 item 1: scene seeds >=
    # 100 and the 'boxes' family are OUTSIDE the training pool)
    for sp in (spd, *(s for s in sub.choices.values() if s is not spd)):
        sp.add_argument("--seed", type=int, default=0,
                        help="scene seed (training pool is seeds 0-3)")
        sp.add_argument("--scene", choices=("corridor", "boxes", "photo"),
                        default="corridor")
    a = p.parse_args(argv)
    _enable_cache()
    return {"desc": cmd_desc, "tri": cmd_tri,
            "e2e": cmd_e2e, "ba": cmd_ba}[a.cmd](a)


if __name__ == "__main__":
    raise SystemExit(main())
