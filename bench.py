"""Benchmark: ALIKED + LightGlue frame-pair throughput on KITTI-sized frames.

This is the reference pipeline's hot path (SURVEY.md §3: ALIKED forward per
frame + LightGlue forward per pair dominate) and the BASELINE.md north-star
metric: >= 60 FPS end-to-end ALIKED+LightGlue on KITTI-00 on one TPU v5e.
Here we measure the steady-state jitted extract+match rate on synthetic
KITTI-resolution frames (no real datasets on this machine); the geometry
stages (PnP/triangulation/BA) amortize over keyframes and are benched in
tests/benches separately.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/60}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    small = os.environ.get("SLAM_BENCH_SMALL") == "1"
    platform = jax.devices()[0].platform
    log(f"bench on {jax.devices()[0]} (platform={platform})")

    from simpleslam_tpu.models import aliked as aliked_mod
    from simpleslam_tpu.models import lightglue as lg_mod
    from simpleslam_tpu.tools.synth import CorridorScene, make_trajectory

    if small:
        H, W, max_kp, n_layers, n_frames = 96, 160, 256, 2, 4
    else:
        H, W, max_kp, n_layers, n_frames = 376, 1232, 2048, 9, 12

    log("rendering synthetic KITTI-resolution frames...")
    scene = CorridorScene(seed=0, hw=(H, W))
    T = make_trajectory(n_frames, speed=0.5)
    frames = np.stack([scene.render(T[i]) for i in range(n_frames)])
    images = jnp.asarray(frames[..., None], jnp.float32) / 255.0

    a_model, a_params = aliked_mod.init_aliked(
        jax.random.PRNGKey(0), desc_dim=128, image_hw=(H, W))
    l_model, l_params = lg_mod.init_lightglue(
        jax.random.PRNGKey(1), desc_dim=128, n_kp=max_kp, dim=256, heads=4,
        n_layers=n_layers)

    @jax.jit
    def pair_step(pa, pl, im_pair):
        feats = aliked_mod.extract_batch(a_model, pa, im_pair, max_kp)
        f0 = jax.tree.map(lambda x: x[0], feats)
        f1 = jax.tree.map(lambda x: x[1], feats)
        P, _, _ = l_model.apply(
            pl, f0.kpts[None], f0.desc[None], f0.valid[None],
            f1.kpts[None], f1.desc[None], f1.valid[None], (H, W))
        m = lg_mod.matches_from_assignment(P[0], 0.7)
        return m.idx0, m.idx1, m.valid

    log("compiling...")
    t0 = time.perf_counter()
    out = pair_step(a_params, l_params, images[0:2])
    jax.block_until_ready(out)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    # steady state: cycle over consecutive pairs
    n_iters = 6 if small else 30
    t0 = time.perf_counter()
    for i in range(n_iters):
        j = i % (n_frames - 1)
        out = pair_step(a_params, l_params,
                        jax.lax.stop_gradient(images[j:j + 2]))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    log(f"steady state: {n_iters} pairs in {dt:.2f}s -> {fps:.2f} pairs/s "
        f"({max_kp} kpts, {n_layers} LightGlue layers, {H}x{W})")

    print(json.dumps({
        "metric": "aliked_lightglue_e2e_pair_fps_kitti_synth",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
