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

    # Throughput mode: ONE dispatch extracts a batch of frames and matches
    # the consecutive pairs (the pipeline's natural TPU shape). Completion is
    # forced by a device->host transfer of a digest that depends on every
    # output — this machine's tunneled TPU platform returns from
    # block_until_ready before execution finishes, and separate per-pair
    # dispatches would hide behind its async queue, so batched + forced
    # transfer is the only honest measurement.
    B = 4 if small else 8           # frames per dispatch -> B-1 pairs

    @jax.jit
    def bench_batch(pa, pl, imgs):
        feats = aliked_mod.extract_batch(a_model, pa, imgs, max_kp)   # (B,...)
        f0 = jax.tree.map(lambda x: x[:-1], feats)
        f1 = jax.tree.map(lambda x: x[1:], feats)
        m = lg_mod.match_batch(l_model, pl, f0, f1, (H, W), 0.7)
        digest = (jnp.sum(m.idx0 * m.valid) + jnp.sum(m.idx1)
                  + jnp.sum(feats.kpts)).astype(jnp.float32)
        return digest, jnp.sum(m.valid.astype(jnp.int32), axis=1)

    batch = images[:B]
    log("compiling...")
    t0 = time.perf_counter()
    out = bench_batch(a_params, l_params, batch)
    digest0 = float(out[0])
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s "
        f"(digest {digest0:.1f})")

    # measured run on perturbed inputs (fresh values, same shapes)
    reps = 2 if small else 4
    times = []
    for r in range(reps):
        b = batch * jnp.float32(1.0 + 1e-6 * (r + 1))
        t0 = time.perf_counter()
        out = bench_batch(a_params, l_params, b)
        _ = float(out[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_pairs = B - 1
    fps = n_pairs / dt
    log(f"steady state: {n_pairs} pairs in {dt:.3f}s (best of {reps}) -> "
        f"{fps:.2f} pairs/s ({max_kp} kpts, {n_layers} LightGlue layers, "
        f"{H}x{W})")

    print(json.dumps({
        "metric": "aliked_lightglue_e2e_pair_fps_kitti_synth",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
