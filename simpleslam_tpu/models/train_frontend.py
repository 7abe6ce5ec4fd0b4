"""Train the learned front-end (ALIKED + LightGlue) on synthetic homography
pairs and checkpoint it for the pipeline.

No pretrained weights can reach this machine (zero egress), so this CLI
makes the learned path REAL: self-supervised training (models/train.py
losses) at pipeline-scale hyperparameters, checkpointed via orbax into
``checkpoints/learned_frontend`` — which ``models.pipeline`` loads
automatically when present.

Run (TPU): python -m simpleslam_tpu.models.train_frontend --steps 600
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# pipeline-scale architecture (must match models/pipeline.py)
DESC_DIM = 128
DIM = 256
HEADS = 4
N_LAYERS = 9
CKPT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "checkpoints",
    "learned_frontend")


def main(argv=None) -> int:
    p = argparse.ArgumentParser("train_frontend")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=[144, 256])
    p.add_argument("--points", type=int, default=96)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", default=CKPT_DIR)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scene_views", type=int, default=160,
                   help="Pre-rendered 3-D views in the scene-pair pool")
    p.add_argument("--scene_frac", type=float, default=0.5,
                   help="Fraction of steps trained on scene pairs (real "
                        "viewpoint change + parallax) vs homography pairs")
    p.add_argument("--render_hw", type=int, nargs=2, default=None,
                   help="Render scene views at this resolution and train on "
                        "random --hw crops (match the pipeline's pixel-scale "
                        "appearance, e.g. 376 1232 for KITTI)")
    p.add_argument("--families", default="corridor",
                   help="comma-separated scene families for the pair pool "
                        "(corridor,boxes) — alternated across scene blocks")
    p.add_argument("--scenes", type=int, default=4,
                   help="number of scene blocks in the pair pool")
    p.add_argument("--real_frac", type=float, default=0.0,
                   help="fraction of steps trained on homography pairs over "
                        "REAL photographs (models/train.PhotoPairPool; the "
                        "training half of the real-image corpus — real "
                        "sensor statistics the renderer cannot produce)")
    p.add_argument("--init_from", default=None,
                   help="warm-start from an existing checkpoint dir "
                        "(same pinned topology) instead of random init — "
                        "fine-tuning, e.g. adding real-photo robustness to "
                        "a converged synthetic checkpoint without paying "
                        "full training or risking its synthetic quality")
    a = p.parse_args(argv)

    from simpleslam_tpu.models import train as train_mod
    from simpleslam_tpu.utils.platform import enable_compile_cache

    enable_compile_cache()
    H, W = a.hw
    a_model, l_model, tx, state = train_mod.make_train_state(
        jax.random.PRNGKey(a.seed), lr=a.lr, desc_dim=DESC_DIM,
        n_kp=a.points, dim=DIM, n_layers=N_LAYERS, image_hw=(H, W),
        total_steps=a.steps)
    if a.init_from:
        import orbax.checkpoint as ocp

        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state.params)
        params0 = ocp.StandardCheckpointer().restore(
            os.path.abspath(a.init_from), target)
        state = state._replace(params=params0)
        print(f"warm-started from {a.init_from}", flush=True)
    step_fn = train_mod.make_train_step(a_model, l_model, tx, (H, W))

    rhw = tuple(a.render_hw) if a.render_hw else (H, W)
    print(f"rendering scene-pair pool ({a.scene_views} views at {rhw}, "
          f"training on {H}x{W} crops)...", flush=True)
    pool = train_mod.ScenePairPool((H, W), n_views=a.scene_views, seed=a.seed,
                                   render_hw=rhw, n_scenes=a.scenes,
                                   families=tuple(a.families.split(",")))
    photo_pool = None
    if a.real_frac > 0:
        photo_pool = train_mod.PhotoPairPool(
            (H, W), train_mod.train_photo_paths(), seed=a.seed)
        print(f"real-photo pool: {len(photo_pool.imgs)} images/pre-scales "
              f"({a.real_frac:.0%} of steps)", flush=True)
    rng = np.random.default_rng(a.seed + 2)

    key = jax.random.PRNGKey(a.seed + 1)
    t0 = time.perf_counter()
    for i in range(a.steps):
        u = rng.random()
        if photo_pool is not None and u < a.real_frac:
            batch = photo_pool.batch(rng, a.batch, a.points)
        elif u < a.real_frac + (1.0 - a.real_frac) * a.scene_frac:
            batch = pool.batch(rng, a.batch, a.points)
        else:
            batch = train_mod.synthetic_pair_batch(
                jax.random.fold_in(key, i), B=a.batch, H=H, W=W,
                G=a.points)
            batch = {k: np.asarray(v) for k, v in batch.items()
                     if k != "Hmats"}
        batch = train_mod.photometric_augment(rng, batch)
        state, metrics = step_fn(state, batch)
        if i % 100 == 0 or i == a.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"step {i:5d}  total {m['total']:.4f}  desc {m['desc']:.4f}"
                  f"  match {m['match']:.4f}  rep {m['rep']:.4f}"
                  f"  peak {m.get('peak', 0.0):.4f}"
                  f"  sig {m.get('sig', 0.0):.4f}"
                  f"  ({time.perf_counter() - t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(a.out),
              jax.tree.map(np.asarray, state.params), force=True)
    ckpt.wait_until_finished()
    print(f"saved checkpoint to {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
