"""Per-branch FLOP accounting for the fused step (executed-average MFU).

XLA cost analysis of the real fused program counts BOTH sides of every
``lax.cond`` — the keyframe burst AND the skip path — so the static
FLOPs/frame bench.py reports is an upper bound on executed work (VERDICT r3
weak-2). This tool lowers the branch-forced program variants
(``core.fused.build_fused_step(force_branch=...)``) and prints ONE JSON
line with the per-frame-class FLOP counts:

  {"static": F, "skip": F_skip, "eval": F_eval, "kf": F_kf}

  static — the real program (both cond branches counted; what bench.py's
           TPU-side analysis also sees),
  skip   — cooldown fast path (no KF evaluation, no burst),
  eval   — KF candidate evaluated (second matcher call) but not promoted,
  kf     — full keyframe burst (insert + triangulate + local BA).

bench.py runs this as a ``JAX_PLATFORMS=cpu`` subprocess: the axon TPU
platform exposes no pre-compile (lowered) cost analysis and three extra
remote compiles would cost minutes each, while CPU-lowered analysis is
seconds and counts the same model FLOPs. bench.py then weights the classes
by the per-class frame counts observed in the timed run (log_flags columns
1 'kf' and 6 'considered') and scales its TPU static count by the
executed/static ratio measured here, keeping one consistent FLOP basis.

Usage: python -m simpleslam_tpu.tools.fused_cost '<json spec>'
  spec = {"argv": [...config argv...], "hw": [H, W], "n_kp": N,
          "desc_dim": D, "desc_dtype": "float32"}
"""
from __future__ import annotations

import json
import sys


def branch_flops(spec: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simpleslam_tpu.config import parse_config
    from simpleslam_tpu.core import frontend
    from simpleslam_tpu.core.fused import (abstract_state, build_fused_step,
                                           make_fused_config)

    cfg = parse_config(list(spec["argv"]))
    H, W = int(spec["hw"][0]), int(spec["hw"][1])
    K = np.asarray(spec.get("K") or [[707.0, 0, W / 2.0],
                                     [0, 707.0, H / 2.0], [0, 0, 1.0]],
                   np.float64)
    detector, matcher = frontend.init_feature_pipeline(cfg)
    match_fn = getattr(matcher, "fn_fast", None) or matcher.fn
    fc = make_fused_config(cfg, (H, W), n_kp=int(spec["n_kp"]),
                           desc_dim=int(spec["desc_dim"]),
                           log_capacity=int(spec.get("log_capacity", 1024)))
    desc_dtype = jnp.dtype(spec.get("desc_dtype", "float32"))
    state = abstract_state(fc, desc_dtype)
    img = jnp.zeros((H, W), jnp.uint8)   # bench stages grayscale frames

    out = {}
    for name, force in (("static", None), ("skip", "skip"),
                        ("eval", "eval"), ("kf", "kf")):
        step = build_fused_step(fc, K, detector.fn, match_fn, None,
                                force_branch=force)
        ca = step.lower(state, img).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        f = (ca or {}).get("flops")
        out[name] = float(f) if f else None
    return out


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    spec = json.loads(sys.argv[1])
    print(json.dumps(branch_flops(spec)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
