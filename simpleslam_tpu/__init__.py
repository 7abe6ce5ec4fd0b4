"""simpleslam_tpu — a TPU-native (JAX/XLA/Pallas) monocular SLAM framework.

A from-scratch rebuild of the capabilities of ``KlrShaK/opencv-SimpleSLAM``
(reference mounted at /root/reference), designed TPU-first:

- ``ops``      — batched geometry kernels (SE(3), RANSAC, DLT triangulation,
                 PnP, Lucas-Kanade, Schur-complement bundle adjustment) in
                 pure JAX with Pallas kernels for the hot paths.
- ``models``   — learned front-end: ALIKED-style keypoint CNN and a
                 LightGlue-style attention matcher, in JAX.
- ``core``     — the SLAM runtime: map / keyframe state, two-view bootstrap,
                 frame-to-map tracking, keyframe policy, triangulation glue.
- ``data``     — dataset loaders (KITTI / Malaga / TUM-RGBD / custom video),
                 calibration, ground truth (host side).
- ``parallel`` — device-mesh sharding helpers (shard_map batched extraction /
                 matching, distributed BA reductions).
- ``viz``      — host-side visualization (2D trajectory, track overlays, UI).
- ``tools``    — trajectory evaluation (ATE / RTE), benchmarks.

The public surface mirrors the reference pipeline's behavior (same thresholds,
same pose conventions: poses are T_cw camera-from-world, x_cam = R @ X_w + t)
while the implementation is idiomatic JAX: static shapes, masked fixed-size
state, batched hypothesis RANSAC, on-device LM solvers.
"""

__version__ = "0.1.0"
