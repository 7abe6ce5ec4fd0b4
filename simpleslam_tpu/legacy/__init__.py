"""Legacy pipeline variants, re-implemented over the TPU-native ops:

  * :mod:`run_ef`  — per-frame E-vs-H 2D-2D tracking with the median-parallax
    rotation-only heuristic (reference: slam/monocular/main.py:206-681).
  * :mod:`run_klt` — pyramidal KLT tracking with forward-backward gating and
    descriptor-match re-seeding (reference: slam/monocular/main4.py:206-764).
"""
