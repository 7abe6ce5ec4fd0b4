"""Learned front-end models (JAX/flax): ALIKED-style keypoint CNN and a
LightGlue-style attention matcher, replacing the reference's torch/CUDA
pipeline (reference: slam/core/features_utils.py:6-11,24-26)."""
