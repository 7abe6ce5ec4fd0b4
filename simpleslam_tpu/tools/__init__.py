"""Evaluation + dataset tooling (ATE/RTE metrics, synthetic sequences)."""
