"""Batched TPU-native geometry / vision ops (pure JAX + Pallas)."""
