"""Device-mesh parallelism: sharded batched extraction/matching and
distributed training-step helpers (jax.sharding over ICI; the reference has
no distributed layer at all — SURVEY.md §2 'parallelism inventory: none')."""
from .mesh import make_mesh  # noqa: F401
from .batch import sharded_extract_and_match  # noqa: F401
