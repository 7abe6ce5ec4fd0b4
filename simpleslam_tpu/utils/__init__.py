"""Shared utilities: precision control, logging, profiling, serialization."""
from .precision import highest_precision, HIGHEST  # noqa: F401
