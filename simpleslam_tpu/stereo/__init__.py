"""Stereo visual odometry (fills the reference's empty
slam/stereo/ROUGHstereo_tracker.py stub with a working metric-scale
tracker built on the JAX disparity + PnP ops)."""
from .tracker import StereoTracker  # noqa: F401
