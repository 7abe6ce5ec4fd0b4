"""SLAM runtime core: typed state containers, map, keyframes, tracking."""
