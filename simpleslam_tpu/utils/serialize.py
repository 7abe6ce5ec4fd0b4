"""Checkpoint / resume: map + trajectory + keyframe serialization.

The reference has NO pipeline-state persistence (SURVEY.md §5: "Checkpoint /
resume: none"); the TPU build adds it: the full Map (points, colours,
observations), the per-frame trajectory, keyframe poses/features/thumbnails
and the config snapshot round-trip through one compressed npz + the native
LZ4 container for thumbnails. Model params go through orbax separately.
"""
from __future__ import annotations

import io
import json
from dataclasses import asdict
from typing import List, Optional, Tuple

import numpy as np

from simpleslam_tpu.core.keyframe import Keyframe
from simpleslam_tpu.core.map import Map
from simpleslam_tpu.core.types import Features


def save_state(path: str, world_map: Map, kfs: List[Keyframe],
               cfg=None, frame_ids: Optional[List[int]] = None) -> None:
    pids = world_map.point_ids()
    obs_flat = []      # (pid, kf_idx, kp_idx) rows; descriptors rebuilt from KFs
    obs_desc = []
    for pid in pids:
        for f, kp, d in world_map.points[pid].observations:
            obs_flat.append((pid, f, kp))
            obs_desc.append(np.asarray(d, np.float32).reshape(-1))
    max_d = max((len(d) for d in obs_desc), default=0)
    desc_arr = np.zeros((len(obs_desc), max_d), np.float32)
    for i, d in enumerate(obs_desc):
        desc_arr[i, :len(d)] = d

    data = {
        "positions": world_map.get_point_array(),
        "colours": world_map.get_color_array(),
        "pids": np.asarray(pids, np.int64),
        "created_kf": np.asarray(
            [world_map.points[p].keyframe_idx for p in pids], np.int32),
        "poses": np.stack(world_map.poses) if world_map.poses else np.zeros((0, 4, 4)),
        "keyframe_indices": np.asarray(world_map.keyframe_indices, np.int64),
        "obs": np.asarray(obs_flat, np.int64).reshape(-1, 3),
        "obs_desc": desc_arr,
        "frame_ids": np.asarray(frame_ids or [], np.int64),
        "n_kfs": np.asarray([len(kfs)]),
    }
    for i, kf in enumerate(kfs):
        data[f"kf{i}_meta"] = np.frombuffer(
            json.dumps({"idx": kf.idx, "frame_idx": kf.frame_idx,
                        "path": kf.path}).encode(), np.uint8)
        data[f"kf{i}_pose"] = np.asarray(kf.pose)
        data[f"kf{i}_kpts"] = np.asarray(kf.feats.kpts)
        data[f"kf{i}_desc"] = np.asarray(kf.feats.desc)
        data[f"kf{i}_scores"] = np.asarray(kf.feats.scores)
        data[f"kf{i}_valid"] = np.asarray(kf.feats.valid)
        data[f"kf{i}_thumb"] = np.frombuffer(kf.thumb, np.uint8)
    if cfg is not None:
        data["config_json"] = np.frombuffer(
            json.dumps(asdict(cfg)).encode(), np.uint8)
    np.savez_compressed(path, **data)


def load_state(path: str) -> Tuple[Map, List[Keyframe], Optional[dict], List[int]]:
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    m = Map()
    for pose, in zip(z["poses"]):
        m.poses.append(np.asarray(pose))
    m.keyframe_indices = [int(v) for v in z["keyframe_indices"]]

    pids = z["pids"]
    # re-add points preserving ids (Map assigns sequential ids; remap below)
    remap = {}
    if len(pids):
        new_ids = m.add_points(z["positions"], z["colours"])
        for old, new, ckf in zip(pids, new_ids, z["created_kf"]):
            remap[int(old)] = int(new)
            m._created_kf[m._row[int(new)]] = int(ckf)
    for (pid, f, kp), d in zip(z["obs"], z["obs_desc"]):
        m.points[remap[int(pid)]].add_observation(int(f), int(kp), d)

    kfs: List[Keyframe] = []
    for i in range(int(z["n_kfs"][0])):
        meta = json.loads(bytes(z[f"kf{i}_meta"]).decode())
        feats = Features(
            kpts=jnp.asarray(z[f"kf{i}_kpts"]),
            desc=jnp.asarray(z[f"kf{i}_desc"]),
            scores=jnp.asarray(z[f"kf{i}_scores"]),
            valid=jnp.asarray(z[f"kf{i}_valid"]))
        kfs.append(Keyframe(meta["idx"], meta["frame_idx"], meta["path"],
                            feats, np.asarray(z[f"kf{i}_pose"]),
                            bytes(z[f"kf{i}_thumb"])))
    cfg = None
    if "config_json" in z:
        cfg = json.loads(bytes(z["config_json"]).decode())
    return m, kfs, cfg, [int(v) for v in z["frame_ids"]]


def save_model_params(path: str, params) -> None:
    """Model parameters via orbax (directory checkpoint)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)


def load_model_params(path: str, template):
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, template)
