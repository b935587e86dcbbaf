#!/usr/bin/env python
"""Isolate the KITTI-geometry forward-scale runaway: which mechanism?

Variants over (road, kitti-trajectory): relative consistency gate (does
re-anchoring scale from stereo fix it?), BA off (are the KF-frame spikes
BA's?), both.
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import bench
from stereo_svo_tpu.config import kitti_config

RUNS = [
    ("default", {}),
    ("no_stereo_refresh", {"stereo_refresh_window": 0}),
]

for name, overrides in RUNS:
    cfg = dataclasses.replace(kitti_config(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=1, cfg=cfg,
                                        scene_kind="road", traj_kind="kitti")
    print(json.dumps({
        "variant": name, "fps": round(fps, 1), "ate_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 6),
        "tracking_ok": round(ok, 3), "keyframes": n_kf}), flush=True)
