#!/usr/bin/env python
"""Root-cause KITTI-geometry ATE 0.0499 (VERDICT r2 #1c / weak #2).

Hypothesis: the EuRoC-ish arc trajectory drives the camera to ~2 m from
the near plane, where disparity (718.856 * 0.537 / 2 ~= 193 px) exceeds
kitti_config's stereo_max_disp=128 — near features lose stereo depth and
scale drifts. Variants isolate the knob, then measure the new
road-scene + forward-dominant 'kitti' trajectory combination.
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import bench
from stereo_svo_tpu.config import kitti_config

RUNS = [
    # name, cfg-overrides, scene, traj
    ("kitti_arc_planes_disp128", {}, "planes", "arc"),
    ("kitti_arc_planes_disp224", {"stereo_max_disp": 224}, "planes", "arc"),
    ("kitti_road_fwd_disp128", {}, "road", "kitti"),
]

for name, overrides, scene, traj in RUNS:
    cfg = dataclasses.replace(kitti_config(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=2, cfg=cfg,
                                        scene_kind=scene, traj_kind=traj)
    print(json.dumps({
        "variant": name, "fps": round(fps, 1), "ate_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 6),
        "tracking_ok": round(ok, 3), "keyframes": n_kf}), flush=True)
