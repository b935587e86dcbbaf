#!/usr/bin/env python
"""Road runaway: does fresher stereo (higher KF rate) pin scale?"""
import dataclasses, json, sys
sys.path.insert(0, "/root/repo")
import bench
from stereo_svo_tpu.config import kitti_config

RUNS = [
    ("kfdist05", {"kf_dist_ratio": 0.05}),
    ("kfdist05_mintrack120", {"kf_dist_ratio": 0.05, "kf_min_tracked": 120}),
    ("kfdist03_mintrack120", {"kf_dist_ratio": 0.03, "kf_min_tracked": 120}),
]
for name, overrides in RUNS:
    cfg = dataclasses.replace(kitti_config(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=1, cfg=cfg,
                                        scene_kind="road", traj_kind="kitti")
    print(json.dumps({"variant": name, "fps": round(fps,1), "ate_m": round(err,4),
        "rpe_t_m": round(rp[0],5), "tracking_ok": round(ok,3), "keyframes": n_kf}), flush=True)
