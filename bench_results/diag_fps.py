#!/usr/bin/env python
"""Which r3 feature costs how much fps on the EuRoC-geometry bench?"""
import dataclasses, json, sys
sys.path.insert(0, "/root/repo")
import bench
from stereo_svo_tpu.config import SvoConfig

RUNS = [
    ("r3_default", {}),
    ("no_stereo_refresh", {"stereo_refresh_window": 0}),
    ("no_rot_variants", {"pr_rot_variants": 0}),
    ("no_prior", {"refine_prior_t_sig": 0.0}),
    ("no_all_three", {"stereo_refresh_window": 0, "pr_rot_variants": 0,
                      "refine_prior_t_sig": 0.0}),
]
for name, overrides in RUNS:
    cfg = dataclasses.replace(SvoConfig(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=3, cfg=cfg)
    print(json.dumps({"variant": name, "fps": round(fps,1),
        "ate_m": round(err,4), "tracking_ok": round(ok,3),
        "keyframes": n_kf}), flush=True)
