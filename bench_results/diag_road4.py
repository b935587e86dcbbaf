#!/usr/bin/env python
"""Road runaway: KLT template-scale mismatch under forward motion?"""
import dataclasses, json, sys
sys.path.insert(0, "/root/repo")
import bench
from stereo_svo_tpu.config import kitti_config

RUNS = [
    ("affine_warp", {"klt_affine_warp": True}),
    ("outlier8", {"refine_outlier_px": 8.0}),
    ("affine_warp_outlier8", {"klt_affine_warp": True, "refine_outlier_px": 8.0}),
]
for name, overrides in RUNS:
    cfg = dataclasses.replace(kitti_config(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=1, cfg=cfg,
                                        scene_kind="road", traj_kind="kitti")
    print(json.dumps({"variant": name, "fps": round(fps,1), "ate_m": round(err,4),
        "rpe_t_m": round(rp[0],5), "tracking_ok": round(ok,3), "keyframes": n_kf}), flush=True)
