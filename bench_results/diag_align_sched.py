#!/usr/bin/env python
"""Align iteration-schedule race (VERDICT r2 #2: drive align < 0.5 ms).

The align loop's cost = (#sampling passes) x (sample+einsum) +
(#refreshes) x (serial 6x6 solve latency). Coarse levels converge in 2-4
iterations under the constant-velocity prior; a coarse->fine schedule cuts
both terms. Full-pipeline fps + ATE per schedule (accuracy-gated choice).
"""
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import bench
from stereo_svo_tpu.config import SvoConfig

RUNS = [
    ("baseline_10x4", None),
    ("sched_3_3_6_8", (3, 3, 6, 8)),
    ("sched_4_4_6_10", (4, 4, 6, 10)),
    ("sched_2_3_4_8", (2, 3, 4, 8)),
]

for name, sched in RUNS:
    cfg = dataclasses.replace(SvoConfig(), align_iters_per_level=sched)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=2, cfg=cfg)
    print(json.dumps({
        "variant": name, "fps": round(fps, 1), "ate_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "tracking_ok": round(ok, 3),
        "keyframes": n_kf}), flush=True)
