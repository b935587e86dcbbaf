#!/usr/bin/env python
"""Diagnose stress-config ATE (VERDICT r2 #1b): which knob pushes the
stress config's ATE over the 0.02 gate, and what does fixing it cost?

Runs bench._run on stress-config variants and prints one JSON line each.
"""

import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import bench
from stereo_svo_tpu.config import stress_config

VARIANTS = {
    "stress_default": {},
    "stress_minlvl0": {"align_min_level": 0},
    "stress_minlvl0_bf16": {"align_min_level": 0, "dtype": "bfloat16"},
    "stress_bf16": {"dtype": "bfloat16"},
}

for name, overrides in VARIANTS.items():
    cfg = dataclasses.replace(stress_config(), **overrides)
    fps, err, n_kf, ok, rp, _tim = bench._run(100, repeats=2, cfg=cfg)
    print(json.dumps({
        "variant": name, "fps": round(fps, 1), "ate_m": round(err, 4),
        "rpe_t_m": round(rp[0], 5), "rpe_r_rad": round(rp[1], 6),
        "tracking_ok": round(ok, 3), "keyframes": n_kf}), flush=True)
