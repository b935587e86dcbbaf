#!/usr/bin/env python
"""Where does the 700-frame road_long run lose tracking? Per-frame metric
dump from the scan outputs (VERDICT r3 next #2 debugging)."""
import os, sys, json
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
import jax, numpy as np
import bench
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate

cfg = kitti_config()
lefts, rights, gts = bench._render_sequence(cfg.camera, 700, "road_long",
                                            "kitti", False)
run = jax.jit(lambda a, b: runner.run_sequence_scan(cfg, a, b))
st, outs = run(lefts, rights)
ok = np.asarray(outs.tracking_ok); nt = np.asarray(outs.n_tracked)
ns = np.asarray(outs.n_seeds); nl = np.asarray(outs.n_landmarks)
md = np.asarray(outs.median_depth); kf = np.asarray(outs.kf_inserted)
est = np.asarray(outs.T_wc)
perr = np.linalg.norm(est[:, :, 3] - gts[:, :, 3], axis=1)
bad = np.where(~ok)[0]
print("first_bad:", bad[:20].tolist())
print("n_bad:", len(bad))
for f in range(0, 700, 25):
    print(json.dumps({"f": f, "ok": int(ok[f]), "trk": int(nt[f]),
                      "seed": int(ns[f]), "lm": int(nl[f]),
                      "med_z": round(float(md[f]), 1),
                      "kf": int(kf[:f+1].sum()),
                      "perr": round(float(perr[f]), 3)}))
