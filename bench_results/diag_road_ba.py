#!/usr/bin/env python
"""road_long BA-kick experiments (r5). Modes via DIAG_MODE:
  debug   — per-KF BA move/cost/accept printout (SVO_DEBUG_BA=1)
  trust10 — ba_trust_t=0.10 (EuRoC-scale guard)
  noba    — use_ba=False
"""
import os, sys, json, dataclasses, time
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
mode = os.environ.get("DIAG_MODE", "base")
import jax, numpy as np
import bench
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate

N = int(os.environ.get("DIAG_FRAMES", "400"))
cfg = kitti_config()
if mode == "trust10":
    cfg = dataclasses.replace(cfg, ba_trust_t=0.10)
elif mode == "noba":
    cfg = dataclasses.replace(cfg, use_ba=False)
elif mode == "v2":      # 2x BA cadence
    cfg = dataclasses.replace(cfg, kf_dist_ratio=0.06)
elif mode == "v4":      # stereo refresh: seeds only
    cfg = dataclasses.replace(cfg, stereo_refresh_landmarks=False)
elif mode == "v24":
    cfg = dataclasses.replace(cfg, kf_dist_ratio=0.06,
                              stereo_refresh_landmarks=False)
elif mode == "v5":      # damped trust-region acceptance
    cfg = dataclasses.replace(cfg, ba_trust_clamp=True)
elif mode == "v5t6":    # damped + wider trust
    cfg = dataclasses.replace(cfg, ba_trust_clamp=True, ba_trust_t=0.6)
elif mode == "v6":      # refine convergence boost
    cfg = dataclasses.replace(cfg, refine_max_iters=20,
                              refine_irls_chunks=5)
elif mode == "v7":      # slower KF cadence (gauge walks slower)
    cfg = dataclasses.replace(cfg, kf_dist_ratio=0.20)
elif mode == "v8":      # wider window
    cfg = dataclasses.replace(cfg, max_keyframes=16)
elif mode == "v9":      # no motion prior (r4: prior locks in inflated vel)
    cfg = dataclasses.replace(cfg, refine_prior_t_sig=0.0)
elif mode == "v10":     # stronger live-disparity rows
    cfg = dataclasses.replace(cfg, refine_stereo_weight=4.0)
lefts, rights, gts = bench._render_sequence(cfg.camera, N, "road_long",
                                            "kitti", False)
run = jax.jit(lambda a, b: runner.run_sequence_scan(cfg, a, b))
t0 = time.time()
st, outs = run(lefts, rights)
ok = np.asarray(outs.tracking_ok)
print("compile+run s:", round(time.time() - t0, 1))
est = np.asarray(outs.T_wc); kf = np.asarray(outs.kf_inserted)
perr = np.linalg.norm(est[:, :, 3] - gts[:, :, 3], axis=1)
gt_step = np.linalg.norm(np.diff(gts[:, :, 3], axis=0), axis=1)
err = ate.ate_rmse(ate.positions(est), ate.positions(gts))
travel = float(np.sum(gt_step))
print(json.dumps({"mode": mode, "n": N, "ate": round(float(err), 3),
                  "pct": round(100 * float(err) / travel, 2),
                  "ok": round(float(ok.mean()), 3),
                  "kfs": int(kf.sum()),
                  "max_perr": round(float(perr.max()), 2)}))
