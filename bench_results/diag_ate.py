#!/usr/bin/env python
"""Diagnose the bench sequence frame by frame: where does tracking dip and
where does the trajectory error come from? (VERDICT round-1 item 1)."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_svo_tpu.config import SvoConfig
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.io import synthetic

N = int(os.environ.get("DIAG_FRAMES", "100"))

cfg = SvoConfig()
cam = cfg.camera
scene = synthetic.default_scene(0)
render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
lefts, rights, gts = [], [], []
for i in range(N):
    T = synthetic.trajectory_pose(jnp.asarray(i * 0.08, jnp.float32))
    l, r = render(T)
    lefts.append(l)
    rights.append(r)
    gts.append(np.asarray(T))
lefts = jnp.stack(lefts)
rights = jnp.stack(rights)

run = jax.jit(lambda l, r: runner.run_sequence_scan(cfg, l, r))
state, outs = run(lefts, rights)
jax.block_until_ready(outs.T_wc)

T_wc = np.asarray(outs.T_wc)
gt = np.stack(gts)
ok = np.asarray(outs.tracking_ok)
ntr = np.asarray(outs.n_tracked)
kf = np.asarray(outs.kf_inserted)
nl = np.asarray(outs.n_landmarks)
ns = np.asarray(outs.n_seeds)
ac = np.asarray(outs.align_cost)
af = np.asarray(outs.align_inlier_frac)
rr = np.asarray(outs.refine_rms_px)
md = np.asarray(outs.median_depth)

# raw (unaligned) and per-frame error after global alignment
p_est = ate.positions(T_wc)
p_gt = ate.positions(gt)
err = ate.ate_rmse(p_est, p_gt)
# aligned per-frame residuals
mu_e, mu_g = p_est.mean(0), p_gt.mean(0)
E, G = p_est - mu_e, p_gt - mu_g
U, S, Vt = np.linalg.svd(G.T @ E)
D = np.eye(3)
D[2, 2] = np.sign(np.linalg.det(U @ Vt))
R = U @ D @ Vt
res = np.linalg.norm((R @ E.T).T - G, axis=1)

print(f"ATE={err:.4f}  ok={ok.mean():.3f}  kfs={kf.sum()}")
for i in range(N):
    flag = "" if ok[i] else "  <-- FAIL"
    if not ok[i] or res[i] > 2 * err or kf[i]:
        print(f"f{i:3d} ok={int(ok[i])} kf={int(kf[i])} ntr={ntr[i]:3d} "
              f"nl={nl[i]:3d} ns={ns[i]:3d} cost={ac[i]:7.1f} "
              f"inl={af[i]:.2f} rms={rr[i]:5.2f} med_z={md[i]:5.2f} "
              f"res={res[i]:.4f}{flag}")
