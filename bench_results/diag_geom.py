#!/usr/bin/env python
"""Per-frame error structure for a (config, scene, trajectory) combo.

Decomposes per-frame pose error into forward/lateral/vertical drift in the
CAMERA frame plus rotation error — scale drift shows up as a steady
forward-axis bias, alignment jitter as zero-mean noise (VERDICT r2 #1c:
root-cause KITTI-geom ATE).

Env: DIAG_CFG=kitti|default|stress  DIAG_SCENE=planes|road|clutter
     DIAG_TRAJ=arc|kitti|spin  DIAG_FRAMES=100
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_svo_tpu.config import SvoConfig, kitti_config, stress_config
from stereo_svo_tpu.engine import runner
from stereo_svo_tpu.eval import ate
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic

N = int(os.environ.get("DIAG_FRAMES", "100"))
cfg = {"kitti": kitti_config, "stress": stress_config,
       "default": SvoConfig}[os.environ.get("DIAG_CFG", "kitti")]()
if os.environ.get("DIAG_NOBA") == "1":
    import dataclasses
    cfg = dataclasses.replace(cfg, use_ba=False)
scene_kind = os.environ.get("DIAG_SCENE", "planes")
traj_kind = os.environ.get("DIAG_TRAJ", "arc")

cam = cfg.camera
scene = synthetic.get_scene(scene_kind, 0)
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      f"seq_{scene_kind}_{traj_kind}_{cam.width}x{cam.height}_{N}.npz")
if os.path.exists(_cache):
    _d = np.load(_cache)
    lefts, rights = jnp.asarray(_d["l"]), jnp.asarray(_d["r"])
    gts = list(_d["g"])
else:
    render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
    lefts, rights, gts = [], [], []
    for i in range(N):
        T = synthetic.trajectory_pose(jnp.asarray(i * 0.08, jnp.float32),
                                      traj_kind)
        l, r = render(T)
        lefts.append(l)
        rights.append(r)
        gts.append(np.asarray(T))
    lefts = jnp.stack(lefts)
    rights = jnp.stack(rights)
    np.savez(_cache, l=np.asarray(lefts), r=np.asarray(rights),
             g=np.stack(gts))

run = jax.jit(lambda l, r: runner.run_sequence_scan(cfg, l, r))
state, outs = run(lefts, rights)
jax.block_until_ready(outs.T_wc)

T_wc = np.asarray(outs.T_wc, np.float64)
gt = np.stack(gts).astype(np.float64)
ntr = np.asarray(outs.n_tracked)
kf = np.asarray(outs.kf_inserted)
md = np.asarray(outs.median_depth)
af = np.asarray(outs.align_inlier_frac)
ac = np.asarray(outs.align_cost)
rr = np.asarray(outs.refine_rms_px)
ns = np.asarray(outs.n_seeds)

err = ate.ate_rmse(ate.positions(T_wc), ate.positions(gt))
print(f"cfg={os.environ.get('DIAG_CFG','kitti')} scene={scene_kind} "
      f"traj={traj_kind}  ATE={err:.4f}  kfs={kf.sum()}")

# per-frame RELATIVE pose error in the camera frame (independent of global
# alignment): compare est vs gt frame-to-frame deltas
print(" f   dfwd_mm  dlat_mm  dvert_mm  drot_mrad  ntr  med_z  kf")
cum = np.zeros(3)
for i in range(1, N):
    def rel(Ts):
        Ra, ta = Ts[i - 1, :, :3], Ts[i - 1, :, 3]
        Rb, tb = Ts[i, :, :3], Ts[i, :, 3]
        return Ra.T @ Rb, Ra.T @ (tb - ta)
    Re, te = rel(T_wc)
    Rg, tg = rel(gt)
    dt = te - tg                      # camera frame: x lat, y vert, z fwd
    dR = Re.T @ Rg
    w = np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0],
                  dR[1, 0] - dR[0, 1]])
    ang = np.arctan2(0.5 * np.linalg.norm(w), 0.5 * (np.trace(dR) - 1))
    cum += dt
    if i % 5 == 0 or kf[i] or i >= int(os.environ.get('DIAG_ALL_FROM', '10000')):
        print(f"{i:3d}  {dt[2]*1e3:8.2f} {dt[0]*1e3:8.2f} {dt[1]*1e3:9.2f}"
              f" {ang*1e3:9.3f} {ntr[i]:4d} {md[i]:6.1f}  {int(kf[i])}"
              f" | ac {ac[i]:6.1f} inl {af[i]:.2f} rms {rr[i]:4.2f}"
              f" ns {ns[i]:3d}")
print(f"cumulative rel-t error (m): fwd={cum[2]:.4f} lat={cum[0]:.4f} "
      f"vert={cum[1]:.4f}")
