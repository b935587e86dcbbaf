#!/usr/bin/env python
"""What does window BA see on the road run? Run to frame N, then inspect
per-(k,n) reprojection + stereo residuals of the ACTIVE BA rows, and what
one bundle_adjust call does to the newest keyframe vs ground truth."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from stereo_svo_tpu.backend import ba as ba_mod
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import state as state_mod
from stereo_svo_tpu.engine.step import make_step, world_points
from stereo_svo_tpu.engine import step as step_mod
from stereo_svo_tpu.geometry import camera as cam_mod, se3
from stereo_svo_tpu.engine.state import STATUS_LANDMARK

cfg = kitti_config()
cam = cfg.camera
d = np.load("/root/repo/bench_results/seq_road_kitti_1241x376_100.npz")
L, R, gt = jnp.asarray(d["l"]), jnp.asarray(d["r"]), d["g"]
NF = int(os.environ.get("DIAG_TO", "64"))

step = make_step(cfg)
def chunk(st, l, r):
    return jax.lax.scan(lambda s, im: step(s, im[0], im[1]), st, (l, r))
st, _ = jax.jit(chunk)(state_mod.init_state(cfg), L[:NF], R[:NF])
jax.block_until_ready(st.T_cw)

X = world_points(cfg, st)
X_mask = np.asarray(st.status) == STATUS_LANDMARK
T_kw = se3.inverse(st.kf_T_wk)
x_c = np.asarray(se3.transform(jnp.asarray(T_kw)[:, None], X[None]))
uv, front = cam_mod.project(cam, jnp.asarray(x_c))
r = np.asarray(uv) - np.asarray(st.obs_uv)
active = (np.asarray(st.obs_mask) & np.asarray(st.kf_valid)[:, None]
          & X_mask[None] & np.asarray(front))
rn = np.linalg.norm(r, axis=-1)
print("active rows", active.sum())
for k in range(cfg.max_keyframes):
    a = active[k]
    if a.sum() == 0: continue
    print(f"kf slot {k} stamp {int(np.asarray(st.kf_stamp)[k]):3d} n={a.sum():4d} "
          f"reproj px: med {np.median(rn[k][a]):6.2f} p90 {np.percentile(rn[k][a],90):7.2f} max {rn[k][a].max():8.1f}")
# stereo rows
ur_pred = cam.fx * (x_c[...,0]-cam.baseline)/np.maximum(x_c[...,2],1e-3) + cam.cx
ur_obs = np.asarray(st.obs_uv)[...,0] - np.asarray(st.obs_disp)
rs = np.abs(ur_pred - ur_obs)
da = active & np.asarray(st.obs_dmask)
print("stereo rows", da.sum(), "med", np.median(rs[da]), "p90", np.percentile(rs[da],90))

# one BA call: move of newest KF vs gt
kf_T, X_new, stats = ba_mod.bundle_adjust(cam, cfg, st.kf_T_wk, st.kf_valid,
    X, jnp.asarray(X_mask), st.obs_uv, st.obs_mask, st.obs_disp,
    st.obs_dmask, obs_sig=st.obs_sig, kf_stamp=st.kf_stamp)
lk = int(np.asarray(st.last_kf))
dr, dt = se3.distance(kf_T[lk], st.kf_T_wk[lk])
stamp = int(np.asarray(st.kf_stamp)[lk])
_, dt_gt_before = se3.distance(st.kf_T_wk[lk], jnp.asarray(gt[stamp]))
_, dt_gt_after = se3.distance(kf_T[lk], jnp.asarray(gt[stamp]))
print(f"BA: cost {float(stats.cost_initial):.1f} -> {float(stats.cost_final):.1f}; newest KF moved dt={float(dt)*1e3:.1f}mm; |err vs gt| before {float(dt_gt_before)*1e3:.1f} after {float(dt_gt_after)*1e3:.1f} mm")

np.savez("/tmp/ba_inputs.npz",
         kf_T_wk=np.asarray(st.kf_T_wk), kf_valid=np.asarray(st.kf_valid),
         X=np.asarray(X), X_mask=np.asarray(X_mask),
         obs_uv=np.asarray(st.obs_uv), obs_mask=np.asarray(st.obs_mask),
         obs_disp=np.asarray(st.obs_disp),
         obs_dmask=np.asarray(st.obs_dmask),
         obs_sig=np.asarray(st.obs_sig),
         kf_stamp=np.asarray(st.kf_stamp), last_kf=np.asarray(st.last_kf),
         gt=gt)
print("inputs saved")
