#!/usr/bin/env python
"""Is the road drift a MAP error (depths wrong vs own anchors) or a pure
pose-integration error? Run in chunks; at each boundary compare each
active feature's posterior depth 1/mu against the analytic scene depth
at its anchor pixel, evaluated at the owner keyframe's TRUE pose."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import runner, state as state_mod
from stereo_svo_tpu.engine.step import make_step
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic

cfg = kitti_config()
cam = cfg.camera
scene = synthetic.road_scene(0)
render = jax.jit(lambda T: synthetic.render_stereo(cam, T, scene))
N = 100
L, R, G = [], [], []
for i in range(N):
    T = synthetic.trajectory_pose(jnp.asarray(i*0.08, jnp.float32), "kitti")
    l, r = render(T); L.append(l); R.append(r); G.append(np.asarray(T))
L, R = jnp.stack(L), jnp.stack(R); gt = np.stack(G)

step = jax.jit(make_step(cfg))
st = state_mod.init_state(cfg)
CH = 25
def chunk(st, l, r):
    def body(s, im):
        s, o = make_step(cfg)(s, im[0], im[1])
        return s, o
    return jax.lax.scan(body, st, (l, r))
chunk_j = jax.jit(chunk)
for c in range(N // CH):
    st, outs = chunk_j(st, L[c*CH:(c+1)*CH], R[c*CH:(c+1)*CH])
    jax.block_until_ready(st.T_cw)
    status = np.asarray(st.status)
    act = status > 0
    kf_id = np.asarray(st.kf_id)
    stamp = np.asarray(st.kf_stamp)[kf_id]
    z_est = 1.0 / np.maximum(np.asarray(st.mu), 1e-6)
    # true depth at anchor pixel from the owner keyframe's TRUE pose
    # (gt_depth takes a single pose: evaluate per keyframe slot)
    z_true = np.full(len(kf_id), np.nan, np.float32)
    for k in range(cfg.max_keyframes):
        if not bool(np.asarray(st.kf_valid)[k]):
            continue
        s = int(np.asarray(st.kf_stamp)[k])
        own = kf_id == k
        if own.sum() == 0:
            continue
        zt = synthetic.gt_depth(cam, jnp.asarray(gt[s]),
                                jnp.asarray(st.kf_uv)[own], scene)
        z_true[own] = np.asarray(zt)
    # estimated pose error of owner keyframes
    kf_perr = []
    for k in range(cfg.max_keyframes):
        if bool(np.asarray(st.kf_valid)[k]):
            s = int(np.asarray(st.kf_stamp)[k])
            dr, dt = se3.distance(st.kf_T_wk[k], jnp.asarray(gt[s]))
            kf_perr.append((s, round(float(dt),3)))
    rel = (z_est - z_true) / np.maximum(z_true, 1e-6)
    for name, sel in (("seed", act & (status==1)), ("lmk", act & (status==2))):
        sel = sel & np.isfinite(z_true)
        if sel.sum() < 3: continue
        print(f"f{(c+1)*CH:3d} {name} n={sel.sum():4d} rel_z med {np.median(rel[sel]):+.4f} "
              f"p10 {np.percentile(rel[sel],10):+.3f} p90 {np.percentile(rel[sel],90):+.3f} "
              f"med_ztrue {np.median(z_true[sel]):5.1f}")
    print(f"   kf pose err (stamp, m): {kf_perr}")
