#!/usr/bin/env python
"""At KF frames, is the committed pose (post kf_phase/post_phase) different
from the tracked pose (ctx.T_cw)? Logs both per frame."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import state as state_mod
from stereo_svo_tpu.engine.step import make_phases
from stereo_svo_tpu.geometry import se3
from stereo_svo_tpu.io import synthetic
from stereo_svo_tpu.ops import pyramid
import dataclasses

cfg = kitti_config()
if os.environ.get("DIAG_NOBA") == "1":
    cfg = dataclasses.replace(cfg, use_ba=False)
cam = cfg.camera
d = np.load("/root/repo/bench_results/seq_road_kitti_1241x376_100.npz")
L, R, gt = jnp.asarray(d["l"]), jnp.asarray(d["r"]), d["g"]

boot, track_phase, kf_phase, post_phase = make_phases(cfg)

def step_dbg(st, l, r):
    pyr_l, gxs, gys = pyramid.build_with_gradients(l, cfg.num_levels)
    def do_boot(st):
        st, out = boot(st, pyr_l, gxs, gys, r)
        return st, out, out.T_wc
    def do_track(st):
        st, ctx = track_phase(st, pyr_l, gxs, gys, r)
        st = jax.lax.cond(ctx.need_kf,
                          lambda s: kf_phase(s, pyr_l, gxs, gys, r, ctx.T_cw),
                          lambda s: s, st)
        st, out = post_phase(st, pyr_l, gxs, gys, ctx)
        return st, out, se3.inverse(ctx.T_cw)
    return jax.lax.cond(jnp.any(st.kf_valid), do_track, do_boot, st)

step_j = jax.jit(step_dbg)
st = state_mod.init_state(cfg)
prev_gt = None; prev_tr = None; prev_cm = None
for i in range(100):
    st, out, T_wc_tracked = step_j(st, L[i], R[i])
    tr = np.asarray(T_wc_tracked); cm = np.asarray(out.T_wc); g = gt[i]
    kf = bool(np.asarray(out.kf_inserted))
    if i > 0 and (kf or i % 10 == 0):
        def rel(a_prev, a):  # forward component of rel motion err vs gt
            Ra, ta = a_prev[:, :3], a_prev[:, 3]
            te = Ra.T @ (a[:, 3] - ta)
            Rg, tg = prev_gt[:, :3], prev_gt[:, 3]
            tgg = Rg.T @ (g[:, 3] - tg)
            return (te - tgg)
        d_tr = rel(prev_cm, tr)   # tracked-this-frame vs committed-prev
        d_cm = rel(prev_cm, cm)
        print(f"f{i:3d} kf={int(kf)} dfwd tracked {d_tr[2]*1e3:8.2f}  committed {d_cm[2]*1e3:8.2f}  (mm)")
    prev_gt = g; prev_tr = tr; prev_cm = cm
