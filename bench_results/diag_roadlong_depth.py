#!/usr/bin/env python
"""road_long drift: map error (depth bias vs own anchors) or pose error?
Chunked run over the cached aa2 sequence; per chunk: median relative
depth bias of landmarks+seeds, owner-KF pose error, per-frame drift."""
import os, sys
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.getcwd())
import jax, jax.numpy as jnp, numpy as np
import bench
from stereo_svo_tpu.config import kitti_config
from stereo_svo_tpu.engine import state as state_mod
from stereo_svo_tpu.engine.step import make_step
from stereo_svo_tpu.io import synthetic

cfg = kitti_config()
cam = cfg.camera
scene = synthetic.get_scene("road_long", 0)
L, R, gt = bench._render_sequence(cam, 700, "road_long", "kitti", False)
N, CH = 250, 25
step_fn = make_step(cfg)
def chunk(s, l, r):
    return jax.lax.scan(lambda s, im: step_fn(s, im[0], im[1]), s, (l, r))
chunk_j = jax.jit(chunk)
st = state_mod.init_state(cfg)
for c in range(N // CH):
    st, outs = chunk_j(st, L[c*CH:(c+1)*CH], R[c*CH:(c+1)*CH])
    np.asarray(outs.tracking_ok)
    f_end = (c+1)*CH - 1
    status = np.asarray(st.status); act = status > 0
    kf_id = np.asarray(st.kf_id)
    z_est = 1.0 / np.maximum(np.asarray(st.mu), 1e-6)
    z_true = np.full(len(kf_id), np.nan, np.float32)
    kfv = np.asarray(st.kf_valid); stamps = np.asarray(st.kf_stamp)
    kf_perr = {}
    for k in range(cfg.max_keyframes):
        if not kfv[k]:
            continue
        s_ = int(stamps[k]); own = (kf_id == k) & act
        kf_perr[s_] = round(float(np.linalg.norm(
            np.asarray(st.kf_T_wk[k])[:, 3] - gt[s_][:, 3])), 3)
        if own.sum():
            zt = synthetic.gt_depth(cam, jnp.asarray(gt[s_]),
                                    jnp.asarray(st.kf_uv)[own], scene)
            z_true[own] = np.asarray(zt)
    ok_lm = act & np.isfinite(z_true) & (z_true < 1e4)
    bias = (z_est[ok_lm] - z_true[ok_lm]) / z_true[ok_lm]
    est_T = np.asarray(outs.T_wc)[-1]
    perr = np.linalg.norm(est_T[:, 3] - gt[f_end][:, 3])
    # scale: est vs gt inter-frame translation over the chunk
    est_all = np.asarray(outs.T_wc)
    d_est = np.linalg.norm(np.diff(est_all[:, :, 3], axis=0), axis=1).sum()
    d_gt = np.linalg.norm(np.diff(gt[c*CH:(c+1)*CH, :, 3], axis=0), axis=1).sum()
    print(f"f={f_end} perr={perr:.2f} scale={d_est/d_gt:.4f} "
          f"depth_bias_med={np.median(bias):+.4f} n_lm={ok_lm.sum()} "
          f"z_med={np.median(z_true[ok_lm]):.1f} kf_perr={kf_perr}", flush=True)
