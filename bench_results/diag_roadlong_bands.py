#!/usr/bin/env python
"""Depth-band census of the active feature set on road_long: how many
features per TRUE-depth band, and each band's estimated-depth bias."""
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
N, CH = 125, 25
step_fn = make_step(cfg)
chunk_j = jax.jit(lambda s, l, r: jax.lax.scan(
    lambda s, im: step_fn(s, im[0], im[1]), s, (l, r)))
st = state_mod.init_state(cfg)
BANDS = [(0, 10), (10, 20), (20, 40), (40, 80), (80, 1e9)]
for c in range(N // CH):
    st, outs = chunk_j(st, L[c*CH:(c+1)*CH], R[c*CH:(c+1)*CH])
    np.asarray(outs.tracking_ok)
    status = np.asarray(st.status); act = status > 0
    kf_id = np.asarray(st.kf_id)
    z_est = 1.0 / np.maximum(np.asarray(st.mu), 1e-6)
    z_true = np.full(len(kf_id), np.nan, np.float32)
    kfv = np.asarray(st.kf_valid); stamps = np.asarray(st.kf_stamp)
    for k in range(cfg.max_keyframes):
        if not kfv[k]:
            continue
        own = (kf_id == k) & act
        if own.sum():
            zt = synthetic.gt_depth(cam, jnp.asarray(gt[int(stamps[k])]),
                                    jnp.asarray(st.kf_uv)[own], scene)
            z_true[own] = np.asarray(zt)
    okm = act & np.isfinite(z_true) & (z_true < 1e6)
    lm = okm & (status == 2)
    row = []
    for lo, hi in BANDS:
        m = lm & (z_true >= lo) & (z_true < hi)
        if m.sum():
            b = np.median((z_est[m] - z_true[m]) / z_true[m])
            row.append(f"[{lo:.0f}-{hi if hi<1e8 else 999:.0f}): n={m.sum()} bias={b:+.3f}")
        else:
            row.append(f"[{lo:.0f}-{hi if hi<1e8 else 999:.0f}): n=0")
    print(f"f={(c+1)*CH-1} " + " | ".join(row), flush=True)
